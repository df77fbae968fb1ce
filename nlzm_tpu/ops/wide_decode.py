"""Batched device decoder for the NLZP wide profile.

Decodes B blocks in lockstep. Each of the five symbol planes
(format/wide.py) runs as its own scan-of-scans: the outer scan walks
chunks (rebuilding the CDF tables from realized counts at each boundary,
same deterministic rule as the encoder), the inner scan walks the steps
of a chunk (warmup schedule 2/2/4/8, then 16); a step advances L rANS
lanes together through 1-2 predicated CDF reads against the chunk-static
tables. The stream is laid out in exact decode order (step, read, lane)
and the format's chunk-offset tables let the host stage every chunk's
renorm window as a dense array up front - the scan itself is gather-free
(selects run as small f32 one-hot contractions on the MXU).

Command assembly is scan-free: plane outputs are routed to command slots
with packed-sort gathers (ops/sort_gather.py), raw-bit fields are sliced
at prefix-summed offsets, and rep distances resolve against the last-4
dict distances by index arithmetic - the wide profile's rep rule is a
gather, not a sequential table replay. LZ expansion then reuses
ops/expand_ops.lz_expand_parallel.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CDF_SCALE_BITS, CDF_SCALE_TOTAL
from ..format.wide import PLANES
from .sort_gather import (
    PACK_MAX,
    compact_by_rank,
    compact_by_rank2,
    compact_by_rank16,
    gather_sorted,
    gather_sorted2,
    gather_sorted16,
)

_I32 = jnp.int32
_U32 = jnp.uint32

TOK_LIT, TOK_DICT, TOK_REP = 0, 1, 2


def _build_cdf_jnp(carry, nsym: int):
    """Device mirror of format.wide.build_cdf: fences [..., nsym + 1].
    carry: [B, R, nsym] i32."""
    carry = carry[..., :nsym]
    tot = jnp.sum(carry, axis=-1, keepdims=True)
    freq = 1 + (carry * (CDF_SCALE_TOTAL - nsym)) // (tot + 1)
    fences = jnp.cumsum(freq, axis=-1)[..., :-1]
    shape = carry.shape[:-1]
    return jnp.concatenate(
        [
            jnp.zeros(shape + (1,), _I32),
            fences,
            jnp.full(shape + (1,), CDF_SCALE_TOTAL, _I32),
        ],
        axis=-1,
    )


def _uniform_tables(B: int, rows: int, nsym: int):
    step = CDF_SCALE_TOTAL // nsym
    cells = np.zeros(nsym + 1, np.int32)
    cells[1:] = np.arange(1, nsym + 1) * step
    cells[nsym] = CDF_SCALE_TOTAL
    return jnp.broadcast_to(jnp.asarray(cells), (B, rows, nsym + 1)).astype(_I32)


@partial(jax.jit, static_argnames=("plane_idx", "steps"))
def plane_scan(seeds: jax.Array, wins: jax.Array, n_sym: jax.Array, ctx: jax.Array,
               plane_idx: int, steps: int, prior=None):
    """Decode one plane for all blocks.

    seeds: [B, L] u32 lane states. wins: [NC, B, WH] i32 per-chunk renorm
    pair windows, host-staged from the format's chunk-offset tables
    (already big-endian decoded: value = (b0<<8)|b1) - the scan itself
    never gathers from the stream; each step selects pairs from its
    chunk's dense window with two-level one-hot contractions that XLA
    places on the MXU (f32 exact: values < 2^16). n_sym: [B] symbol
    counts. ctx: [B, steps*L] read-0 context rows. steps must equal
    sum(chunk_schedule(...)). prior: optional per-read [rows, alph]
    warm-start counts. Returns per-read symbol arrays, each [B, steps*L].
    """
    from ..format.wide import chunk_schedule

    spec = PLANES[plane_idx]
    L, reads = spec.lanes, spec.reads
    B = seeds.shape[0]
    NC, _, WH = wins.shape
    assert WH % 8 == 0

    lane_iota = jnp.arange(L, dtype=_I32)

    ctx_t = ctx.reshape(B, steps, L).transpose(1, 0, 2)  # [steps, B, L]
    t_iota = jnp.arange(steps, dtype=_I32)
    active_t = (
        (t_iota[:, None, None] * L + lane_iota[None, None, :])
        < n_sym[None, :, None]
    )

    f32 = jnp.float32
    # TPU matmuls default to bf16 passes; these contractions carry exact
    # 14-16 bit integers and need full f32 precision
    PX = jax.lax.Precision.HIGHEST

    def read_one(x, rel, win3, tables_f, row, active, single_row):
        """One predicated CDF read across lanes.

        Symbol and span start/freq all derive from one fence-compare
        tensor. Row-table select and the pair select run as f32
        contractions (MXU); the rANS update stays u32. Symbol counts
        are NOT accumulated here: the chunk driver recovers them from
        the scanned-out symbols once per chunk (identical sums, ~1/clen
        of the ops on this fixed-overhead-dominated step path).
        """
        f = (x & jnp.asarray(0x3FFF, _U32)).astype(_I32)
        if single_row:
            tbl = tables_f[:, 0][:, None, :].astype(_I32)  # [B, 1, W+1]
        else:
            row_oh = jax.nn.one_hot(row, tables_f.shape[1], dtype=f32)
            tbl = jnp.einsum("blr,brw->blw", row_oh, tables_f, precision=PX).astype(_I32)
        cmp = (f[:, :, None] >= tbl[:, :, 1:]).astype(_I32)  # [B, L, W]
        dtbl = tbl[:, :, 1:] - tbl[:, :, :-1]
        y = jnp.sum(cmp, axis=2)
        start = jnp.sum(cmp * dtbl, axis=2)
        cmp1 = jnp.concatenate(
            [jnp.ones((B, L, 1), _I32), cmp[:, :, :-1]], axis=2
        )
        freq = jnp.sum((cmp1 - cmp) * dtbl, axis=2)

        x2 = freq.astype(_U32) * (x >> CDF_SCALE_BITS) + (f - start).astype(_U32)
        renorm = active & (x2 < jnp.asarray(1 << 16, _U32))
        rank = jnp.cumsum(renorm.astype(_I32), axis=1) - renorm.astype(_I32)
        h = jnp.clip(rel[:, None] + rank, 0, WH - 1)  # pair index in window
        # two-level select: O(WH/8 + 8) one-hots instead of O(WH)
        oh_hi = jax.nn.one_hot(h >> 3, WH // 8, dtype=f32)
        oh_lo = jax.nn.one_hot(h & 7, 8, dtype=f32)
        s1 = jnp.einsum("blh,bhe->ble", oh_hi, win3, precision=PX)  # [B, L, 8]
        pair = jnp.einsum("ble,ble->bl", s1, oh_lo, precision=PX).astype(_I32).astype(_U32)
        x3 = jnp.where(renorm, (x2 << 16) | pair, x2)
        x = jnp.where(active, x3, x)
        rel = rel + jnp.sum(renorm.astype(_I32), axis=1)

        y = jnp.where(active, y, 0)
        return y, x, rel

    def make_step(win3):
        def step_body(carry, xs):
            x, rel, tables_f = carry
            row0, active = xs
            ys = []
            y_prev = jnp.zeros((B, L), _I32)
            for r in range(reads):
                if r == 0:
                    row = row0
                elif spec.name == "dst":
                    row = row0 * 8 + y_prev
                else:
                    row = y_prev
                y, x, rel = read_one(
                    x, rel, win3, tables_f[r], row, active, spec.rows[r] == 1
                )
                ys.append(y)
                y_prev = y
            return (x, rel, tables_f), tuple(ys)
        return step_body

    def chunk_counts(ys, ctx_c, active_c):
        """Per-read realized counts for one chunk, from the scan output:
        one contraction per read instead of per step."""
        acta = active_c.astype(f32)  # [clen, B, L]
        out = []
        y_prev = None
        for r in range(reads):
            if r == 0:
                row = ctx_c
            elif spec.name == "dst":
                row = ctx_c * 8 + y_prev
            else:
                row = y_prev
            y_oh = jax.nn.one_hot(ys[r], spec.alphabets[r], dtype=f32)
            if spec.rows[r] == 1:
                cnt = jnp.einsum(
                    "tbl,tbls->bs", acta, y_oh, precision=PX
                ).astype(_I32)[:, None, :]
            else:
                row_oh = jax.nn.one_hot(row, spec.rows[r], dtype=f32)
                cnt = jnp.einsum(
                    "tblr,tbls,tbl->brs", row_oh, y_oh, acta, precision=PX
                ).astype(_I32)
            out.append(cnt)
            y_prev = ys[r]
        return tuple(out)

    def chunk_body(carry, xs):
        x, tables, carries = carry
        ctx_c, active_c, win_c = xs
        win3 = win_c.reshape(B, WH // 8, 8).astype(f32)
        tables_f = tuple(t.astype(f32) for t in tables)
        rel0 = jnp.zeros((B,), _I32)  # window is per chunk: cursor resets
        (x, _, _), ys = jax.lax.scan(
            make_step(win3), (x, rel0, tables_f), (ctx_c, active_c)
        )
        counts = chunk_counts(ys, ctx_c, active_c)
        new_carries = tuple(
            (carries[r] >> 1) + counts[r] for r in range(reads)
        )
        new_tables = tuple(
            _build_cdf_jnp(new_carries[r], spec.alphabets[r]) for r in range(reads)
        )
        return (x, new_tables, new_carries), ys

    if prior is None:
        tables0 = tuple(_uniform_tables(B, spec.rows[r], spec.alphabets[r]) for r in range(reads))
        carries0 = tuple(
            jnp.zeros((B, spec.rows[r], spec.alphabets[r]), _I32) for r in range(reads)
        )
    else:
        carries0 = tuple(
            jnp.broadcast_to(
                prior[r][None], (B, spec.rows[r], spec.alphabets[r])
            ).astype(_I32)
            for r in range(reads)
        )
        tables0 = tuple(
            _build_cdf_jnp(carries0[r], spec.alphabets[r]) for r in range(reads)
        )

    # group the warmup schedule into runs of equal chunk length; each run
    # is one scan-of-scans, state threads across runs
    schedule = chunk_schedule(steps)
    assert sum(schedule) == steps, (schedule, steps)
    assert len(schedule) == NC, (len(schedule), NC)
    runs = []
    for clen in schedule:
        if runs and runs[-1][0] == clen:
            runs[-1][1] += 1
        else:
            runs.append([clen, 1])

    carry = (seeds.astype(_U32), tables0, carries0)
    ys_parts = [[] for _ in range(reads)]
    t0 = 0
    c0 = 0
    for clen, count in runs:
        seg = slice(t0, t0 + clen * count)
        ctx_x = ctx_t[seg].reshape(count, clen, B, L)
        act_x = active_t[seg].reshape(count, clen, B, L)
        win_x = wins[c0 : c0 + count]
        carry, ys = jax.lax.scan(chunk_body, carry, (ctx_x, act_x, win_x))
        for r in range(reads):
            ys_parts[r].append(ys[r].reshape(count * clen, B, L))
        t0 += clen * count
        c0 += count

    return tuple(
        jnp.concatenate(p, axis=0).transpose(1, 0, 2).reshape(B, steps * L)
        for p in ys_parts
    )


# -------------------------------------------------------- the fused scan
# ALL FIVE planes are single-read with context-free row-0 tables (wire
# v4), so their scans fuse into ONE: every lane advances together per
# step through fence compares, one joint rANS update and one window
# select - per-step op COUNT is what the chip bills for at these tensor
# sizes (~8us fixed cost per op), and the fused scan runs max(steps_p)
# steps instead of sum(steps_p).
#
# Lane layout (internal to the decoder; the wire keeps the PLANES
# order): planes are PERMUTED into two alphabet groups so the five
# per-plane fence compares batch into TWO same-shape compares per step -
# group A = tok|len|dst (64+32+32 = 128 lanes, alphabets <= 64) compares
# flat at a padded width of 64, group B = lit|lex (80 lanes, alphabet
# 256) runs a TWO-LEVEL search (16 coarse fences -> one-hot MXU bucket
# select -> 17-wide fine compare, see make_step). Grouping cut 3
# dispatched kernels per step (measured; the step loop is
# dispatch-bound, ~8us per op through this relay). start/freq
# derive from the same compare by min/max over fences (largest fence
# <= f, smallest fence > f) instead of masked delta sums. The per-lane
# grouped fence tensors are chunk-static, built once per chunk in
# chunk_body.
_NP = len(PLANES)
# slot order: tok, len, dst, lit, lex (slot q holds plane _P1_PERM[q])
_P1_PERM = (0, 2, 4, 1, 3)
_P1_SLOT = tuple(_P1_PERM.index(p) for p in range(_NP))  # plane -> slot
_P1_L = tuple(PLANES[_P1_PERM[q]].lanes for q in range(_NP))
_P1_BASE = tuple(int(np.cumsum((0,) + _P1_L)[q]) for q in range(_NP))
_P1_LTOT = sum(_P1_L)
_P1_ALPH = tuple(PLANES[_P1_PERM[q]].alphabets[0] for q in range(_NP))
_P1_BOUNDS = tuple((b, b + l) for b, l in zip(_P1_BASE, _P1_L))
_P1_NA = 3  # slots 0.._P1_NA-1 form group A (alph <= _P1_WA)
_P1_WA = 64
_P1_GB = 16  # group-B coarse buckets (alph 256 = _P1_GB * _P1_GB)
_P1_A_END = _P1_BOUNDS[_P1_NA - 1][1]
assert _P1_A_END == 128 and all(a <= _P1_WA for a in _P1_ALPH[:_P1_NA])


def _seg_ranks(renorm, bounds):
    """Per-segment exclusive renorm ranks + per-segment totals.

    renorm: [B, L] bool; bounds: static (start, end) tuples partitioning
    the lane axis. Returns (rank [B, L], totals list of [B])."""
    B = renorm.shape[0]
    cs = jnp.cumsum(renorm.astype(_I32), axis=1)
    parts, totals = [], []
    for s, e in bounds:
        base = cs[:, s - 1 : s] if s > 0 else jnp.zeros((B, 1), _I32)
        parts.append(cs[:, s:e] - base)
        totals.append((cs[:, e - 1 : e] - base)[:, 0])
    return jnp.concatenate(parts, axis=1) - renorm.astype(_I32), totals


@partial(jax.jit, static_argnames=("steps",))
def plane_scan_fused(seeds, wins, n_syms, steps: int, priors=None):
    """Decode ALL planes (tok+lit+len+lex+dst) in one fused scan.

    seeds: [B, LTOT] u32 lane states in SLOT order (tok|len|dst|lit|lex,
    the grouped internal layout - prepare_wide lays them out). wins:
    tuple of per-plane [NC, B, WH_p] chunk windows in ORIGINAL plane
    order (NC = global chunk count for `steps`). n_syms: [B, NP]
    per-plane symbol counts, original order. priors: optional NP-tuple
    of [1, alph] counts, original order.
    Returns (tok_y, lit_y, len_y, lex_y, slot_y) in original plane
    order; plane p's array is [B, steps * L_p].
    """
    from ..format.wide import chunk_schedule

    B = seeds.shape[0]
    NC = wins[0].shape[0]
    WHs = tuple(int(w.shape[2]) for w in wins)
    base_w = tuple(int(x) for x in np.cumsum((0,) + WHs)[:_NP])
    WH_cat = sum(WHs)
    pad = (-WH_cat) % 64
    WHc = WH_cat + pad
    wins_cat = jnp.concatenate(
        list(wins) + ([jnp.zeros((NC, B, pad), wins[0].dtype)] if pad else []), axis=2
    )

    f32 = jnp.float32
    PX = jax.lax.Precision.HIGHEST

    # pid = ORIGINAL plane id per (slot-ordered) lane: n_syms and the
    # window bases stay indexed by wire plane order
    pid = np.concatenate(
        [np.full(_P1_L[q], _P1_PERM[q], np.int32) for q in range(_NP)]
    )
    lane_off = np.concatenate([np.arange(l, dtype=np.int32) for l in _P1_L])
    lane_lp = np.concatenate([np.full(l, l, np.int32) for l in _P1_L])
    base_w_lane = jnp.asarray(np.asarray(base_w, np.int32)[pid])  # [LTOT]
    pid_j = jnp.asarray(pid)
    slot_j = jnp.asarray(
        np.concatenate([np.full(_P1_L[q], q, np.int32) for q in range(_NP)])
    )

    t_iota = jnp.arange(steps, dtype=_I32)
    nsym_lane = jnp.take(n_syms, pid_j, axis=1)  # [B, LTOT]
    active_t = (
        t_iota[:, None, None] * jnp.asarray(lane_lp)[None, None, :]
        + jnp.asarray(lane_off)[None, None, :]
    ) < nsym_lane[None, :, :]  # [steps, B, LTOT]

    def fetch_pairs(win4, h):
        # three-level select (WHc/64 -> 8 -> 8): the level-one one-hot is
        # the only lane-wide tensor proportional to the window size, so
        # narrowing it 8x (vs the two-level WHc/8 form) removes the
        # dominant per-step VPU materialization; the wide contraction
        # stays a single MXU einsum of identical MAC count.
        oh_a = jax.nn.one_hot(h >> 6, WHc // 64, dtype=f32)
        oh_b = jax.nn.one_hot((h >> 3) & 7, 8, dtype=f32)
        oh_c = jax.nn.one_hot(h & 7, 8, dtype=f32)
        s1 = jnp.einsum("blh,bhe->ble", oh_a, win4, precision=PX)  # [B,L,64]
        s2 = jnp.einsum(
            "blge,blg->ble", s1.reshape(*s1.shape[:2], 8, 8), oh_b, precision=PX
        )  # [B,L,8]
        return (
            jnp.einsum("ble,ble->bl", s2, oh_c, precision=PX)
            .astype(_I32)
            .astype(_U32)
        )

    S14 = CDF_SCALE_TOTAL
    GB, SB = _P1_GB, _P1_GB + 1  # group-B coarse buckets / fine row width
    planeoff_B = jnp.asarray(
        np.concatenate(
            [np.full(_P1_L[q], (q - _P1_NA) * GB, np.int32)
             for q in range(_P1_NA, _NP)]
        )
    )

    def make_step(win3, fenA, coarseB, fineB):
        # Group A (tok|len|dst, alphabets <= 64): fenA [B, 128, 64]
        # per-lane fences, one flat compare - at this width the flat form
        # beats a two-level search (measured; the extra coarse/select
        # kernels cost more than the 64-column compare saves).
        # Group B (lit|lex, alphabet 256): flat would touch
        # [B, 80, 256] x ~6 passes per step; instead a TWO-LEVEL search:
        # compare against 16 per-lane coarse fences F[16c] (coarseB
        # [B, 80, 16]), select the bucket's 17 fine fences F[16c..16c+16]
        # with one one-hot MXU dot into the concatenated per-plane fine
        # table (fineB [B, 2*16, 17]; lex rows offset by 16 via
        # planeoff_B), then compare at width 17 - a ~9 us/step win on
        # hardware (flat 52.8 -> 43.2 us, .build/prof_twolevel.py).
        # start = largest fence <= f, end = smallest fence > f, both from
        # min/max over the same compares; freq = end - start.
        def group_flat(fg, fen):
            cmp = fg[:, :, None] >= fen  # [B, Lg, Wg]
            yg = jnp.sum(cmp.astype(_I32), axis=2)
            sg = jnp.max(jnp.where(cmp, fen, 0), axis=2)
            eg = jnp.min(jnp.where(cmp, S14, fen), axis=2)
            return yg, sg, eg

        def group_two(fg):
            cc = fg[:, :, None] >= coarseB  # [B, LgB, GB]
            cstar = jnp.sum(cc.astype(_I32), axis=2)  # bucket, in [0, GB)
            oh = jax.nn.one_hot(cstar + planeoff_B[None, :], 2 * GB, dtype=f32)
            sel = jnp.einsum("blg,bgs->bls", oh, fineB, precision=PX).astype(_I32)
            cf = fg[:, :, None] >= sel  # [B, LgB, SB]; sel[...,0] <= f always
            yg = cstar * GB + jnp.sum(cf[:, :, 1:].astype(_I32), axis=2)
            sg = jnp.max(jnp.where(cf, sel, 0), axis=2)
            eg = jnp.min(jnp.where(cf, S14, sel), axis=2)
            return yg, sg, eg

        def step_body(carry, active):
            x, rels = carry

            f = (x & jnp.asarray(0x3FFF, _U32)).astype(_I32)
            yA, sA, eA = group_flat(f[:, :_P1_A_END], fenA)
            yB, sB, eB = group_two(f[:, _P1_A_END:])
            y = jnp.concatenate([yA, yB], axis=1)
            start = jnp.concatenate([sA, sB], axis=1)
            freq = jnp.concatenate([eA - sA, eB - sB], axis=1)

            x2 = freq.astype(_U32) * (x >> CDF_SCALE_BITS) + (f - start).astype(_U32)
            renorm = active & (x2 < jnp.asarray(1 << 16, _U32))
            rank, totals = _seg_ranks(renorm, _P1_BOUNDS)
            rel_lane = jnp.take(rels, slot_j, axis=1)
            h = jnp.clip(base_w_lane[None, :] + rel_lane + rank, 0, WHc - 1)
            pair = fetch_pairs(win3, h)
            x3 = jnp.where(renorm, (x2 << 16) | pair, x2)
            x = jnp.where(active, x3, x)
            rels = rels + jnp.stack(totals, axis=1)

            y = jnp.where(active, y, 0)
            return (x, rels), y

        return step_body

    def grouped_fences(tables):
        """Per-lane grouped fence tensors from the per-slot tables.

        fenA [B, 128, 64]: group-A per-lane fences 1..alph (padded with
        S14). coarseB [B, LgB, GB]: group-B per-lane coarse fences
        F[GB], F[2*GB], .., F[alph]. fineB [B, 2*GB, GB+1] f32: bucket
        row g of plane (q - NA) holds F[GB*g .. GB*g + GB] (overlapping
        rows, so a stack, not a reshape); f32 so the per-step one-hot
        bucket select is a single MXU dot (fences <= 2^14 are exact)."""
        partsA, partsC, partsF = [], [], []
        for q in range(_NP):
            t = tables[q][:, 0, 1:]  # [B, alph] fences 1..alph
            if q < _P1_NA:
                t = jnp.concatenate(
                    [t, jnp.full((B, _P1_WA - _P1_ALPH[q]), S14, _I32)],
                    axis=1,
                ) if _P1_ALPH[q] < _P1_WA else t
                partsA.append(jnp.broadcast_to(t[:, None, :], (B, _P1_L[q], _P1_WA)))
            else:
                assert _P1_ALPH[q] == GB * GB
                tf = tables[q][:, 0, :]  # [B, alph + 1] fences 0..alph
                coarse = tf[:, GB::GB]  # [B, GB]
                partsC.append(
                    jnp.broadcast_to(coarse[:, None, :], (B, _P1_L[q], GB))
                )
                partsF.append(
                    jnp.stack(
                        [tf[:, g * GB : g * GB + GB + 1] for g in range(GB)],
                        axis=1,
                    ).astype(f32)
                )
        return (
            jnp.concatenate(partsA, axis=1),
            jnp.concatenate(partsC, axis=1),
            jnp.concatenate(partsF, axis=1),
        )

    def chunk_body(carry, xs):
        x, tables, carries = carry
        active_c, win_c = xs
        win3 = win_c.reshape(B, WHc // 64, 64).astype(f32)
        # hoist the grouped per-lane fence tensors out of the step loop:
        # tables change only at chunk boundaries
        fenA, coarseB, fineB = grouped_fences(tables)

        rel0 = jnp.zeros((B, _NP), _I32)
        (x, _), ys = jax.lax.scan(
            make_step(win3, fenA, coarseB, fineB), (x, rel0), active_c
        )
        # realized symbol counts once per chunk from the scan output
        # (identical sums to per-step accumulation, ~1/clen of the ops)
        acta = active_c.astype(f32)  # [clen, B, LTOT]
        counts = tuple(
            jnp.einsum(
                "tbl,tbls->bs",
                acta[:, :, _P1_BOUNDS[p][0] : _P1_BOUNDS[p][1]],
                jax.nn.one_hot(
                    ys[:, :, _P1_BOUNDS[p][0] : _P1_BOUNDS[p][1]],
                    _P1_ALPH[p], dtype=f32,
                ),
                precision=PX,
            ).astype(_I32)[:, None, :]
            for p in range(_NP)
        )
        new_carries = tuple((carries[p] >> 1) + counts[p] for p in range(_NP))
        new_tables = tuple(
            _build_cdf_jnp(new_carries[p], _P1_ALPH[p]) for p in range(_NP)
        )
        return (x, new_tables, new_carries), ys

    # tables/carries ride in SLOT order; priors arrive in wire order
    if priors is None:
        tables0 = tuple(_uniform_tables(B, 1, _P1_ALPH[q]) for q in range(_NP))
        carries0 = tuple(jnp.zeros((B, 1, _P1_ALPH[q]), _I32) for q in range(_NP))
    else:
        carries0 = tuple(
            jnp.broadcast_to(
                priors[_P1_PERM[q]][None], (B, 1, _P1_ALPH[q])
            ).astype(_I32)
            for q in range(_NP)
        )
        tables0 = tuple(
            _build_cdf_jnp(carries0[q], _P1_ALPH[q]) for q in range(_NP)
        )

    schedule = chunk_schedule(steps)
    assert sum(schedule) == steps and len(schedule) == NC, (schedule, steps, NC)
    runs = []
    for clen in schedule:
        if runs and runs[-1][0] == clen:
            runs[-1][1] += 1
        else:
            runs.append([clen, 1])

    carry = (seeds.astype(_U32), tables0, carries0)
    ys_parts = []
    t0 = 0
    c0 = 0
    for clen, count in runs:
        seg = slice(t0, t0 + clen * count)
        act_x = active_t[seg].reshape(count, clen, B, _P1_LTOT)
        win_x = wins_cat[c0 : c0 + count]
        carry, ys = jax.lax.scan(chunk_body, carry, (act_x, win_x))
        ys_parts.append(ys.reshape(count * clen, B, _P1_LTOT))
        t0 += clen * count
        c0 += count

    y0 = jnp.concatenate(ys_parts, axis=0).transpose(1, 0, 2)  # [B, steps, LTOT]
    # un-permute: original plane p lives at its slot's lane bounds
    return tuple(
        y0[
            :, :, _P1_BOUNDS[_P1_SLOT[p]][0] : _P1_BOUNDS[_P1_SLOT[p]][1]
        ].reshape(B, steps * PLANES[p].lanes)
        for p in range(_NP)
    )


# ------------------------------------------------------------- assembly


def _bits_fetch(bit_half, offs, width, big=False):
    """MSB-first field of `width` bits at bit offset `offs` (both [B, Tc]).

    bit_half: [B, H] big-endian halfwords of the raw-bit plane. Fields
    are <= 15 bits (the 32 KiB block cap bounds distance extras at 13),
    so two adjacent halfwords always cover a field: width + 15 offset
    bits <= 30 < 32. Two 16-bit-payload gathers replace the previous
    three byte gathers.
    """
    bit_half = bit_half.astype(_I32)  # staged as u16 (half the upload bytes)
    h0 = offs >> 4
    hm = bit_half.shape[1] - 1
    G16 = gather_sorted2 if big else gather_sorted16
    hw0 = G16(bit_half, jnp.clip(h0, 0, hm))
    hw1 = G16(bit_half, jnp.clip(h0 + 1, 0, hm))
    word = (hw0.astype(_U32) << 16) | hw1.astype(_U32)
    sh = (offs & 15).astype(_U32)
    w = jnp.clip(width, 0, 16).astype(_U32)
    v = ((word << sh) & jnp.asarray(0xFFFFFFFF, _U32)) >> (
        jnp.asarray(32, _U32) - jnp.maximum(w, 1)
    )
    return jnp.where(width > 0, v.astype(_I32), 0)


@partial(jax.jit, static_argnames=("big", "wide_delta"))
def assemble_ops(
    tok_y, len_y, lex_y, lit_y, slot_y, bit_half, n_cmds, big=False,
    wide_delta=False,
):
    """Scan-free command assembly: plane symbols -> (op_len [Tc, B],
    op_val [Tc, B]) for lz_expand_parallel. One jit covers lengths,
    distances, rep resolution, literals and raw bits (wire v4's
    context-free dst removed the mid-assembly dst-scan dependency that
    used to split this into two stages).

    big selects the 2-operand sort primitives (no 15-bit packing budget)
    for block sizes above PACK_MAX. wide_delta: deltas may use 16 bits
    (shared dictionary reach); the delta compact/gather pair switches to
    the 16-bit-payload packings."""
    G = gather_sorted2 if big else gather_sorted
    C = compact_by_rank2 if big else compact_by_rank
    # delta values (only) can exceed the 15-bit payload with a dictionary
    Gd = gather_sorted2 if big else (gather_sorted16 if wide_delta else gather_sorted)
    Cd = compact_by_rank2 if big else (compact_by_rank16 if wide_delta else compact_by_rank)
    B, Tc = tok_y.shape
    k = jnp.arange(Tc, dtype=_I32)[None, :]
    active = k < n_cmds[:, None]
    is_lit = active & (tok_y == TOK_LIT)
    is_rep = active & (tok_y == TOK_REP)
    is_dict = active & (tok_y == TOK_DICT)
    is_match = is_rep | is_dict

    m_rank = jnp.cumsum(is_match.astype(_I32), axis=1) - is_match.astype(_I32)
    len_sym = jnp.where(is_match, G(len_y, m_rank), 0)
    esc = is_match & (len_sym == 7)
    lex_rank = jnp.cumsum(esc.astype(_I32), axis=1) - esc.astype(_I32)
    ext = jnp.where(esc, G(lex_y, lex_rank), 0)
    lv = jnp.where(esc, 7 + ext, len_sym)
    d_rank = jnp.cumsum(is_dict.astype(_I32), axis=1) - is_dict.astype(_I32)

    slot = jnp.where(is_dict, G(slot_y, d_rank), 0)  # slot_y is dict-aligned
    is_big_slot = slot >= 4
    # clamp to the format maximum (128 KiB blocks + 64 KiB dict ->
    # dv < 2^18 -> ab <= 16, still within _bits_fetch's 16-bit fields) so
    # corrupted payloads degrade to a CRC failure instead of overflowing
    # the shifted intermediates below
    ab = jnp.clip(jnp.where(is_dict & is_big_slot, (slot >> 1) - 1, 0), 0, 16)

    widths = jnp.where(is_rep, 2, 0) + ab
    offs = jnp.cumsum(widths, axis=1) - widths
    v = _bits_fetch(bit_half, offs, widths, big)
    rep_idx = jnp.where(is_rep, v, 0)
    extra = jnp.where(is_dict, v, 0)

    dv = jnp.where(is_big_slot, ((2 + (slot & 1)) << ab) + extra, slot)
    delta_dict = jnp.where(is_dict, dv + 1, 0)

    # rep resolution: r-th most recent dict distance (virtual history
    # 1,2,3,4 before the first dict command)
    D = Cd(delta_dict, d_rank, is_dict, Tc)
    j = d_rank - 1 - rep_idx
    delta_rep = jnp.where(j >= 0, Gd(D, jnp.maximum(j, 0)), -j)
    delta = jnp.where(is_rep, delta_rep, delta_dict)

    lit_rank = jnp.cumsum(is_lit.astype(_I32), axis=1) - is_lit.astype(_I32)
    byte = jnp.where(is_lit, G(lit_y, lit_rank), 0)

    mmin = (
        2
        + (delta > 0xFF).astype(_I32)
        + (delta > 0xFFF).astype(_I32)
        + (delta > 0xFFFFF).astype(_I32)
    )
    op_len = jnp.where(active, jnp.where(is_match, lv + mmin, 0), -1)
    op_val = jnp.where(is_match, delta, byte)
    return op_len.T, op_val.T


# ------------------------------------------------------------- driver
def rounds_hint_of(max_depth: int):
    """Exact pointer-doubling round budget for a container's max chain
    depth (the per-block depth rides the container's reads slot); None
    when the depth is unknown (legacy containers)."""
    if max_depth <= 0:
        return None
    return max(0, max_depth - 1).bit_length()


def stage_plane(stream_list, offset_list, plane_idx: int, steps: int):
    """Host-side single-plane staging: (seeds [B, L] u32, wins [NC, B, WH] u16).

    Test/reference path for the unfused plane_scan. The production
    pipeline (prepare_wide) stages compact streams instead and builds
    windows ON DEVICE (stage_windows_fused): at container scale the dense
    host window build plus the padded upload dominated end-to-end decode.

    wins holds each chunk's renorm pairs as big-endian values, dense and
    zero-padded to WH (the max pair count of any (block, chunk)); block
    offsets pad to the global chunk count by repeating the stream end.
    """
    from ..format.wide import chunk_schedule

    L = PLANES[plane_idx].lanes
    B = len(stream_list)
    NC = len(chunk_schedule(steps))
    seeds = np.frombuffer(
        b"".join(s[: 4 * L] for s in stream_list), "<u4"
    ).reshape(B, L)
    hw_lens = np.asarray([(len(s) - 4 * L) // 2 for s in stream_list], np.int64)
    hw_flat = np.frombuffer(
        b"".join(s[4 * L :] for s in stream_list), ">u2"
    ).astype(np.uint16)
    hw_base = np.zeros(B + 1, np.int64)
    np.cumsum(hw_lens, out=hw_base[1:])

    offs = np.zeros((B, NC + 1), np.int64)
    for b, o in enumerate(offset_list):
        offs[b, : len(o)] = o
        offs[b, len(o) :] = hw_lens[b] * 2
    pair_counts = (offs[:, 1:] - offs[:, :-1]) // 2  # [B, NC]
    WH = max(8, int(-(-pair_counts.max() // 8)) * 8)
    if len(hw_flat) == 0:
        return jnp.asarray(seeds), jnp.zeros((NC, B, WH), jnp.uint16)
    # wins[c, b, k] = hw[b][offs[b, c]/2 + k] for k < pair_counts[b, c]
    k = np.arange(WH, dtype=np.int64)
    idx = hw_base[:-1][:, None, None] + offs[:, :-1, None] // 2 + k  # [B, NC, WH]
    mask = k < pair_counts[:, :, None]
    wins = np.where(
        mask, np.take(hw_flat, np.minimum(idx, len(hw_flat) - 1)), 0
    ).transpose(1, 0, 2).astype(np.uint16)
    return jnp.asarray(seeds), jnp.asarray(np.ascontiguousarray(wins))


@partial(jax.jit, static_argnames=("WHs", "bases", "big"))
def stage_windows_fused(hw_cat, offs, ends, WHs: tuple, bases: tuple, big: bool):
    """Build every plane's dense per-chunk renorm windows ON DEVICE.

    hw_cat: [B, H] u16 - each block's five plane pair streams laid out at
    static per-plane halfword bases (big-endian-decoded values). offs:
    [B, NP, NC] i32 global pair index of each chunk's first pair; ends:
    [B, NP] i32 global end index of each plane's stream. WHs/bases:
    static per-plane window widths and stream bases.

    One batched sort-gather serves all five planes' layouts at once
    (~2 G sorted elem/s vs ~70 M elem/s for XLA's gather lowering);
    queries are each chunk's offs[c] + iota(WH), masked to its real pair
    count. Returns the per-plane [NC, B, WH_p] i32 window tuple the
    fused scan consumes.
    """
    B, H = hw_cat.shape
    NC = offs.shape[2]
    nxt = jnp.concatenate(
        [offs[:, :, 1:], ends[:, :, None]], axis=2
    )  # [B, NP, NC]
    pc = nxt - offs  # pair count per (block, plane, chunk)

    qs, masks = [], []
    for p in range(_NP):
        k = jnp.arange(WHs[p], dtype=_I32)
        q = offs[:, p, :, None] + k  # [B, NC, WH_p]
        masks.append(k[None, None, :] < pc[:, p, :, None])
        qs.append(q.reshape(B, NC * WHs[p]))
    q_cat = jnp.clip(jnp.concatenate(qs, axis=1), 0, max(H - 1, 0))
    src = hw_cat.astype(_I32)
    g = (gather_sorted2 if big else gather_sorted16)(src, q_cat)

    wins = []
    pos = 0
    for p in range(_NP):
        n = NC * WHs[p]
        w = g[:, pos : pos + n].reshape(B, NC, WHs[p])
        wins.append(jnp.where(masks[p], w, 0).transpose(1, 0, 2))
        pos += n
    return tuple(wins)


def prepare_wide(payloads, priors_blob: bytes | None = None):
    """Host prep: parse block headers, stage COMPACT streams for device.

    The host only slices each block's plane streams into one padded
    [B, H] halfword array (plus tiny offset tables); the dense per-chunk
    renorm windows - the expensive layout - are built on device by
    stage_windows_fused from the format's chunk-offset tables. This keeps
    host prep at memcpy cost and ships ~half the bytes of the padded
    windows over the host->device link. Returns a staged dict of device
    arrays + static step counts, ready for decode_wide_staged.
    """
    from ..format.wide import (
        N_PLANES, chunk_schedule, padded_steps, parse_payload, parse_priors,
    )

    B = len(payloads)
    counts = np.zeros((B, N_PLANES), np.int64)
    plane_streams = [[] for _ in range(N_PLANES)]
    plane_offsets = [[] for _ in range(N_PLANES)]
    bit_chunks = []
    for b, p in enumerate(payloads):
        cnts, streams, offsets, bits = parse_payload(p)
        for i in range(N_PLANES):
            counts[b, i] = cnts[i]
            plane_streams[i].append(streams[i])
            plane_offsets[i].append(offsets[i])
        bit_chunks.append(bits)

    # all five planes share one fused scan (wire v4: every plane is
    # context-free): one global step count (the max is itself a valid
    # schedule sum), windows staged to its chunk count
    steps_fused = max(
        padded_steps(int(counts[:, i].max()), PLANES[i].lanes)
        for i in range(N_PLANES)
    )
    NC = len(chunk_schedule(steps_fused))

    # per-plane stream geometry (pair = halfword units); seeds lay out
    # in the fused scan's SLOT order (grouped lane layout)
    seeds_cat = np.zeros((B, _P1_LTOT), np.uint32)
    hw_lens = np.zeros((B, N_PLANES), np.int64)
    for i in range(N_PLANES):
        L = PLANES[i].lanes
        q0 = _P1_BASE[_P1_SLOT[i]]
        seeds_cat[:, q0 : q0 + L] = np.frombuffer(
            b"".join(s[: 4 * L] for s in plane_streams[i]), "<u4"
        ).reshape(B, L)
        hw_lens[:, i] = [(len(s) - 4 * L) // 2 for s in plane_streams[i]]
    Hmax = np.maximum(8, hw_lens.max(axis=0))  # per plane
    bases = np.zeros(N_PLANES + 1, np.int64)
    np.cumsum(Hmax, out=bases[1:])
    H_tot = int(bases[-1])

    hw_cat = np.zeros((B, H_tot), np.uint16)
    offs_g = np.zeros((B, N_PLANES, NC), np.int32)
    ends_g = np.zeros((B, N_PLANES), np.int32)
    for i in range(N_PLANES):
        L = PLANES[i].lanes
        flat = np.frombuffer(
            b"".join(s[4 * L :] for s in plane_streams[i]), ">u2"
        ).astype(np.uint16)
        base = 0
        b0 = int(bases[i])
        for b in range(B):
            n = int(hw_lens[b, i])
            hw_cat[b, b0 : b0 + n] = flat[base : base + n]
            base += n
            o = plane_offsets[i][b]
            no = len(o)
            offs_g[b, i, :no] = b0 + (o // 2)
            offs_g[b, i, no:] = b0 + n
            ends_g[b, i] = b0 + n

    pair_counts = (
        np.concatenate([offs_g[:, :, 1:], ends_g[:, :, None]], axis=2) - offs_g
    )
    WHs = tuple(
        max(8, int(-(-pair_counts[:, i, :].max() // 8)) * 8)
        for i in range(N_PLANES)
    )

    # big-endian halfword staging for the 16-bit-payload bits gathers
    hmax = (max(len(x) for x in bit_chunks) + 1) // 2 + 2
    bit_arr = np.zeros((B, hmax), np.uint16)
    for b, c in enumerate(bit_chunks):
        cb = np.frombuffer(c + b"\x00" * (len(c) & 1), np.uint8).astype(np.uint16)
        bit_arr[b, : len(cb) // 2] = (cb[0::2] << 8) | cb[1::2]
    priors = None
    if priors_blob:
        raw = parse_priors(priors_blob)
        priors = {
            name: [jnp.asarray(np.asarray(a, np.int32)) for a in pr]
            for name, pr in raw.items()
        }
    return {
        "priors": priors,
        "n_sym": [jnp.asarray(counts[:, i], np.int32) for i in range(N_PLANES)],
        "seeds_cat": jnp.asarray(seeds_cat),
        "hw_cat": jnp.asarray(hw_cat),
        "offs": jnp.asarray(offs_g),
        "ends": jnp.asarray(ends_g),
        "WHs": WHs,
        "bases": tuple(int(x) for x in bases[:N_PLANES]),
        "bit_half": jnp.asarray(bit_arr),
        "steps": [steps_fused] * N_PLANES,
        "B": B,
    }


def stage_windows_of(staged):
    """Device window build from a prepare_wide staged dict."""
    NC = staged["offs"].shape[2]
    H = staged["hw_cat"].shape[1]
    q_tot = NC * sum(staged["WHs"])
    big = H > PACK_MAX or q_tot > PACK_MAX
    return stage_windows_fused(
        staged["hw_cat"], staged["offs"], staged["ends"],
        staged["WHs"], staged["bases"], big,
    )


def decode_wide_staged(staged, block_size: int):
    """Device pipeline: staged plane streams -> (out [B, N] u8, produced)."""
    from .expand_ops import lz_expand_parallel

    rounds_hint = staged.get("rounds_hint")
    dict_arr = staged.get("dict_arr")  # [D] u8 shared dictionary or None

    n_sym, steps = staged["n_sym"], staged["steps"]
    priors = staged.get("priors")
    big = block_size > PACK_MAX  # 2-operand sort path for > 32 KiB blocks
    # plane pad can exceed the 15-bit packed-sort budget by one chunk;
    # symbol counts never do (every command produces >= 1 byte)
    cap15 = (lambda a: a) if big else (lambda a: a[:, : min(a.shape[1], 1 << 15)])

    wins = stage_windows_of(staged)
    seeds_f = staged["seeds_cat"]
    nsyms_f = jnp.stack([n_sym[i] for i in range(_NP)], axis=1)
    priors_f = None
    if priors:
        priors_f = tuple(priors[PLANES[p].name][0] for p in range(_NP))
    ys = plane_scan_fused(seeds_f, wins, nsyms_f, steps[0], priors_f)
    tok_y, lit_y, len_y, lex_y, slot_y = map(cap15, ys)

    op_len, op_val = assemble_ops(
        tok_y, len_y, lex_y, lit_y, slot_y, staged["bit_half"], n_sym[0], big,
        wide_delta=dict_arr is not None,
    )
    return lz_expand_parallel(op_len, op_val, block_size, rounds_hint, dict_arr)


def prepare_wide_bucketed(payloads, priors_blob: bytes | None = None, n_buckets: int = 2):
    """Bucket blocks by command count before staging.

    Scan step counts and assembly widths are static per batch, sized by
    the WORST block (16.9k commands vs ~4.4k median on the bench mix) -
    one outlier makes every block pay its padding. Splitting the batch
    into quantile buckets lets each run at its own (smaller) widths.
    Returns a list of (staged, block_index_list); buckets are quantile
    splits by tok symbol count.
    """
    B = len(payloads)
    if B <= n_buckets * 8:
        return [(prepare_wide(payloads, priors_blob), list(range(B)))]
    tok_counts = [int.from_bytes(p[0:4], "big") for p in payloads]
    order = sorted(range(B), key=lambda b: tok_counts[b])
    out = []
    for k in range(n_buckets):
        idx = order[k * B // n_buckets : (k + 1) * B // n_buckets]
        if not idx:
            continue
        out.append((prepare_wide([payloads[b] for b in idx], priors_blob), idx))
    return out


def decode_wide_blocks(
    payloads, block_size: int, total_len: int,
    priors_blob: bytes | None = None, max_depth: int = 0,
    dictionary: bytes | None = None,
) -> bytes:
    """Decode wide-profile block payloads (host orchestration).

    max_depth (from the container's per-block depth fields) lets the
    expander run its exact round budget instead of detecting convergence:
    a scalar applies globally; a per-block sequence gives each bucket its
    own (smaller) budget. Blocks run in command-count buckets
    (prepare_wide_bucketed) so one command-dense block does not size
    every block's scan/sort widths.
    dictionary: container-level shared dictionary (virtual history before
    every block; the expander resolves dict-region ancestors from it).
    """
    buckets = prepare_wide_bucketed(payloads, priors_blob)
    dict_arr = (
        jnp.asarray(np.frombuffer(dictionary, np.uint8)) if dictionary else None
    )
    per_block = None
    if not isinstance(max_depth, int):
        per_block = list(max_depth)
        max_depth = max(per_block, default=0)
    full = np.empty(len(payloads) * block_size, np.uint8)
    # dispatch every bucket before forcing any: device compute of bucket k
    # overlaps the host-side fetch of bucket k-1 (dispatch is async)
    outs = []
    for staged, idx in buckets:
        bucket_depth = (
            max((per_block[b] for b in idx), default=0) if per_block else max_depth
        )
        staged["rounds_hint"] = rounds_hint_of(bucket_depth)
        staged["dict_arr"] = dict_arr
        out, produced = decode_wide_staged(staged, block_size)
        outs.append((out, idx))
    for out, idx in outs:
        out_np = np.asarray(out)
        for row, b in enumerate(idx):
            full[b * block_size : (b + 1) * block_size] = out_np[row]
    return full.tobytes()[:total_len]
