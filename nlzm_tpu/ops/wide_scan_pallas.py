"""Pallas TPU kernel for the wide-profile fused plane scan.

One `pallas_call` runs the ENTIRE fused scan (ops/wide_decode.py::
plane_scan_fused): all chunks, the per-chunk CDF rebuilds, the
lane-parallel rANS math and the renorm-window fetches. The XLA scan
pays ~8us of fixed dispatch cost per op and ~20 ops per step; here the
step loop lives inside a single kernel, so per-step cost is pure
VPU/MXU work. Semantics are mirror-exact with the XLA path (differential
test: tests/test_wide_pallas.py); the staged decode picks whichever path
is enabled (decode_wide_staged(use_pallas=...)).

Layout choices:
- lanes pad LTOT=208 -> 256 (two 128-lane registers); pad lanes carry
  nsym=0 so they never renorm or emit symbols.
- the per-lane fence/delta tables live in VMEM scratch at [BT, 256, 256]
  (lane-major, width = max joint alphabet), rebuilt from carried counts
  at every chunk boundary with the format's deterministic rule.
- grid = (B/BT, NC) with chunks minor: scratch state (lane rANS states,
  window cursors, count carries) persists across the chunk dimension and
  re-initializes at chunk 0 of each block tile.
- ys are written per chunk at dynamic step offsets; the chunk schedule
  (warmup then full steady chunks) is closed-form, so each chunk's step
  offset/length derive from program_id arithmetic. Warmup chunks write
  their full steady-length row tile into slack that later chunks
  overwrite in grid order, so the output buffer carries CHUNK_STEPS rows
  of tail padding.
- the whole per-tile output lives in VMEM as one revisited block, which
  bounds the step count the kernel accepts (fits 32 KiB blocks; the
  caller falls back to the XLA scan above MAX_STEPS).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CDF_SCALE_BITS, CDF_SCALE_TOTAL
from ..format.wide import CHUNK_STEPS, PLANES, WARMUP_CHUNKS, chunk_schedule

_I32 = jnp.int32
_U32 = jnp.uint32

NP = len(PLANES)
LANE_PAD = 256  # LTOT=208 padded to two 128-lane registers
W = 256  # joint fence width = max plane alphabet
BT = 8  # block tile per kernel instance
# VMEM ceiling for the revisited [steps_pad, BT, LANE_PAD] i32 out block
# (~4.3 MB at 520 steps) + the ~8 MB of per-step intermediates; beyond
# this the caller must use the XLA scan (big-block containers)
MAX_STEPS = 768

_L = tuple(p.lanes for p in PLANES)
_BASE = tuple(int(np.cumsum((0,) + _L)[i]) for i in range(NP))
_LTOT = sum(_L)
_ALPH = tuple(p.alphabets[0] for p in PLANES)
_BOUNDS = tuple((b, b + l) for b, l in zip(_BASE, _L))


def _cumsum_last(x):
    """Inclusive cumsum along the last axis by log2(n) shifted adds —
    Mosaic has no cumsum lowering (jnp.cumsum raises NotImplementedError
    inside a TPU kernel)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (k,), x.dtype), x[..., : n - k]], axis=-1
        )
        x = x + shifted
        k *= 2
    return x


def _build_fences_padded(carry, alph: int):
    """build_cdf over one plane's padded [BT, W] carry row -> fences
    [BT, W] (fence[i] = cumulative end of symbol i) and deltas [BT, W].

    Columns >= alph get fence = 2^14 (never matched by a 14-bit state)
    and delta 0 (never contribute to spans). Mirrors format.wide.
    build_cdf exactly for the live columns."""
    col = jax.lax.broadcasted_iota(_I32, carry.shape, 1)
    live = col < alph
    c = jnp.where(live, carry, 0)
    tot = jnp.sum(c, axis=1, keepdims=True)
    freq = jnp.where(live, 1 + (c * (CDF_SCALE_TOTAL - alph)) // (tot + 1), 0)
    fence = _cumsum_last(freq)
    # the LAST live symbol absorbs rounding slack: its fence (and all
    # padded columns) pin to 2^14
    fence = jnp.where(col >= alph - 1, CDF_SCALE_TOTAL, fence)
    prev = jnp.concatenate([jnp.zeros_like(fence[:, :1]), fence[:, :-1]], axis=1)
    delta = jnp.where(live, fence - prev, 0)
    return fence, delta


def _seg_cumsum(flags):
    """Per-plane-segment exclusive ranks and totals over the lane axis.

    flags: [BT, LANE_PAD] i32. Returns (rank [BT, LANE_PAD],
    totals [BT, NP])."""
    cs = _cumsum_last(flags)
    parts, totals = [], []
    for s, e in _BOUNDS:
        base = cs[:, s - 1 : s] if s > 0 else jnp.zeros_like(cs[:, :1])
        parts.append(cs[:, s:e] - base)
        totals.append(cs[:, e - 1 : e] - base)
    parts.append(jnp.zeros_like(cs[:, _LTOT:]))
    return (
        jnp.concatenate(parts, axis=1) - flags,
        jnp.concatenate(totals, axis=1),
    )


def _seg_const(l, values):
    """Piecewise-constant per-lane metadata from scalar constants only
    (pallas kernels cannot capture array constants)."""
    out = jnp.full_like(l, int(values[-1]))
    for p in range(NP - 1, -1, -1):
        out = jnp.where(l < _BOUNDS[p][1], int(values[p]), out)
    return out


def _make_kernel(whc: int, schedule: tuple, base_ws: tuple):
    NC = len(schedule)
    # the schedule is closed-form (format.wide WARMUP_CHUNKS then full
    # CHUNK_STEPS chunks: padded_steps guarantees no short tail), so the
    # kernel derives (clen, toff) from program_id arithmetic
    warm = tuple(WARMUP_CHUNKS)
    exp = (warm + (CHUNK_STEPS,) * NC)[:NC]
    assert tuple(exp) == tuple(schedule), schedule
    warm_off = tuple(int(x) for x in np.cumsum((0,) + warm))
    f32 = jnp.float32
    step_tile = max(max(warm), CHUNK_STEPS)

    def kernel(seeds_ref, nsyml_ref, tab0_ref, car0_ref, win_ref,
               ys_ref, x_s, rel_s, car_s, fen_s, dtb_s):
        c = pl.program_id(1)

        l1 = jax.lax.broadcasted_iota(_I32, (1, LANE_PAD), 1)
        seg_base = _seg_const(l1, _BASE + (_LTOT,))
        lane_off_j = jnp.where(l1 < _LTOT, l1 - seg_base, 0)
        lane_lp_j = _seg_const(l1, _L + (1,))
        lane_lp_j = jnp.where(l1 < _LTOT, lane_lp_j, 1)
        base_w_lane = jnp.where(l1 < _LTOT, _seg_const(l1, base_ws + (0,)), 0)

        # the renorm window is per chunk: its cursor resets every chunk
        rel_s[:] = jnp.zeros_like(rel_s)

        @pl.when(c == 0)
        def _init():
            x_s[:] = seeds_ref[:]
            car_s[:] = car0_ref[:]
            for p in range(NP):
                t = tab0_ref[:, p, :]  # [BT, W] fences (end-of-symbol)
                prev = jnp.concatenate(
                    [jnp.zeros_like(t[:, :1]), t[:, :-1]], axis=1
                )
                col = jax.lax.broadcasted_iota(_I32, t.shape, 1)
                fen_s[:, p, :] = t
                dtb_s[:, p, :] = jnp.where(col < _ALPH[p], t - prev, 0)

        # (clen, t0) ladders generated from the format's schedule constants
        nw = len(warm)
        clen = jnp.full((), CHUNK_STEPS, _I32)
        t0 = warm_off[nw] + (c - nw) * CHUNK_STEPS
        for i in range(nw - 1, -1, -1):
            clen = jnp.where(c == i, warm[i], clen)
            t0 = jnp.where(c == i, warm_off[i], t0)

        # chunk-static per-lane tables: concat of per-plane broadcasts
        fence1 = jnp.concatenate(
            [
                jnp.broadcast_to(fen_s[:, p, :][:, None, :], (BT, _L[p], W))
                for p in range(NP)
            ]
            + [jnp.full((BT, LANE_PAD - _LTOT, W), CDF_SCALE_TOTAL, _I32)],
            axis=1,
        )
        dtbl = jnp.concatenate(
            [
                jnp.broadcast_to(dtb_s[:, p, :][:, None, :], (BT, _L[p], W))
                for p in range(NP)
            ]
            + [jnp.zeros((BT, LANE_PAD - _LTOT, W), _I32)],
            axis=1,
        )
        # wins arrive pre-reshaped [1, BT, whc//8, 8] (Mosaic cannot
        # reshape an i16 vector across lane dims) and widen i32 -> f32
        # (no direct u16 -> f32 cast lowering). Mosaic treats the u16
        # vector as i16, so the widening cast SIGN-extends pair values
        # >= 0x8000 - mask back to the unsigned low halfword
        win3 = (win_ref[0].astype(_I32) & 0xFFFF).astype(f32)
        nsym_lane = nsyml_ref[:]  # [BT, LANE_PAD]

        def step(t, counts):
            x = x_s[:]
            rels = rel_s[:]
            active = (
                ((t0 + t) * lane_lp_j + lane_off_j < nsym_lane)
                & (t < clen)
            )
            f = (x & jnp.asarray(0x3FFF, _U32)).astype(_I32)
            cmp = (f[:, :, None] >= fence1).astype(_I32)  # [BT, LP, W]
            y = jnp.sum(cmp, axis=2)
            start = jnp.sum(cmp * dtbl, axis=2)
            cmp1 = jnp.concatenate(
                [jnp.ones((BT, LANE_PAD, 1), _I32), cmp[:, :, :-1]], axis=2
            )
            y_oh = cmp1 - cmp
            freq = jnp.sum(y_oh * dtbl, axis=2)

            x2 = freq.astype(_U32) * (x >> CDF_SCALE_BITS) + (
                f - start
            ).astype(_U32)
            renorm = (active & (x2 < jnp.asarray(1 << 16, _U32))).astype(_I32)
            rank, totals = _seg_cumsum(renorm)
            rel_lane = jnp.concatenate(
                [
                    jnp.broadcast_to(rels[:, p : p + 1], (BT, _L[p]))
                    for p in range(NP)
                ]
                + [jnp.zeros((BT, LANE_PAD - _LTOT), _I32)],
                axis=1,
            )
            h = jnp.clip(base_w_lane + rel_lane + rank, 0, whc - 1)
            oh_hi = jax.nn.one_hot(h >> 3, whc // 8, dtype=f32)
            # HIGHEST precision: the default MXU pass truncates the f32
            # window values (up to 65535) through bf16
            s1 = jax.lax.dot_general(
                oh_hi, win3, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [BT, LP, 8]
            oh_lo = jax.nn.one_hot(h & 7, 8, dtype=f32)
            pair = jnp.sum(s1 * oh_lo, axis=2).astype(_I32).astype(_U32)
            x3 = jnp.where(renorm == 1, (x2 << 16) | pair, x2)
            x_s[:] = jnp.where(active, x3, x)
            rel_s[:] = rels + totals

            y = jnp.where(active, y, 0)
            ys_ref[pl.ds(t0 + t, 1), :, :] = y[None]
            y_oha = y_oh * active.astype(_I32)[:, :, None]
            # counts ride the loop as a per-plane tuple: .at[:, p, :].add
            # on a stacked array lowers to scatter-add, which Mosaic has
            # no lowering for
            return tuple(
                counts[p]
                + jnp.sum(y_oha[:, _BOUNDS[p][0] : _BOUNDS[p][1], :], axis=1)
                for p in range(NP)
            )

        counts = jax.lax.fori_loop(
            0, step_tile, step, tuple(jnp.zeros((BT, W), _I32) for _ in range(NP))
        )

        # chunk boundary: carry-halved rebuild
        new_car = (car_s[:] >> 1) + jnp.stack(counts, axis=1)
        car_s[:] = new_car
        for p in range(NP):
            fen, dtb = _build_fences_padded(new_car[:, p, :], _ALPH[p])
            fen_s[:, p, :] = fen
            dtb_s[:, p, :] = dtb

    return kernel


@partial(jax.jit, static_argnames=("steps", "interpret"))
def fused_scan_pallas(seeds, wins, n_syms, steps: int, priors=None,
                      interpret: bool = False):
    """Drop-in twin of plane_scan_fused running as one pallas kernel.

    seeds: [B, LTOT] u32; wins: tuple of per-plane [NC, B, WH_p] u16
    windows; n_syms: [B, NP] i32; priors: optional NP-tuple of [1, alph]
    counts. Returns per-plane symbol arrays [B, steps * L_p]. Raises
    ValueError above MAX_STEPS (out block would not fit VMEM) - callers
    fall back to the XLA scan.
    """
    if steps > MAX_STEPS:
        raise ValueError(
            f"pallas fused scan supports <= {MAX_STEPS} steps (got {steps})"
        )
    from .wide_decode import _build_cdf_jnp, _uniform_tables

    B = seeds.shape[0]
    NC = wins[0].shape[0]
    WHs = tuple(int(w.shape[2]) for w in wins)
    schedule = tuple(chunk_schedule(steps))
    assert len(schedule) == NC

    # concatenated per-chunk windows, padded to a multiple of 8
    base_ws = tuple(int(x) for x in np.cumsum((0,) + WHs)[:NP])
    whc = int(-(-sum(WHs) // 8) * 8)
    pad = whc - sum(WHs)
    wins_cat = jnp.concatenate(
        list(wins) + ([jnp.zeros((NC, B, pad), wins[0].dtype)] if pad else []), axis=2
    )

    # pad B to a multiple of BT with inert blocks
    Bp = -(-B // BT) * BT
    if Bp != B:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((Bp - B,) + a.shape[1:], a.dtype)], axis=0
        )
        seeds = zpad(seeds)
        n_syms = zpad(n_syms)
        wins_cat = jnp.concatenate(
            [wins_cat, jnp.zeros((NC, Bp - B, whc), wins_cat.dtype)], axis=1
        )

    # per-lane symbol counts (pad lanes: 0)
    nsym_lane = jnp.zeros((Bp, LANE_PAD), _I32)
    for p in range(NP):
        nsym_lane = nsym_lane.at[:, _BOUNDS[p][0] : _BOUNDS[p][1]].set(
            jnp.broadcast_to(n_syms[:, p : p + 1], (Bp, _L[p]))
        )
    seeds_pad = jnp.zeros((Bp, LANE_PAD), _U32).at[:, :_LTOT].set(seeds)

    # initial tables/carries, padded to W columns
    tab0 = jnp.zeros((Bp, NP, W), _I32)
    car0 = jnp.zeros((Bp, NP, W), _I32)
    for p in range(NP):
        a = _ALPH[p]
        if priors is None:
            t = _uniform_tables(Bp, 1, a)[:, 0, 1:]  # fences 1..a
            c0 = jnp.zeros((Bp, a), _I32)
        else:
            c0 = jnp.broadcast_to(priors[p][None, 0], (Bp, a)).astype(_I32)
            t = _build_cdf_jnp(c0[:, None, :], a)[:, 0, 1:]
        tab0 = tab0.at[:, p, :a].set(t)
        tab0 = tab0.at[:, p, a:].set(CDF_SCALE_TOTAL)
        car0 = car0.at[:, p, :a].set(c0)

    # slack rows: every chunk runs a fixed step_tile of iterations and
    # writes its full row tile; short warmup chunks spill into rows the
    # next chunk overwrites in grid order
    steps_pad = steps + max(max(WARMUP_CHUNKS), CHUNK_STEPS)

    kernel = _make_kernel(whc, schedule, base_ws)

    grid = (Bp // BT, NC)
    ys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, LANE_PAD), lambda b, c: (b, 0)),
            pl.BlockSpec((BT, LANE_PAD), lambda b, c: (b, 0)),
            pl.BlockSpec((BT, NP, W), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((BT, NP, W), lambda b, c: (b, 0, 0)),
            pl.BlockSpec((1, BT, whc // 8, 8), lambda b, c: (c, b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (steps_pad, BT, LANE_PAD), lambda b, c: (0, b, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((steps_pad, Bp, LANE_PAD), _I32),
        scratch_shapes=[
            pltpu.VMEM((BT, LANE_PAD), _U32),
            pltpu.VMEM((BT, NP), _I32),
            pltpu.VMEM((BT, NP, W), _I32),
            pltpu.VMEM((BT, NP, W), _I32),
            pltpu.VMEM((BT, NP, W), _I32),
        ],
        interpret=interpret,
    )(seeds_pad, nsym_lane, tab0, car0, wins_cat.reshape(NC, Bp, whc // 8, 8))

    y0 = ys[:steps, :B, :].transpose(1, 0, 2)  # [B, steps, LANE_PAD]
    return tuple(
        y0[:, :, _BOUNDS[p][0] : _BOUNDS[p][1]].reshape(B, steps * _L[p])
        for p in range(NP)
    )
