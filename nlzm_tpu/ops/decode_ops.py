"""Batched TPU decode: SIMD-across-streams FSM entropy decoder + LZ expansion.

A single NLZM stream cannot be vectorized (every coded symbol mutates the
rANS state and the adaptive model consumed by the next one), so throughput
comes from decoding many independent block streams in lockstep: one
`lax.scan` step advances every block by exactly one coded item (CDF symbol
or raw-bits field). Per-block control flow (which symbol comes next) is a
small FSM evaluated with masked vector selects - the TPU never branches.

Phase 1 (fsm_decode): [B] streams -> per-block command lists (length, value).
Phase 2 (lz_expand): command lists -> bytes. Overlapping match copies are a
single modular-index gather (out[p-d+(j mod d)]), so each command costs one
vector gather+scatter regardless of length.

Semantics parity: NLZM.cpp:1955-2024 (decode driver), 642-731 (frame reads);
the batched formulation is original.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MATCH_MAX
from .cdf_ops import (
    CTX_CMD,
    CTX_DIST_HI,
    CTX_DIST_LO,
    CTX_LEN_DIRECT,
    CTX_LEN_EXT_HI,
    CTX_LEN_EXT_LO,
    CTX_LIT_HI,
    CTX_LIT_LO,
    NUM_CTX,
    ctx_classes,
    initial_bank,
    mixin_tensor,
)

# ---- FSM states ----
S_CMD = 0
S_LIT_HI = 1
S_LIT_LO = 2
S_LEN_DIRECT = 3
S_LEN_EXT_HI = 4
S_LEN_EXT_LO = 5
S_DIST_HI = 6
S_DIST_LO = 7
S_DBITS_A = 8  # high extra distance bits (count nb_a)
S_DBITS_B = 9  # low extra distance bits (count nb_b)
S_REP_BITS = 10  # 2-bit rep slot index

_U32 = jnp.uint32
_I32 = jnp.int32


class DecodeState(NamedTuple):
    bank: jax.Array  # [B, NUM_CTX, 17] i32
    rans: jax.Array  # [B, 4] u32
    lane: jax.Array  # [B] i32
    rans_pos: jax.Array  # [B] i32
    bit_pos: jax.Array  # [B] i32
    word: jax.Array  # [B] u32
    word_bits: jax.Array  # [B] i32
    num_ops: jax.Array  # [B] i32
    frame_ptr: jax.Array  # [B] i32
    done: jax.Array  # [B] bool
    fsm: jax.Array  # [B] i32
    mode_rep: jax.Array  # [B] bool
    hi: jax.Array  # [B] i32 (latched nibble / dist-hi slot)
    lv: jax.Array  # [B] i32
    lc: jax.Array  # [B] i32
    dv: jax.Array  # [B] i32
    nb_a: jax.Array  # [B] i32
    nb_b: jax.Array  # [B] i32
    rep_idx: jax.Array  # [B] i32
    rep_tab: jax.Array  # [B, 4] i32
    op_len: jax.Array  # [B, MAX_CMDS] i32 (0 => literal)
    op_val: jax.Array  # [B, MAX_CMDS] i32 (byte / delta)
    op_idx: jax.Array  # [B] i32


def _match_min(delta):
    return (
        2
        + (delta > 0xFF).astype(_I32)
        + (delta > 0xFFF).astype(_I32)
        + (delta > 0xFFFFF).astype(_I32)
    )


def _init_state(B: int, max_cmds: int) -> DecodeState:
    z = jnp.zeros((B,), _I32)
    return DecodeState(
        bank=jnp.broadcast_to(jnp.asarray(initial_bank()), (B, NUM_CTX, 17)).astype(_I32),
        rans=jnp.zeros((B, 4), _U32),
        lane=z,
        rans_pos=z,
        bit_pos=z,
        word=jnp.zeros((B,), _U32),
        word_bits=z,
        num_ops=z,
        frame_ptr=z,
        done=jnp.zeros((B,), bool),
        fsm=z,
        mode_rep=jnp.zeros((B,), bool),
        hi=z,
        lv=z,
        lc=z,
        dv=z,
        nb_a=z,
        nb_b=z,
        rep_idx=z,
        rep_tab=jnp.broadcast_to(jnp.arange(1, 5, dtype=_I32), (B, 4)),
        op_len=jnp.zeros((B, max_cmds), _I32),
        op_val=jnp.zeros((B, max_cmds), _I32),
        op_idx=z,
    )


def _gather_byte(data, pos):
    """data [B, S] uint8, pos [B] -> [B] i32 (clamped)."""
    idx = jnp.clip(pos, 0, data.shape[1] - 1)
    return jnp.take_along_axis(data, idx[:, None], axis=1)[:, 0].astype(_I32)


def _be32(data, pos):
    return (
        (_gather_byte(data, pos) << 24)
        | (_gather_byte(data, pos + 1) << 16)
        | (_gather_byte(data, pos + 2) << 8)
        | _gather_byte(data, pos + 3)
    )


def _le32(data, pos):
    return (
        _gather_byte(data, pos).astype(_U32)
        | (_gather_byte(data, pos + 1).astype(_U32) << 8)
        | (_gather_byte(data, pos + 2).astype(_U32) << 16)
        | (_gather_byte(data, pos + 3).astype(_U32) << 24)
    )


def _decode_step(data, mixin, classes, st: DecodeState, _):
    B = data.shape[0]
    barange = jnp.arange(B)

    # ---- A) frame transition at command boundaries ----
    need = (~st.done) & (st.num_ops == 0)
    hdr_ops = _be32(data, st.frame_ptr)
    nb_bytes = _be32(data, st.frame_ptr + 4)
    nr_bytes = _be32(data, st.frame_ptr + 8)
    becomes_done = need & (hdr_ops == 0)
    init = need & (hdr_ops != 0)

    done = st.done | becomes_done
    num_ops = jnp.where(init, hdr_ops, st.num_ops)
    bit_pos = jnp.where(init, st.frame_ptr + 12, st.bit_pos)
    word = jnp.where(init, jnp.zeros((), _U32), st.word)
    word_bits = jnp.where(init, 0, st.word_bits)
    rans_base = st.frame_ptr + nb_bytes
    new_states = jnp.stack([_le32(data, rans_base + 4 * k) for k in range(4)], axis=1)
    rans = jnp.where(init[:, None], new_states, st.rans)
    lane = jnp.where(init, 0, st.lane)
    rans_pos = jnp.where(init, rans_base + 16, st.rans_pos)
    frame_ptr = jnp.where(init, st.frame_ptr + nb_bytes + nr_bytes, st.frame_ptr)

    active = ~done
    fsm = st.fsm
    is_bits = (fsm == S_REP_BITS) | (fsm == S_DBITS_A) | (fsm == S_DBITS_B)
    do_cdf = active & ~is_bits
    do_bits = active & is_bits

    # ---- B1) CDF symbol read ----
    ctx = jnp.select(
        [
            fsm == S_CMD,
            fsm == S_LIT_HI,
            fsm == S_LIT_LO,
            fsm == S_LEN_DIRECT,
            fsm == S_LEN_EXT_HI,
            fsm == S_LEN_EXT_LO,
            fsm == S_DIST_HI,
        ],
        [
            jnp.full((B,), CTX_CMD, _I32),
            jnp.full((B,), CTX_LIT_HI, _I32),
            CTX_LIT_LO + st.hi,
            jnp.full((B,), CTX_LEN_DIRECT, _I32),
            jnp.full((B,), CTX_LEN_EXT_HI, _I32),
            CTX_LEN_EXT_LO + st.hi,
            CTX_DIST_HI + st.lc,
        ],
        CTX_DIST_LO + (st.lc << 3) + st.hi,
    )
    ctx = jnp.clip(ctx, 0, NUM_CTX - 1)

    cells = st.bank[barange, ctx]  # [B, 17]
    x = rans[barange, lane]
    f = (x & jnp.asarray(0x3FFF, _U32)).astype(_I32)
    y = jnp.sum(f[:, None] >= cells[:, 1:], axis=1).astype(_I32)
    start = jnp.take_along_axis(cells, y[:, None], axis=1)[:, 0]
    hi_fence = jnp.take_along_axis(cells, y[:, None] + 1, axis=1)[:, 0]
    freq = hi_fence - start

    x2 = freq.astype(_U32) * (x >> 14) + (f - start).astype(_U32)
    renorm = x2 < jnp.asarray(1 << 16, _U32)
    rb = (
        (_gather_byte(data, rans_pos).astype(_U32) << 8)
        | _gather_byte(data, rans_pos + 1).astype(_U32)
    )
    x3 = jnp.where(renorm, (x2 << 16) | rb, x2)
    rans = rans.at[barange, lane].set(jnp.where(do_cdf, x3, x))
    rans_pos = rans_pos + jnp.where(do_cdf & renorm, 2, 0)
    lane = jnp.where(do_cdf, (lane + 1) & 3, lane)

    mix = mixin[classes[ctx], jnp.clip(y, 0, 15)]  # [B, 17]
    cells_new = cells + ((mix - cells) >> 7)
    bank = st.bank.at[barange, ctx].set(jnp.where(do_cdf[:, None], cells_new, cells))

    # ---- B2) raw-bits read ----
    nb = jnp.select(
        [fsm == S_REP_BITS, fsm == S_DBITS_A],
        [jnp.full((B,), 2, _I32), st.nb_a],
        st.nb_b,
    )
    nb = jnp.clip(nb, 1, 24)
    for _i in range(3):  # refill to >= 24 bits (3 predicated byte loads)
        can = do_bits & (word_bits < 24)
        byte = _gather_byte(data, bit_pos).astype(_U32)
        shift = jnp.clip(24 - word_bits, 0, 31).astype(_U32)
        word = jnp.where(can, word | (byte << shift), word)
        bit_pos = bit_pos + can.astype(_I32)
        word_bits = word_bits + jnp.where(can, 8, 0)
    v = (word >> jnp.asarray(32 - nb, _U32).astype(_U32)).astype(_I32)
    word = jnp.where(do_bits, word << nb.astype(_U32), word)
    word_bits = word_bits - jnp.where(do_bits, nb, 0)

    num_ops = num_ops - active.astype(_I32)

    # ---- C) FSM transition ----
    in_cmd = fsm == S_CMD
    in_lit_hi = fsm == S_LIT_HI
    in_lit_lo = fsm == S_LIT_LO
    in_len_dir = fsm == S_LEN_DIRECT
    in_len_ehi = fsm == S_LEN_EXT_HI
    in_len_elo = fsm == S_LEN_EXT_LO
    in_dist_hi = fsm == S_DIST_HI
    in_dist_lo = fsm == S_DIST_LO
    in_dba = fsm == S_DBITS_A
    in_dbb = fsm == S_DBITS_B
    in_rep_bits = fsm == S_REP_BITS

    # latches
    hi = jnp.where(in_lit_hi | in_len_ehi | in_dist_hi, y, st.hi)
    lv = jnp.where(in_len_dir, y, st.lv)
    lv = jnp.where(in_len_elo, 7 + (st.hi << 4) + y, lv)
    lc = jnp.where(in_len_dir, jnp.minimum(y, 3), st.lc)
    rep_idx = jnp.where(in_rep_bits, v, st.rep_idx)
    mode_rep = jnp.where(in_cmd, y == 2, st.mode_rep)
    mode_rep = jnp.where(in_rep_bits, True, mode_rep)

    # distance slot resolution
    dv_slot = (st.hi << 3) + y  # valid when in_dist_lo
    small = dv_slot < 4
    ab = jnp.clip((dv_slot >> 1) - 1, 0, 30)
    dv_base = (2 + (dv_slot & 1)) << ab
    dv = st.dv
    dv = jnp.where(in_dist_lo, jnp.where(small, dv_slot, dv_base), dv)
    dv = jnp.where(in_dba, st.dv + (v << 4), dv)
    dv = jnp.where(in_dbb, st.dv + v, dv)
    nb_a = jnp.where(in_dist_lo, ab - 4, st.nb_a)
    nb_b = jnp.where(in_dist_lo, jnp.minimum(ab, 4), st.nb_b)

    # emits
    len_done = (in_len_dir & (y < 7)) | in_len_elo
    emit_lit = do_cdf & in_lit_lo
    emit_rep = active & len_done & mode_rep
    emit_match = active & (
        (in_dist_lo & small) | in_dbb
    )

    # next state
    nxt = jnp.full((B,), S_CMD, _I32)
    nxt = jnp.where(in_cmd & (y == 0), S_LIT_HI, nxt)
    nxt = jnp.where(in_cmd & (y == 1), S_LEN_DIRECT, nxt)
    nxt = jnp.where(in_cmd & (y >= 2), S_REP_BITS, nxt)
    nxt = jnp.where(in_lit_hi, S_LIT_LO, nxt)
    # in_lit_lo -> S_CMD (emit)
    nxt = jnp.where(in_rep_bits, S_LEN_DIRECT, nxt)
    nxt = jnp.where(in_len_dir & (y == 7), S_LEN_EXT_HI, nxt)
    nxt = jnp.where(len_done & ~mode_rep, S_DIST_HI, nxt)
    # len_done & mode_rep -> S_CMD (emit rep)
    nxt = jnp.where(in_len_ehi, S_LEN_EXT_LO, nxt)
    nxt = jnp.where(in_dist_hi, S_DIST_LO, nxt)
    nxt = jnp.where(in_dist_lo & ~small & (ab > 4), S_DBITS_A, nxt)
    nxt = jnp.where(in_dist_lo & ~small & (ab <= 4), S_DBITS_B, nxt)
    nxt = jnp.where(in_dba, S_DBITS_B, nxt)
    # in_dbb -> S_CMD (emit match)
    fsm = jnp.where(active, nxt, fsm)

    # ---- D) record emitted command & update rep cache ----
    delta = dv + 1
    rep_delta = st.rep_tab[barange, jnp.clip(rep_idx, 0, 3)]
    out_delta = jnp.where(emit_rep, rep_delta, delta)
    out_len = lv + _match_min(out_delta)

    emit_any = emit_lit | emit_rep | emit_match
    rec_len = jnp.where(emit_lit, 0, out_len)
    rec_val = jnp.where(emit_lit, (st.hi << 4) + y, out_delta)

    slot = jnp.where(emit_any, st.op_idx, st.op_len.shape[1] - 1)
    keep_len = st.op_len[barange, slot]
    keep_val = st.op_val[barange, slot]
    op_len = st.op_len.at[barange, slot].set(jnp.where(emit_any, rec_len, keep_len))
    op_val = st.op_val.at[barange, slot].set(jnp.where(emit_any, rec_val, keep_val))
    op_idx = st.op_idx + emit_any.astype(_I32)

    # MTF insert for fresh match distances (rep hits leave the cache as-is)
    t = st.rep_tab
    present = jnp.any(t == delta[:, None], axis=1)
    shifted = jnp.concatenate([delta[:, None], t[:, :3]], axis=1)
    rep_tab = jnp.where((emit_match & ~present)[:, None], shifted, t)

    return (
        DecodeState(
            bank=bank,
            rans=rans,
            lane=lane,
            rans_pos=rans_pos,
            bit_pos=bit_pos,
            word=word,
            word_bits=word_bits,
            num_ops=num_ops,
            frame_ptr=frame_ptr,
            done=done,
            fsm=fsm,
            mode_rep=mode_rep,
            hi=jnp.where(in_dist_lo, st.hi, hi),
            lv=lv,
            lc=lc,
            dv=dv,
            nb_a=nb_a,
            nb_b=nb_b,
            rep_idx=rep_idx,
            rep_tab=rep_tab,
            op_len=op_len,
            op_val=op_val,
            op_idx=op_idx,
        ),
        None,
    )


@partial(jax.jit, static_argnames=("num_steps", "max_cmds"))
def fsm_decode(data: jax.Array, num_steps: int, max_cmds: int):
    """Entropy-decode B block streams in lockstep.

    data: [B, S] uint8 - per-block frame bytes (no file header/sentinel),
          zero-padded; a zero 4-byte header acts as the natural terminator.
    num_steps: max total coded items over blocks (static).
    max_cmds: command-slot capacity (static).

    Returns (op_len [B, max_cmds], op_val [B, max_cmds], n_cmds [B]).
    """
    B = data.shape[0]
    mixin = jnp.asarray(mixin_tensor())
    classes = jnp.asarray(ctx_classes())
    st = _init_state(B, max_cmds)
    st, _ = jax.lax.scan(
        lambda s, x: _decode_step(data, mixin, classes, s, x),
        st,
        None,
        length=num_steps,
    )
    return st.op_len, st.op_val, st.op_idx


@partial(jax.jit, static_argnames=("block_size", "num_steps"))
def lz_expand(op_len: jax.Array, op_val: jax.Array, n_cmds: jax.Array, block_size: int, num_steps: int):
    """Expand per-block command lists into bytes.

    Each scan step applies one command per block: a literal writes one byte;
    a match gathers `length` bytes at modular offsets (correct for
    overlapping copies) and scatters them at the write head.
    """
    B = op_len.shape[0]
    barange = jnp.arange(B)[:, None]
    j = jnp.arange(MATCH_MAX)[None, :]  # [1, 264]
    out0 = jnp.zeros((B, block_size), jnp.uint8)
    pos0 = jnp.zeros((B,), _I32)

    def step(carry, t):
        out, pos = carry
        L = op_len[:, t]
        V = op_val[:, t]
        act = t < n_cmds
        is_lit = L == 0
        length = jnp.where(is_lit, 1, L)
        delta = jnp.where(is_lit, 1, V)
        delta = jnp.maximum(delta, 1)

        src = pos[:, None] - delta[:, None] + j % delta[:, None]
        gathered = jnp.take_along_axis(out, jnp.clip(src, 0, block_size - 1), axis=1)
        vals = jnp.where(is_lit[:, None], V[:, None].astype(jnp.uint8), gathered)

        write = act[:, None] & (j < length[:, None])
        dst = jnp.where(write, pos[:, None] + j, block_size)
        out = out.at[barange, dst].set(vals, mode="drop")
        pos = pos + jnp.where(act, length, 0)
        return (out, pos), None

    (out, pos), _ = jax.lax.scan(step, (out0, pos0), jnp.arange(num_steps))
    return out, pos
