"""Fully parallel LZ expansion via pointer doubling.

Sequential LZ reconstruction (each match copies earlier output) looks
inherently serial, but every output byte has a well-defined *literal
ancestor*: byte i of a match at distance d sources from i - d, recursively
until a literal. Chains are strictly decreasing, so log2(N) rounds of
batched pointer jumping resolve every byte's ancestor, and one final gather
fills the output - O(N log N) work in ~15 large vectorized gathers instead
of one scatter per command. This replaces both the reference's byte-serial
copy loop (NLZM.cpp:1992-1996) and the per-command scatter kernel.

Inputs are the step-aligned command arrays from fsm_decode_v2.
"""

from functools import partial

import jax
import jax.numpy as jnp

_I32 = jnp.int32


@partial(jax.jit, static_argnames=("block_size",))
def lz_expand_parallel(op_len: jax.Array, op_val: jax.Array, block_size: int):
    """op_len/op_val: [T, B] (op_len<0 past end, 0 literal, else match len).

    Returns (out [B, block_size] uint8, produced [B]).
    """
    T, B = op_len.shape
    lens = jnp.where(op_len < 0, 0, jnp.where(op_len == 0, 1, op_len)).T  # [B, T]
    is_lit = (op_len == 0).T
    deltas = jnp.where(is_lit, 0, op_val.T)  # [B, T]
    lit_byte = jnp.where(is_lit, op_val.T, 0)  # [B, T]

    ends = jnp.cumsum(lens, axis=1)  # [B, T] exclusive-end of each command
    produced = ends[:, -1]

    # command index covering each output position: one histogram scatter-add
    # of command ends + a cumsum (cheaper than a per-position binary search)
    barange = jnp.arange(B)[:, None]
    marks = jnp.zeros((B, block_size + 1), _I32)
    marks = marks.at[barange, jnp.minimum(ends, block_size)].add(1)
    cmd_idx = jnp.cumsum(marks[:, :block_size], axis=1)
    cmd_idx = jnp.clip(cmd_idx, 0, T - 1)

    pos = jnp.arange(block_size, dtype=_I32)[None, :]  # [1, N]
    take = lambda arr: jnp.take_along_axis(arr, cmd_idx, axis=1)  # [B, N]
    d_at = take(deltas)
    lit_at = take(lit_byte)

    # parent pointer: literals root at themselves
    parent = jnp.where(d_at == 0, pos, pos - d_at)
    parent = jnp.clip(parent, 0, block_size - 1)

    # pointer doubling with early exit: round k resolves chains <= 2^k
    rounds = max(1, (block_size - 1).bit_length())

    def cond(state):
        k, p, changed = state
        return (k < rounds) & changed

    def body(state):
        k, p, _ = state
        p2 = jnp.take_along_axis(p, p, axis=1)
        return k + 1, p2, jnp.any(p2 != p)

    _, parent, _ = jax.lax.while_loop(cond, body, (0, parent, True))

    out = jnp.take_along_axis(lit_at, parent, axis=1).astype(jnp.uint8)
    # zero out past-end positions
    out = jnp.where(pos < produced[:, None], out, 0)
    return out, produced
