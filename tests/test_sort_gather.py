"""Unit tests for the packed-sort gather primitives and depth lifting."""

import numpy as np
import pytest

import jax.numpy as jnp

from nlzm_tpu.ops.sort_gather import PACK_MAX, compact_by_rank, gather_sorted


def test_gather_sorted_matches_take_along_axis():
    rng = np.random.default_rng(0)
    B, N, Q = 5, 1000, 700
    src = rng.integers(0, PACK_MAX, (B, N)).astype(np.int32)
    idx = rng.integers(0, N, (B, Q)).astype(np.int32)
    got = np.asarray(gather_sorted(jnp.asarray(src), jnp.asarray(idx)))
    ref = np.take_along_axis(src, idx, axis=1)
    assert np.array_equal(got, ref)


def test_gather_sorted_max_width():
    rng = np.random.default_rng(1)
    B, N = 2, PACK_MAX
    src = rng.integers(0, PACK_MAX, (B, N)).astype(np.int32)
    idx = rng.integers(0, N, (B, N)).astype(np.int32)
    got = np.asarray(gather_sorted(jnp.asarray(src), jnp.asarray(idx)))
    assert np.array_equal(got, np.take_along_axis(src, idx, axis=1))


def test_compact_by_rank():
    rng = np.random.default_rng(2)
    B, K = 4, 600
    vals = rng.integers(0, PACK_MAX, (B, K)).astype(np.int32)
    pred = rng.random((B, K)) < 0.4
    rank = np.cumsum(pred, axis=1) - pred
    out_w = 512
    got = np.asarray(
        compact_by_rank(
            jnp.asarray(vals), jnp.asarray(rank.astype(np.int32)), jnp.asarray(pred), out_w
        )
    )
    for b in range(B):
        want = vals[b][pred[b]][:out_w]
        assert np.array_equal(got[b, : len(want)], want)
        assert (got[b, len(want) :] == 0).all()


def test_lift_native_matches_python():
    from nlzm_tpu import native
    from nlzm_tpu.ops.encode_ops import lift_deep_matches, parse_blocks_device

    if not native.available():
        pytest.skip("native lib not built")

    rng = np.random.default_rng(3)
    # deep chains: every append copies bytes that were themselves just
    # copied, so nesting depth grows linearly with the append count
    seed = bytes(rng.integers(32, 127, 300).astype(np.uint8))
    data = bytearray(seed)
    while len(data) < 8192 * 2:
        data += data[-37:]
        data += bytes(rng.integers(32, 127, 2).astype(np.uint8))
    data = bytes(data[: 8192 * 2])

    from nlzm_tpu import native as nat

    op_len, op_val = nat.parse_blocks(data, 8192, 13)
    ol_n, ov_n = op_len.copy(), op_val.copy()
    d_n = nat.lift_deep(ol_n, ov_n, 8192)
    ol_p, ov_p = op_len.copy(), op_val.copy()
    d_p = lift_deep_matches(ol_p, ov_p)
    assert np.array_equal(ol_n, ol_p)
    assert np.array_equal(ov_n, ov_p)
    assert np.array_equal(d_n, d_p)
    # the data above must actually exercise lifting
    assert not np.array_equal(ol_n, op_len) or not np.array_equal(ov_n, op_val)


def test_gather_sorted2_matches_packed():
    import numpy as np

    from nlzm_tpu.ops.sort_gather import gather_sorted, gather_sorted2

    rng = np.random.default_rng(9)
    B, N, Q = 3, 1024, 700
    src = jnp.asarray(rng.integers(0, 1 << 14, (B, N)), jnp.int32)
    q = jnp.asarray(rng.integers(0, N, (B, Q)), jnp.int32)
    a = np.asarray(gather_sorted(src, q))
    b = np.asarray(gather_sorted2(src, q))
    assert np.array_equal(a, b)


def test_gather_sorted2_wide_payloads():
    import numpy as np

    from nlzm_tpu.ops.sort_gather import gather_sorted2

    rng = np.random.default_rng(10)
    B, N = 2, 70000  # width beyond PACK_MAX, payloads beyond 15 bits
    src = jnp.asarray(rng.integers(0, 1 << 30, (B, N)), jnp.int32)
    q = jnp.asarray(rng.integers(0, N, (B, N)), jnp.int32)
    got = np.asarray(gather_sorted2(src, q))
    want = np.take_along_axis(np.asarray(src), np.asarray(q), axis=1)
    assert np.array_equal(got, want)


def test_compact_by_rank2_matches_packed():
    import numpy as np

    from nlzm_tpu.ops.sort_gather import compact_by_rank, compact_by_rank2

    rng = np.random.default_rng(11)
    B, K = 3, 2000
    vals = jnp.asarray(rng.integers(0, 1 << 14, (B, K)), jnp.int32)
    pred = jnp.asarray(rng.random((B, K)) < 0.4)
    rank = jnp.cumsum(pred.astype(jnp.int32), axis=1) - pred.astype(jnp.int32)
    a = np.asarray(compact_by_rank(vals, rank, pred, 900))
    b = np.asarray(compact_by_rank2(vals, rank, pred, 900))
    assert np.array_equal(a, b)
