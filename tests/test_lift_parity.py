"""Engine parity for depth lifting: Python fallback vs native lift_deep.

parse_blocks_device silently falls back to ops/encode_ops.py::
lift_deep_matches when the native library is absent; both claim identical
semantics (64-iteration lift budget, non-overlap-only lifting, command-
boundary stop). This pins op_val and depth outputs equal on identical
inputs - the VERDICT round-2 item 8 guarantee.
"""

import numpy as np
import pytest

from nlzm_tpu import native
from nlzm_tpu.ops.encode_ops import lift_deep_matches

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def _parse_real_blocks(n_bytes=131072, block_size=32768):
    from nlzm_tpu.utils.corpus import build_nonperiodic

    data = build_nonperiodic(n_bytes)
    op_len, op_val = native.parse_blocks(data, block_size, 15)
    return (
        np.ascontiguousarray(op_len, np.int32),
        np.ascontiguousarray(op_val, np.int32),
        block_size,
    )


def test_lift_parity_on_parsed_blocks():
    op_len, op_val, bs = _parse_real_blocks()
    ol_py, ov_py = op_len.copy(), op_val.copy()
    ol_nat, ov_nat = op_len.copy(), op_val.copy()
    d_py = lift_deep_matches(ol_py, ov_py, cap=15)
    d_nat = native.lift_deep(ol_nat, ov_nat, bs, cap=15, threads=1)
    np.testing.assert_array_equal(ov_py, ov_nat)
    np.testing.assert_array_equal(ol_py, ol_nat)
    np.testing.assert_array_equal(d_py, d_nat)


def test_lift_parity_aggressive_cap():
    op_len, op_val, bs = _parse_real_blocks(65536)
    ol_py, ov_py = op_len.copy(), op_val.copy()
    ol_nat, ov_nat = op_len.copy(), op_val.copy()
    d_py = lift_deep_matches(ol_py, ov_py, cap=4)
    d_nat = native.lift_deep(ol_nat, ov_nat, bs, cap=4, threads=1)
    np.testing.assert_array_equal(ov_py, ov_nat)
    np.testing.assert_array_equal(d_py, d_nat)


def test_fallback_warns_on_multiblock(monkeypatch):
    import warnings

    from nlzm_tpu.ops import encode_ops

    monkeypatch.setattr(native, "available", lambda: False)
    data = b"abcd" * 4096
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        encode_ops.parse_blocks_device(data, 4096, 12, "greedy")
    assert any("falls back" in str(x.message) for x in w)
