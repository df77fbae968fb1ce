"""Unit tests for tables, CDFs, and rANS primitives."""

import zlib

import numpy as np
import pytest

from nlzm_tpu.constants import CDF_SCALE_TOTAL, get_match_min
from nlzm_tpu.models.cdf import cdf_initial, cdf_lookup, cdf_update, mixin_table, new_cdf
from nlzm_tpu.format.rans import rans_advance, rans_states_from_bytes, rans_stream_encode
from nlzm_tpu.utils.crc32 import crc32, crc32_tables
from nlzm_tpu.utils.log2lut import LOG2_LUT


def test_log2_lut_anchors():
    # -log2(1/2) = 1 bit -> ~32 in 1/32-bit units (table is floor-ish)
    assert LOG2_LUT[128] in (31, 32)
    # -log2(1/4) = 2 bits
    assert 62 <= LOG2_LUT[64] <= 64
    # monotone decreasing
    assert all(LOG2_LUT[i] >= LOG2_LUT[i + 1] for i in range(1, 255))
    assert LOG2_LUT[0] == LOG2_LUT[1]


def test_mixin_tables():
    m4 = mixin_table(4)
    assert m4[0][0] == 0
    assert m4[3] == (0, 1, 2, 3)
    # bias keeps targets above full scale for fences past the coded symbol
    assert m4[0][1] == CDF_SCALE_TOTAL + 1 + (127 - 4)
    m16 = mixin_table(16)
    assert m16[5][5] == 5 and m16[5][6] == CDF_SCALE_TOTAL + 6 + 111


@pytest.mark.parametrize("n", [4, 8, 16])
def test_cdf_update_preserves_invariants(n):
    import random

    rng = random.Random(7)
    cells = cdf_initial(n)
    for _ in range(20000):
        y = rng.randrange(n)
        cdf_update(cells, y)
        assert cells[0] == 0 and cells[n] == CDF_SCALE_TOTAL
        for i in range(n):
            assert cells[i] < cells[i + 1], cells  # strictly positive freqs
    # lookup agrees with linear scan at every boundary
    for f in range(0, CDF_SCALE_TOTAL, 97):
        y = cdf_lookup(cells, f)
        assert cells[y] <= f < cells[y + 1]


def test_cdf1_update():
    cells = new_cdf(2)
    for _ in range(1000):
        cdf_update(cells, 1)
    assert cells[1] <= 200  # converged near mixin target 129
    for _ in range(1000):
        cdf_update(cells, 0)
    assert cells[1] >= CDF_SCALE_TOTAL - 300


def test_rans_round_trip_random_spans():
    import random

    rng = random.Random(123)
    spans = []
    for _ in range(5000):
        freq = rng.randrange(1, CDF_SCALE_TOTAL)
        start = rng.randrange(0, CDF_SCALE_TOTAL - freq + 1)
        spans.append((start, freq))

    stream = rans_stream_encode(spans)
    states, pos = rans_states_from_bytes(stream, 0)
    for i, (start, freq) in enumerate(spans):
        lane = i & 3
        x = states[lane]
        f = x & (CDF_SCALE_TOTAL - 1)
        assert start <= f < start + freq, f"symbol {i} misdecoded"
        states[lane], pos = rans_advance(x, start, freq, stream, pos)
    assert pos == len(stream)


def test_crc32_matches_zlib_and_tables():
    data = b"The quick brown fox jumps over the lazy dog" * 100
    assert crc32(data) == zlib.crc32(data)
    t = crc32_tables()
    # classic byte-at-a-time using table[0] must equal zlib
    crc = np.uint32(0xFFFFFFFF)
    for b in data[:500]:
        crc = t[0][(int(crc) ^ b) & 0xFF] ^ np.uint32(int(crc) >> 8)
    assert (int(crc) ^ 0xFFFFFFFF) == zlib.crc32(data[:500])


def test_get_match_min():
    assert get_match_min(1) == 2
    assert get_match_min(255) == 2
    assert get_match_min(256) == 3
    assert get_match_min(4095) == 3
    assert get_match_min(4096) == 4
    assert get_match_min(1 << 20) == 5
