"""Fixed-point -log2 cost lookup table.

256-entry table with 5 fractional bits; LOG2_LUT[i] approximates
-log2(i/256) * 32 for i in [1, 255]. Drives every cost estimate in the
optimal parser and the frame-size estimator. Parity: NLZM.cpp:97-124.
"""

from ..constants import LOG2_LUT_PRECISION, LOG2_LUT_SCALE_BITS, LOG2_LUT_SIZE_BITS


def _build_lut() -> list[int]:
    table_size = 1 << LOG2_LUT_SIZE_BITS
    scale = 1 << LOG2_LUT_SCALE_BITS
    lut = [0] * table_size

    for i in range(1, table_size):
        nxt = 1 << LOG2_LUT_PRECISION
        acc = 0
        for _ in range(scale):
            v = (i * nxt) >> LOG2_LUT_SIZE_BITS
            # number of bits above the precision's MSB anchor
            num_bits = LOG2_LUT_PRECISION - (v.bit_length() - 1)
            acc += num_bits - 1
            nxt = v << (num_bits - 1)
        lut[i] = acc & 0xFFFF

    lut[0] = lut[1]
    return lut


LOG2_LUT: list[int] = _build_lut()


def log2_cost_of_freq(freq: int) -> int:
    """Cost (in 1/32-bit units) of a symbol with 14-bit-scaled frequency."""
    from ..constants import CDF_SCALE_BITS

    return LOG2_LUT[freq >> (CDF_SCALE_BITS - LOG2_LUT_SIZE_BITS)]
