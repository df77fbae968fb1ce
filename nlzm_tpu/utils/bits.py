"""Small integer/bit utilities (host side).

Parity targets: NLZM.cpp:59-95 (clz32/ctz32/popcnt32). Note the reference's
"clz32" is actually a bit-scan-reverse: it returns the index of the highest
set bit (floor(log2 x)), which is what we call bsr32 here.
"""


def bsr32(x: int) -> int:
    """Index of highest set bit; floor(log2(x)). x must be > 0."""
    return x.bit_length() - 1


def ctz32(x: int) -> int:
    """Count of trailing zero bits. x must be > 0."""
    return (x & -x).bit_length() - 1


def popcount32(x: int) -> int:
    return bin(x & 0xFFFFFFFF).count("1")
