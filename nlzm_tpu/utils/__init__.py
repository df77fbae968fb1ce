from .bits import bsr32, ctz32, popcount32
from .log2lut import LOG2_LUT, log2_cost_of_freq
from .crc32 import crc32, crc32_tables

__all__ = [
    "bsr32",
    "ctz32",
    "popcount32",
    "LOG2_LUT",
    "log2_cost_of_freq",
    "crc32",
    "crc32_tables",
]
