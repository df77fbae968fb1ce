from .rans import RANS_MID, rans_advance, rans_stream_encode
from .frame import FrameWriter, FrameReader

__all__ = [
    "RANS_MID",
    "rans_advance",
    "rans_stream_encode",
    "FrameWriter",
    "FrameReader",
]
