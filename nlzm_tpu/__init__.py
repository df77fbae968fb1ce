"""nlzm_tpu: a TPU-native lossless compression framework.

Implements the NLZM bitstream (sliding-window LZ + forward-graph optimal
parsing + chunked 4-lane rANS over adaptive nibble CDFs) with three engines:

- serial host reference model (pure Python; nlzm_tpu.codec)
- native C++ host runtime (nlzm_tpu.native)
- batched TPU engine: blocks decoded/encoded SIMD-across-streams with
  JAX/Pallas kernels, data-parallel over a device mesh (nlzm_tpu.ops,
  nlzm_tpu.parallel)
"""

__version__ = "0.1.0"

from .codec import decode_bytes, encode_bytes

__all__ = ["decode_bytes", "encode_bytes", "__version__"]
