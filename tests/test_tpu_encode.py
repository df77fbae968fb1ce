"""Batched TPU encoder vs the other engines."""

import pytest

from nlzm_tpu import native
from nlzm_tpu.parallel.blocks import decode_container, encode_container


@pytest.mark.parametrize("name", ["text", "repetitive", "random", "zeros"])
def test_tpu_encode_cross_decodes(corpus_samples, name):
    data = corpus_samples[name]
    c = encode_container(data, block_size=4096, parser="greedy", engine="tpu")
    assert decode_container(c, engine="serial") == data
    assert decode_container(c, engine="tpu") == data


def test_tpu_encode_native_decode(corpus_text):
    if not native.available():
        pytest.skip("native lib not built")
    data = corpus_text(60000) + b"#"
    c = encode_container(data, block_size=8192, parser="greedy", engine="tpu")
    assert decode_container(c, engine="native") == data


def test_tpu_encode_empty():
    assert decode_container(encode_container(b"", engine="tpu"), engine="serial") == b""


def test_tpu_encode_single_frame_cap():
    # blocks must fit one frame in the TPU profile
    from nlzm_tpu.ops.encode_ops import encode_blocks_tpu

    with pytest.raises(AssertionError):
        encode_blocks_tpu(b"x" * 100000, 65536, 14)
