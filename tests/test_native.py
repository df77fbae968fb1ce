"""Native C++ runtime vs Python reference model and the oracle."""

import pytest

from nlzm_tpu import native
from nlzm_tpu.codec import decode_bytes, encode_bytes
from nlzm_tpu.lz.encoder import SerialEncoder
from nlzm_tpu.parallel.blocks import decode_container, encode_container
from nlzm_tpu.utils.crc32 import crc32

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_crc32(corpus_samples):
    for d in corpus_samples.values():
        assert native.crc32(d) == crc32(d)


@pytest.mark.parametrize("parser", ["greedy", "optimal"])
@pytest.mark.parametrize("name", ["text", "repetitive", "random"])
def test_native_encode_matches_python(corpus_samples, name, parser):
    data = corpus_samples[name]
    enc = SerialEncoder(16, parser=parser)
    py = enc.encode_frames(data)
    nat, reads, cmds = native.encode_block(data, 16, parser)
    assert nat == py
    assert (reads, cmds) == (enc.total_reads, enc.total_cmds)


def test_native_encode_bytes_equals_oracle(oracle_runner, corpus_text):
    data = corpus_text(30000)
    ours = encode_bytes(data, 16, parser="optimal", engine="native")
    assert ours == oracle_runner.compress(data, window_bits=16)


def test_native_decode_round_trip(corpus_text):
    data = corpus_text(50000)
    archive = encode_bytes(data, 16, parser="optimal", engine="native")
    assert decode_bytes(archive, engine="native") == data
    assert decode_bytes(archive) == data


def test_native_container_round_trip(corpus_text):
    data = corpus_text(200000) + b"!"
    c = encode_container(data, block_size=16384, parser="optimal", engine="native")
    assert decode_container(c, engine="native") == data
    assert decode_container(c, engine="serial") == data


def test_native_container_matches_serial_container(corpus_text):
    data = corpus_text(40000)
    a = encode_container(data, block_size=8192, parser="greedy", engine="native")
    b = encode_container(data, block_size=8192, parser="greedy", engine="serial")
    assert a == b


def test_native_expand_ops():
    import numpy as np

    # literal 'a', literal 'b', match(len=4, delta=2) -> "ababab"... wait:
    # out = a b, then copy 4 from delta 2: a b a b -> "ababab"
    op_len = np.array([0, 0, 4], dtype=np.int32)
    op_val = np.array([ord("a"), ord("b"), 2], dtype=np.int32)
    assert native.expand_ops(op_len, op_val, 6) == b"ababab"
