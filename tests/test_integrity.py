"""Container integrity + window-rebase parity at larger windows."""

import pytest

from nlzm_tpu import native
from nlzm_tpu.codec import encode_bytes
from nlzm_tpu.parallel.blocks import IntegrityError, decode_container, encode_container


def test_crc_verified_on_decode(corpus_text):
    data = corpus_text(30000)
    c = bytearray(encode_container(data, block_size=8192, parser="greedy"))
    assert decode_container(bytes(c), engine="serial") == data
    c[-100] ^= 0x40  # corrupt a payload byte
    with pytest.raises((IntegrityError, Exception)):
        decode_container(bytes(c), engine="serial")


def test_crc_mismatch_is_integrity_error(corpus_text):
    data = corpus_text(12000)
    c = bytearray(encode_container(data, block_size=4096, parser="greedy"))
    # corrupt the stored CRC itself: decode output is fine, check must trip
    c[24] ^= 0xFF
    with pytest.raises(IntegrityError):
        decode_container(bytes(c), engine="serial")


@pytest.mark.slow
def test_native_large_window_rebase_parity(oracle_runner, corpus_text):
    """hist_bits 17 on ~600 KB forces several virtual-position rebases."""
    if not native.available():
        pytest.skip("native lib not built")
    data = corpus_text(600000)
    ours = encode_bytes(data, 17, parser="optimal", engine="native")
    ref = oracle_runner.compress(data, window_bits=17)
    assert ours == ref


def test_junk_streams_raise_cleanly():
    """Garbage inputs must raise (FormatError/IndexError/ValueError),
    never hang or decode silently."""
    import random

    import pytest

    from nlzm_tpu.codec import decode_bytes

    rng = random.Random(1)
    for trial in range(20):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(8, 1500)))
        if trial % 2:
            junk = (16).to_bytes(2, "big") + (14).to_bytes(2, "big") + junk
        with pytest.raises(Exception):
            decode_bytes(junk)
