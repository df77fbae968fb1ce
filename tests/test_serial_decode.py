"""Serial decoder vs the reference oracle's encoder."""

import pytest

from nlzm_tpu.codec import decode_bytes


@pytest.mark.parametrize(
    "name",
    ["tiny", "text", "random", "repetitive", "long_range", "zeros", "one", "empty"],
)
def test_decode_oracle_archives(oracle_runner, corpus_samples, name):
    data = corpus_samples[name]
    archive = oracle_runner.compress(data, window_bits=16)
    assert decode_bytes(archive) == data


def test_decode_oracle_archive_default_window(oracle_runner, corpus_text):
    data = corpus_text(60000)
    archive = oracle_runner.compress(data)
    assert decode_bytes(archive) == data


def test_decode_oracle_multi_frame(oracle_runner, corpus_text):
    # > chunk_size at window 16 (frame 14 bits -> chunk 14848) => many frames
    data = corpus_text(100000)
    archive = oracle_runner.compress(data, window_bits=16)
    assert decode_bytes(archive) == data


def test_decode_oracle_window_slide(oracle_runner, corpus_text):
    # window 15 -> slide when virtual pos reaches 64 KB; 300 KB forces slides
    data = corpus_text(300000)
    archive = oracle_runner.compress(data, window_bits=15)
    assert decode_bytes(archive) == data
