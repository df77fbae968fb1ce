"""Serial encoder vs the reference oracle (byte parity + cross-decode)."""

import pytest

from nlzm_tpu.codec import decode_bytes, encode_bytes


@pytest.mark.parametrize("name", ["text", "repetitive", "long_range", "zeros"])
def test_optimal_archives_byte_identical_to_reference(oracle_runner, corpus_samples, name):
    data = corpus_samples[name]
    ours = encode_bytes(data, 16, parser="optimal")
    ref = oracle_runner.compress(data, window_bits=16)
    assert ours == ref


def test_optimal_byte_identical_random(oracle_runner, corpus_samples):
    data = corpus_samples["random"]
    assert encode_bytes(data, 16, parser="optimal") == oracle_runner.compress(data, window_bits=16)


@pytest.mark.slow
def test_optimal_byte_identical_with_window_slide(oracle_runner, corpus_text):
    # window 15 => virtual positions hit 2*window and rebase several times
    data = corpus_text(150000)
    ours = encode_bytes(data, 15, parser="optimal")
    ref = oracle_runner.compress(data, window_bits=15)
    assert ours == ref


@pytest.mark.parametrize("name", ["text", "repetitive", "random", "tiny", "empty"])
def test_greedy_round_trip(corpus_samples, name):
    data = corpus_samples[name]
    archive = encode_bytes(data, 16, parser="greedy")
    assert decode_bytes(archive) == data


def test_reference_decodes_our_greedy_archive(oracle_runner, corpus_text):
    data = corpus_text(30000)  # big enough that hist_bits stays >= 12
    archive = encode_bytes(data, 16, parser="greedy")
    assert oracle_runner.decompress(archive) == data


def test_greedy_multiframe_round_trip(corpus_text):
    data = corpus_text(120000)
    archive = encode_bytes(data, 16, parser="greedy")
    assert decode_bytes(archive) == data
