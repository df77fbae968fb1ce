"""Compression-ratio regression guards on a deterministic mixed corpus.

These bounds protect the headline tradeoffs across refactors: v1 blocks
are the ratio profile, wide is the throughput profile (bounded ratio
cost). Margins are ~2% over measured values (round 2), so a small
regression fails CI rather than drifting silently.

Oracle-delta guards compare against the compiled reference at
-window:15 - the same 32 KiB reach our blocks have - so the delta
isolates what block independence actually costs (model restarts),
not window size. At windows >= 20 this corpus's 1 MiB generator period
makes the single-stream oracle ~30x smaller than ANY 32 KiB-reach
codec; the window-matrix tests cover that regime with byte parity.

Measured (round 2): 256 KiB: v1 0.5536, wide/v1 1.1408;
64 MiB: v1 0.5540, wide/v1 1.1277, v1/oracle(w15) 1.085,
wide/oracle(w15) 1.224.
"""

import pytest


@pytest.fixture(scope="module")
def mixed_corpus():
    import bench

    return bench.build_corpus(262144)


def _oracle_size(oracle_runner, data, window_bits):
    return len(oracle_runner.compress(data, window_bits=window_bits))


def test_v1_block_ratio(mixed_corpus):
    from nlzm_tpu import native
    from nlzm_tpu.parallel.blocks import encode_container

    if not native.available():
        pytest.skip("native lib not built")
    c = encode_container(mixed_corpus, block_size=32768, parser="optimal")
    assert len(c) / len(mixed_corpus) < 0.565  # measured 0.5536


def test_wide_ratio_within_budget(mixed_corpus):
    from nlzm_tpu import native
    from nlzm_tpu.parallel.blocks import encode_container

    if not native.available():
        pytest.skip("native lib not built")
    v1 = encode_container(mixed_corpus, block_size=32768, parser="optimal")
    wide = encode_container(
        mixed_corpus, block_size=32768, parser="optimal", profile="wide"
    )
    # measured 1.1408 (chunked adaptation + plane seeds + chunk tables;
    # fixed per-block overheads weigh more at this small size)
    assert len(wide) < len(v1) * 1.165


def test_oracle_delta_per_profile(oracle_runner, mixed_corpus):
    """Block profiles vs the reference binary at equal (32 KiB) reach."""
    from nlzm_tpu import native
    from nlzm_tpu.parallel.blocks import encode_container

    if not native.available():
        pytest.skip("native lib not built")
    osz = _oracle_size(oracle_runner, mixed_corpus, 15)
    v1 = encode_container(mixed_corpus, block_size=32768, parser="optimal")
    wide = encode_container(
        mixed_corpus, block_size=32768, parser="optimal", profile="wide"
    )
    assert len(v1) < osz * 1.13  # measured 1.096 at 256 KiB
    assert len(wide) < osz * 1.29  # measured 1.25 at 256 KiB


@pytest.mark.slow
def test_ratio_evidence_at_scale(oracle_runner):
    """64 MiB corpus: sizes within 2% of the recorded round-2 numbers."""
    import bench
    from nlzm_tpu.parallel.blocks import encode_container

    data = bench.build_corpus(64 * 1024 * 1024)
    v1 = encode_container(data, block_size=32768, parser="optimal")
    wide = encode_container(data, block_size=32768, parser="optimal", profile="wide")
    assert len(v1) / len(data) < 0.565  # measured 0.5540
    assert len(wide) < len(v1) * 1.15  # measured 1.1277
    osz = _oracle_size(oracle_runner, data, 15)
    assert len(v1) < osz * 1.11  # measured 1.085
    assert len(wide) < osz * 1.25  # measured 1.224
