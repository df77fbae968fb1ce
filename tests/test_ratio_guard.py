"""Compression-ratio regression guards.

Two corpora, two regimes:

1. The perf-bench mixed corpus (1 MiB generator period): quick 256 KiB
   guards at EQUAL 32 KiB reach (-window:15) isolate what block
   independence costs (model restarts), not window size.
2. The NON-PERIODIC drifting-topic corpus (utils/corpus.py): 16 MiB
   guards against the oracle at its default-class -window:20 (1 MiB
   reach). This is the honest long-range regime - no block is a copy of
   another, so the oracle's window advantage is real modeling, and the
   container shared dictionary (round 3) is what closes it.

Margins are ~2% over measured values so regressions fail CI rather than
drifting silently.

Measured (round 3, 16 MiB non-periodic, oracle w20 = 0.3687; wide wire
v2 = lanes x4, whose 1.7 KB/block of lane seeds cost ~+6% at 32 KiB
blocks, bought for scan steps / 4 on device decode):
  v1 32K blocks 0.4534 (1.230x oracle)
  wide 32K blocks + 32K dict 0.4946 (1.342x; wire v1 lanes was 1.262x)
  wide 32K blocks no dict 0.5691 (1.544x) - the dict is worth -13%
  wide 128K blocks + 64K dict 0.4525 (1.227x; v1 lanes was 1.178x)
Measured (periodic): 256 KiB v1 0.5536, wide/v1 1.2359 (v1 lanes
1.1408); 64 MiB v1 0.5540, wide/v1 1.2221 (v1 lanes 1.1277).
"""

import pytest


@pytest.fixture(scope="module")
def mixed_corpus():
    import bench

    return bench.build_corpus(262144)


@pytest.fixture(scope="module")
def nonperiodic16():
    from nlzm_tpu.utils.corpus import build_nonperiodic

    return build_nonperiodic(16_000_000)


@pytest.fixture(scope="module")
def oracle_w20_size(tmp_path_factory, nonperiodic16):
    import subprocess

    from conftest import ORACLE_SRC, _ensure_oracle

    if not ORACLE_SRC.exists():
        pytest.skip("reference source not available")
    binary = _ensure_oracle()
    wd = tmp_path_factory.mktemp("oracle_w20")
    src = wd / "in.bin"
    dst = wd / "out.nlzm"
    src.write_bytes(nonperiodic16)
    subprocess.run(
        [str(binary), "-window:20", "c", str(src), str(dst)],
        check=True, capture_output=True,
    )
    return dst.stat().st_size


def test_window20_oracle_delta_nonperiodic(oracle_w20_size, nonperiodic16):
    """Long-range regime: parallel profiles vs the oracle's 1 MiB window.

    The shared dictionary gives 32 KiB blocks container-level reach; the
    guard pins both the with-dict delta and the dict's benefit itself.
    """
    from nlzm_tpu import native
    from nlzm_tpu.parallel.blocks import encode_container

    if not native.available():
        pytest.skip("native lib not built")
    data = nonperiodic16
    v1 = encode_container(data, block_size=32768, parser="optimal")
    wide_dict = encode_container(
        data, block_size=32768, parser="optimal", profile="wide", dict_size=32768
    )
    assert len(v1) < oracle_w20_size * 1.26  # measured 1.230
    assert len(wide_dict) < oracle_w20_size * 1.30  # measured 1.276 (wire v4)


def test_big_block_dict_delta_nonperiodic(oracle_w20_size, nonperiodic16):
    """Frontier config (128 KiB blocks + 128 KiB dict + depth cap 12):
    the best-ratio parallel config (round-5 A/B: 1.137x oracle-w20 vs
    1.190x for the former 64 KiB-dict/cap-8 point)."""
    from nlzm_tpu import native
    from nlzm_tpu.parallel.blocks import encode_container

    if not native.available():
        pytest.skip("native lib not built")
    wide = encode_container(
        nonperiodic16, block_size=131072, parser="optimal", profile="wide",
        dict_size=131072, depth_cap=12,
    )
    assert len(wide) < oracle_w20_size * 1.16  # measured 1.137


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
    # measured 1.2359 at wire v2 (chunked adaptation + the x4 lane
    # seeds; fixed per-block overheads weigh more at this small size)
    assert len(wide) < len(v1) * 1.26


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
    assert len(v1) < osz * 1.13  # measured 1.074 at 256 KiB
    assert len(wide) < osz * 1.36  # measured 1.327 at 256 KiB (wire v2)


@pytest.mark.slow
def test_ratio_evidence_at_scale(oracle_runner):
    """64 MiB corpus: sizes within 2% of the recorded round-2 numbers."""
    import bench
    from nlzm_tpu.parallel.blocks import encode_container

    data = bench.build_corpus(64 * 1024 * 1024)
    v1 = encode_container(data, block_size=32768, parser="optimal")
    wide = encode_container(data, block_size=32768, parser="optimal", profile="wide")
    assert len(v1) / len(data) < 0.565  # measured 0.5540
    assert len(wide) < len(v1) * 1.25  # measured 1.2221 (wire v2)
    osz = _oracle_size(oracle_runner, data, 15)
    assert len(v1) < osz * 1.11  # measured 1.085
    assert len(wide) < osz * 1.36  # measured 1.326 (wire v2)


def test_nlzc_ratio_with_prior(mixed_corpus):
    """NLZC v4 (huff0 container prior + 4096-row contexts): ratio <= 0.63
    on the bench mix at 1 MiB (measured 0.6037; 0.5626 at 4 MiB where
    the prior amortizes; v3 measured 0.636, round-2 order-2 0.687).
    Reference anchor: PPMd var.I order-6 gets 0.337 on this mix
    (BASELINE.md) - NLZC trades ratio for lane/block-parallel decode."""
    from nlzm_tpu.research import ppm_tpu

    import bench

    data = bench.build_corpus(1 << 20)
    blob = ppm_tpu.compress(data)
    assert len(blob) / len(data) < 0.63  # measured 0.6037
