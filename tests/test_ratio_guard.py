"""Compression-ratio regression guards on a deterministic mixed corpus.

These bounds protect the headline tradeoffs across refactors: v1 blocks
are the ratio profile, wide is the throughput profile (bounded ratio
cost), and both must keep beating naive entropy coding on mixed data.
"""

import pytest


@pytest.fixture(scope="module")
def mixed_corpus():
    import bench

    return bench.build_corpus(262144)


def test_v1_block_ratio(mixed_corpus):
    from nlzm_tpu import native
    from nlzm_tpu.parallel.blocks import encode_container

    if not native.available():
        pytest.skip("native lib not built")
    c = encode_container(mixed_corpus, block_size=32768, parser="optimal")
    assert len(c) / len(mixed_corpus) < 0.60  # measured 0.554


def test_wide_ratio_within_budget(mixed_corpus):
    from nlzm_tpu import native
    from nlzm_tpu.parallel.blocks import encode_container

    if not native.available():
        pytest.skip("native lib not built")
    v1 = encode_container(mixed_corpus, block_size=32768, parser="optimal")
    wide = encode_container(
        mixed_corpus, block_size=32768, parser="optimal", profile="wide"
    )
    # the throughput profile may cost at most ~20% ratio vs v1 blocks at
    # this small size (measured 1.13; fixed per-block overheads dominate
    # more here than at MB scale where the gap is ~5%)
    assert len(wide) < len(v1) * 1.20
