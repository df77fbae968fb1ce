"""PPM research codec round trips + compression sanity."""

import pytest

from nlzm_tpu.research import ppm


@pytest.mark.parametrize("name", ["tiny", "repetitive", "zeros", "one", "empty"])
def test_round_trip_small(corpus_samples, name):
    data = corpus_samples[name]
    assert ppm.decompress(ppm.compress(data)) == data


def test_round_trip_text(corpus_text):
    data = corpus_text(8000)
    blob = ppm.compress(data)
    assert ppm.decompress(blob) == data
    # context mixing compresses text substantially even during model warmup
    assert len(blob) < len(data) * 0.50


def test_round_trip_random(corpus_samples):
    data = corpus_samples["random"][:3000]
    blob = ppm.compress(data)
    assert ppm.decompress(blob) == data
    assert len(blob) < len(data) * 1.15  # SEE keeps noise expansion small


def test_see_escape_weight_bounded():
    """Saturated contexts + a distribution shift drive SEE escape
    estimates high; the coded total must stay under the range coder's
    precision bound (regression: unbounded esc could zero the range)."""
    import random

    rng = random.Random(5)
    a = bytes(rng.choice(b"abc") for _ in range(60000))
    b = bytes(rng.randrange(256) for _ in range(40000))
    data = a + b
    blob = ppm.compress(data)
    assert ppm.decompress(blob) == data


def test_model_restart_stays_in_sync(corpus_text, monkeypatch):
    """The bounded-memory restart must trigger identically in both
    drivers (the var.I RestoreModel capability analog)."""
    monkeypatch.setattr(ppm, "MAX_NODES", 1500)
    data = corpus_text(12000)
    blob = ppm.compress(data)
    assert ppm.decompress(blob) == data
