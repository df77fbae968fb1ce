"""Suffix-trie PPM (var.I-class structures): round-trip, ratio vs the
hashed PPM, and CutOff-pruning degradation."""

import pytest

from nlzm_tpu.research import ppm, ppm_trie


@pytest.mark.parametrize("name", ["tiny", "text", "repetitive", "random", "zeros"])
def test_round_trip(corpus_samples, name):
    data = corpus_samples[name]
    assert ppm_trie.decompress(ppm_trie.compress(data)) == data


def test_empty():
    assert ppm_trie.decompress(ppm_trie.compress(b"")) == b""


def test_beats_hashed_ppm_on_text(corpus_text):
    data = corpus_text(60000)
    trie = len(ppm_trie.compress(data))
    hashed = len(ppm.compress(data))
    assert trie < hashed, (trie, hashed)


def test_cutoff_pruning_round_trip(corpus_text, monkeypatch):
    # tiny budget: the trie prunes many times and must stay mirror-exact
    monkeypatch.setattr(ppm_trie, "NODE_BUDGET", 2048)
    data = corpus_text(30000)
    blob = ppm_trie.compress(data)
    assert ppm_trie.decompress(blob) == data
    # a heavily pruned model still compresses (2048 nodes is ~1% of the
    # normal budget; measured 18.9 KB from 30 KB)
    assert len(blob) < len(data) * 3 // 4


def test_arena_exhaustion_cutoff_round_trip(corpus_text, monkeypatch):
    # tiny arena, huge node budget: CutOff must fire from the arena
    # headroom/text-cursor triggers (not the node counter) and the
    # bitstream must stay mirror-exact through repeated copy-collects
    monkeypatch.setattr(ppm_trie, "ARENA_UNITS", 6000)
    monkeypatch.setattr(ppm_trie, "TEXT_RESERVE", 750)
    data = corpus_text(30000)
    blob = ppm_trie.compress(data)
    assert ppm_trie.decompress(blob) == data
    # prove the exhaustion path actually ran
    m = ppm_trie._TrieModel()
    for b in data[:20000]:
        m.update(b, 0)
        m.advance(b)
    assert m.pruned > 0
