"""Deterministic non-periodic corpus generator for ratio tracking.

The perf bench corpus (bench.build_corpus) repeats a 1 MiB base block, so
any window >= 20 gives the single-stream oracle a degenerate advantage
(every block after the first is one giant long-range match) and
oracle-delta guards had to hide at window 15. This generator produces
enwik-class text with NO global repetition: an order-0 Zipf word model
whose *vocabulary emphasis drifts* across the file (evolving topics), plus
markup/record/noise segments. Long-range redundancy exists (the shared
vocabulary), but no block is a copy of another, so window-20 comparisons
against the reference oracle measure real long-range modeling, not
block-copy detection.

Used by tests/test_ratio_guard.py (window-20 guards) and the dictionary
ratio experiments. Everything is seeded and vectorized; ~16 MiB generates
in a few seconds and results are cached by callers.
"""

import numpy as np

_VOCAB_SIZE = 16384
_TOPIC_BOOST = 256  # words per topic emphasis set
_SEG_BYTES = 4096  # approximate bytes per topic segment


def _make_vocab(rng: np.random.Generator):
    lens = rng.integers(2, 11, _VOCAB_SIZE)
    letters = rng.integers(0, 26, int(lens.sum())) + ord("a")
    words = []
    off = 0
    for L in lens:
        words.append(bytes(letters[off : off + L].tolist()))
        off += L
    return words


def build_nonperiodic(n: int, seed: int = 0x5EED) -> bytes:
    """n bytes of drifting-topic text/markup/records; no global repeats."""
    rng = np.random.default_rng(seed)
    vocab = _make_vocab(rng)
    vocab_arr = np.array(vocab, dtype=object)

    # global Zipf weights over a fixed random rank permutation
    rank = rng.permutation(_VOCAB_SIZE)
    base_w = 1.0 / (rank + 1.2)

    # evolving topic emphasis: a sliding window over the shuffled mid/tail
    # vocabulary (function-word head excluded so no word dominates);
    # adjacent segments share most of their boosted subset, far segments
    # share none - redundancy decays with distance instead of repeating
    topic_order = rng.permutation(np.argsort(rank)[512:])  # head excluded

    out = []
    total = 0
    seg_idx = 0
    while total < n:
        start = (seg_idx * (_TOPIC_BOOST // 4)) % (len(topic_order) - _TOPIC_BOOST)
        boost = topic_order[start : start + _TOPIC_BOOST]
        w = base_w.copy()
        w[boost] *= 60.0
        p = w / w.sum()

        kind = rng.random()
        est_words = _SEG_BYTES // 6
        idx = rng.choice(_VOCAB_SIZE, size=est_words, p=p)
        words = vocab_arr[idx]
        if kind < 0.60:  # prose: sentences of 6-17 words
            seg = bytearray()
            k = 0
            while k < len(words):
                sl = int(rng.integers(6, 18))
                sent = b" ".join(words[k : k + sl])
                seg += sent.capitalize() + b". "
                k += sl
        elif kind < 0.80:  # markup
            seg = bytearray()
            for k in range(0, len(words) - 1, 2):
                tag, body = words[k], words[k + 1]
                seg += b"<%s id=\"%d\">%s</%s>\n" % (
                    tag, int(rng.integers(10**6)), body, tag,
                )
        elif kind < 0.97:  # records
            seg = bytearray()
            for k in range(len(words)):
                seg += b"%08d,%s,%06d,OK;\n" % (
                    int(rng.integers(10**8)), words[k], int(rng.integers(10**6)),
                )
        else:  # incompressible noise burst
            seg = rng.integers(0, 256, int(rng.integers(256, 2048)), dtype=np.uint8).tobytes()
        out.append(bytes(seg))
        total += len(out[-1])
        seg_idx += 1
    return b"".join(out)[:n]
