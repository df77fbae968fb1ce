"""Benchmark: block-parallel TPU decode throughput vs the reference baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference NLZM decodes enwik8 at ~123 MB/s on its (unspecified)
benchmark machine (README.md:4: 0.81 s for 100 MB). vs_baseline is our
aggregate decode MB/s divided by 123.

The compressed container is cached in .build/ keyed by corpus/config so
repeated runs skip the host-side encode; the JAX persistent compilation
cache in .build/jaxcache makes recompiles cheap.
"""

import hashlib
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BLOCK_SIZE = 16384
CORPUS_MB = int(os.environ.get("NLZM_BENCH_MB", "8"))


def build_corpus(n: int) -> bytes:
    """Deterministic enwik-like mix: natural text + source + light noise."""
    import random

    parts = []
    for p in [REPO / "SURVEY.md", REPO / "README.md", REPO / "BASELINE.md"]:
        if p.exists():
            parts.append(p.read_bytes())
    for p in sorted((REPO / "nlzm_tpu").rglob("*.py")):
        parts.append(p.read_bytes())
    base = b"\n".join(parts)
    rng = random.Random(0xBEEF)
    out = bytearray()
    while len(out) < n:
        chunk = bytearray(base)
        # sprinkle of edits so tiles aren't byte-identical
        for _ in range(len(chunk) // 256):
            chunk[rng.randrange(len(chunk))] = rng.randrange(32, 127)
        out += chunk
    return bytes(out[:n])


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".build" / "jaxcache"))

    data = build_corpus(CORPUS_MB * 1_000_000)
    key = hashlib.sha256(data + f"|v2|{BLOCK_SIZE}".encode()).hexdigest()[:16]
    cache = REPO / ".build" / f"bench_{key}.nlzp"
    cache.parent.mkdir(parents=True, exist_ok=True)

    if cache.exists():
        container = cache.read_bytes()
    else:
        from nlzm_tpu.parallel.blocks import encode_container

        container = encode_container(data, block_size=BLOCK_SIZE, parser="greedy")
        cache.write_bytes(container)

    from nlzm_tpu.parallel.blocks import decode_container

    # warmup (compile)
    out = decode_container(container, engine="tpu")
    assert out == data, "decode mismatch"

    times = []
    for _ in range(3):
        t0 = time.time()
        out = decode_container(container, engine="tpu")
        times.append(time.time() - t0)
    best = min(times)
    mbs = len(data) / best / 1e6

    print(
        json.dumps(
            {
                "metric": "block_parallel_decode_throughput",
                "value": round(mbs, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbs / 123.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
