"""Pallas fused-scan kernel vs the XLA scan-of-scans (interpret mode).

The kernel (ops/wide_scan_pallas.py) must reproduce plane_scan_fused
symbol-for-symbol: same chunk schedule, same CDF rebuild rule, same rANS
consumption. On CPU the kernel runs through the pallas interpreter; the
real-hardware A/B lives in bench.py.
"""

import numpy as np
import pytest

from nlzm_tpu import native
from nlzm_tpu.parallel.blocks import (
    block_payloads,
    decode_container,
    encode_container,
    parse_container,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


@pytest.fixture(scope="module")
def staged_case():
    import jax.numpy as jnp

    from nlzm_tpu.ops.wide_decode import prepare_wide
    from nlzm_tpu.utils.corpus import build_nonperiodic

    data = build_nonperiodic(200_000)
    c = encode_container(
        data, block_size=32768, parser="optimal", profile="wide",
        dict_size=32768,
    )
    info = parse_container(c)
    st = prepare_wide(block_payloads(c, info), info.wide_priors)
    return data, c, info, st


def test_pallas_scan_matches_xla(staged_case):
    import jax.numpy as jnp

    from nlzm_tpu.format.wide import PLANES
    from nlzm_tpu.ops.wide_decode import plane_scan_fused
    from nlzm_tpu.ops.wide_scan_pallas import fused_scan_pallas

    from nlzm_tpu.ops.wide_decode import stage_windows_of

    _, _, _, st = staged_case
    NP = len(PLANES)
    seeds_f = st["seeds_cat"]
    nsyms_f = jnp.stack([st["n_sym"][i] for i in range(NP)], axis=1)
    pr = st["priors"]
    priors_f = tuple(pr[PLANES[p].name][0] for p in range(NP)) if pr else None
    wins = stage_windows_of(st)
    ref = plane_scan_fused(seeds_f, wins, nsyms_f, st["steps"][0], priors_f)
    got = fused_scan_pallas(
        seeds_f, wins, nsyms_f, st["steps"][0], priors_f, interpret=True
    )
    for p in range(NP):
        r, g = np.asarray(ref[p]), np.asarray(got[p])
        n = np.asarray(st["n_sym"][p])
        for b in range(r.shape[0]):
            assert np.array_equal(r[b, : n[b]], g[b, : n[b]]), (
                PLANES[p].name, b)


def test_pallas_end_to_end_decode(staged_case):
    import jax.numpy as jnp

    from nlzm_tpu.ops.wide_decode import decode_wide_staged, rounds_hint_of

    data, c, info, st = staged_case
    st = dict(st)
    st["use_pallas"] = True
    st["pallas_interpret"] = True
    st["rounds_hint"] = rounds_hint_of(max(info.total_reads))
    st["dict_arr"] = jnp.asarray(
        np.frombuffer(info.dictionary, np.uint8))
    out, produced = decode_wide_staged(st, info.block_size)
    full = np.asarray(out).reshape(-1)[: info.total_len].tobytes()
    assert full == data
