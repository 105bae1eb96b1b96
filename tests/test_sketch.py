"""HLL sketch kernel: rho math, partial/merge algebra, estimate accuracy."""

import numpy as np

from gscap_ray.functions.sketch import (
    HLL_M,
    HLL_RHO_CAP,
    hll_estimate,
    hll_partials,
    hll_register_sum,
    hll_rho,
)


def naive_rho(h: int) -> tuple[int, int]:
    reg = h % HLL_M
    w = h >> 8
    if w == 0:
        return reg, HLL_RHO_CAP
    tz = 0
    while (w >> tz) & 1 == 0:
        tz += 1
    return reg, min(tz + 1, HLL_RHO_CAP)


def test_rho_matches_naive():
    rng = np.random.default_rng(1)
    hs = rng.integers(0, 2**64, 2000, dtype=np.uint64)
    # force some trailing-zero-heavy and zero-w values
    hs[:10] = np.uint64(0)
    hs[10:20] = (np.arange(10, dtype=np.uint64) + 1) << np.uint64(40)
    reg, rho = hll_rho(hs)
    for i in range(len(hs)):
        r2, p2 = naive_rho(int(hs[i]))
        assert (reg[i], rho[i]) == (r2, p2), i


def test_partials_merge_equals_single_pass():
    """max-merge of per-batch partials == registers of the whole stream
    (the algebra that makes the shuffle carry O(groups x m))."""
    rng = np.random.default_rng(2)
    h = rng.integers(0, 2**64, 30_000, dtype=np.uint64)
    g = rng.integers(0, 3, 30_000)
    whole = np.zeros(3 * HLL_M, np.int64)
    reg, rho = hll_rho(h)
    np.maximum.at(whole, g * HLL_M + reg, rho)
    merged = np.zeros(3 * HLL_M, np.int64)
    for lo in range(0, 30_000, 7_000):  # uneven batches
        gg, rr, mm = hll_partials(g[lo:lo + 7_000], 3, h[lo:lo + 7_000])
        np.maximum.at(merged, gg * HLL_M + rr, mm)
    assert (whole == merged).all()


def test_estimate_accuracy():
    """Raw estimator within ~3 sigma (sigma ~ 1.04/sqrt(256) = 6.5%) on a
    cardinality far from the small-range regime."""
    import hashlib

    n = 50_000
    hs = np.array([int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                                  "little") for i in range(n)],
                  dtype=np.uint64)
    g, reg, rho = hll_partials(np.zeros(n, np.int64), 1, hs)
    _n_regs, s = hll_register_sum(rho)
    est = hll_estimate(s)
    assert abs(est - n) / n < 0.20


def test_register_sum_untouched_registers():
    n_regs, s = hll_register_sum(np.array([], np.int64))
    assert n_regs == 0 and s == HLL_M * (1 << 32)
    # one register at rho=1 replaces one 2^32 term with 2^31
    n_regs, s = hll_register_sum(np.array([1], np.int64))
    assert s == (HLL_M - 1) * (1 << 32) + (1 << 31)
