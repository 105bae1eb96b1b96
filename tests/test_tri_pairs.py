"""Property tests for the shared within-segment pair enumerator
(queries._tri_pair_indices) used by covisit_pairs / knox_pairs."""

import numpy as np

from gscap_ray.queries import _tri_pair_indices


def _brute(starts, lens):
    out = []
    for s, ln in zip(starts, lens):
        for i in range(ln):
            for j in range(i + 1, ln):
                out.append((s + i, s + j))
    return out


def test_tri_pairs_matches_brute_force():
    rng = np.random.default_rng(7)
    for _ in range(50):
        lens = rng.integers(0, 9, size=rng.integers(1, 12))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
        ia, ib = _tri_pair_indices(starts, lens.astype(np.int64))
        want = _brute(starts, lens)
        if not want:
            assert ia is None and ib is None
            continue
        got = sorted(zip(ia.tolist(), ib.tolist()))
        assert got == sorted(want)
        assert (ia < ib).all()


def test_tri_pairs_single_large_segment():
    k = 200
    ia, ib = _tri_pair_indices(np.array([0], np.int64), np.array([k], np.int64))
    assert ia.size == k * (k - 1) // 2
    # every unordered pair exactly once
    packed = set((ia * 1000 + ib).tolist())
    assert len(packed) == ia.size
