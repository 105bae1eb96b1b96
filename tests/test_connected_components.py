"""Distributed connected-components (large-star/small-star) tests.

Cross-checked against a plain union-find over the same edge lists,
including the adversarial shapes for the alternating contraction: long
chains (worst-case round count), cliques, stars rooted at the largest id,
and random G(n, p) graphs.
"""

import numpy as np
import pandas as pd
import pytest


def union_find_components(edges):
    parent = {}

    def find(a):
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in edges:
        ra, rb = find(u), find(v)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


def run_cc(edges, **kw):
    import ray.data as rd

    from gscap_ray.ops import connected_components

    df = pd.DataFrame({"u": np.array([e[0] for e in edges], np.int64),
                       "v": np.array([e[1] for e in edges], np.int64)})
    out = connected_components(rd.from_pandas(df), **kw).to_pandas()
    got = dict(zip(out["id"], out["rep"]))
    assert len(out) == len(got), "duplicate node rows in CC output"
    return got


@pytest.mark.usefixtures("ray_session")
def test_cc_matches_union_find_shapes():
    cases = [
        [(1, 2)],
        [(5, 4), (4, 3), (3, 2), (2, 1)],                # descending chain
        [(i, i + 1) for i in range(40)],                  # long chain
        [(i, j) for i in range(8) for j in range(i)],     # clique
        [(100, i) for i in range(5)],                     # star @ largest id
        [(1, 2), (3, 4), (5, 6), (2, 3)],                 # merged + separate
    ]
    for edges in cases:
        want = union_find_components(edges)
        got = run_cc(edges)
        assert got == want, edges


@pytest.mark.usefixtures("ray_session")
def test_cc_random_graphs():
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(30, 120))
        m = int(rng.integers(n // 2, 3 * n))
        # non-contiguous node ids exercise the hash partitioning
        ids = rng.choice(np.arange(0, 10_000), size=n, replace=False)
        uu = ids[rng.integers(0, n, m)]
        vv = ids[rng.integers(0, n, m)]
        keep = uu != vv
        edges = list(zip(uu[keep].tolist(), vv[keep].tolist()))
        if not edges:
            continue
        want = union_find_components(edges)
        got = run_cc(edges)
        assert got == want, trial
