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
        # both paths: single-task fast path (default) and the distributed
        # star contraction (small_edges=0 forces it)
        assert run_cc(edges) == want, edges
        assert run_cc(edges, small_edges=0) == want, edges


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
        assert run_cc(edges) == want, trial
        assert run_cc(edges, small_edges=0) == want, trial


@pytest.mark.usefixtures("ray_session")
def test_dedup_representatives_tie_semantics(tmp_path):
    """Keep-list picks max token count, ties -> smallest doc_id; every
    component member appears exactly once (planted world, no oracle)."""
    import ray.data as rd

    import gscap_ray.queries as Q

    # planted docs: 0/1/2 one component (near-identical text), 3/4 another
    # with a token-count tie, 5 a singleton (must NOT appear in output)
    b1 = "alpha beta gamma delta epsilon zeta eta theta"
    b2 = "red orange yellow green blue indigo violet umber"
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [b1 + " one two three",           # 11 tokens
                 b1 + " one two three four",      # 12 tokens  <- keeper c1
                 b1 + " one two",                 # 10 tokens
                 b2 + " x y z",                   # 11 tokens  <- keeper c2 (tie, min id)
                 b2 + " x y w",                   # 11 tokens (tie loser)
                 "totally different text entirely unrelated words here"],
    })
    sf = tmp_path / "world"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    out = Q.q_dedup_representatives(str(sf))
    if isinstance(out, rd.Dataset):
        out = out.to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert set(out["doc_id"]) == {0, 1, 2, 3, 4}, out
    kept = dict(zip(out["doc_id"], out["kept"]))
    assert kept == {0: False, 1: True, 2: False, 3: True, 4: False}, kept
    # reps are component minima
    reps = dict(zip(out["doc_id"], out["rep"]))
    assert reps[0] == reps[1] == reps[2] == 0
    assert reps[3] == reps[4] == 3


def test_components_query_star_path_parity(ray_session, monkeypatch):
    # the components query normally takes the single-task fast path at
    # test scale; the distributed star-contraction path must produce the
    # identical (id, rep) table on the same graph
    import gscap_ray.ops as ops
    import gscap_ray.queries as Q

    sf = "/root/testdata/sf0.001"
    fast = Q.q_components(sf).to_pandas().sort_values("id").reset_index(drop=True)

    orig = ops.connected_components

    def forced(edges, **kw):
        kw["small_edges"] = 0
        return orig(edges, **kw)

    monkeypatch.setattr(ops, "connected_components", forced)
    monkeypatch.setattr(Q, "connected_components", forced, raising=False)
    # q_components imports inside the function body, so patch the module
    # attribute it resolves at call time
    star = Q.q_components(sf).to_pandas().sort_values("id").reset_index(drop=True)
    assert star.equals(fast), (star.head(), fast.head())
