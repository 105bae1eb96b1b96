"""Forced distributed-route byte-match tests for the link-graph family
(VERDICT r4 asks #1 and #6): monkeypatch the _GRAPH_SMALL_EDGES /
_BROADCAST_LABEL_NODES gates to -1 so every query takes its Dataset route
(two-join wedge support, distributed distinct-node SCC trim, sharded
Bellman-Ford label table), then require the result to byte-match the
default gated fast path on the same input — the connected_components
`small_edges=0` pattern (test_connected_components.py) applied to the
whole graph family."""

import pandas as pd
import pytest

import gscap_ray.queries as Q

SF = "/root/testdata/sf0.001"


def _frame(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    df = res.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _both_paths(monkeypatch, fn, *, shard_labels=False):
    fast = _frame(fn(SF))
    monkeypatch.setattr(Q, "_GRAPH_SMALL_EDGES", -1)
    if shard_labels:
        monkeypatch.setattr(Q, "_BROADCAST_LABEL_NODES", -1)
    forced = _frame(fn(SF))
    assert len(fast) > 0, "vacuous comparison: fast path returned no rows"
    pd.testing.assert_frame_equal(fast, forced)


@pytest.mark.usefixtures("ray_session")
def test_edge_support_dataset_route(monkeypatch):
    _both_paths(monkeypatch, Q.q_edge_support)


@pytest.mark.usefixtures("ray_session")
def test_clustering_coeff_dataset_route(monkeypatch):
    _both_paths(monkeypatch, Q.q_clustering_coeff)


@pytest.mark.usefixtures("ray_session")
def test_truss_peel_dataset_route(monkeypatch):
    _both_paths(monkeypatch, Q.q_truss_peel)


@pytest.mark.usefixtures("ray_session")
def test_link_prediction_cn_dataset_route(monkeypatch):
    _both_paths(monkeypatch, Q.q_link_prediction_cn)


@pytest.mark.usefixtures("ray_session")
def test_scc_components_dataset_route(monkeypatch):
    _both_paths(monkeypatch, Q.q_scc_components)


@pytest.mark.usefixtures("ray_session")
def test_dag_layers_dataset_route(monkeypatch):
    _both_paths(monkeypatch, Q.q_dag_layers)


@pytest.mark.usefixtures("ray_session")
def test_sssp_broadcast_route(monkeypatch):
    # gate at -1, node bound untouched: the broadcast label-vector tier
    _both_paths(monkeypatch, Q.q_sssp_rounds)


@pytest.mark.usefixtures("ray_session")
def test_sssp_sharded_route(monkeypatch):
    # both gates at -1: the host-hash-sharded label-table tier, where the
    # distance state itself is a Dataset (VERDICT r4 ask #6)
    _both_paths(monkeypatch, Q.q_sssp_rounds, shard_labels=True)


def test_edge_support_np_chunked_equivalence(monkeypatch):
    """The driver wedge expansion runs in bounded chunks; forcing the
    chunk size through (and past) every boundary regime must not change
    a single support value."""
    import numpy as np

    rng = np.random.default_rng(3)
    U = 150
    a = rng.integers(0, U, 2500)
    b = rng.integers(0, U, 2500)
    keep = a != b
    k = np.unique(np.minimum(a[keep], b[keep]).astype(np.int64) * U
                  + np.maximum(a[keep], b[keep]).astype(np.int64))
    lo, hi = (k // U).astype(np.int64), (k % U).astype(np.int64)
    ref = Q._edge_support_np(lo, hi, U)
    for chunk in (1, 5, 97, 10**9):
        monkeypatch.setattr(Q, "_WEDGE_CHUNK", chunk)
        assert (Q._edge_support_np(lo, hi, U) == ref).all(), chunk
