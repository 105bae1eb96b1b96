"""Invariant tests for the CDC / Pareto / trajectory / collocation ops
(oracle byte-parity is covered by the SUBSET sweep in test_query_oracles;
these assert the semantics independently of the SQL twin)."""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_trajectory_simplify_keeps_endpoints_and_subsets(ray_session):
    import gscap_ray.queries as Q

    out = Q.q_trajectory_simplify(SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    # every user survives, and per user the first/last point (ts, event_id
    # order) is always kept
    assert set(out["user_id"]) == set(ev["user_id"])
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        kept = set(out.loc[out["user_id"] == uid, "event_id"])
        assert g["event_id"].iloc[0] in kept
        assert g["event_id"].iloc[-1] in kept
        assert kept <= set(g["event_id"])
    # integer-e5 coords reproduce the float synth exactly
    u = out["user_id"].to_numpy(np.int64)
    e = out["event_id"].to_numpy(np.int64)
    lat = (u * 37 % 120 - 60) * 100000 + 50000 + (e * 7919) % 2001 - 1000
    assert (out["lat_e5"].to_numpy(np.int64) == lat).all()


def test_skyline_is_exact_pareto_front(ray_session):
    import gscap_ray.queries as Q

    out = Q.q_skyline(SF)
    orders = pd.read_parquet(SF + "/orders.parquet",
                             columns=["o_orderkey", "o_totalprice",
                                      "o_orderdate"])
    p = orders["o_totalprice"].to_numpy()
    d = orders["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)

    def dominated(pp, dd):
        strict = ((p <= pp) & (d >= dd)) & ((p < pp) | (d > dd))
        return strict.any()

    # brute-force O(n^2) check: output = exactly the non-dominated set
    want = {int(k) for k, pp, dd in zip(orders["o_orderkey"], p, d)
            if not dominated(pp, dd)}
    assert set(out["o_orderkey"].astype(int)) == want
    assert len(out) == len(want) > 0


def test_pmi_bigrams_counts_consistent(ray_session):
    import gscap_ray.queries as Q

    out = Q.q_pmi_bigrams(SF)
    assert (out["cnt_ab"] >= 5).all()
    assert (out["cnt_a"] >= out["cnt_ab"]).all()
    assert (out["cnt_b"] >= out["cnt_ab"]).all()
    assert (out["pmi_milli"] > 0).all()
    # spot-check one bigram's exact counts against a pandas recount
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    toks = docs["text"].fillna("").str.strip()
    toks = toks[toks != ""].str.split()
    ex = toks.explode()
    flat = ex.to_numpy(dtype=object)
    did = ex.index.to_numpy()
    same = did[:-1] == did[1:]
    pairs = pd.DataFrame({"a": flat[:-1][same], "b": flat[1:][same]})
    row = out.iloc[0]
    got = ((pairs["a"] == row["tok1"]) & (pairs["b"] == row["tok2"])).sum()
    assert got == row["cnt_ab"]
    assert (flat == row["tok1"]).sum() == row["cnt_a"]


def test_snapshot_diff_matches_planted_mutations(ray_session):
    import gscap_ray.queries as Q

    out = Q.q_snapshot_diff(SF).to_pandas()
    keys = pd.read_parquet(SF + "/orders.parquet",
                           columns=["o_orderkey"])["o_orderkey"].to_numpy(np.int64)
    removed = {int(k) for k in keys if k % 97 == 0}
    added = {-int(k) for k in keys if k % 97 != 0 and k % 83 == 0}
    changed = {int(k) for k in keys if k % 97 != 0 and k % 89 == 0}
    by = out.groupby("change")["o_orderkey"].apply(lambda s: set(s.astype(int)))
    assert by.get("removed", set()) == removed
    assert by.get("added", set()) == added
    assert by.get("changed", set()) == changed
    assert len(out) == len(removed) + len(added) + len(changed)


def test_line_dedup_strips_planted_boilerplate(ray_session):
    import gscap_ray.queries as Q

    out = Q.q_line_dedup(SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    toks = docs["text"].fillna("").str.strip().str.split()
    # one output row per doc with >= 1 token, n_lines = ceil(len/10)
    nz = docs.loc[toks.str.len() > 0, "doc_id"]
    assert set(out["doc_id"]) == set(nz)
    want = np.ceil(toks[toks.str.len() > 0].str.len() / 10).astype(int)
    got = out.set_index("doc_id")["n_lines"]
    assert (got.loc[nz].to_numpy() == want.to_numpy()).all()
    # the corpus's planted duplicate docs make stripping non-vacuous
    assert (out["n_kept"] < out["n_lines"]).any()
    assert (out["n_kept"] <= out["n_lines"]).all()
    # recount one stripped doc by hand: its stripped lines occur >= 3x
    from gscap_ray.functions.text import md5_token_hash64
    allh = {}
    for lst in toks:
        for j in range(0, len(lst), 10):
            h = int(md5_token_hash64([" ".join(lst[j:j + 10])])[0] % 2**31)
            allh[h] = allh.get(h, 0) + 1
    row = out[out["n_kept"] < out["n_lines"]].iloc[0]
    lst = toks.loc[docs["doc_id"] == row["doc_id"]].iloc[0]
    n_hot = sum(1 for j in range(0, len(lst), 10)
                if allh[int(md5_token_hash64(
                    [" ".join(lst[j:j + 10])])[0] % 2**31)] >= 3)
    assert row["n_lines"] - row["n_kept"] == n_hot
