"""Semantics tests for the round-3 curation operators on planted worlds:
pack_sequences' distributed scan on sparse / gappy doc_ids (range parts
must not assume dense ids), and decontaminate's broadcast 13-gram gate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def world(tmp_path):
    """documents.parquet factory under a tmp sf_dir."""
    def make(doc_ids, texts, **extra):
        cols = {"doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(doc_ids), pa.string()),
                "source": pa.array(["src0"] * len(doc_ids), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64())}
        cols.update(extra)
        pq.write_table(pa.table(cols), tmp_path / "documents.parquet")
        return str(tmp_path)
    return make


def test_pack_sequences_sparse_doc_ids(ray_session, world):
    # ids straddle several 8192-wide parts, with empty parts between and
    # non-contiguous ids inside a part; some docs empty / whitespace-only
    rng = np.random.default_rng(3)
    ids = np.unique(np.concatenate([
        rng.integers(0, 5000, 40),          # part 0 (sparse)
        rng.integers(16384, 17000, 10),     # part 2 (part 1 empty)
        rng.integers(81920, 90000, 25),     # parts 10-11
    ])).astype(np.int64)
    texts = []
    for i, d in enumerate(ids):
        if i % 9 == 0:
            texts.append("")            # 0 tokens
        elif i % 9 == 5:
            texts.append("   ")         # whitespace-only, still 0 tokens
        else:
            texts.append(" ".join(f"w{j}" for j in range((d % 700) + 1)))
    sf = world(ids, texts)

    from gscap_ray.queries import q_pack_sequences

    got = (q_pack_sequences(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    n = np.array([len(t.split()) for t in texts], dtype=np.int64)
    order = np.argsort(ids)
    off = np.zeros(len(ids), dtype=np.int64)
    off[order] = np.concatenate([[0], np.cumsum(n[order])[:-1]])
    want = pd.DataFrame({"doc_id": ids, "n_tokens": n,
                         "tok_offset": off, "seq_id": off // 2048})
    pd.testing.assert_frame_equal(got, want.sort_values("doc_id")
                                  .reset_index(drop=True))
    # offsets form one global chain: consecutive docs differ by n_tokens
    o = got.sort_values("doc_id")
    assert (np.diff(o["tok_offset"].values)
            == o["n_tokens"].values[:-1]).all()


def test_decontaminate_planted_hits(ray_session, world):
    shared = " ".join(f"s{i}" for i in range(13))       # one 13-gram
    bench_extra = " ".join(f"b{i}" for i in range(20))
    clean = " ".join(f"c{i}" for i in range(30))
    ids = [0, 17, 5, 6, 7]  # 0 and 17 are benchmark (doc_id % 17 == 0)
    texts = [
        bench_extra + " " + shared,   # benchmark doc carrying the 13-gram
        "x y z",                      # benchmark doc, too short for windows
        "lead in tokens " + shared + " trailing words here",  # contaminated
        clean,                        # disjoint -> clean
        "only twelve tokens " + " ".join(f"t{i}" for i in range(9)),  # 12 toks
    ]
    sf = world(ids, texts)

    from gscap_ray.queries import q_decontaminate

    got = (q_decontaminate(sf).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    assert list(got.index) == [5, 6, 7]          # benchmark docs excluded
    assert got.loc[5, "contaminated"] == 1
    assert got.loc[6, "contaminated"] == 0
    assert got.loc[7, "contaminated"] == 0
    assert got.loc[7, "n_windows"] == 0          # <13 tokens -> no windows
    assert got.loc[6, "n_windows"] == 30 - 12


def test_jaccard_verify_empty_candidates(ray_session, world):
    """The shared verify tail must return a typed empty result when the
    candidate generator found nothing (Ray empty blocks lose schema)."""
    import ray.data as rd

    from gscap_ray.queries import _exact_jaccard_verify, _read

    sf = world([1, 2], ["alpha beta gamma delta", "zeta eta theta iota"])
    cand = rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                   "doc_b": pa.array([], pa.int64())}))
    out = _exact_jaccard_verify(_read(sf, "documents", ["doc_id", "text"]),
                                cand)
    assert out.count() == 0
    # Dataset-level schema survives (to_pandas() drops columns for 0-row
    # datasets — a Ray quirk, not this operator's contract)
    assert out.schema().names == ["doc_a", "doc_b", "jaccard"]
