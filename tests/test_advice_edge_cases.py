"""Regression tests for the ADVICE r4 parity edge cases, which are
unreachable at the stock sf scales: decile queries over groups with
n < 10 rows (rank-0 deciles), EWMA floor division over NEGATIVE values
(DuckDB // truncates, numpy floors), and the winnow_select packing
envelope (doc_id >= 2^16 must fail loudly, not wrap)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory, ray_session):
    """An events table with a 7-row purchase group (rank-0 deciles), a
    23-row click group, and negative values on one user (floor-div sign
    coverage)."""
    d = tmp_path_factory.mktemp("tiny_world")
    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    # purchase: n=7 (< 10 -> k*n//10 == 0 for k=1)
    for i in range(7):
        rows.append((eid, 1_700_000_000_000_000 + eid * 60_000_000, 1,
                     "purchase", float(rng.integers(-500, 500)) / 100))
        eid += 1
    # click: n=23, user 2 all-negative values
    for i in range(23):
        v = -float(rng.integers(1, 900)) / 100 if i % 2 else \
            float(rng.integers(1, 900)) / 100
        rows.append((eid, 1_700_000_000_000_000 + eid * 60_000_000,
                     2 if i % 2 else 3, "click", v))
        eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    return str(d)


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')")
    return con.sql(sql).df()


@pytest.mark.parametrize("name", ["lorenz_deciles", "qq_deciles",
                                  "ewma_floor"])
def test_small_group_and_negative_parity(name, tiny_world):
    from check_correctness import compare, to_pandas

    from gscap_ray.queries import ORACLE_SQL, QUERIES

    ray_df = to_pandas(QUERIES[name](tiny_world))
    sql_df = _oracle(ORACLE_SQL[name], tiny_world)
    assert len(ray_df) > 0, "vacuous parity comparison"
    if name == "qq_deciles":
        # the 7-row purchase side zeroes rank k=1: both sides must drop it
        assert 1 not in set(ray_df["k"]), "rank-0 decile row not dropped"
    msg = compare(name, ray_df, sql_df)
    assert msg is None, msg


def test_winnow_envelope_guard(tmp_path, ray_session):
    """doc_id outside the 16-bit packing envelope must raise, not wrap."""
    from gscap_ray.queries import QUERIES

    t = pa.table({"doc_id": pa.array([70_000], pa.int64()),
                  "text": pa.array(["a b c d e f g h"], pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="16-bit envelope"):
        QUERIES["winnow_select"](str(tmp_path)).to_pandas()
