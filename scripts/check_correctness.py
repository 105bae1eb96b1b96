"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() twin at a given sf, compare row count, schema (column
names) and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").fillna(np.inf)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


EXACT = os.environ.get("GSCAP_EXACT_CHECK", "") == "1"


def compare(name, ray_df, sql_df):
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT mismatch: ray={len(a)} sql={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]):
            if EXACT:
                # Byte-level equality, the driver's hash standard: -0.0 vs
                # 0.0 and last-ulp differences count as mismatches.
                ok = (av.astype(np.float64).view(np.uint64)
                      == bv.astype(np.float64).view(np.uint64)).all()
                if not ok:
                    bad = np.where(av.astype(np.float64).view(np.uint64)
                                   != bv.astype(np.float64).view(np.uint64))[0][:3]
                    return (f"BITDIFF col={c} rows={bad.tolist()} "
                            f"ray={av[bad]} sql={bv[bad]}")
            ok = np.allclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            bad = np.where(av != bv)[0][:3] if not pd.api.types.is_float_dtype(a[c]) else \
                np.where(~np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True))[0][:3]
            return f"VALUES mismatch col={c} rows={bad.tolist()} ray={av[bad]} sql={bv[bad]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from gscap_ray.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    only = set(sys.argv[2:])
    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa
            print(f"[ERR ] {name}: ray side raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"[rows] {name}: {len(ray_df)} rows (rows-only, no oracle)")
            continue
        # dump/derived-input oracles embed sf0.01 /tmp artifact paths (the
        # driver contract only ever runs sf0.01); when checking another sf
        # locally, retarget those paths at the same-sf artifacts the Ray
        # side just built
        tag = sf_dir.rstrip("/").split("/")[-1]
        if tag != "sf0.01":
            sql = sql.replace("sf0.01", tag)
        try:
            sql_df = con.sql(sql).df()
        except Exception as e:  # noqa
            print(f"[ERR ] {name}: SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        msg = compare(name, ray_df, sql_df)
        if msg:
            print(f"[FAIL] {name}: {msg}")
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(ray_df)} rows match")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
