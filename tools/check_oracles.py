"""Run every queries() entry and compare with its oracle_sql() via DuckDB —
a local stand-in for the driver's correctness gate.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(res, Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize like the driver: columns sorted by name, rows sorted by
    all columns, integer widths collapsed to int64 / float widths to float64 /
    timestamps to us. NO float rounding — the driver hashes exact values, so
    a lenient local compare would mask real hash-fails (this is what hid the
    three r1 failures)."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        msg = None
        t0 = time.time()
        try:
            mine = norm(to_df(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {len(mine)} rows  [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            oracle = norm(con.execute(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {ex}")
            n_fail += 1
            continue
        ok_shape = list(mine.columns) == list(oracle.columns) and len(mine) == len(oracle)
        # dtype KIND must match too (int result vs float oracle = driver
        # schema/hash fail even when values are numerically equal)
        if ok_shape:
            kinds_m = [mine[c].dtype.kind for c in mine.columns]
            kinds_o = [oracle[c].dtype.kind for c in oracle.columns]
            if kinds_m != kinds_o:
                ok_shape = False
                msg = f"dtype kinds differ: {kinds_m} vs {kinds_o}"
        ok_vals = False
        if ok_shape:
            try:
                # exact values — bitwise for floats, like a value hash
                pd.testing.assert_frame_equal(mine, oracle, check_dtype=True, check_exact=True)
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
        if ok_shape and ok_vals:
            print(f"PASS {name}: {len(mine)} rows  [{dt:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: cols {list(mine.columns)} vs {list(oracle.columns)}; rows {len(mine)} vs {len(oracle)}")
            if msg:
                print("   mismatch:", msg)
            if mine.shape == oracle.shape and list(mine.columns) == list(oracle.columns):
                try:
                    merged = mine.compare(oracle)
                    if len(merged):
                        print(merged.head(5).to_string())
                except Exception:
                    pass
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()


if __name__ == "__main__":
    main()
