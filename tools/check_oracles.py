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
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df


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
        ok_vals = False
        if ok_shape:
            try:
                pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[0]
        if ok_shape and ok_vals:
            print(f"PASS {name}: {len(mine)} rows  [{dt:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: cols {list(mine.columns)} vs {list(oracle.columns)}; rows {len(mine)} vs {len(oracle)}")
            if ok_shape:
                print("   value mismatch:", msg)
                merged = mine.compare(oracle) if mine.shape == oracle.shape else None
                if merged is not None and len(merged):
                    print(merged.head(5).to_string())
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()


if __name__ == "__main__":
    main()
