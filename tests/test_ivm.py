"""Incremental aggregate view: equals full recompute after any CDC history."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _full_recompute(root: str, group_col: str, measure_col: str, scale: int = 100) -> pd.DataFrame:
    import pyarrow.parquet as pq

    parts = [pq.read_table(os.path.join(root, f)) for f in sorted(os.listdir(root)) if f.endswith(".parquet")]
    df = pa.concat_tables(parts).to_pandas()
    if df.empty:
        return pd.DataFrame({group_col: [], "n": [], "msum": []})
    df["_m"] = (df[measure_col] * scale).round(0).astype("int64")
    g = df.groupby(group_col, as_index=False).agg(n=("_m", "size"), msum=("_m", "sum"))
    g["n"] = g["n"].astype("int64")
    return g.sort_values(group_col).reset_index(drop=True)


def test_view_tracks_cdc_batches(ray_session, tmp_path):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ivm import build_view, refresh_view
    from perfect_bloomfilter_ray.stages.mergetable import merge_into_partitioned, write_hash_partitioned

    rng = np.random.default_rng(23)
    root, view = str(tmp_path / "tbl"), str(tmp_path / "view")
    os.makedirs(root)
    n0 = 500
    base = pd.DataFrame(
        {
            "k": np.arange(n0, dtype=np.int64),
            "grp": rng.choice(["a", "b", "c"], size=n0),
            "val": np.round(rng.uniform(0, 100, size=n0), 2),
        }
    )
    write_hash_partitioned(rd.from_pandas(base), root, "k", num_partitions=16)

    got = build_view(root, view, "grp", "val")
    pd.testing.assert_frame_equal(got, _full_recompute(root, "grp", "val"))

    # three CDC rounds: inserts, updates (group moves), deletes
    next_key = n0
    for r in range(3):
        ins = pd.DataFrame(
            {
                "k": np.arange(next_key, next_key + 40, dtype=np.int64),
                "grp": rng.choice(["a", "b", "c", "d"], size=40),
                "val": np.round(rng.uniform(0, 100, size=40), 2),
            }
        )
        upd = pd.DataFrame(
            {
                "k": rng.choice(n0, size=25, replace=False).astype(np.int64),
                "grp": rng.choice(["a", "d"], size=25),
                "val": np.round(rng.uniform(0, 100, size=25), 2),
            }
        )
        dels = rng.choice(n0, size=15, replace=False).astype(np.int64).tolist()
        next_key += 40
        manifest = merge_into_partitioned(
            root, "k", upserts=pa.Table.from_pandas(pd.concat([ins, upd])), delete_keys=dels
        )
        assert manifest["partitions_touched"] == len(manifest["touched_parts"])
        got = refresh_view(root, view, "grp", "val", manifest["touched_parts"])
        pd.testing.assert_frame_equal(got, _full_recompute(root, "grp", "val"))

    # untouched partials are reused: a no-op refresh reads only partials
    got2 = refresh_view(root, view, "grp", "val", [])
    pd.testing.assert_frame_equal(got2, got)


def test_refresh_is_idempotent(ray_session, tmp_path):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ivm import build_view, refresh_view
    from perfect_bloomfilter_ray.stages.mergetable import write_hash_partitioned

    root, view = str(tmp_path / "tbl"), str(tmp_path / "view")
    os.makedirs(root)
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "grp": ["x"] * 100, "val": [1.0] * 100})
    write_hash_partitioned(rd.from_pandas(base), root, "k", num_partitions=4)
    a = build_view(root, view, "grp", "val")
    # simulating a crashed refresh rerun: same partitions again, same answer
    b = refresh_view(root, view, "grp", "val", [0, 1, 2, 3])
    pd.testing.assert_frame_equal(a, b)
