"""CDC MERGE INTO a hash-partitioned parquet table: upsert/delete semantics,
untouched-partition preservation, atomic rewrites."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from perfect_bloomfilter_ray.stages.mergetable import (
    merge_into_partitioned,
    write_hash_partitioned,
)


def _read_all(root: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    parts = [
        pq.read_table(os.path.join(root, f)).to_pandas()
        for f in sorted(os.listdir(root))
        if f.endswith(".parquet")
    ]
    return pd.concat(parts, ignore_index=True).sort_values("k").reset_index(drop=True)


@pytest.fixture
def table_dir(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100, dtype=np.float64)})
    root = str(tmp_path / "tbl")
    m = write_hash_partitioned(rd.from_pandas(df).repartition(4), root, "k", 8)
    assert m == {"partitions": 8, "rows": 100}
    return root


def test_merge_upsert_insert_delete(ray_session, table_dir):
    ups = pa.table({"k": pa.array([3, 7, 200], pa.int64()), "v": pa.array([30.0, 70.0, 2000.0])})
    manifest = merge_into_partitioned(table_dir, "k", upserts=ups, delete_keys=[5, 6, 999])
    got = _read_all(table_dir)
    exp = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100, dtype=np.float64)})
    exp.loc[exp["k"] == 3, "v"] = 30.0
    exp.loc[exp["k"] == 7, "v"] = 70.0
    exp = exp[~exp["k"].isin([5, 6])]
    exp = pd.concat([exp, pd.DataFrame({"k": [200], "v": [2000.0]})], ignore_index=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert manifest["rows_upserted"] == 3
    assert manifest["rows_deleted"] == 2  # key 999 never existed


def test_merge_delete_beats_upsert_and_last_wins(ray_session, table_dir):
    ups = pa.table(
        {"k": pa.array([1, 1, 2], pa.int64()), "v": pa.array([111.0, 112.0, 22.0])}
    )
    merge_into_partitioned(table_dir, "k", upserts=ups, delete_keys=[2])
    got = _read_all(table_dir)
    assert float(got.loc[got["k"] == 1, "v"].iloc[0]) == 112.0, "last upsert wins"
    assert 2 not in set(got["k"]), "delete beats same-batch upsert"


def test_merge_touches_only_affected_partitions(ray_session, table_dir):
    before = {
        f: os.path.getmtime(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
        if f.endswith(".parquet")
    }
    m = merge_into_partitioned(table_dir, "k", delete_keys=[0])
    after = {
        f: os.path.getmtime(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
        if f.endswith(".parquet")
    }
    assert m["partitions_touched"] == 1
    changed = [f for f in before if before[f] != after[f]]
    assert len(changed) == 1, "only the partition holding key 0 may be rewritten"


def test_merge_noop_batch(ray_session, table_dir):
    m = merge_into_partitioned(table_dir, "k", upserts=None, delete_keys=[])
    assert m == {"partitions_touched": 0, "touched_parts": [], "rows_upserted": 0, "rows_deleted": 0}
    assert len(_read_all(table_dir)) == 100
