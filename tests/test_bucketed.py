"""Bucketed storage layout — write/resume semantics and join parity."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from perfect_bloomfilter_ray.stages.bucketed import bucketed_join, write_bucketed


def _mk(tmp_path, name, df, key, nb):
    import ray

    path = str(tmp_path / name)
    write_bucketed(ray.data.from_pandas(df), key, path, nb)
    return path


def test_join_parity_with_pandas(ray_session, tmp_path):
    rng = np.random.RandomState(0)
    a = pd.DataFrame({"k": rng.randint(0, 200, 5000), "x": np.arange(5000)})
    b = pd.DataFrame({"k": np.arange(0, 250), "y": np.arange(250) * 10})
    pa_, pb_ = _mk(tmp_path, "a", a, "k", 8), _mk(tmp_path, "b", b, "k", 8)
    got = bucketed_join(pa_, pb_, "k").to_pandas()
    exp = a.merge(b, on="k", how="inner")
    key = lambda d: d.sort_values(["k", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got)[["k", "x", "y"]], key(exp)[["k", "x", "y"]])


def test_bucket_files_and_manifest(ray_session, tmp_path):
    df = pd.DataFrame({"k": np.arange(100), "v": np.arange(100)})
    path = _mk(tmp_path, "t", df, "k", 4)
    meta = json.load(open(os.path.join(path, "_buckets.json")))
    assert meta["num_buckets"] == 4 and meta["key"] == "k"
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 4
    total = sum(pq.read_table(os.path.join(path, f)).num_rows for f in files)
    assert total == 100


def test_resume_skips_existing_and_mismatch_raises(ray_session, tmp_path):
    import ray

    df = pd.DataFrame({"k": np.arange(50), "v": np.arange(50)})
    path = _mk(tmp_path, "t", df, "k", 4)
    f0 = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))[0]
    mtime = os.path.getmtime(os.path.join(path, f0))
    write_bucketed(ray.data.from_pandas(df), "k", path, 4)  # resume: no rewrite
    assert os.path.getmtime(os.path.join(path, f0)) == mtime
    with pytest.raises(ValueError):
        write_bucketed(ray.data.from_pandas(df), "k", path, 8)
    write_bucketed(ray.data.from_pandas(df), "k", path, 8, overwrite=True)
    meta = json.load(open(os.path.join(path, "_buckets.json")))
    assert meta["num_buckets"] == 8


def test_null_keys_dropped(ray_session, tmp_path):
    df = pd.DataFrame({"k": [1, 2, None, 4], "v": [1.0, 2.0, 3.0, 4.0]})
    path = _mk(tmp_path, "t", df, "k", 2)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    total = sum(pq.read_table(os.path.join(path, f)).num_rows for f in files)
    assert total == 3


def test_left_join_with_missing_bucket_file(ray_session, tmp_path):
    # small right side: some buckets have no right file at all
    a = pd.DataFrame({"k": np.arange(1000), "x": np.arange(1000)})
    b = pd.DataFrame({"k": [3], "y": [30]})
    pa_, pb_ = _mk(tmp_path, "a", a, "k", 16), _mk(tmp_path, "b", b, "k", 16)
    got = bucketed_join(pa_, pb_, "k", how="left").to_pandas()
    assert len(got) == 1000
    assert got.loc[got["k"] == 3, "y"].iloc[0] == 30
    assert got.loc[got["k"] != 3, "y"].isna().all()


def test_overwrite_clears_stale_buckets(ray_session, tmp_path):
    """The reviewer-reproduced corruption: a rewrite that no longer
    populates some bucket must not leave the old file for joins to read."""
    import ray

    path = str(tmp_path / "t")
    wide = pd.DataFrame({"k": np.arange(100), "v": np.arange(100)})
    write_bucketed(ray.data.from_pandas(wide), "k", path, 4)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 4
    narrow = pd.DataFrame({"k": [1], "v": [1]})  # lands in one bucket only
    write_bucketed(ray.data.from_pandas(narrow), "k", path, 4, overwrite=True)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    total = sum(pq.read_table(os.path.join(path, f)).num_rows for f in files)
    assert total == 1  # no stale rows survive


def test_join_requires_matching_key_name(ray_session, tmp_path):
    a = pd.DataFrame({"x": np.arange(10), "v": np.arange(10)})
    b = pd.DataFrame({"k": np.arange(10), "w": np.arange(10)})
    pa_ = _mk(tmp_path, "a", a, "x", 4)
    pb_ = _mk(tmp_path, "b", b, "k", 4)
    with pytest.raises(ValueError):
        bucketed_join(pa_, pb_, "k")
