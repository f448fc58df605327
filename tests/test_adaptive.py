"""Adaptive join dispatch + fingerprint-keyed result cache."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pytest

from perfect_bloomfilter_ray.stages.adaptive import adaptive_join, cached_result


def _ds(df):
    import ray

    return ray.data.from_pandas(df)


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_dispatch_broadcast_and_parity(ray_session):
    rng = np.random.RandomState(0)
    left = pd.DataFrame({"k": rng.randint(0, 50, 2000), "x": np.arange(2000)})
    right = pd.DataFrame({"k": np.arange(60), "y": np.arange(60) * 3})
    out, strat = adaptive_join(_ds(left), _ds(right), on="k")
    assert strat == "broadcast"
    got = _sorted(out.to_pandas()[["k", "x", "y"]], ["k", "x"])
    exp = _sorted(left.merge(right, on="k"), ["k", "x"])[["k", "x", "y"]]
    pd.testing.assert_frame_equal(got, exp)


def test_dispatch_hash_when_right_large(ray_session):
    rng = np.random.RandomState(1)
    left = pd.DataFrame({"k": rng.randint(0, 500, 3000), "x": np.arange(3000)})
    right = pd.DataFrame({"k": np.arange(500), "y": np.arange(500)})
    out, strat = adaptive_join(
        _ds(left), _ds(right), on="k", broadcast_max_rows=100, hot_count_threshold=10_000
    )
    assert strat == "hash"
    assert out.count() == 3000


def test_dispatch_skew_when_hot_key(ray_session):
    left = pd.DataFrame(
        {"k": np.concatenate([np.zeros(5000, np.int64), np.arange(1, 500)]),
         "x": np.arange(5499)}
    )
    right = pd.DataFrame({"k": np.arange(500), "y": np.arange(500)})
    out, strat = adaptive_join(
        _ds(left), _ds(right), on="k", broadcast_max_rows=100, hot_count_threshold=1000
    )
    assert strat == "skew"
    got = _sorted(out.to_pandas()[["k", "x", "y"]], ["k", "x"])
    exp = _sorted(left.merge(right, on="k"), ["k", "x"])[["k", "x", "y"]]
    pd.testing.assert_frame_equal(got, exp)


def test_cached_result_hit_miss_invalidate(ray_session, tmp_path):
    data = tmp_path / "input.parquet"
    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(data)
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return pd.DataFrame({"s": [6]})

    r1, hit1 = cached_result(str(tmp_path / "cache"), "sum_a", [str(data)], compute)
    r2, hit2 = cached_result(str(tmp_path / "cache"), "sum_a", [str(data)], compute)
    assert not hit1 and hit2
    assert calls["n"] == 1
    pd.testing.assert_frame_equal(r1, r2)
    # touching the input invalidates
    time.sleep(0.01)
    pd.DataFrame({"a": [1, 2, 4]}).to_parquet(data)
    r3, hit3 = cached_result(str(tmp_path / "cache"), "sum_a", [str(data)], compute)
    assert not hit3 and calls["n"] == 2
    # a different query name never collides
    _, hit4 = cached_result(str(tmp_path / "cache"), "other", [str(data)], compute)
    assert not hit4
