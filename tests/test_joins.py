"""Broadcast-lookup join stage: inner/left semantics, semi/anti, dup guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture()
def sides(ray_session):
    import ray.data as rd

    big = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 4, 2, 9], "v": ["a", "b", "c", "d", "e", "f"]})
    )
    small = pa.table({"k2": [1, 2, 3, 4, 5], "name": ["one", "two", "three", "four", "five"]})
    return big, small


def test_inner_broadcast_join(ray_session, sides):
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    big, small = sides
    out = broadcast_lookup_join(big, small, on="k", right_on="k2").to_pandas()
    out = out.sort_values(["k", "v"]).reset_index(drop=True)
    assert len(out) == 5  # k=9 dropped
    assert out.loc[out["k"] == 2, "name"].tolist() == ["two", "two"]


def test_left_broadcast_join_null_fill(ray_session, sides):
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    big, small = sides
    out = broadcast_lookup_join(big, small, on="k", right_on="k2", how="left").to_pandas()
    assert len(out) == 6
    assert out.loc[out["k"] == 9, "name"].isna().all()


def test_duplicate_small_keys_rejected(ray_session, sides):
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    big, _ = sides
    dup = pa.table({"k2": [1, 1], "name": ["x", "y"]})
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_lookup_join(big, dup, on="k", right_on="k2")


def test_semi_and_anti_join(ray_session, sides):
    from perfect_bloomfilter_ray.stages.joins import broadcast_semi_join

    big, small = sides
    semi = broadcast_semi_join(big, small, on="k", right_on="k2").to_pandas()
    anti = broadcast_semi_join(big, small, on="k", right_on="k2", anti=True).to_pandas()
    assert sorted(semi["k"]) == [1, 2, 2, 3, 4]
    assert anti["k"].tolist() == [9]


def test_matches_duckdb_on_tables(ray_session, sf_dir):
    import duckdb

    import ray.data as rd
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    mine = (
        broadcast_lookup_join(cust, nation, on="c_nationkey", right_on="n_nationkey")
        .to_pandas()
        .sort_values(["c_custkey"])
        .reset_index(drop=True)[["c_custkey", "n_name"]]
    )
    oracle = duckdb.sql(
        f"""SELECT c_custkey, n_name FROM '{sf_dir}/customer.parquet' c
            JOIN '{sf_dir}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
            ORDER BY c_custkey"""
    ).df()
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


def _skew_frames(seed=7, n_left=4000, n_right=300):
    rng = np.random.default_rng(seed)
    # zipf-ish: key 0 is scorching hot, a few warm, long uniform tail
    keys = np.concatenate(
        [
            np.zeros(n_left // 2, np.int64),
            np.full(n_left // 4, 1, np.int64),
            rng.integers(2, 80, n_left // 4),
        ]
    )
    rng.shuffle(keys)
    left = pd.DataFrame({"k": keys, "lv": np.arange(len(keys), dtype=np.int64)})
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 80, n_right),
            "rv": np.arange(n_right, dtype=np.int64),
        }
    )
    return left, right


@pytest.mark.parametrize("threshold", [100, 10**9])  # hybrid and all-cold paths
def test_skew_join_matches_pandas_merge(ray_session, threshold):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import skew_join

    left, right = _skew_frames()
    out = skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk",
        hot_count_threshold=threshold, hot_top_k=8, num_partitions=4,
    ).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk")[["k", "lv", "rv"]]
    assert list(out.columns) == ["k", "lv", "rv"]
    key = lambda d: d.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(exp))


def test_skew_join_all_hot(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import skew_join

    left = pd.DataFrame({"k": [5] * 50 + [6] * 50, "lv": range(100)})
    right = pd.DataFrame({"rk": [5, 5, 6, 7], "rv": [10, 11, 12, 13]})
    out = skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", hot_count_threshold=1, hot_top_k=8,
    ).to_pandas()
    exp = left.merge(right, left_on="k", right_on="rk")[["k", "lv", "rv"]]
    key = lambda d: d.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(exp))


def test_skew_join_string_keys(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import skew_join

    left = pd.DataFrame(
        {
            "host": ["spam.com"] * 300 + ["a.org", "b.net", "c.io"] * 20,
            "lv": range(360),
        }
    )
    right = pd.DataFrame(
        {
            "rhost": ["spam.com", "spam.com", "a.org", "b.net", "d.gov"],
            "rv": [1, 2, 3, 4, 5],
        }
    )
    out = skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="host", right_on="rhost",
        hot_count_threshold=100, hot_top_k=4, num_partitions=2,
    ).to_pandas()
    exp = left.merge(right, left_on="host", right_on="rhost")[["host", "lv", "rv"]]
    key = lambda d: d.sort_values(["host", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(exp))


def test_skew_join_string_keys_none_hot(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import skew_join

    # regression: zero hot keys + string key type used to crash building the
    # broadcast array (float64 np.empty vs string Arrow type)
    left = pd.DataFrame({"host": ["a.org", "b.net", "c.io"] * 5, "lv": range(15)})
    right = pd.DataFrame({"rhost": ["a.org", "d.gov"], "rv": [1, 2]})
    out = skew_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="host", right_on="rhost",
        hot_count_threshold=10**9, hot_top_k=4, num_partitions=2,
    ).to_pandas()
    exp = left.merge(right, left_on="host", right_on="rhost")[["host", "lv", "rv"]]
    key = lambda d: d.sort_values(["host", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(exp))
