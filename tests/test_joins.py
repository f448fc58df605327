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
