"""Sliding-window aggregate and broadcast range join stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sliding_window_counts_and_peers(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import sliding_window_agg

    # key 1: ts 0s, 60s, 60s (peers), 400s; window 2min
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2],
            "ts": pd.to_datetime([0, 60, 60, 400, 0], unit="s"),
            "v": [1.0, 2.0, 3.0, 4.0, 10.0],
            "rid": [0, 1, 2, 3, 4],
        }
    )
    out = (
        sliding_window_agg(rd.from_pandas(df).repartition(2), "k", "ts", value_col="v", window="2min", out_sum="w_sum")
        .to_pandas()
        .sort_values(["k", "ts", "rid"])
        .reset_index(drop=True)
    )
    k1 = out[out["k"] == 1]
    # peers at ts=60 both see {0,60,60}: count 3; ts=400 sees only itself
    assert k1["w_count"].tolist() == [1, 3, 3, 1]
    assert k1["w_sum"].tolist() == [1.0, 6.0, 6.0, 4.0]
    assert out[out["k"] == 2]["w_count"].tolist() == [1]


def test_sliding_window_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import sliding_window_agg

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])
    got = (
        sliding_window_agg(events, "user_id", "ts", value_col="value", window="10min", out_sum="w_sum")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT event_id, count(*) OVER w AS w_count, sum(value) OVER w AS w_sum
        FROM read_parquet('{sf_dir}/events.parquet')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    ).fetchdf()
    assert got["w_count"].tolist() == want["w_count"].tolist()
    np.testing.assert_allclose(got["w_sum"].to_numpy(), want["w_sum"].to_numpy(), rtol=1e-9)


@pytest.fixture()
def bands():
    return pa.table(
        {
            "name": ["low", "mid", "high"],
            "lo": [0.0, 10.0, 100.0],
            "hi": [10.0, 100.0, 1000.0],
        }
    )


def test_range_join_left_and_inner(ray_session, bands):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import range_join_broadcast

    df = pd.DataFrame({"x": [-5.0, 0.0, 9.999, 10.0, 99.0, 100.0, 999.0, 1000.0]})
    ds = rd.from_pandas(df).repartition(2)
    left = range_join_broadcast(ds, bands, "x", "lo", "hi").to_pandas().sort_values("x").reset_index(drop=True)
    # half-open [lo, hi): -5 and 1000 unmatched; boundaries go to upper band
    assert [None if pd.isna(v) else v for v in left["name"]] == [
        None, "low", "low", "mid", "mid", "high", "high", None,
    ]
    inner = range_join_broadcast(ds, bands, "x", "lo", "hi", how="inner").to_pandas()
    assert len(inner) == 6


def test_range_join_closed_both(ray_session, bands):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import range_join_broadcast

    # disjoint closed intervals
    iv = pa.table({"name": ["a", "b"], "lo": [0.0, 20.0], "hi": [10.0, 30.0]})
    df = pd.DataFrame({"x": [10.0, 15.0, 20.0]})
    out = (
        range_join_broadcast(ray_dataset(df), iv, "x", "lo", "hi", closed="both")
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert [None if pd.isna(v) else v for v in out["name"]] == ["a", None, "b"]


def ray_dataset(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_range_join_rejects_overlap(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import range_join_broadcast

    iv = pa.table({"name": ["a", "b"], "lo": [0.0, 5.0], "hi": [6.0, 10.0]})
    with pytest.raises(ValueError, match="overlap"):
        range_join_broadcast(rd.from_pandas(pd.DataFrame({"x": [1.0]})), iv, "x", "lo", "hi")


def test_lag_lead_cum_matches_duckdb(ray_session, sf_dir):
    import duckdb
    import numpy as np
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import lag_lead_cum

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"])
    got = lag_lead_cum(events, "user_id", "ts", "value").to_pandas().sort_values("event_id").reset_index(drop=True)
    want = duckdb.sql(
        f"""
        SELECT event_id, lag(value) OVER w AS lag_value, lead(value) OVER w AS lead_value,
               sum(value) OVER (PARTITION BY user_id ORDER BY ts, value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value
        FROM read_parquet('{sf_dir}/events.parquet')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
        ORDER BY event_id
        """
    ).fetchdf()
    for c in ["lag_value", "lead_value", "cum_value"]:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float), rtol=1e-9, equal_nan=True
        )


def test_ranked_window_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import ranked

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, 400),
            "v": rng.integers(0, 12, 400),  # heavy ties
            "id": np.arange(400),
        }
    )
    out = (
        ranked(
            rd.from_pandas(df).repartition(6),
            "k",
            "v",
            descending=True,
            tie_cols=["id"],
            rank_col="r",
            dense_rank_col="dr",
            row_number_col="rn",
            num_blocks=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.copy()
    exp["r"] = df.groupby("k")["v"].rank(method="min", ascending=False).astype(int)
    exp["dr"] = df.groupby("k")["v"].rank(method="dense", ascending=False).astype(int)
    exp["rn"] = (
        df.sort_values(["v", "id"], ascending=[False, True]).groupby("k").cumcount() + 1
    )
    merged = out.merge(exp[["id", "r", "dr", "rn"]], on="id", suffixes=("", "_exp"))
    assert (merged["r"] == merged["r_exp"]).all()
    assert (merged["dr"] == merged["dr_exp"]).all()
    assert (merged["rn"] == merged["rn_exp"]).all()


def test_band_join_partitioned_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import band_join_partitioned

    rng = np.random.default_rng(31)
    ne, nb = 400, 300
    events = pd.DataFrame(
        {
            "k": rng.integers(0, 20, ne),
            "ts": pd.to_datetime(rng.integers(0, 1000, ne), unit="s"),
            "eid": np.arange(ne, dtype=np.int64),
        }
    )
    build = pd.DataFrame(
        {
            "bk": rng.integers(0, 22, nb),
            "bts": pd.to_datetime(rng.integers(0, 1000, nb), unit="s"),
            "bid": np.arange(nb, dtype=np.int64),
        }
    )
    out = (
        band_join_partitioned(
            rd.from_pandas(events), rd.from_pandas(build),
            on="k", big_ts="ts", window="100s",
            right_on="bk", small_ts="bts", num_blocks=3,
        )
        .to_pandas()
        .sort_values(["eid", "band_bid"])
        .reset_index(drop=True)
    )
    m = events.merge(build, left_on="k", right_on="bk")
    m = m[(m["bts"] >= m["ts"] - pd.Timedelta("100s")) & (m["bts"] <= m["ts"])]
    exp = set(zip(m["eid"], m["bid"]))
    got = set(zip(out["eid"], out["band_bid"]))
    assert got == exp
