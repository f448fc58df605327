"""grouped_corr (stages/agg.py), ntile (stages/windows.ranked) and
profile_table (stages/profile.py) — parity vs pandas/duckdb references,
with multi-block inputs so the partial/merge paths are actually exercised."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd


def _events_df(n=4000, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 37, n),
            "x": rng.normal(1e6, 50.0, n),  # large offset: catches naive Σx² cancellation
            "y": rng.normal(-3.0, 2.0, n),
        }
    )
    df["y"] += 0.4 * (df["x"] - 1e6)  # induce real correlation
    df.loc[rng.choice(n, n // 20, replace=False), "x"] = np.nan
    df.loc[rng.choice(n, n // 25, replace=False), "y"] = np.nan
    # one singleton group and one all-null group → n<2 paths
    df.loc[0, "k"] = 99
    df.loc[df["k"] == 5, ["x"]] = np.nan
    return df


def test_grouped_corr_matches_pandas(ray_session):
    from perfect_bloomfilter_ray.stages.agg import grouped_corr

    df = _events_df()
    out = (
        grouped_corr(rd.from_pandas(df).repartition(13), "k", "x", "y", num_blocks=5)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref_rows = []
    for k, g in df.dropna(subset=["x", "y"]).groupby("k"):
        n = len(g)
        cov = g["x"].cov(g["y"]) if n > 1 else np.nan
        corr = g["x"].corr(g["y"]) if n > 1 else np.nan
        ref_rows.append({"k": k, "n": n, "covar_samp": cov, "corr": corr})
    ref = pd.DataFrame(ref_rows).sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == list(ref["k"])
    assert list(out["n"]) == list(ref["n"])
    np.testing.assert_allclose(out["covar_samp"], ref["covar_samp"], rtol=1e-9)
    np.testing.assert_allclose(out["corr"], ref["corr"], rtol=1e-9)


def test_grouped_corr_empty_and_constant(ray_session):
    from perfect_bloomfilter_ray.stages.agg import grouped_corr

    # constant x → zero variance → corr null, covar 0
    df = pd.DataFrame({"k": [1, 1, 1], "x": [5.0, 5.0, 5.0], "y": [1.0, 2.0, 3.0]})
    out = grouped_corr(rd.from_pandas(df), "k", "x", "y").to_pandas()
    assert out["n"].iloc[0] == 3
    assert abs(out["covar_samp"].iloc[0]) < 1e-12
    assert np.isnan(out["corr"].iloc[0])


def test_ntile_matches_duckdb(ray_session):
    from perfect_bloomfilter_ray.stages.windows import ranked

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 61, n),
            "v": rng.integers(0, 40, n),  # ties on purpose
        }
    )
    for b in (1, 3, 4, 7):
        out = (
            ranked(
                rd.from_pandas(df).repartition(9),
                "k",
                "v",
                tie_cols=["rid"],
                rank_col=None,
                ntile=b,
                ntile_col="nt",
                num_blocks=6,
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        ref = duckdb.sql(
            f"SELECT rid, ntile({b}) OVER (PARTITION BY k ORDER BY v, rid) AS nt "
            "FROM df ORDER BY rid"
        ).df()
        assert list(out["nt"]) == list(ref["nt"]), f"ntile({b}) mismatch"


def test_profile_table_matches_pandas(ray_session):
    from perfect_bloomfilter_ray.stages.profile import profile_table

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "a": rng.integers(-50, 50, n).astype(float),
            "b": rng.integers(0, 10_000, n),
            "s": np.array(["u", "v", "w", "xyz"])[rng.integers(0, 4, n)],
        }
    )
    df.loc[rng.choice(n, 300, replace=False), "a"] = np.nan
    df.loc[rng.choice(n, 100, replace=False), "s"] = None
    out = profile_table(
        rd.from_pandas(df).repartition(11), num_cols=["a", "b"], str_cols=["s"], num_blocks=4
    )
    by = {r.col_name: r for r in out.itertuples()}
    assert by["a"].n == int(df["a"].notna().sum())
    assert by["a"].n_null == int(df["a"].isna().sum())
    assert by["a"].n_distinct == df["a"].dropna().nunique()
    assert by["a"].min_num == df["a"].min()
    assert by["a"].max_num == df["a"].max()
    assert by["b"].n_distinct == df["b"].nunique()
    assert by["b"].min_num == float(df["b"].min())
    assert by["s"].n == int(df["s"].notna().sum())
    assert by["s"].n_distinct == 4
    assert np.isnan(by["s"].min_num)


def test_percent_rank_cume_dist_match_duckdb(ray_session):
    from perfect_bloomfilter_ray.stages.windows import ranked

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 40, n),
            "v": rng.integers(0, 15, n),  # heavy ties → real cume_dist peers
        }
    )
    # singleton key → percent_rank 0 branch
    df.loc[0, "k"] = 999
    out = (
        ranked(
            rd.from_pandas(df).repartition(5),
            "k",
            "v",
            rank_col=None,
            percent_rank_col="pr",
            cume_dist_col="cd",
            num_blocks=4,
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ref = duckdb.sql(
        "SELECT rid, percent_rank() OVER (PARTITION BY k ORDER BY v) AS pr, "
        "cume_dist() OVER (PARTITION BY k ORDER BY v) AS cd FROM df ORDER BY rid"
    ).df()
    np.testing.assert_array_equal(out["pr"].to_numpy(), ref["pr"].to_numpy())
    np.testing.assert_array_equal(out["cd"].to_numpy(), ref["cd"].to_numpy())


def test_zscore_normalize_matches_pandas(ray_session):
    from perfect_bloomfilter_ray.stages.agg import zscore_normalize

    rng = np.random.default_rng(31)
    n = 3000
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 25, n),
            "x": rng.normal(50.0, 9.0, n),
        }
    )
    df.loc[0, "k"] = 77  # singleton key → null z
    df.loc[df["k"] == 3, "x"] = 1.25  # constant key → zero std → null z
    out = (
        zscore_normalize(rd.from_pandas(df).repartition(8), "k", "x", num_blocks=4)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ref = df.groupby("k")["x"].transform(lambda s: (s - s.mean()) / s.std(ddof=1))
    mask = df["k"].isin([77, 3]).to_numpy()
    assert np.isnan(out["z"].to_numpy()[mask]).all()
    np.testing.assert_allclose(out["z"].to_numpy()[~mask], ref.to_numpy()[~mask], rtol=1e-9)


def test_jackknife_ols_matches_per_fold_refit(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.agg import jackknife_ols

    rng = np.random.default_rng(23)
    n = 4000
    x = rng.integers(1, 60, n).astype("int64")
    y = (3 * x + 17 + rng.integers(-40, 41, n)).astype("int64")
    fold = (np.arange(n) % 4).astype("int64")
    df = pd.DataFrame({"fold": fold, "x": x, "y": y})
    got = jackknife_ols(rd.from_pandas(df).repartition(7), "fold", "x", "y")
    assert list(got["fold"]) == [0, 1, 2, 3]
    for _, r in got.iterrows():
        m = fold != int(r["fold"])
        xt, yt = x[m].astype(float), y[m].astype(float)
        nn = int(m.sum())
        sx, sy = xt.sum(), yt.sum()
        sxx, sxy = (xt * xt).sum(), (xt * yt).sum()
        slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
        intercept = (sy * sxx - sx * sxy) / (nn * sxx - sx * sx)
        assert r["train_n"] == nn
        assert abs(r["slope"] - slope) < 1e-9
        assert abs(r["intercept"] - intercept) < 1e-6
