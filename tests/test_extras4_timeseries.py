"""Round-4 time-series / retrieval queries — brute-force verification."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _dense_hourly():
    df = duckdb.sql(
        f"SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS c "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    hb = df["b"].astype("datetime64[us]").astype("int64").to_numpy() // 3_600_000_000
    dense = np.zeros(int(hb[-1] - hb[0]) + 1, dtype=np.int64)
    dense[hb - hb[0]] = df["c"].to_numpy()
    return dense


def test_acf_vs_numpy_corrcoef(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.hourly_volume_acf(SF)
    dense = _dense_hourly()
    assert len(out) == 12
    for _, row in out.iterrows():
        lag = int(row["lag"])
        x, y = dense[:-lag].astype(float), dense[lag:].astype(float)
        assert int(row["n_pairs"]) == len(x)
        ref = np.corrcoef(x, y)[0, 1]
        assert abs(row["acf"] - ref) < 1e-5
        assert -1.0 <= row["acf"] <= 1.0


def test_sax_motifs_vs_bruteforce(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.sax_hourly_motifs(SF)
    dense = _dense_hourly()
    srt = np.sort(dense)
    cuts = [srt[max(int(np.ceil(q * len(srt))) - 1, 0)] for q in (0.25, 0.5, 0.75)]
    sym = np.searchsorted(np.array(cuts), dense, side="left")
    words = {}
    for i in range(len(sym) - 2):
        w = (sym[i], sym[i + 1], sym[i + 2])
        words[w] = words.get(w, 0) + 1
    exp = sorted(
        ((n, w) for w, n in words.items() if n >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = list(zip(out["n_occ"], zip(out["s1"], out["s2"], out["s3"])))
    assert [(int(n), tuple(int(x) for x in w)) for n, w in got] == [
        (n, tuple(int(x) for x in w)) for n, w in exp
    ]
    assert (out["s1"].between(0, 3)).all()


def test_dirichlet_ql_properties(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.dirichlet_ql_doc_search(SF)
    assert (out[["tf_hash", "tf_join", "tf_scan"]].sum(axis=1) > 0).all()
    assert (out["ql_score"] < 0).all()  # log-probabilities
    # smoothing sanity: within equal dl, more matched occurrences never hurts
    g = out.groupby("dl")
    for _, sub in g:
        if len(sub) < 2:
            continue
        sub = sub.assign(tot=sub[["tf_hash", "tf_join", "tf_scan"]].sum(axis=1))
        top = sub.sort_values(["tot", "ql_score"]).iloc[-1]
        assert top["ql_score"] == sub["ql_score"].max() or top["tot"] != sub["tot"].max()


def test_pacf_recursion_and_lag1_identity(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4
    from perfect_bloomfilter_ray.pipelines.extras4 import durbin_levinson_pacf

    out = e4.hourly_volume_pacf(SF)
    assert len(out) == 12
    assert (out["pacf"].abs() <= 1.0 + 1e-9).all()
    # lag-1 identity: pacf(1) == acf(1) about the mean
    dense = _dense_hourly().astype(float)
    x = dense - dense.mean()
    rho1 = (x[:-1] * x[1:]).sum() / (x * x).sum()
    assert abs(out["pacf"].iloc[0] - round(rho1, 6)) < 1e-6
    # independent check: solving the Yule-Walker system directly gives the
    # same phi_kk as the recursion
    rho = np.array([(x[:-k] * x[k:]).sum() / (x * x).sum() for k in range(1, 13)])
    for k in (2, 5, 12):
        R = np.empty((k, k))
        for i in range(k):
            for j in range(k):
                lag = abs(i - j)
                R[i, j] = 1.0 if lag == 0 else rho[lag - 1]
        phi = np.linalg.solve(R, rho[:k])
        assert abs(durbin_levinson_pacf(rho)[k - 1] - phi[-1]) < 1e-9


def test_median_polish_identity_and_robustness(ray_session):
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4
    from perfect_bloomfilter_ray.pipelines.extras4 import median_polish_int

    out = e4.median_polish_seasonality(SF)
    overall = int(out.loc[out["component"] == "overall", "effect"].iloc[0])
    row = out.loc[out["component"] == "dow"].sort_values("index")["effect"].to_numpy()
    col = out.loc[out["component"] == "hod"].sort_values("index")["effect"].to_numpy()
    # rebuild the grid and verify the exact additive identity
    df = duckdb.sql(
        f"SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, "
        f"CAST(extract(hour FROM ts) AS BIGINT) AS hod, count(*) AS c "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).df()
    grid = np.zeros((7, 24), dtype=np.int64)
    for _, r in df.iterrows():
        grid[int(r["dow"]), int(r["hod"])] = int(r["c"])
    resid, ov2, row2, col2 = median_polish_int(grid)
    assert ov2 == overall and (row2 == row).all() and (col2 == col).all()
    recon = ov2 + row2[:, None] + col2[None, :] + resid
    assert (recon == grid).all()  # exact decomposition identity
    # the polish explains structure: residual mass < centered-grid mass
    assert np.abs(resid).sum() < np.abs(grid - int(np.median(grid))).sum()
    # robustness: one huge outlier cell barely moves the effects
    g2 = grid.copy()
    g2[3, 12] += 1_000_000
    _, _, row3, col3 = median_polish_int(g2)
    assert (np.abs(row3 - row2) < 1000).all()
    assert (np.abs(col3 - col2) < 1000).all()


def test_grubbs_statistic_vs_numpy(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.grubbs_hourly_outlier(SF).iloc[0]
    dense = _dense_hourly()  # note: query uses OBSERVED hours, not the spine
    import duckdb

    h = duckdb.sql(
        f"SELECT count(*) AS c FROM '{SF}/events.parquet' "
        f"GROUP BY date_trunc('hour', ts)"
    ).df()["c"].to_numpy().astype(float)
    g_ref = max(h.max() - h.mean(), h.mean() - h.min()) / h.std(ddof=1)
    assert abs(out["g_stat"] - g_ref) < 1e-5
    assert out["g_stat"] > 0
