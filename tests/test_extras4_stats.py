"""Brute-force verification of the round-4 inference-statistics queries."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cochran_armitage_vs_bruteforce(ray_session):
    """T and the dose-spread piece match a direct per-row computation, and
    the assembled z is finite and matches the classic formula."""
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.cochran_armitage_purchase_trend(SF).iloc[0]
    df = duckdb.sql(
        f"SELECT CAST(extract(hour FROM ts) AS BIGINT) // 6 AS w, "
        f"CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS r "
        f"FROM '{SF}/events.parquet'"
    ).df()
    n, r_tot = len(df), int(df["r"].sum())
    t_num = 0
    sw_n = sww_n = 0
    for w, g in df.groupby("w"):
        n_g, r_g = len(g), int(g["r"].sum())
        t_num += int(w) * (n * r_g - r_tot * n_g)
        sw_n += int(w) * n_g
        sww_n += int(w) ** 2 * n_g
    var_piece = n * sww_n - sw_n**2
    assert int(out["n"]) == n and int(out["r_tot"]) == r_tot
    assert int(out["t_num"]) == t_num
    assert int(out["var_piece"]) == var_piece
    # classic z = T / sqrt(R(N-R)*V/N), assembled with Python ints (128-bit safe)
    z = t_num / math.sqrt(r_tot * (n - r_tot) * var_piece / n)
    assert math.isfinite(z)


def test_brown_forsythe_vs_bruteforce(ray_session):
    """Per-group (n, Σz, Σz²) match numpy medians, and the assembled W
    statistic equals a direct Brown-Forsythe computation."""
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.brown_forsythe_value_by_type(SF).set_index("event_type")
    df = duckdb.sql(
        f"SELECT event_type, CAST(floor(value*100) AS BIGINT) AS x "
        f"FROM '{SF}/events.parquet' WHERE value IS NOT NULL"
    ).df()
    groups = {}
    for g, sub in df.groupby("event_type"):
        x = np.sort(sub["x"].to_numpy().astype(np.int64))
        med = x[max(int(np.ceil(0.5 * len(x))) - 1, 0)]  # disc convention
        z = np.abs(x - med)
        groups[g] = z
        assert int(out.loc[g, "n_g"]) == len(z)
        assert int(out.loc[g, "sz"]) == int(z.sum())
        assert int(out.loc[g, "szz"]) == int((z * z).sum())
    # assemble W from the query's integers and compare to direct form
    n_g = out["n_g"].to_numpy().astype(float)
    sz = out["sz"].to_numpy().astype(float)
    szz = out["szz"].to_numpy().astype(float)
    n, k = n_g.sum(), len(n_g)
    zbar_g = sz / n_g
    zbar = sz.sum() / n
    between = (n_g * (zbar_g - zbar) ** 2).sum()
    within = (szz - sz * sz / n_g).sum()
    w_stat = ((n - k) / (k - 1)) * between / within
    allz = np.concatenate(list(groups.values()))
    d_between = sum(
        len(z) * (z.mean() - allz.mean()) ** 2 for z in groups.values()
    )
    d_within = sum(((z - z.mean()) ** 2).sum() for z in groups.values())
    w_direct = ((n - k) / (k - 1)) * d_between / d_within
    assert abs(w_stat - w_direct) < 1e-8
    assert w_stat >= 0


def test_moods_median_vs_bruteforce(ray_session):
    """Contingency counts match the disc grand median split; χ²
    contributions sum to the classic statistic."""
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.moods_median_value_by_type(SF).set_index("event_type")
    df = duckdb.sql(
        f"SELECT event_type, CAST(floor(value*100) AS BIGINT) AS x "
        f"FROM '{SF}/events.parquet' WHERE value IS NOT NULL"
    ).df()
    x = np.sort(df["x"].to_numpy().astype(np.int64))
    gm = x[max(int(np.ceil(0.5 * len(x))) - 1, 0)]
    for g, sub in df.groupby("event_type"):
        above = int((sub["x"] > gm).sum())
        le = int((sub["x"] <= gm).sum())
        assert int(out.loc[g, "n_above"]) == above
        assert int(out.loc[g, "n_le"]) == le
    a = out["n_above"].to_numpy().astype(float)
    b = out["n_le"].to_numpy().astype(float)
    n, ta, tb = (a + b).sum(), a.sum(), b.sum()
    ea, eb = (a + b) * ta / n, (a + b) * tb / n
    chi2 = ((a - ea) ** 2 / ea + (b - eb) ** 2 / eb)
    assert np.allclose(out["chi2_part"].to_numpy(), chi2, rtol=1e-12)
    assert (chi2 >= 0).all()


def test_cohens_kappa_identities(ray_session):
    """κ from the query's integers matches the po/pe definition and the
    confusion matrix the lang_id query reports."""
    import perfect_bloomfilter_ray.pipelines.extras4 as e4
    import perfect_bloomfilter_ray.pipelines.queries as qs

    out = e4.cohens_kappa_langid(SF).iloc[0]
    conf = qs.lang_id_documents(SF)
    n = int(conf["n"].sum())
    agree = int(conf.loc[conf["lang"] == conf["pred"], "n"].sum())
    row = conf.groupby("lang")["n"].sum()
    col = conf.groupby("pred")["n"].sum()
    labs = row.index.intersection(col.index)
    pe_num = int((row.loc[labs] * col.loc[labs]).sum())
    assert int(out["n"]) == n and int(out["agree"]) == agree
    assert int(out["pe_num"]) == pe_num
    po, pe = agree / n, pe_num / (n * n)
    assert abs(out["kappa"] - (po - pe) / (1 - pe)) < 1e-12
    assert -1.0 <= out["kappa"] <= 1.0


def test_loo_target_encoding_identities(ray_session):
    """Each row's rational excludes its own target; group totals recover."""
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.event_type_loo_target_encoding(SF).to_pandas()
    ref = duckdb.sql(
        f"SELECT event_id, event_type, CAST(floor(value*100) AS BIGINT) AS x "
        f"FROM '{SF}/events.parquet' WHERE value IS NOT NULL"
    ).df()
    merged = out.merge(ref, on="event_id")
    for g, sub in merged.groupby("event_type"):
        sx, n = int(sub["x"].sum()), len(sub)
        assert (sub["loo_num"] + sub["x"] == sx).all()
        assert (sub["loo_den"] == n - 1).all()


def test_seasonal_outlier_hours_flags(ray_session):
    """Every flagged hour violates the 3-MAD rule within its stratum; no
    unflagged hour does."""
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.seasonal_outlier_hours(SF)
    h = duckdb.sql(
        f"SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS c "
        f"FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).df()
    hb = h["b"].astype("datetime64[us]").astype("int64").to_numpy() // 3_600_000_000
    c = h["c"].to_numpy()
    dow, hod = ((hb // 24) + 4) % 7, hb % 24

    def dmed(v):
        s = np.sort(v)
        return int(s[max(int(np.ceil(0.5 * len(s))) - 1, 0)])

    expected = set()
    for d in range(7):
        for hh in range(24):
            m = (dow == d) & (hod == hh)
            if not m.any():
                continue
            med = dmed(c[m])
            ad = np.abs(c[m] - med)
            mad = dmed(ad)
            for b, flag in zip(h["b"].to_numpy()[m], ad > 3 * mad):
                if flag:
                    expected.add(pd.Timestamp(b))
    got = set(pd.to_datetime(out["hour_bucket"]))
    assert got == expected


def test_conservative_cms_sandwich():
    """exact <= CU estimate <= plain CMS estimate, same seeds/stream."""
    from perfect_bloomfilter_ray.state.cms import ConservativeCMS, CountMinSketch

    rng = np.random.RandomState(0)
    keys = (rng.zipf(1.3, 100_000) % 3000).astype(np.int64)
    cms = CountMinSketch(eps=1e-2, delta=1e-2)
    cu = ConservativeCMS(eps=1e-2, delta=1e-2)
    for i in range(0, len(keys), 8192):
        cms.update_column(keys[i : i + 8192])
        cu.update_column(keys[i : i + 8192])
    uniq, true = np.unique(keys, return_counts=True)
    e_cms = cms.estimate_column(uniq)
    e_cu = cu.estimate_column(uniq)
    assert (e_cu >= true).all()
    assert (e_cu <= e_cms).all()
    assert (e_cu - true).mean() < (e_cms - true).mean()  # strictly tighter on skew


def test_conservative_cms_merge_keeps_upper_bound():
    from perfect_bloomfilter_ray.state.cms import ConservativeCMS

    rng = np.random.RandomState(1)
    a_keys = (rng.zipf(1.3, 30_000) % 1000).astype(np.int64)
    b_keys = (rng.zipf(1.3, 30_000) % 1000).astype(np.int64)
    a = ConservativeCMS(eps=1e-2, delta=1e-2)
    b = ConservativeCMS(eps=1e-2, delta=1e-2)
    a.update_column(a_keys)
    b.update_column(b_keys)
    merged = ConservativeCMS.from_bytes(a.to_bytes()) if False else a.merge(b)
    allk = np.concatenate([a_keys, b_keys])
    uniq, true = np.unique(allk, return_counts=True)
    assert (merged.estimate_column(uniq) >= true).all()


def test_cu_query_sandwich(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.cms_cu_heavy_hitter_users(SF)
    assert (out["exact"] <= out["est_cu"]).all()
    assert (out["est_cu"] <= out["est_cms"]).all()


def test_jl_projection_distortion(ray_session):
    """JL property: projected pairwise distances track the originals."""
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.jl_projected_embeddings(SF).to_pandas().head(50)
    ref = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id LIMIT 50"
    ).df()
    orig = np.stack([np.asarray(v, dtype=np.float64) for v in ref["embedding"]])
    proj = out[["p0", "p1", "p2", "p3"]].to_numpy() / 2.0  # 1/sqrt(k) scale
    rng = np.random.RandomState(0)
    ratios = []
    for _ in range(200):
        i, j = rng.randint(0, 50, 2)
        if i == j:
            continue
        d0 = np.linalg.norm(orig[i] - orig[j])
        d1 = np.linalg.norm(proj[i] - proj[j])
        if d0 > 0:
            ratios.append(d1 / d0)
    r = np.array(ratios)
    assert 0.5 < np.median(r) < 2.0  # k=4 is a coarse sketch; unbiased center


def test_hill_estimator_assembly_and_direction(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.hill_tail_index_value(SF)
    assert len(out) == 100
    assert (out["ln_ratio"] >= 0).all()  # top-100 all >= x_(101)
    assert out["cents"].is_monotonic_decreasing
    alpha = 100.0 / out["ln_ratio"].sum()
    assert alpha > 0
    # direction: a heavier tail (pareto a=1) gives smaller alpha than a=3
    rng = np.random.RandomState(0)
    for a_true, other in ((1.2, 3.0),):
        xs1 = np.sort(rng.pareto(a_true, 20_000))[::-1]
        xs2 = np.sort(rng.pareto(other, 20_000))[::-1]

        def hill(xs):
            return 100.0 / np.log(xs[:100] / xs[100]).sum()

        assert hill(xs1) < hill(xs2)


def test_voptimal_dp_vs_bruteforce():
    from perfect_bloomfilter_ray.pipelines.extras4 import voptimal_segments

    rng = np.random.RandomState(3)
    bins = 24
    n = rng.randint(0, 50, bins).astype(np.int64)
    sx = (n * rng.randint(1, 20, bins)).astype(np.float64)
    sxx = sx * rng.randint(1, 20, bins)
    for B in (2, 3, 4):
        segs = voptimal_segments(n, sx, sxx, B)
        assert len(segs) == B
        assert segs[0][0] == 0 and segs[-1][1] == bins - 1
        for (a1, b1), (a2, b2) in zip(segs, segs[1:]):
            assert a2 == b1 + 1

        def seg_sse(a, b):
            cnt = n[a : b + 1].sum()
            if cnt == 0:
                return 0.0
            s = sx[a : b + 1].sum()
            return sxx[a : b + 1].sum() - s * s / cnt

        def brute(B):
            import itertools

            best = None
            for cuts in itertools.combinations(range(1, bins), B - 1):
                edges = [0, *cuts, bins]
                c = sum(seg_sse(edges[i], edges[i + 1] - 1) for i in range(B))
                if best is None or c < best - 1e-9:
                    best = c
            return best

        got = sum(seg_sse(a, b) for a, b in segs)
        assert abs(got - brute(B)) < 1e-6
    # SSE monotone non-increasing in bucket count
    sse_by_b = [
        sum(
            (lambda a, b: seg_sse(a, b))(a, b)
            for a, b in voptimal_segments(n, sx, sxx, B)
        )
        for B in (2, 4, 8)
    ]
    assert sse_by_b[0] >= sse_by_b[1] >= sse_by_b[2]


def test_markov_attribution_properties(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.markov_removal_attribution(SF)
    assert "purchase" not in set(out["channel"])
    assert 0 <= out["base_conversion"].iloc[0] <= 1
    assert abs(out["credit"].sum() - 1.0) < 1e-9
    assert (out["removal_effect"] <= 1.0 + 1e-12).all()
    # every channel that ever precedes a purchase has nonneg removal effect
    assert (out["credit"] >= 0).all()


def test_absorption_solver_vs_enumeration():
    """(I-Q)x = r absorption matches brute-force path enumeration on a toy
    chain: START->a->b->conv with leak to END."""
    # chain: a -> b (0.5), a -> END (0.5); b -> conv (0.4), b -> a (0.2), b -> END (0.4)
    Q = np.array([[0.0, 0.5], [0.2, 0.0]])
    r = np.array([0.0, 0.4])
    x = np.linalg.solve(np.eye(2) - Q, r)
    # brute force: sum over paths with geometric a<->b loops
    # P(conv from b) = 0.4 + 0.2 * P(conv from a); P(conv from a) = 0.5 * P(conv from b)
    pb = 0.4 / (1 - 0.2 * 0.5)
    pa_ = 0.5 * pb
    assert abs(x[0] - pa_) < 1e-12
    assert abs(x[1] - pb) < 1e-12


def test_coreset_kmeans_cost_competitive(ray_session):
    """Coreset centroids cost <= 2x a direct full-data k-means cost."""
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.embedding_coreset_kmeans(SF)
    cent = out.attrs["centroids"]
    assert cent.shape[0] == 8
    ref = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in ref["embedding"]])

    def cost(c):
        d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    # direct full-data Lloyd with the same deterministic init scheme
    c = [X[np.argmax(((X - X.mean(axis=0)) ** 2).sum(axis=1))]]
    for _ in range(7):
        d2c = np.min(np.stack([((X - cc) ** 2).sum(axis=1) for cc in c]), axis=0)
        c.append(X[np.argmax(d2c)])
    full = np.stack(c)
    for _ in range(15):
        d = ((X[:, None, :] - full[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(8):
            if (a == j).any():
                full[j] = X[a == j].mean(axis=0)
    assert cost(cent) <= 2.0 * cost(full)
    # weights approximately reconstruct the corpus size
    assert 0.5 * len(X) <= out["weight_sum"].sum() <= 2.0 * len(X)


def test_merkle_diff_localizes_known_changes(ray_session):
    """Changed buckets = exactly those touched by the deterministic edits."""
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.merkle_bucket_diff(SF)
    keys = duckdb.sql(
        f"SELECT o_orderkey AS k FROM '{SF}/orders.parquet'"
    ).df()["k"].to_numpy().astype(np.int64)
    removed = keys[keys % 97 == 0]
    added = keys[keys % 101 == 0] + 100_000_000
    touched = set((removed % 64).tolist()) | set((added % 64).tolist())
    # fingerprint collisions could hide a touched bucket (prob ~2^-31 each);
    # every REPORTED bucket must be genuinely touched, and the count deltas
    # must reconcile with the edit sizes
    got = set(out["bucket"].tolist())
    assert got <= touched
    assert len(got) >= len(touched) - 1  # allow at most one collision miss
    assert int((out["n_a"] - out["n_b"]).sum()) == len(removed) - len(added)


def test_hash_avalanche_within_binomial_envelope(ray_session):
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4
    from perfect_bloomfilter_ray.functions.hashing import hash64
    import pyarrow as pa_

    out = e4.hash_avalanche_audit(SF)
    n = int(out["n"].iloc[0])
    sigma = (n * 0.25) ** 0.5
    assert ((out["ones"] - n / 2).abs() <= 6 * sigma).all()  # 6σ envelope
    # brute-force popcount parity for one bit
    keys = duckdb.sql(f"SELECT o_orderkey FROM '{SF}/orders.parquet'").df()["o_orderkey"]
    h = hash64(pa_.array(keys.to_numpy().astype(np.int64)), 0xA0D1)
    assert int(out.loc[out["bit"] == 0, "ones"].iloc[0]) == int((h & 1).sum())
    assert int(out.loc[out["bit"] == 63, "ones"].iloc[0]) == int((h >> 63).sum())


def test_ind_discovery_finds_real_fk(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.inclusion_dependency_discovery(SF).set_index(["lhs", "rhs"])
    # the schema's real FK: every order's custkey is a customer key
    assert int(out.loc[("o_custkey", "c_custkey"), "violations"]) == 0
    # and every lineitem's orderkey is an order key
    assert int(out.loc[("l_orderkey", "o_orderkey"), "violations"]) == 0
    # violations never exceed the lhs distinct count
    assert (out["violations"] <= out["n_lhs"]).all()
    assert len(out) == 20


def test_partial_corr_vs_numpy(ray_session):
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.partial_corr_qty_price_given_discount(SF).iloc[0]
    df = duckdb.sql(
        f"SELECT CAST(l_quantity AS BIGINT) AS x, "
        f"CAST(floor(l_extendedprice*100) AS BIGINT) AS y, "
        f"CAST(floor(l_discount*100) AS BIGINT) AS z FROM '{SF}/lineitem.parquet'"
    ).df()
    c = np.corrcoef(np.stack([df["x"], df["y"], df["z"]]).astype(float))
    r_xy, r_xz, r_yz = c[0, 1], c[0, 2], c[1, 2]
    ref = (r_xy - r_xz * r_yz) / np.sqrt((1 - r_xz**2) * (1 - r_yz**2))
    assert abs(out["partial_r"] - ref) < 1e-5
    assert -1.0 <= out["partial_r"] <= 1.0


def test_page_trend_midranks(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.page_trend_test_periods(SF)
    assert len(out) == 4
    # doubled midranks per day sum to 2*(1+2+3+4) = 20 when all 4 periods
    # present; total across periods = 20 * n_days
    assert int(out["r2_sum"].sum()) == 20 * int(out["n_days"].iloc[0])
    # the assembled Page L from doubled ranks: 2L = sum p * r2_sum
    l2 = int((out["period"] * out["r2_sum"]).sum())
    assert l2 > 0


def test_cqv_identities(ray_session):
    import duckdb

    import perfect_bloomfilter_ray.pipelines.extras4 as e4

    out = e4.quartile_dispersion_per_type(SF).set_index("event_type")
    df = duckdb.sql(
        f"SELECT event_type, CAST(floor(value*100) AS BIGINT) AS x "
        f"FROM '{SF}/events.parquet' WHERE value IS NOT NULL"
    ).df()
    for g, sub in df.groupby("event_type"):
        x = np.sort(sub["x"].to_numpy().astype(np.int64))
        q1 = x[max(int(np.ceil(0.25 * len(x))) - 1, 0)]
        q3 = x[max(int(np.ceil(0.75 * len(x))) - 1, 0)]
        assert int(out.loc[g, "q1"]) == q1
        assert int(out.loc[g, "q3"]) == q3
        assert abs(out.loc[g, "cqv"] - round((q3 - q1) / (q3 + q1), 6)) < 1e-12
    assert (out["q3"] >= out["q1"]).all()
    assert out["cqv"].between(0, 1).all()
