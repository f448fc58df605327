"""Exact grouped quantiles / quantile trim (stages/quantiles.py),
deterministic shuffle (stages/shards.py) and incremental-ingest dedup
(stages/dedup.incremental_new_rows): brute-force parity + invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _rand_events(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k1": rng.choice(["a", "b", "c", "dd"], size=n),
            "k2": rng.integers(0, 3, size=n).astype(np.int64),
            "v": np.round(rng.normal(100, 40, size=n), 3),  # ties after round
            "rid": np.arange(n, dtype=np.int64),
        }
    )


def _disc_brute(df, keys, qs):
    def per_group(g):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        return pd.Series({f"q{i}": v[max(int(np.ceil(q * n)) - 1, 0)] for i, q in enumerate(qs)})

    return df.groupby(keys).apply(per_group, include_groups=False).reset_index()


@pytest.mark.parametrize("num_blocks", [1, 7])
@pytest.mark.parametrize("keys", [["k1"], ["k1", "k2"]])
def test_exact_grouped_quantiles_disc_parity(ray_session, keys, num_blocks):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    df = _rand_events()
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    names = [f"q{i}" for i in range(len(qs))]
    got = (
        exact_grouped_quantiles(
            rd.from_pandas(df).repartition(5), keys, "v", qs, kind="disc",
            names=names, num_blocks=num_blocks,
        )
        .to_pandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )
    want = _disc_brute(df, keys, qs).sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False, check_exact=True)


def test_exact_grouped_quantiles_cont_matches_numpy(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    df = _rand_events(seed=11)
    got = (
        exact_grouped_quantiles(rd.from_pandas(df), "k1", "v", [0.25, 0.75], kind="cont",
                                names=["a", "b"])
        .to_pandas()
        .sort_values("k1")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k1")["v"]
        .agg(a=lambda s: np.quantile(s, 0.25), b=lambda s: np.quantile(s, 0.75))
        .reset_index()
    )
    np.testing.assert_allclose(got[["a", "b"]].to_numpy(), want[["a", "b"]].to_numpy(), rtol=1e-12)


def test_quantile_trim_parity(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import quantile_trim

    df = _rand_events(seed=5)
    got = (
        quantile_trim(rd.from_pandas(df).repartition(4), "k1", "v", 0.1, 0.9)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )

    def bounds(g):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        lo = v[max(int(np.ceil(0.1 * n)) - 1, 0)]
        hi = v[max(int(np.ceil(0.9 * n)) - 1, 0)]
        return g[(g["v"] >= lo) & (g["v"] <= hi)]

    want = (
        df.groupby("k1", group_keys=False)[df.columns]
        .apply(bounds)
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_exact=True)


def test_deterministic_shuffle_order_and_reproducibility(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.shards import deterministic_shuffle

    ids = np.arange(0, 4000, dtype=np.int64) * 7919  # sparse ids
    df = pd.DataFrame({"doc_id": ids})
    out = deterministic_shuffle(rd.from_pandas(df).repartition(6), "doc_id").to_pandas()
    mod, mult = 1_000_000_007, 2654435761
    want_key = (ids.astype(object) % mod) * (mult % mod) % mod  # unbounded python ints
    assert sorted(out["doc_id"]) == sorted(ids)
    # keys match the engine-portable formula exactly
    got = out.sort_values("doc_id")["shuffle_key"].to_numpy()
    np.testing.assert_array_equal(got, want_key.astype(np.int64))  # ids already ascending
    # globally sorted by (key, id)
    k = out["shuffle_key"].to_numpy()
    i = out["doc_id"].to_numpy()
    assert np.all((k[:-1] < k[1:]) | ((k[:-1] == k[1:]) & (i[:-1] < i[1:])))
    # a second run yields the identical order
    out2 = deterministic_shuffle(rd.from_pandas(df).repartition(3), "doc_id").to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_incremental_new_rows_parity(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import incremental_new_rows

    rng = np.random.default_rng(9)
    texts = [f"doc body {i % 220}" for i in range(600)]  # heavy cross-slice dup
    df = pd.DataFrame(
        {
            "doc_id": np.arange(600, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "fr"], size=600),
        }
    )
    old_df, new_df = df[df.doc_id % 10 < 8], df[df.doc_id % 10 >= 8]
    got = (
        incremental_new_rows(
            rd.from_pandas(old_df).repartition(4),
            rd.from_pandas(new_df).repartition(3),
            "text",
            "doc_id",
            keep_cols=["lang"],
            num_blocks=5,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        new_df[~new_df["text"].isin(set(old_df["text"]))]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["lang"]) == list(want["lang"])
    assert len(got) > 0  # slice boundaries leave genuinely new docs


def test_incremental_new_rows_normalized(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import incremental_new_rows

    old = pd.DataFrame({"doc_id": [0], "text": ["Hello,   World!"]})
    new = pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", "brand new"]})
    got = incremental_new_rows(
        rd.from_pandas(old), rd.from_pandas(new), "text", "doc_id", normalize=True, num_blocks=2
    ).to_pandas()
    assert list(got["doc_id"]) == [2]


def test_normalize_text_kernel():
    import pyarrow as pa

    from perfect_bloomfilter_ray.functions.text import normalize_text

    got = normalize_text(pa.array(["  A  b\t c ", "", "X"])).to_pylist()
    assert got == ["a b c", "", "x"]


def test_word_jaccard_pairs_grouped_parity(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import word_jaccard_pairs_grouped

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 25))) for _ in range(80)]
    texts[5] = ""  # empty doc: excluded from any pair (union>0 guard pairs it only with non-empty)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(80, dtype=np.int64),
            "g": rng.choice(["s1", "s2", "s3"], size=80),
            "text": texts,
        }
    )
    got = (
        word_jaccard_pairs_grouped(rd.from_pandas(df).repartition(4), "g", "text", "doc_id", 0.3)
        .to_pandas()
        .sort_values(["g", "id_a", "id_b"])
        .reset_index(drop=True)
    )

    import re

    rows = []
    for g, sub in df.groupby("g"):
        recs = list(sub.itertuples())
        for x in range(len(recs)):
            for y in range(x + 1, len(recs)):
                a, b = recs[x], recs[y]
                wa = set(re.findall(r"[a-z0-9]+", a.text.lower()))
                wb = set(re.findall(r"[a-z0-9]+", b.text.lower()))
                if not wa and not wb:
                    continue
                jac = len(wa & wb) / len(wa | wb)
                if jac >= 0.3:
                    lo, hi = sorted((a.doc_id, b.doc_id))
                    rows.append((g, lo, hi, jac))
    want = (
        pd.DataFrame(rows, columns=["g", "id_a", "id_b", "jaccard"])
        .sort_values(["g", "id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_quantile_bin_equi_depth(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import quantile_bin

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 500),
            "v": np.concatenate([rng.normal(0, 1, 500), rng.normal(5, 2, 500)]),
            "i": np.arange(1000),
        }
    )
    out = (
        quantile_bin(rd.from_pandas(df), "g", "v", n_bins=4)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    for g, sub in out.groupby("g"):
        # equi-depth: each quartile bin holds ~250 rows (ties may shift a few)
        counts = sub["bin"].value_counts()
        assert set(counts.index) == {0, 1, 2, 3}
        assert counts.min() >= 115 and counts.max() <= 135  # 500 rows / 4 bins
        # bins are monotone in value
        order = sub.sort_values("v")["bin"].to_numpy()
        assert (np.diff(order) >= 0).all()


def test_ks_two_sample_matches_bruteforce(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import ks_two_sample

    rng = np.random.default_rng(17)
    # discretized values force heavy ties (the distinct-value collapse path)
    v0 = np.round(rng.normal(0, 1, 400), 1)
    v1 = np.round(rng.normal(0.5, 1.3, 300), 1)
    df = pd.DataFrame(
        {
            "v": np.concatenate([v0, v1, [np.nan, np.nan]]),
            "h": np.concatenate([np.zeros(400), np.ones(300), [0, 1]]).astype("int64"),
        }
    )
    res = ks_two_sample(rd.from_pandas(df).repartition(6), "v", "h", num_buckets=16)
    assert (res["n0"], res["n1"]) == (400, 300)

    xs = np.unique(np.concatenate([v0, v1]))
    f0 = np.searchsorted(np.sort(v0), xs, side="right")
    f1 = np.searchsorted(np.sort(v1), xs, side="right")
    exp_num = int(np.abs(f0 * 300 - f1 * 400).max())
    assert res["ks_num"] == exp_num
    # cross-check D against the classical definition
    assert res["ks_num"] / (400 * 300) == pytest.approx(
        np.abs(f0 / 400 - f1 / 300).max(), abs=1e-12
    )


def test_ks_two_sample_single_value_and_empty_side(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import ks_two_sample

    df = pd.DataFrame({"v": [3.0] * 10, "h": [0] * 10})
    res = ks_two_sample(rd.from_pandas(df), "v", "h", num_buckets=8)
    assert res == {"n0": 10, "n1": 0, "ks_num": 0}

    empty = pd.DataFrame({"v": [np.nan], "h": [0]})
    res = ks_two_sample(rd.from_pandas(empty), "v", "h")
    assert res == {"n0": 0, "n1": 0, "ks_num": 0}


def test_ks_group_vs_rest_matches_bruteforce(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import ks_group_vs_rest

    rng = np.random.default_rng(31)
    groups = ["a", "b", "c"]
    sizes = [300, 200, 250]
    vals = [
        np.round(rng.normal(0, 1, sizes[0]), 1),
        np.round(rng.normal(0.4, 1.2, sizes[1]), 1),
        np.round(rng.normal(-0.3, 0.8, sizes[2]), 1),
    ]
    df = pd.DataFrame(
        {
            "v": np.concatenate(vals + [[np.nan]]),
            "g": np.concatenate([[g] * s for g, s in zip(groups, sizes)] + [["a"]]),
        }
    )
    out = ks_group_vs_rest(rd.from_pandas(df).repartition(7), "v", "g", num_buckets=16)
    assert list(out["group"]) == groups
    assert list(out["n_g"]) == sizes

    n = sum(sizes)
    allv = np.concatenate(vals)
    xs = np.unique(allv)
    f_all = np.searchsorted(np.sort(allv), xs, side="right")
    for i, g in enumerate(groups):
        fg = np.searchsorted(np.sort(vals[i]), xs, side="right")
        exp_num = int(np.abs(fg * (n - sizes[i]) - (f_all - fg) * sizes[i]).max())
        assert int(out.loc[out["group"] == g, "ks_num"].iloc[0]) == exp_num


def test_ks_group_vs_rest_empty(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import ks_group_vs_rest

    empty = pd.DataFrame({"v": [np.nan], "g": ["a"]})
    out = ks_group_vs_rest(rd.from_pandas(empty), "v", "g")
    assert len(out) == 0


def test_mannwhitney_matches_scipy_formula(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import mannwhitney_u

    rng = np.random.default_rng(23)
    v0 = np.round(rng.normal(0, 1, 250), 1)
    v1 = np.round(rng.normal(0.4, 1.1, 180), 1)
    df = pd.DataFrame(
        {
            "v": np.concatenate([v0, v1]),
            "h": np.concatenate([np.zeros(250), np.ones(180)]).astype("int64"),
        }
    )
    res = mannwhitney_u(rd.from_pandas(df).repartition(5), "v", "h", num_buckets=8)
    assert (res["n0"], res["n1"]) == (250, 180)

    # brute force with midranks
    allv = np.concatenate([v0, v1])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv), dtype=np.float64)
    sv = allv[order]
    i = 0
    r = 1
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2.0
        r += j - i
        i = j
    r1 = ranks[250:].sum()
    exp_two_u1 = int(round(2 * r1)) - 180 * 181
    assert res["two_u1"] == exp_two_u1

    _, cnt = np.unique(allv, return_counts=True)
    assert res["tie_sum"] == int((cnt * (cnt * cnt - 1)).sum())


def test_spearman_matches_bruteforce(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import spearman_rho

    rng = np.random.default_rng(31)
    x = rng.integers(0, 12, 400).astype("float64")  # heavy ties
    y = x * 2 + np.round(rng.normal(0, 3, 400), 1)
    y[5] = np.nan  # dropped pair
    df = pd.DataFrame({"x": x, "y": y})
    res = spearman_rho(rd.from_pandas(df).repartition(5), "x", "y", num_buckets=8)
    assert res["n"] == 399

    m = df.dropna()
    exp = m["x"].rank().corr(m["y"].rank())  # pandas midranks Pearson
    assert res["rho"] == pytest.approx(exp, abs=1e-12)


def test_weighted_grouped_quantiles_bruteforce(ray_session):
    """Exact weighted lower quantiles per group vs an O(n log n) driver
    reference, including duplicate values and single-row groups."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import weighted_grouped_quantiles

    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(0, 50, n).astype("float64"),  # heavy ties
            "w": rng.integers(1, 9, n).astype("int64"),
        }
    )
    df = pd.concat(
        [df, pd.DataFrame({"k": ["solo"], "v": [3.5], "w": [2]})], ignore_index=True
    )
    qs = [(1, 4), (1, 2), (9, 10)]
    got = weighted_grouped_quantiles(rd.from_pandas(df), "k", "v", "w", qs)

    for k, grp in df.groupby("k"):
        g = grp.groupby("v", as_index=False)["w"].sum().sort_values("v")
        cum = g["w"].cumsum().to_numpy()
        tot = int(cum[-1])
        for qn, qd in qs:
            pos = int(np.searchsorted(cum * qd, qn * tot, side="left"))
            want = float(g["v"].to_numpy()[min(pos, len(g) - 1)])
            row = got[(got["k"] == k) & (got["q_num"] == qn) & (got["q_den"] == qd)]
            assert len(row) == 1 and float(row["wq"].iloc[0]) == want, (k, qn, qd)


def test_kendall_tau_b_matches_bruteforce(ray_session):
    import math

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import kendall_tau_b

    rng = np.random.default_rng(17)
    n = 800
    x = rng.integers(0, 12, n)
    y = np.clip(x + rng.integers(-4, 5, n), 0, 15)  # correlated, heavy ties
    df = pd.DataFrame({"x": x.astype("int64"), "y": y.astype("int64")})
    res = kendall_tau_b(rd.from_pandas(df).repartition(5), "x", "y")

    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, k=1)
    prod = dx[iu] * dy[iu]
    nc, nd = int((prod > 0).sum()), int((prod < 0).sum())
    n0 = n * (n - 1) // 2
    n1 = int((dx[iu] == 0).sum())
    n2 = int((dy[iu] == 0).sum())
    assert res["n"] == n and res["s"] == nc - nd
    assert res["n0"] == n0 and res["n1"] == n1 and res["n2"] == n2
    want = (nc - nd) / math.sqrt(float(n0 - n1) * float(n0 - n2))
    assert res["tau_b"] == want


def test_wasserstein_group_vs_rest_bruteforce(ray_session):
    """W1 numerators vs a brute-force scipy-free oracle on random data."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import wasserstein_group_vs_rest

    rng = np.random.RandomState(3)
    n = 2000
    g = rng.choice(["a", "b", "c"], n)
    v = np.round(rng.normal(50, 20, n), 2)
    v[g == "c"] += 30  # drifted segment
    df = pd.DataFrame({"g": g, "v": v})
    got = wasserstein_group_vs_rest(
        rd.from_pandas(df).repartition(4), "v", "g", num_buckets=16
    ).set_index("group")

    x = np.floor(v * 100).astype(np.int64)
    for grp in ["a", "b", "c"]:
        sel = g == grp
        n_g, n_r = int(sel.sum()), int((~sel).sum())
        uniq = np.unique(x)
        cg = np.searchsorted(np.sort(x[sel]), uniq, side="right")
        cr = np.searchsorted(np.sort(x[~sel]), uniq, side="right")
        num = np.abs(cg * n_r - cr * n_g)
        want = int((num[:-1] * np.diff(uniq)).sum())
        assert int(got.loc[grp, "w1_num"]) == want
        assert int(got.loc[grp, "n_g"]) == n_g
    # the drifted segment must dominate the normalized distance
    w1 = {
        grp: got.loc[grp, "w1_num"] / (100.0 * got.loc[grp, "n_g"] * (n - got.loc[grp, "n_g"]))
        for grp in ["a", "b", "c"]
    }
    assert w1["c"] > w1["a"] and w1["c"] > w1["b"]


def test_kuiper_group_vs_rest_bruteforce(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.quantiles import kuiper_group_vs_rest

    rng = np.random.RandomState(11)
    n = 1500
    g = rng.choice(["a", "b"], n)
    v = np.round(rng.normal(0, 10, n), 2)
    v[g == "b"] = np.abs(v[g == "b"])  # tail-asymmetric drift
    df = pd.DataFrame({"g": g, "v": v})
    got = kuiper_group_vs_rest(
        rd.from_pandas(df).repartition(3), "v", "g", num_buckets=8
    ).set_index("group")

    uniq = np.unique(v)
    for grp in ["a", "b"]:
        sel = g == grp
        n_g, n_r = int(sel.sum()), int((~sel).sum())
        cg = np.searchsorted(np.sort(v[sel]), uniq, side="right")
        cr = np.searchsorted(np.sort(v[~sel]), uniq, side="right")
        signed = cg * n_r - cr * n_g
        want = max(0, int(signed.max())) + max(0, int((-signed).max()))
        assert int(got.loc[grp, "v_num"]) == want
        assert int(got.loc[grp, "n_g"]) == n_g


def test_kruskal_rank_sums_vs_bruteforce(ray_session):
    """2*R_g + tie3 from the distributed path == brute-force midranks, and
    the assembled H statistic matches a direct computation."""
    import perfect_bloomfilter_ray.pipelines.extras as ex

    out = ex.kruskal_rank_sums_per_type("/root/testdata/sf0.001").set_index("event_type")

    import duckdb

    df = duckdb.sql(
        "SELECT event_type, value FROM '/root/testdata/sf0.001/events.parquet' "
        "WHERE value IS NOT NULL"
    ).df()
    v = df["value"].to_numpy()
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v))
    # midranks
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(v)
    tie3 = 0
    for _, c in pd.Series(v).value_counts().items():
        tie3 += c**3 - c
    h = 0.0
    for g, sub in df.groupby("event_type"):
        rg = ranks[df["event_type"].to_numpy() == g].sum()
        n_g = len(sub)
        assert int(out.loc[g, "r2g"]) == int(round(2 * rg))
        assert int(out.loc[g, "n_g"]) == n_g
        h += rg * rg / n_g
    assert int(out["tie3"].iloc[0]) == tie3
    h = 12.0 / (n * (n + 1.0)) * h - 3.0 * (n + 1.0)
    h_corr = h / (1.0 - tie3 / float(n**3 - n))
    # assemble H from the query's integers the documented way
    r2g = out["r2g"].to_numpy().astype(float)
    n_gs = out["n_g"].to_numpy().astype(float)
    h2 = 12.0 / (n * (n + 1.0)) * ((r2g / 2.0) ** 2 / n_gs).sum() - 3.0 * (n + 1.0)
    h2_corr = h2 / (1.0 - int(out["tie3"].iloc[0]) / float(n**3 - n))
    assert abs(h2_corr - h_corr) < 1e-9
    assert h2_corr > 0


def test_minmax_normalize_bounds_and_nulls(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.agg import minmax_normalize

    df = pd.DataFrame(
        {"k": ["a"] * 4 + ["b"] * 2 + ["c"], "v": [1.0, 3.0, 2.0, 5.0, 7.0, 7.0, 9.0]}
    )
    out = minmax_normalize(rd.from_pandas(df), "k", "v").to_pandas()
    a = out[out["k"] == "a"].sort_values("v")["scaled"].tolist()
    assert a == [0.0, 0.25, 0.5, 1.0]
    # zero-span group and singleton group -> null
    assert out[out["k"] == "b"]["scaled"].isna().all()
    assert out[out["k"] == "c"]["scaled"].isna().all()
