"""Round-3 operators: AMS F2 sketch, blocked hamming pairs, global top-k,
Bloom-prefiltered decontamination, empty-small-side broadcast join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from perfect_bloomfilter_ray.state.ams import AMSSketch


def _skewed_keys(n: int, seed: int = 7) -> np.ndarray:
    """Zipf-ish keys: heavy hitters + a long tail (the F2-hard shape)."""
    rng = np.random.default_rng(seed)
    return (rng.zipf(1.3, n) % 5000).astype(np.int64)


def _exact_f2(keys: np.ndarray) -> int:
    _, counts = np.unique(keys, return_counts=True)
    return int((counts.astype(np.int64) ** 2).sum())


class TestAMS:
    def test_estimate_within_bound(self):
        keys = _skewed_keys(50_000)
        s = AMSSketch(width=2048, depth=5)
        s.update_column(pa.array(keys))
        f2 = _exact_f2(keys)
        est = s.estimate_f2()
        assert abs(est - f2) <= 5 * s.rel_error * f2
        assert s.total == len(keys)

    def test_merge_exact_state_any_order(self):
        keys = _skewed_keys(30_000, seed=11)
        chunks = np.array_split(keys, 7)

        def build(order):
            parts = []
            for c in chunks:
                p = AMSSketch(width=512, depth=4)
                p.update_column(pa.array(c))
                parts.append(p)
            acc = AMSSketch(width=512, depth=4)
            for i in order:
                acc.merge(parts[i])
            return acc

        a = build(range(7))
        b = build(reversed(range(7)))
        # linear sketch: merge is elementwise add -> byte-exact in ANY order
        assert np.array_equal(a.counters, b.counters)
        whole = AMSSketch(width=512, depth=4)
        whole.update_column(pa.array(keys))
        assert np.array_equal(a.counters, whole.counters)

    def test_weighted_updates_match_repetition(self):
        keys = np.array([1, 2, 3, 2], dtype=np.int64)
        w = np.array([3, 1, 2, 1], dtype=np.int64)
        a = AMSSketch(width=256, depth=3)
        a.update_column(pa.array(keys), weights=w)
        b = AMSSketch(width=256, depth=3)
        b.update_column(pa.array(np.repeat(keys, w)))
        assert np.array_equal(a.counters, b.counters)

    def test_roundtrip_and_shape_guard(self):
        s = AMSSketch(width=256, depth=3)
        s.update_column(pa.array([1, 2, 3]))
        r = AMSSketch.from_bytes(s.to_bytes())
        assert np.array_equal(r.counters, s.counters) and r.total == s.total
        with pytest.raises(ValueError):
            s.merge(AMSSketch(width=512, depth=3))
        with pytest.raises(ValueError):
            AMSSketch(width=100)


class TestBlockedHammingPairs:
    def _brute(self, df: pd.DataFrame, prefix_len=8, max_dist=2):
        pad = "~"
        pfx = (
            df["text"]
            .fillna("")
            .str.lower()
            .str.slice(0, prefix_len)
            .str.pad(prefix_len, side="right", fillchar=pad)
        )
        out = []
        rows = list(zip(df["doc_id"], df["blk"], pfx))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][1] != rows[j][1]:
                    continue
                d = sum(a != b for a, b in zip(rows[i][2], rows[j][2]))
                if d <= max_dist:
                    a, b = sorted((rows[i][0], rows[j][0]))
                    out.append((a, b, d))
        return sorted(out)

    def test_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.fuzzy import blocked_hamming_pairs

        rng = np.random.default_rng(3)
        base = ["hello world document", "hellp world document", "açai bérry smoothie",
                "açaí bérry smoothie", "totally different text", "hello worle document"]
        n = 120
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [base[rng.integers(len(base))] + str(rng.integers(3)) for _ in range(n)],
                "blk": rng.integers(0, 3, n).astype(np.int64),
            }
        )
        df.loc[5, "text"] = None  # null text -> all-pad prefix
        ds = rd.from_pandas(df).repartition(6)
        got = (
            blocked_hamming_pairs(ds, "doc_id", "text", ["blk"], prefix_len=8, max_dist=2)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
        )
        got_t = sorted(zip(got["id_a"], got["id_b"], got["dist"]))
        assert got_t == self._brute(df)

    def test_multibyte_chars_count_one_position(self, ray_session):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.fuzzy import blocked_hamming_pairs

        df = pd.DataFrame(
            {
                "doc_id": np.array([1, 2], dtype=np.int64),
                "text": ["日本語のテキスト", "日本語のテキスl"],
                "blk": np.array([0, 0], dtype=np.int64),
            }
        )
        out = blocked_hamming_pairs(
            rd.from_pandas(df), "doc_id", "text", ["blk"], prefix_len=8, max_dist=3
        ).to_pandas()
        assert len(out) == 1 and int(out["dist"].iloc[0]) == 1


class TestGlobalTopK:
    def test_matches_sorted_head(self, ray_session):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.topk import global_top_k

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "id": np.arange(500, dtype=np.int64),
                "v": rng.integers(0, 40, 500).astype(np.int64),  # heavy ties
            }
        )
        ds = rd.from_pandas(df).repartition(8)
        got = global_top_k(ds, "v", 25, descending=True, tie_cols=["id"]).to_pandas()
        exp = df.sort_values(["v", "id"], ascending=[False, True]).head(25)
        pd.testing.assert_frame_equal(
            got.sort_values(["v", "id"], ascending=[False, True]).reset_index(drop=True),
            exp.reset_index(drop=True),
        )

    def test_k_larger_than_input(self, ray_session):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.topk import global_top_k

        df = pd.DataFrame({"id": np.arange(7, dtype=np.int64), "v": np.arange(7)[::-1].astype(np.int64)})
        got = global_top_k(rd.from_pandas(df).repartition(3), "v", 100).to_pandas()
        assert len(got) == 7


class TestBloomDecontaminate:
    def test_matches_exact_path(self, ray_session, sf_dir):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.decontam import (
            build_blocklist,
            decontaminate,
            decontaminate_bloom,
        )

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = docs.to_pandas()
        bench_mask = (ids["doc_id"] * 2654435761) % 10 == 3
        bench = rd.from_pandas(ids[bench_mask])
        corp = rd.from_pandas(ids[~bench_mask])

        exact = decontaminate(corp, build_blocklist(bench, "text", n=5), n=5, drop=False)
        bloom = decontaminate_bloom(corp, bench, n=5, drop=False)
        e = exact.to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = bloom.to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_series_equal(e["contaminated"], b["contaminated"])
        assert e["contaminated"].any()  # the fixture corpus has real hits

    def test_drop_variant(self, ray_session, sf_dir):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.decontam import decontaminate_bloom

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        df = docs.to_pandas()
        bench = rd.from_pandas(df[(df["doc_id"] * 2654435761) % 10 == 3])
        corp = rd.from_pandas(df[(df["doc_id"] * 2654435761) % 10 != 3])
        flagged = decontaminate_bloom(corp, bench, n=5, drop=False).to_pandas()
        dropped = decontaminate_bloom(corp, bench, n=5, drop=True).to_pandas()
        assert len(dropped) == int((~flagged["contaminated"]).sum())


def test_broadcast_join_empty_small_side(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    big = rd.from_pandas(pd.DataFrame({"k": np.arange(10, dtype=np.int64)}))
    small = rd.from_pandas(
        pd.DataFrame({"k": np.array([7], dtype=np.int64), "v": np.array([1], dtype=np.int64)})
    ).map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    assert len(broadcast_lookup_join(big, small, on="k").to_pandas()) == 0
    left = broadcast_lookup_join(big, small, on="k", how="left").to_pandas()
    assert len(left) == 10 and left["v"].isna().all()


class TestUnionByName:
    def test_pads_missing_columns(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.setops import union_by_name

        a = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()), "x": pa.array(["a", "b"])}))
        b = rd.from_arrow(pa.table({"id": pa.array([3], pa.int64()), "y": pa.array([9.5])}))
        u = union_by_name(a, b).to_pandas().sort_values("id").reset_index(drop=True)
        assert list(u.columns) == ["id", "x", "y"]
        assert u["x"].isna().tolist() == [False, False, True]
        assert u["y"].isna().tolist() == [True, True, False]

    def test_type_conflict_raises(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.setops import union_by_name

        a = rd.from_arrow(pa.table({"id": pa.array([1], pa.int64())}))
        b = rd.from_arrow(pa.table({"id": pa.array(["1"])}))
        with pytest.raises(ValueError, match="type conflict"):
            union_by_name(a, b)


class TestCrossJoinBroadcast:
    def test_matches_pandas_cross(self, ray_session):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.joins import cross_join_broadcast

        a = pd.DataFrame({"x": np.arange(7, dtype=np.int64), "s": [f"r{i}" for i in range(7)]})
        b = pd.DataFrame({"y": np.arange(3, dtype=np.int64)})
        got = (
            cross_join_broadcast(rd.from_pandas(a).repartition(3), rd.from_pandas(b))
            .to_pandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        exp = a.merge(b, how="cross").sort_values(["x", "y"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    def test_size_cap(self, ray_session):
        import ray.data as rd

        from perfect_bloomfilter_ray.stages.joins import cross_join_broadcast

        big = rd.from_pandas(pd.DataFrame({"x": [1]}))
        small = pd.DataFrame({"y": np.arange(70000, dtype=np.int64)})
        import pyarrow as pa_

        with pytest.raises(ValueError, match="cap"):
            cross_join_broadcast(big, pa_.Table.from_pandas(small))


def test_compression_ratio_quality_signal():
    from perfect_bloomfilter_ray.functions.text import compression_ratio

    rep = "spam template line " * 120
    prose = (
        "A different thought each clause: rivers bend, markets clear, gulls "
        "wheel over the harbor while the ferry horn argues with the fog. "
        "Numbers 4821 and 977 anchor novelty; zephyr quartz vex jumbo glyph."
    )
    r = compression_ratio(pa.array([rep, prose, ""])).to_pylist()
    assert r[0] < 0.1          # boilerplate repetition compresses hard
    assert 0.3 < r[1] < 1.0    # prose sits in the normal band
    assert r[2] == 1.0         # empty doc: defined as 1.0
    # deterministic: same input, same exact floats
    assert compression_ratio(pa.array([rep, prose, ""])).to_pylist() == r


def test_decayed_cms_tracks_exact(ray_session, sf01_dir):
    """CMS with integer micro-unit decay weights answers within eps*total of
    the exact decayed scores (the cms_decayed_heavy_users contract)."""
    from perfect_bloomfilter_ray.pipelines.queries import (
        cms_decayed_heavy_users,
        decayed_user_scores_exact,
    )

    exact = decayed_user_scores_exact(sf01_dir).set_index("user_id")["decayed_score"]
    est = cms_decayed_heavy_users(sf01_dir).set_index("user_id")["decayed_score_est"]
    # eps=1e-4 of the total weight: total <= n_events (weights <= 1)
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{sf01_dir}/events.parquet").num_rows
    bound = 1e-4 * n_events + 1e-3  # sketch eps*total + micro-unit rounding
    for uid, score in exact.items():
        if uid in est.index:
            assert est.loc[uid] >= score - 1e-3  # CMS never underestimates (mod rounding)
            assert est.loc[uid] <= score + bound


def test_mutual_nn_pairs_reciprocal_sf0001(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["mutual_nn_pairs"]("/root/testdata/sf0.001")
    # pairs are ordered, unique, and by construction reciprocal top-1s
    assert (out["id_a"] < out["id_b"]).all()
    assert not out.duplicated().any()


def test_hourly_profile_cosine_bounds_sf0001(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["event_type_hourly_profile_cosine"]("/root/testdata/sf0.001")
    assert len(out) == 10  # C(5,2) type pairs
    assert ((out["cosine"] >= 0) & (out["cosine"] <= 1.0000000001)).all()
    assert (out["dot"] >= 0).all()


def test_cluster_sample_keeps_whole_users_sf0001(ray_session):
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["cluster_sampled_event_stats"]("/root/testdata/sf0.001")
    # totals equal a whole-user slice of the corpus: per-user event counts in
    # the sample match the full corpus for every sampled user
    full = duckdb.sql("""
        SELECT CAST(count(*) AS BIGINT) n FROM read_parquet('/root/testdata/sf0.001/events.parquet')
        WHERE (user_id * 2654435761) % 5 = 0
    """).fetchone()[0]
    assert int(out["n"].sum()) == int(full)


def test_degree_assortativity_matches_numpy_pearson(ray_session):
    """Stage moments equal brute-force Pearson over oriented incidences."""
    import numpy as np
    import pandas as pd
    import ray

    from perfect_bloomfilter_ray.stages.graph import degree_assortativity

    rng = np.random.default_rng(7)
    x = rng.integers(0, 40, 300)
    y = rng.integers(0, 40, 300)
    keep = x != y
    a, b = np.minimum(x, y)[keep], np.maximum(x, y)[keep]
    edges = pd.DataFrame({"x": a, "y": b}).drop_duplicates()
    res = degree_assortativity(ray.data.from_pandas(edges), "x", "y")
    # brute force: degree map, oriented incidence pairs, numpy corrcoef
    deg = {}
    for u, v in zip(edges["x"], edges["y"]):
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    dx = np.array(
        [deg[u] for u, v in zip(edges["x"], edges["y"])]
        + [deg[v] for u, v in zip(edges["x"], edges["y"])],
        dtype=np.float64,
    )
    dy = np.array(
        [deg[v] for u, v in zip(edges["x"], edges["y"])]
        + [deg[u] for u, v in zip(edges["x"], edges["y"])],
        dtype=np.float64,
    )
    assert res["n"] == 2 * len(edges)
    assert res["sx"] == int(dx.sum())
    assert res["sxx"] == int((dx * dx).sum())
    assert res["sxy"] == int(2 * (dx[: len(edges)] * dy[: len(edges)]).sum())
    r_np = np.corrcoef(dx, dy)[0, 1]
    assert abs(res["assortativity"] - r_np) < 1e-9


def test_degree_assortativity_star_is_minus_one(ray_session):
    """A star graph is perfectly disassortative (r = -1)."""
    import pandas as pd
    import ray

    from perfect_bloomfilter_ray.stages.graph import degree_assortativity

    edges = pd.DataFrame({"x": [0, 0, 0, 0], "y": [1, 2, 3, 4]})
    res = degree_assortativity(ray.data.from_pandas(edges), "x", "y")
    assert abs(res["assortativity"] - (-1.0)) < 1e-12


def test_event_type_reciprocity_bounds_sf0001(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["event_type_reciprocity"]("/root/testdata/sf0.001")
    row = out.iloc[0]
    # reciprocal edges come in (a,b)/(b,a) pairs, so the count is even
    assert int(row["n_reciprocal"]) % 2 == 0
    assert 0 <= int(row["n_reciprocal"]) <= int(row["n_edges"])
    assert 0.0 <= float(row["reciprocity"]) <= 1.0


def test_lang_lexical_diversity_invariants_sf0001(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["lang_lexical_diversity"]("/root/testdata/sf0.001")
    assert len(out) == 5  # one row per language
    assert (out["n_hapax"] <= out["n_types"]).all()
    assert (out["n_types"] <= out["n_tokens"]).all()
    assert ((out["ttr"] > 0) & (out["ttr"] <= 1)).all()


def test_link_prediction_matches_bruteforce(ray_session):
    """Stage top-k equals a brute-force common-neighbor census."""
    import numpy as np
    import pandas as pd
    import ray

    from perfect_bloomfilter_ray.stages.graph import link_prediction_scores

    rng = np.random.default_rng(11)
    x = rng.integers(0, 30, 150)
    y = rng.integers(0, 30, 150)
    keep = x != y
    a, b = np.minimum(x, y)[keep], np.maximum(x, y)[keep]
    edges = pd.DataFrame({"x": a, "y": b}).drop_duplicates().reset_index(drop=True)
    out = link_prediction_scores(ray.data.from_pandas(edges), "x", "y", k=10)

    nbrs: dict[int, set] = {}
    for u, v in zip(edges["x"], edges["y"]):
        nbrs.setdefault(int(u), set()).add(int(v))
        nbrs.setdefault(int(v), set()).add(int(u))
    eset = set(zip(edges["x"].astype(int), edges["y"].astype(int)))
    rows = []
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in eset:
                continue
            cn = len(nbrs[u] & nbrs[v])
            if cn > 0:
                rows.append((u, v, cn, len(nbrs[u]), len(nbrs[v])))
    brute = pd.DataFrame(rows, columns=["node_a", "node_b", "cn", "deg_a", "deg_b"])
    brute = brute.sort_values(
        ["cn", "node_a", "node_b"], ascending=[False, True, True]
    ).head(10).reset_index(drop=True)
    assert out[["node_a", "node_b", "cn", "deg_a", "deg_b"]].equals(brute)
    exp_j = brute["cn"] / (brute["deg_a"] + brute["deg_b"] - brute["cn"])
    assert np.allclose(out["jaccard"], exp_j)


def test_value_purchase_stump_counts_consistent(ray_session):
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["value_purchase_stump"]("/root/testdata/sf0.001").iloc[0]
    tot = duckdb.sql(
        "SELECT count(*) n, sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) p "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet') WHERE value IS NOT NULL"
    ).fetchone()
    assert int(out["n_left"]) + int(out["n_right"]) == int(tot[0])
    assert int(out["pos_left"]) + int(out["pos_right"]) == int(tot[1])
    assert int(out["n_left"]) > 0 and int(out["n_right"]) > 0


def test_bm25_scores_ranked_and_positive_tf(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["bm25_doc_search"]("/root/testdata/sf0.001")
    assert len(out) == 25
    s = out["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()  # non-increasing
    # every retrieved doc matches at least one query term
    assert ((out["tf_hash"] + out["tf_join"] + out["tf_scan"]) > 0).all()


def test_dgim_error_bound_and_exact_cover():
    """DGIM(k) window estimates stay within the 1/(2(k-1)) relative bound
    and are exact when the window covers the whole stream."""
    import numpy as np

    from perfect_bloomfilter_ray.state.dgim import DGIM

    rng = np.random.default_rng(3)
    ts = np.cumsum(rng.integers(1, 20, 5000)).astype(np.int64)
    for k in (4, 8):
        d = DGIM(k=k)
        for x in ts:
            d.insert(int(x))
        for since in [int(ts[-1]) - w for w in (50, 500, 5000, 50000)]:
            exact = int((ts >= since).sum())
            est = d.query(since)
            if exact > 0:
                assert abs(est - exact) <= max(1, exact / (2 * (k - 1)) + 1), (k, since)
        assert d.query(int(ts[0])) == len(ts)  # full-cover: exact
        # O(k log n) buckets, not O(n)
        assert d.n_buckets() <= (k + 1) * (int(np.log2(len(ts))) + 2)


def test_dgim_query_est_close_to_exact(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["dgim_sliding_event_counts"]("/root/testdata/sf0.001")
    assert len(out) == 5
    for _, r in out.iterrows():
        exact = int(r["exact_last_hour"])
        assert abs(int(r["est_last_hour"]) - exact) <= max(1, exact / 6 + 1)
        assert int(r["n_buckets"]) <= 5 * 64  # log-scale state


def test_graph_eccentricity_sweep_property(ray_session):
    """2-sweep on a path graph finds the exact diameter; far ecc >= src ecc."""
    import pandas as pd
    import ray

    from perfect_bloomfilter_ray.stages.graph import bfs_levels

    edges = pd.DataFrame({"x": [1, 2, 3, 4], "y": [2, 3, 4, 5]})
    eds = ray.data.from_pandas(edges)
    d1 = bfs_levels(eds, 3, "x", "y", max_depth=6)  # middle: ecc 2
    far = int(d1.sort_values(["dist", "node"], ascending=[False, True]).iloc[0]["node"])
    d2 = bfs_levels(eds, far, "x", "y", max_depth=6)
    assert int(d1["dist"].max()) == 2
    assert int(d2["dist"].max()) == 4  # exact diameter of P5


def test_pps_sample_matches_bruteforce(ray_session):
    """Distributed bucket prefix-sum selection equals the single-array rule."""
    import numpy as np
    import pandas as pd
    import ray

    from perfect_bloomfilter_ray.stages.topk import pps_systematic_sample

    rng = np.random.default_rng(5)
    k = np.sort(rng.choice(100000, 3000, replace=False)).astype(np.int64)
    w = rng.integers(1, 10000, 3000).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"key": k, "wt": w})).repartition(8)
    out = pps_systematic_sample(ds, "key", "wt", m=50)
    cum = w.cumsum()
    tot = int(cum[-1])
    sel = (cum * 50) // tot > ((cum - w) * 50) // tot
    assert out["k"].tolist() == k[sel].tolist()
    assert out["w"].tolist() == w[sel].tolist()
    assert len(out) <= 50
    # any row heavier than one stratum is always selected
    heavy = w > tot // 50
    assert set(k[heavy]).issubset(set(out["k"]))


def test_lag_correlation_bounds(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["view_click_lag_correlation"]("/root/testdata/sf0.001")
    assert out["lag"].tolist() == [0, 1, 2, 3]
    assert (out["corr"].abs() <= 1.0 + 1e-12).all()
    assert (out["n"] > 0).all()


def test_isotonic_fit_matches_bruteforce_pava(ray_session):
    import numpy as np

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["hourly_value_isotonic"]("/root/testdata/sf0.001")
    f = out["fitted_mean_cents"].to_numpy()
    n = out["n"].to_numpy().astype(np.float64)
    s = out["cents_sum"].to_numpy().astype(np.float64)
    # monotone nondecreasing and weighted-mean preserving
    assert (np.diff(f) >= -1e-12).all()
    assert abs((f * n).sum() - s.sum()) < 1e-6 * max(1.0, abs(s.sum()))
    # brute-force PAVA (repeated full scans until no violators)
    fs = s / n
    ws = n.copy()
    groups = [[i] for i in range(len(fs))]
    vals = list(fs)
    wts = list(ws)
    changed = True
    while changed:
        changed = False
        for i in range(len(vals) - 1):
            if vals[i] > vals[i + 1] + 0:
                tw = wts[i] + wts[i + 1]
                tv = (vals[i] * wts[i] + vals[i + 1] * wts[i + 1]) / tw
                vals[i : i + 2] = [tv]
                wts[i : i + 2] = [tw]
                groups[i : i + 2] = [groups[i] + groups[i + 1]]
                changed = True
                break
    brute = np.empty(len(fs))
    for g, v in zip(groups, vals):
        for idx in g:
            brute[idx] = v
    assert np.allclose(f, brute, rtol=1e-9)


def test_xor8_contract_and_fp_rate():
    import numpy as np

    from perfect_bloomfilter_ray.state.xorfilter import Xor8

    rng = np.random.default_rng(2)
    keys = np.unique(rng.integers(0, 2**63, 50000, dtype=np.int64).astype(np.uint64))
    f = Xor8(keys)
    assert f.contains(keys).all()  # zero false negatives, always
    fresh = rng.integers(2**63, 2**64 - 1, 100000, dtype=np.uint64)
    fresh = fresh[~np.isin(fresh, keys)]
    fp = f.contains(fresh).mean()
    assert fp < 3.0 / 256  # ~1/256 expected
    # serialization roundtrip and build determinism
    g = Xor8.from_state(f.to_state())
    assert g.contains(keys).all()
    h = Xor8(keys)
    assert h.seed == f.seed and (h.cells == f.cells).all()
    # space: ~9.84 bits/key
    assert 8 * len(f.cells) <= 11 * len(keys)


def test_xor8_tiny_sets():
    import numpy as np

    from perfect_bloomfilter_ray.state.xorfilter import Xor8

    for n in (0, 1, 2, 3, 7):
        keys = (np.arange(n, dtype=np.uint64) + 17) * np.uint64(0x9E3779B97F4A7C15)
        f = Xor8(keys)
        if n:
            assert f.contains(keys).all()
        assert not Xor8.from_state(f.to_state()).contains(
            np.array([0xDEAD], dtype=np.uint64)
        ).any() or n > 0  # empty filter rejects everything


def test_modularity_matches_bruteforce_formula(ray_session):
    """Q from the query's integer numerator equals the textbook float sum."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES, ORACLE_SQL

    out = QUERIES["part_community_modularity"]("/root/testdata/sf0.001").iloc[0]
    assert -0.5 <= float(out["modularity"]) <= 1.0
    # recompute Q = ein/m - sum((dc/2m)^2) from the oracle's own CTEs
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    q = con.execute(ORACLE_SQL["part_community_modularity"]).fetchdf().iloc[0]
    assert int(q["q_num"]) == int(out["q_num"])
    m = int(out["m"])
    assert float(out["modularity"]) == float(int(out["q_num"])) / (4.0 * m * m)
    # textbook per-community sum agrees with the single-fraction form
    con.execute(
        "CREATE VIEW l2 AS SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey % 4 = 0"
    )
    ein = int(out["intra_edges"])
    sd2 = 4 * m * ein - int(out["q_num"])
    assert abs(float(out["modularity"]) - (ein / m - sd2 / (4.0 * m * m))) < 1e-12


def test_changepoint_is_global_sse_argmin(ray_session):
    """The reported split beats every other split's SSE (brute force)."""
    import duckdb
    import numpy as np

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["hourly_changepoint"]("/root/testdata/sf0.001").iloc[0]
    hc = duckdb.sql(
        "SELECT date_trunc('hour', ts) h, count(*) x FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    x = hc["x"].to_numpy().astype(np.int64)
    best = None
    for i in range(1, len(x)):
        l, r = x[:i].astype(np.float64), x[i:].astype(np.float64)
        sse = (l * l).sum() - l.sum() ** 2 / len(l) + (r * r).sum() - r.sum() ** 2 / len(r)
        if best is None or sse < best - 1e-9:
            best = sse
    assert abs(float(out["sse"]) - best) < 1e-6 * max(1.0, abs(best))
    assert int(out["n_left"]) + int(out["n_right"]) == len(x)


def test_knn_loo_counts_consistent(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["knn_loo_label_accuracy"]("/root/testdata/sf0.001")
    assert (out["correct"] <= out["n"]).all()
    assert ((out["acc"] >= 0) & (out["acc"] <= 1)).all()
    # every 5th vec_id is classified exactly once
    import duckdb

    nq = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet') "
        "WHERE vec_id % 5 = 0"
    ).fetchone()[0]
    assert int(out["n"].sum()) == int(nq)


def test_sequential_poisson_weighted_inclusion(ray_session):
    """Heavier rows are overrepresented vs their population share."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["orders_sequential_poisson_sample"]("/root/testdata/sf0.001")
    assert len(out) == 100
    assert not out["o_orderkey"].duplicated().any()
    pop = duckdb.sql(
        "SELECT avg(o_totalprice) FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchone()[0]
    # PPS: the sample's mean weight exceeds the population mean price
    assert out["w"].mean() / 100.0 > pop


def test_dp_noisy_counts_calibrated_and_rerun_stable(ray_session):
    import numpy as np

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    a = QUERIES["dp_noisy_event_counts"]("/root/testdata/sf0.001")
    b = QUERIES["dp_noisy_event_counts"]("/root/testdata/sf0.001")
    assert np.array_equal(a["n_noisy"].to_numpy(), b["n_noisy"].to_numpy())
    # Laplace(b=2): P(|noise| > 20) = exp(-10) ~ 4.5e-5 — never for 5 draws
    assert (a["noise"].abs() < 20).all()
    assert np.allclose(a["n_noisy"], a["n_exact"] + a["noise"])


def test_l_diversity_consistent_with_duckdb(ray_session):
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["l_diversity_report"]("/root/testdata/sf0.001").iloc[0]
    tot = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert int(out["total_rows"]) == int(tot)
    assert 1 <= int(out["min_l"]) <= 5


def test_hopping_windows_sum_to_triple_total(ray_session):
    """Every hour lands in exactly 3 windows, so window totals sum to 3x."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["hopping_window_event_totals"]("/root/testdata/sf0.001")
    tot = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert int(out["n_events"].sum()) == 3 * int(tot)


def test_ensemble_census_set_algebra(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    r = QUERIES["ensemble_er_pair_census"]("/root/testdata/sf0.001").iloc[0]
    assert int(r["n_union"]) == int(r["n_sorted_neighborhood"]) + int(r["n_ppjoin"]) - int(r["n_both"])
    assert int(r["n_both"]) <= min(int(r["n_sorted_neighborhood"]), int(r["n_ppjoin"]))


def test_time_decay_shares_sum_to_one(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["time_decay_attribution"]("/root/testdata/sf0.001")
    assert set(out["event_type"]) <= {"view", "click"}
    assert abs(out["share"].sum() - 1.0) < 1e-12
    assert (out["credit"] > 0).all()


def test_phash_dedup_finds_every_identical_payload(ray_session):
    """Byte-identical payloads MUST pair at Hamming 0 (stub codec is
    deterministic in the payload)."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["image_phash_dedup_pairs"]("/root/testdata/sf0.001")
    zero = out[out["hamming"] == 0]
    pairs = set(zip(zero["id_a"], zero["id_b"]))
    exp = duckdb.sql(
        "SELECT doc_id FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id % 50 = 0 ORDER BY doc_id"
    ).fetchdf()["doc_id"]
    for d in exp:
        assert (int(d), int(d) + 1_000_000) in pairs, d
    assert (out["hamming"] <= 6).all()


def test_cuped_reduces_to_plain_means_at_theta_terms(ray_session):
    """Adjusted means recombine exactly: Σ_v n_v·(mean_adj_v) folds back to
    the pooled mean of y (CUPED preserves the overall average)."""
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["cuped_ab_analysis"]("/root/testdata/sf0.001")
    assert len(out) == 2 and set(out["variant"]) == {0, 1}
    n = out["n_users"].to_numpy().astype(float)
    # pooled adjusted mean equals pooled raw mean (Σ n_v θ (x̄_v - x̄) = 0)
    pooled_adj = (out["mean_y_cuped"].to_numpy() * n).sum() / n.sum()
    pooled_raw = out["post_purchase_cents"].sum() / n.sum()
    assert abs(pooled_adj - pooled_raw) < 1e-6 * max(1.0, abs(pooled_raw))
    assert out["theta"].nunique() == 1


def test_percent_of_parent_sums_bound(ray_session):
    """Children of one parent can't claim more than 100% combined (the
    implicit tree assigns each node to exactly one parent)."""
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["part_percent_of_parent"]("/root/testdata/sf0.001")
    assert ((out["share_of_parent"] > 0) & (out["share_of_parent"] <= 1.0)).all()
    by_parent = out.groupby("parent")["share_of_parent"].sum()
    assert (by_parent <= 1.0 + 1e-12).all()
    assert (out["parent"] == out["node"] // 7).all()


def test_seasonal_backtest_beats_naive_on_seasonal_data(ray_session):
    """The synthetic events have a daily cycle, so the seasonal-naive
    forecast must beat the 1-step-naive baseline (MASE < 1)."""
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["hourly_seasonal_backtest"]("/root/testdata/sf0.001").iloc[0]
    assert int(out["n_seasonal"]) == int(out["n_naive"]) - 23
    assert float(out["mase"]) > 0


def test_fano_factor_poisson_scale(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["hourly_fano_factor_per_type"]("/root/testdata/sf0.001")
    assert len(out) == 5
    assert (out["fano"] > 0).all()
    assert (out["n_hours"] == out["n_hours"].iloc[0]).all()  # shared dense grid


def test_link_prediction_hub_cap_bounds_wedges(ray_session):
    """With the cap at >= max degree, results are identical to uncapped;
    with a tiny cap, counts only shrink (documented lower bound)."""
    import numpy as np
    import pandas as pd
    import ray

    from perfect_bloomfilter_ray.stages.graph import link_prediction_scores

    rng = np.random.default_rng(13)
    x = rng.integers(0, 25, 120)
    y = rng.integers(0, 25, 120)
    keep = x != y
    edges = pd.DataFrame(
        {"x": np.minimum(x, y)[keep], "y": np.maximum(x, y)[keep]}
    ).drop_duplicates()
    ds = ray.data.from_pandas(edges)
    full = link_prediction_scores(ds, "x", "y", k=10)
    same = link_prediction_scores(ds, "x", "y", k=10, max_neighbors_per_apex=1000)
    assert full.equals(same)
    capped = link_prediction_scores(ds, "x", "y", k=10, max_neighbors_per_apex=3)
    merged = capped.merge(full, on=["node_a", "node_b"], suffixes=("_c", "_f"))
    assert (merged["cn_c"] <= merged["cn_f"]).all()


def test_jsd_bounds(ray_session):
    import math

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["event_type_jsd_drift"]("/root/testdata/sf0.001").iloc[0]
    assert 0.0 <= float(out["jsd"]) <= math.log(2) + 1e-12


def test_conformal_coverage_near_target(ray_session):
    """Split conformal guarantees coverage >= 1 - alpha in expectation;
    on a 25k-row test fold the empirical value stays in a wide band."""
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["conformal_value_intervals"]("/root/testdata/sf0.001").iloc[0]
    assert 0.8 <= float(out["coverage"]) <= 1.0
    assert float(out["qhat"]) > 0
    assert int(out["covered"]) <= int(out["n_test"])


def test_ztest_consistency(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["ab_conversion_ztest"]("/root/testdata/sf0.001").iloc[0]
    assert int(out["x0"]) <= int(out["n0"]) and int(out["x1"]) <= int(out["n1"])
    assert 0 < float(out["p0"]) < 1 and 0 < float(out["p1"]) < 1
    # hash split is not a real treatment: |z| should not be astronomical
    assert abs(float(out["z"])) < 10


def test_fellegi_sunter_finds_reingested_slice(ray_session):
    """Every re-ingested dirty copy must surface as a link (its agreement
    pattern scores at least lang+source+pfx which clears the threshold)."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["fellegi_sunter_linkage"]("/root/testdata/sf0.001").iloc[0]
    # blocking recall is exact and computable: a dirty copy is reachable
    # unless its ±1 length perturbation crosses a //16 band boundary
    n_reachable = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id % 25 = 0 "
        "AND (n_chars + (doc_id * 2654435761) % 3 - 1) // 16 = n_chars // 16"
    ).fetchone()[0]
    assert int(out["true_links_found"]) == int(n_reachable)
    assert int(out["n_links"]) >= int(out["true_links_found"])
    assert (
        int(out["n_links"]) + int(out["n_possible"]) + int(out["n_nonlinks"])
        == int(out["n_candidates"])
    )


def test_zipf_profile_shape(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["zipf_rank_frequency_profile"]("/root/testdata/sf0.001")
    assert len(out) == 20
    c = out["c"].to_numpy()
    assert (c[:-1] >= c[1:]).all()  # counts non-increasing by rank
    assert float(out["zipf_slope_top1000"].iloc[0]) < 0


def test_fk_integrity_clean_schema(ray_session):
    """The synthetic star schema is referentially clean by construction."""
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["fk_integrity_audit"]("/root/testdata/sf0.001").iloc[0]
    assert int(out["lineitem_orphan_orders"]) == 0
    assert int(out["order_orphan_customers"]) == 0
    assert int(out["customer_orphan_nations"]) == 0
    assert int(out["childless_orders"]) >= 0


def test_lang_purity_counts_conserve(ray_session):
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["lang_purity_margin_census"]("/root/testdata/sf0.001")
    tot = duckdb.sql(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert int(out["n_docs"].sum()) == int(tot)
    assert (out["n_no_signal"] <= out["n_docs"]).all()


def test_contrastive_triplets_contract(ray_session):
    """Positives are edges, negatives never are, anchors never self-pair."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["contrastive_training_triplets"]("/root/testdata/sf0.001")
    edges = duckdb.sql("""
        WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
                    WHERE l_partkey % 4 = 0)
        SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
        FROM pl a JOIN pl b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    """).fetchdf()
    eset = set(zip(edges["x"], edges["y"]))
    for _, r in out.iterrows():
        a, p, ng = int(r["anchor"]), int(r["positive"]), int(r["negative"])
        assert (min(a, p), max(a, p)) in eset
        assert (min(a, ng), max(a, ng)) not in eset
        assert ng != a


def test_peak_rate_sane(ray_session):
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["user_peak_minute_rate"]("/root/testdata/sf0.001")
    assert 1 <= len(out) <= 20  # sf0.001 has only 15 users
    p = out["peak"].to_numpy()
    assert (p >= 1).all() and (p[:-1] >= p[1:]).all()


def test_peak_concurrency_brute_force(ray_session):
    """Sweep result equals a brute-force interval-overlap maximum."""
    import duckdb

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    out = QUERIES["peak_concurrent_sessions"]("/root/testdata/sf0.001").iloc[0]
    iv = duckdb.sql("""
        WITH d AS (SELECT user_id, ts,
                          CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                    > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
                   FROM read_parquet('/root/testdata/sf0.001/events.parquet')),
        s AS (SELECT user_id, ts, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM d)
        SELECT min(ts) st, max(ts) en FROM s GROUP BY user_id, sid
    """).fetchdf()
    assert int(out["n_sessions"]) == len(iv)
    # brute force: concurrency at every session start
    st = iv["st"].to_numpy()
    en = iv["en"].to_numpy()
    peak = max(int(((st <= t) & (en >= t)).sum()) for t in st)
    assert int(out["peak_concurrent"]) == peak
