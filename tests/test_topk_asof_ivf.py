"""Grouped top-k, as-of join, and IVF ANN stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# --------------------------------------------------------------------------
# grouped_top_k
# --------------------------------------------------------------------------


def _topk_oracle(df: pd.DataFrame, keys, order_col, k, tie_cols):
    return (
        df.sort_values([order_col, *tie_cols], ascending=[False] + [True] * len(tie_cols))
        .groupby(keys, sort=False)
        .head(k)
    )


def test_grouped_top_k_matches_pandas(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 7, 500),
            "x": rng.integers(0, 50, 500).astype(float),  # many ties
            "id": np.arange(500),
        }
    )
    # many blocks so partial top-k actually runs per block
    ds = rd.from_pandas(df).repartition(8)
    got = grouped_top_k(ds, "g", "x", k=5, tie_cols=["id"]).to_pandas()
    got = got.sort_values(["g", "x", "id"], ascending=[True, False, True]).reset_index(drop=True)
    want = _topk_oracle(df, ["g"], "x", 5, ["id"])
    want = want.sort_values(["g", "x", "id"], ascending=[True, False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["g", "x", "id"]], want[["g", "x", "id"]], check_dtype=False)


def test_grouped_top_k_group_smaller_than_k(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    df = pd.DataFrame({"g": ["a", "a", "b"], "x": [1.0, 2.0, 9.0], "id": [0, 1, 2]})
    got = grouped_top_k(rd.from_pandas(df), "g", "x", k=10, tie_cols=["id"]).to_pandas()
    assert len(got) == 3


# --------------------------------------------------------------------------
# asof_join_broadcast
# --------------------------------------------------------------------------


@pytest.fixture()
def asof_sides(ray_session):
    import ray.data as rd

    # interleaved event/build timestamps, a key with no build rows (k=3),
    # an event before every build ts (t=5), and exact-equality hits (t=10)
    events = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "t": pd.to_datetime([10, 25, 5, 10, 40, 10], unit="s"),
            "eid": [0, 1, 2, 3, 4, 5],
        }
    )
    build = pd.DataFrame(
        {
            "bk": [1, 1, 1, 2, 2],
            "bt": pd.to_datetime([10, 20, 30, 10, 30], unit="s"),
            "payload": [100, 200, 300, 110, 310],
        }
    )
    return rd.from_pandas(events).repartition(3), pa.Table.from_pandas(build)


def test_asof_inclusive(ray_session, asof_sides):
    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast

    events, build = asof_sides
    out = (
        asof_join_broadcast(events, build, on="k", big_ts="t", right_on="bk", small_ts="bt")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # eid0: k=1 t=10 → bt=10 (inclusive); eid1: t=25 → bt=20; eid2: t=5 → none
    # eid3: k=2 t=10 → bt=10; eid4: t=40 → bt=30; eid5: k=3 → none
    assert out["asof_payload"].tolist() == [100.0, 200.0, None, 110.0, 310.0, None] or (
        [None if pd.isna(v) else v for v in out["asof_payload"]] == [100, 200, None, 110, 310, None]
    )


def test_asof_strict_and_inner(ray_session, asof_sides):
    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast

    events, build = asof_sides
    out = (
        asof_join_broadcast(
            events, build, on="k", big_ts="t", right_on="bk", small_ts="bt", strict=True, how="inner"
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # strict: t=10 events no longer match bt=10
    assert out["eid"].tolist() == [1, 4]
    assert out["asof_payload"].tolist() == [200, 310]


def test_asof_probe_ts_beyond_packed_span(ray_session):
    """A probe ts offset >= 2^ts_bits must not overflow the packed composite.

    Pre-fix, the OR of an oversized offset leaked into the key-code bits and
    the key-equality check rejected a real match (null/left, dropped/inner).
    The clamp makes any far-future probe ts match the key's LAST build row.
    """
    import ray.data as rd
    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast

    # 9 keys → code_bits=4, ts_bits=59; int64 ts passes through _ts_i64 uncast
    build = pa.table(
        {
            "bk": list(range(9)) + [4],
            "bt": [0] * 9 + [100],
            "payload": list(range(9)) + [999],
        }
    )
    events = rd.from_items(
        [
            {"k": 4, "t": (1 << 59) + 7, "eid": 0},  # offset far past 2^59
            {"k": 4, "t": 50, "eid": 1},  # in-span control
        ]
    )
    out = (
        asof_join_broadcast(events, build, on="k", big_ts="t", right_on="bk", small_ts="bt")
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    assert out["asof_payload"].tolist() == [999, 4]
    # strict variant: far-future probe still matches the last row
    out_s = (
        asof_join_broadcast(
            events, build, on="k", big_ts="t", right_on="bk", small_ts="bt", strict=True, how="inner"
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    assert out_s["asof_payload"].tolist() == [999, 4]


def test_asof_duplicate_ts_tiebreak(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast

    events = pd.DataFrame({"k": [1], "t": pd.to_datetime([50], unit="s"), "eid": [0]})
    build = pa.Table.from_pandas(
        pd.DataFrame(
            {
                "bk": [1, 1],
                "bt": pd.to_datetime([10, 10], unit="s"),
                "pid": [7, 3],
            }
        )
    )
    out = asof_join_broadcast(
        rd.from_pandas(events), build, on="k", big_ts="t", right_on="bk", small_ts="bt", tie_col="pid"
    ).to_pandas()
    # deterministic: last row in (bk, bt, pid) sort order wins → pid=7
    assert out["asof_pid"].tolist() == [7]


def test_asof_matches_duckdb(ray_session, sf_dir):
    """Full-table cross-check vs DuckDB ASOF JOIN on the sf0.001 tables."""
    import duckdb
    import ray.data as rd

    from ray.data.aggregate import Max

    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    ded = orders.groupby(["o_custkey", "o_orderdate"]).aggregate(Max("o_orderkey", alias_name="ok"))
    got = (
        asof_join_broadcast(
            events, ded, on="user_id", big_ts="ts", right_on="o_custkey", small_ts="o_orderdate"
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH ded AS (
            SELECT o_custkey, o_orderdate, max(o_orderkey) AS ok
            FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY 1, 2
        )
        SELECT e.event_id, d.ok
        FROM read_parquet('{sf_dir}/events.parquet') e
        ASOF LEFT JOIN ded d ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
        ORDER BY e.event_id
        """
    ).fetchdf()
    assert got["asof_ok"].fillna(-1).tolist() == want["ok"].fillna(-1).tolist()


# --------------------------------------------------------------------------
# ivf_topk
# --------------------------------------------------------------------------


def test_ivf_recall_vs_brute_force(ray_session, sf01_dir):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import brute_force_topk, ivf_topk

    emb = rd.read_parquet(f"{sf01_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = sorted(emb.filter(expr="vec_id < 4").take_all(), key=lambda r: r["vec_id"])
    dim = len(qrows[0]["embedding"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])

    exact = brute_force_topk(emb, queries, "embedding", "vec_id", dim, k=10)
    approx = ivf_topk(emb, queries, "embedding", "vec_id", dim, k=10, nlist=16, nprobe=6)

    recalls = []
    for qid in range(len(queries)):
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_ivf_deterministic(ray_session, sf01_dir):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import ivf_topk

    emb = rd.read_parquet(f"{sf01_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = sorted(emb.filter(expr="vec_id < 2").take_all(), key=lambda r: r["vec_id"])
    dim = len(qrows[0]["embedding"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    a = ivf_topk(emb, queries, "embedding", "vec_id", dim, k=5)
    b = ivf_topk(emb, queries, "embedding", "vec_id", dim, k=5)
    pd.testing.assert_frame_equal(a, b)


def test_stratified_sample_deterministic_k_per_group(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.topk import stratified_sample

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"g": rng.integers(0, 5, 300), "id": np.arange(300)})
    ds = rd.from_pandas(df).repartition(6)
    a = stratified_sample(ds, "g", "id", k=7).to_pandas().sort_values(["g", "id"]).reset_index(drop=True)
    assert a.groupby("g").size().le(7).all()
    assert a.groupby("g").size().eq(7).all()  # every group has >=7 members here
    # deterministic across runs and partitionings
    b = (
        stratified_sample(rd.from_pandas(df).repartition(2), "g", "id", k=7)
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    assert a[["g", "id"]].equals(b[["g", "id"]])


def test_grouped_top_k_empty_input(ray_session):
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    df = pd.DataFrame({"g": pd.Series([], dtype="int64"), "x": pd.Series([], dtype="float64"), "id": pd.Series([], dtype="int64")})
    out = grouped_top_k(rd.from_pandas(df), "g", "x", k=3, tie_cols=["id"]).to_pandas()
    assert len(out) == 0


def test_asof_partitioned_matches_broadcast(ray_session, sf_dir):
    """Big-big co-partitioned as-of join must be row-identical to the
    broadcast variant (same kernel, different routing) on real tables."""
    import ray.data as rd
    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast, asof_join_partitioned

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"])

    kw = dict(on="user_id", big_ts="ts", right_on="o_custkey", small_ts="o_orderdate", tie_col="o_orderkey")
    a = (
        asof_join_broadcast(events, orders, **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        asof_join_partitioned(events, orders, num_blocks=7, **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    # inner + strict flavors too
    ai = (
        asof_join_broadcast(events, orders, how="inner", strict=True, **kw)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    bi = (
        asof_join_partitioned(events, orders, how="inner", strict=True, num_blocks=7, **kw)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ai, bi[ai.columns])


def test_asof_partitioned_empty_sides(ray_session):
    import ray.data as rd
    from perfect_bloomfilter_ray.stages.joins import asof_join_partitioned

    events = rd.from_pandas(pd.DataFrame({"k": [1, 2], "t": [10, 20], "eid": [0, 1]}))
    build = rd.from_pandas(pd.DataFrame({"bk": [9], "bt": [5], "payload": [1.0]}))
    # keys never co-occur -> left join keeps probes with null payload
    out = (
        asof_join_partitioned(events, build, on="k", big_ts="t", right_on="bk", small_ts="bt", num_blocks=3)
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    assert len(out) == 2 and out["asof_payload"].isna().all()
    inner = asof_join_partitioned(
        events, build, on="k", big_ts="t", right_on="bk", small_ts="bt", how="inner", num_blocks=3
    ).to_pandas()
    assert len(inner) == 0


def test_weighted_sample_biases_toward_heavy_rows(ray_session):
    import ray.data as rd
    from perfect_bloomfilter_ray.stages.topk import weighted_sample

    n = 2000
    # two strata of weights: heavy rows (w=1000) vs light rows (w=1)
    df = pd.DataFrame(
        {
            "g": ["a"] * n,
            "id": np.arange(n),
            "w": np.where(np.arange(n) % 2 == 0, 1000, 1),
        }
    )
    out = weighted_sample(rd.from_pandas(df).repartition(4), "g", "id", "w", k=100).to_pandas()
    assert len(out) == 100
    heavy_frac = (out["w"] == 1000).mean()
    assert heavy_frac > 0.9  # 1000x weight → overwhelmingly heavy rows
    # deterministic across runs
    out2 = weighted_sample(rd.from_pandas(df).repartition(7), "g", "id", "w", k=100).to_pandas()
    assert sorted(out2["id"]) == sorted(out["id"])


def test_quantized_topk_recall(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
    )

    rng = np.random.default_rng(17)
    dim, n, k = 32, 4000, 10
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[7] = 0.0  # zero vector edge case
    queries = rng.normal(size=(5, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), dim
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    qds = quantize_embeddings(ds, "embedding", dim)
    approx = quantized_topk(qds, queries, "qvec", "qscale", "vec_id", dim, k=k)
    exact = brute_force_topk(ds, queries, "embedding", "vec_id", dim, k=k)
    recalls = []
    for qid in range(5):
        a = set(approx.loc[approx.query_id == qid, "vec_id"])
        e = set(exact.loc[exact.query_id == qid, "vec_id"])
        recalls.append(len(a & e) / k)
    assert np.mean(recalls) >= 0.9  # int8 keeps cosine ranks nearly intact


def test_ivf_persisted_index_roundtrip(ray_session, tmp_path):
    import os

    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import (
        brute_force_topk,
        ivf_build_index,
        ivf_query_index,
    )

    rng = np.random.default_rng(23)
    dim, n, k = 16, 3000, 10
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), dim
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    idx = str(tmp_path / "ivf")
    man = ivf_build_index(ds, "embedding", "vec_id", dim, idx, nlist=8)
    assert man["nlist"] == 8
    # the persisted layout is cell-partitioned: one dir per cell
    cells = [d for d in os.listdir(os.path.join(idx, "vectors")) if d.startswith("cell=")]
    assert len(cells) == 8
    queries = vecs[:4]
    out = ivf_query_index(idx, queries, k=k, nprobe=3)
    exact = brute_force_topk(ds, queries, "embedding", "vec_id", dim, k=k)
    recalls = []
    for qid in range(4):
        a = set(out.loc[out.query_id == qid, "vec_id"])
        e = set(exact.loc[exact.query_id == qid, "vec_id"])
        recalls.append(len(a & e) / k)
    assert np.mean(recalls) >= 0.7  # nprobe=3/8 cells
    # self-vector always found (its own cell is the nearest probed cell)
    assert all(qid in set(out.loc[out.query_id == qid, "vec_id"]) for qid in range(4))


def test_ivf_persisted_rebuild_overwrites(ray_session, tmp_path):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import ivf_build_index, ivf_query_index

    rng = np.random.default_rng(5)
    dim, n = 8, 400
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), pa.float32()), dim
            ),
        }
    )
    ds = rd.from_arrow(tbl)
    idx = str(tmp_path / "ivf")
    ivf_build_index(ds, "embedding", "vec_id", dim, idx, nlist=4)
    out1 = ivf_query_index(idx, vecs[:2], k=5, nprobe=2)
    # regression: a rebuild used to APPEND, duplicating every vector
    ivf_build_index(ds, "embedding", "vec_id", dim, idx, nlist=4)
    out2 = ivf_query_index(idx, vecs[:2], k=5, nprobe=2)
    for qid in (0, 1):
        ids = out2.loc[out2.query_id == qid, "vec_id"].tolist()
        assert len(ids) == len(set(ids))  # no duplicated neighbors
    pd.testing.assert_frame_equal(
        out1.reset_index(drop=True), out2.reset_index(drop=True)
    )


def test_pq_topk_recall_and_roundtrip(ray_session, sf01_dir):
    """PQ-ADC top-10 recall vs float brute force on the sf0.01 embeddings,
    plus encode determinism: same codebooks -> identical codes across runs."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    emb = rd.read_parquet(f"{sf01_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id < 5").take_all()
    dim = len(qrows[0]["embedding"])
    queries = np.stack(
        [np.asarray(r["embedding"]) for r in sorted(qrows, key=lambda r: r["vec_id"])]
    )
    cb = pq_train_codebooks(emb, "embedding", "vec_id", dim, m=8, ksub=256)
    assert cb.shape == (8, 256, dim // 8)
    codes = pq_encode(emb, cb, "embedding", "vec_id", dim).materialize()
    c1 = codes.to_pandas().sort_values("vec_id")
    c2 = pq_encode(emb, cb, "embedding", "vec_id", dim).to_pandas().sort_values("vec_id")
    assert [list(x) for x in c1["pqcode"]] == [list(x) for x in c2["pqcode"]]

    k = 10
    exact = brute_force_topk(emb, queries, "embedding", "vec_id", dim, k=k)
    approx = pq_topk(codes, cb, queries, "pqcode", "vec_id", k=k, rescore=8)
    recalls = []
    for qid in range(len(queries)):
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        a = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        recalls.append(len(a & e) / k)
    assert np.mean(recalls) >= 0.5, recalls  # 8-byte codes: coarse but must rank


def test_ranking_eval_hand_case():
    import pandas as pd

    from perfect_bloomfilter_ray.stages.ann import ranking_eval

    k = 4
    exact = pd.DataFrame(
        {"query_id": [0] * 4 + [1] * 4, "vec_id": [10, 11, 12, 13, 20, 21, 22, 23],
         "rk": [1, 2, 3, 4] * 2}
    )
    # q0: perfect but ranks 1/2 swapped; q1: top-1 missing, one stranger
    approx = pd.DataFrame(
        {"query_id": [0] * 4 + [1] * 4, "vec_id": [11, 10, 12, 13, 21, 22, 23, 99],
         "rk": [1, 2, 3, 4] * 2}
    )
    out = ranking_eval(exact, approx, "vec_id", k=k)
    q0, q1 = out[out["query_id"] == 0].iloc[0], out[out["query_id"] == 1].iloc[0]
    assert q0["overlap"] == 4 and q0["jaccard"] == 1.0
    assert q0["mrr"] == 0.5 and q0["displacement"] == 2
    assert q1["overlap"] == 3 and q1["jaccard"] == 3.0 / 5.0
    assert q1["mrr"] == 0.0 and q1["displacement"] == 3


def test_exact_and_quantized_ranked_consistent(ray_session):
    import numpy as np
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import (
        exact_topk_ranked,
        quantize_embeddings,
        quantized_exact_topk_ranked,
        ranking_eval,
    )

    rng = np.random.default_rng(5)
    dim, n = 16, 400
    vecs = rng.standard_normal((n, dim))
    import pandas as pd

    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"), "embedding": vecs.tolist()})
    ds = rd.from_pandas(df).repartition(4)
    queries, qids = vecs[:3], np.arange(3, dtype=np.int64)

    exact = exact_topk_ranked(ds, queries, "embedding", "vec_id", dim, k=8, query_ids=qids)
    # ranks are 1..8 per query, self excluded
    assert all(
        list(g) == list(range(1, 9))
        for _, g in exact.sort_values("rk").groupby("query_id")["rk"]
    )
    assert not exact.apply(lambda r: r["vec_id"] == qids[int(r["query_id"])], axis=1).any()

    # brute-force float64 reference for query 0
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn[0]
    sims[0] = -np.inf
    want = np.lexsort((np.arange(n), -sims))[:8]
    got = exact[exact["query_id"] == 0].sort_values("rk")["vec_id"].to_numpy()
    assert list(got) == list(want)

    qds = quantize_embeddings(ds, "embedding", dim, precision="f64").materialize()
    qc = np.stack(
        [r["qvec"] for r in sorted(qds.filter(expr="vec_id < 3").take_all(), key=lambda r: r["vec_id"])]
    ).astype(np.int32)
    approx = quantized_exact_topk_ranked(qds, qc, "qvec", "vec_id", dim, k=8, query_ids=qids)
    rep = ranking_eval(exact, approx, "vec_id", k=8)
    assert len(rep) == 3 and (rep["overlap"] >= 5).all()  # int8 keeps most of top-8
