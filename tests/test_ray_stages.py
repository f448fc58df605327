"""Ray-integration tests: UDAF adapters, membership, dedup, ANN, checkpoint."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from perfect_bloomfilter_ray import BloomCascade, BloomConfig, CountMinSketch, HyperLogLog, KLLSketch


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def test_sketch_global_matches_local(docs_ds, sf_dir):
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.stages.agg import sketch_global

    h = sketch_global(docs_ds, "text", lambda: HyperLogLog(12), name="hll")
    local = HyperLogLog(12)
    local.update_column(pq.read_table(f"{sf_dir}/documents.parquet").column("text"))
    assert h.state_equal(local)  # distributed build == sequential build, exactly


def test_sketch_grouped_matches_local(docs_ds, sf_dir):
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.stages.agg import sketch_grouped

    out = sketch_grouped(
        docs_ds, "lang", "text", lambda: HyperLogLog(10),
        name="est", finalize_fn=lambda s: float(s.estimate()), batch_size=64, salt=4,
    ).to_pandas()
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    for lang in out["lang"]:
        mask = pa.compute.equal(t.column("lang"), lang)
        local = HyperLogLog(10)
        local.update_column(t.filter(mask).column("text"))
        got = float(out.loc[out["lang"] == lang, "est"].iloc[0])
        assert got == pytest.approx(local.estimate())


def test_membership_semi_join_exact(ray_session, sf_dir):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.membership import bloom_semi_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    got = sorted(r["o_orderkey"] for r in bloom_semi_join(orders, cust, "o_custkey", "c_custkey", 10_000).take_all())

    import duckdb

    want = duckdb.sql(
        f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet' WHERE o_custkey IN "
        f"(SELECT c_custkey FROM '{sf_dir}/customer.parquet' WHERE c_mktsegment='BUILDING') ORDER BY 1"
    ).df()["o_orderkey"].tolist()
    assert got == want


def test_sharded_filter_roundtrip(ray_session, sf_dir):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.membership import ShardedBloomFilter, build_sharded_filter

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    f = build_sharded_filter(ev, "event_id", num_shards=8, expected_keys=2000)
    keys = pa.array(np.arange(1000))
    assert f.contains_column(keys).all()
    fresh = pa.array(np.arange(5_000_000, 5_050_000))
    assert int(f.contains_column(fresh).sum()) == 0
    rt = ShardedBloomFilter.from_bytes(f.to_bytes())
    assert rt.contains_column(keys).all()


def test_exact_dedup_keeps_min_id(docs_ds, ray_session):
    import duckdb

    from perfect_bloomfilter_ray.stages.dedup import exact_dedup

    out = exact_dedup(docs_ds, "text", "doc_id").select_columns(["doc_id"]).to_pandas()
    want = duckdb.sql(
        "SELECT min(doc_id) AS doc_id FROM '/root/testdata/sf0.001/documents.parquet' GROUP BY text ORDER BY 1"
    ).df()
    assert sorted(out["doc_id"]) == want["doc_id"].tolist()


def test_minhash_finds_planted_duplicates(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import minhash_lsh_pairs

    base = " ".join(f"token{i}" for i in range(60))  # 60 words; one edit → J≈0.84
    texts = [base, base, base.replace("token30", "changed"), "completely different words about sketches and filters and rays"]
    more = [f"filler document number {i} with some unique words {i*7} {i*13} inside padding text" for i in range(50)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts + more))), "text": texts + more}))
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found  # exact dup
    assert (0, 2) in found or (1, 2) in found  # near dup
    assert all(b <= 2 for _, b in found)  # no false pairs among fillers


def test_simhash_pairs_planted(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import simhash_pairs

    base = "word" + " word".join(str(i) for i in range(60))
    texts = [base, base + " tail", "a b c d e f g h i j k l m n o p q r s t u v w x y z"]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2], "text": texts}))
    pairs = simhash_pairs(ds, "text", "doc_id", max_hamming=3).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found
    assert (0, 2) not in found and (1, 2) not in found


def test_ann_bruteforce_and_lsh_recall(ray_session, sf_dir):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.ann import brute_force_topk, lsh_topk

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = emb.take(2)
    dim = len(rows[0]["embedding"])
    q = np.stack([np.asarray(r["embedding"]) for r in rows])
    exact = brute_force_topk(emb, q, "embedding", "vec_id", dim, k=10)
    assert len(exact) == 20
    # each query's own vector must be its top hit (cos == 1)
    top = exact.groupby("query_id").first()
    assert top.loc[0, "vec_id"] == rows[0]["vec_id"]
    assert top.loc[1, "vec_id"] == rows[1]["vec_id"]
    approx = lsh_topk(emb, q, "embedding", "vec_id", dim, k=10, num_tables=16, num_planes=6)
    recall = len(set(map(tuple, approx[["query_id", "vec_id"]].values)) & set(map(tuple, exact[["query_id", "vec_id"]].values))) / len(exact)
    assert recall >= 0.5, recall


def test_checkpoint_resume_byte_identical(ray_session, tmp_path, sf_dir):
    from perfect_bloomfilter_ray.stages.checkpoint import checkpointed_build

    files = [f"{sf_dir}/documents.parquet", "/root/testdata/sf0.01/documents.parquet"]
    ck = str(tmp_path / "ck")
    s1, m1 = checkpointed_build(files, "text", lambda: HyperLogLog(12), ck)
    assert m1["num_built"] == 2 and m1["num_resumed"] == 0
    parts = sorted(glob.glob(ck + "/*part-*.sketch"))
    os.remove(parts[1])
    s2, m2 = checkpointed_build(files, "text", lambda: HyperLogLog(12), ck)
    assert m2["num_built"] == 1 and m2["num_resumed"] == 1
    assert s1.to_bytes() == s2.to_bytes()


def test_flagship_pipeline_runs(ray_session):
    from perfect_bloomfilter_ray.pipelines.flagship import flagship
    from perfect_bloomfilter_ray.sources.corpus import pages_dataset

    out = flagship(pages_dataset(500, seed=1), expected_urls=500)
    assert len(out) >= 5 and "distinct_urls_est" in out.columns


def test_flagship_invariant_sample_matches_full(ray_session, tmp_path):
    """Benchmark-mode sampled invariant: identical sketch results (the check
    never alters data) and the file-sampled path still catches corruption."""
    import glob
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from perfect_bloomfilter_ray.pipelines.flagship import flagship
    from perfect_bloomfilter_ray.sources.corpus import pages_dataset, write_pages

    corpus = write_pages(str(tmp_path / "corpus_inv"), 2000, seed=7, num_blocks=4)
    full = flagship(corpus, expected_urls=2000)
    sampled = flagship(corpus, expected_urls=2000, invariant_sample=2)
    pd.testing.assert_frame_equal(full, sampled)
    assert full.attrs["summary"] == sampled.attrs["summary"]

    # Dataset input: row-level sampling also stays result-identical
    row_sampled = flagship(pages_dataset(500, seed=1), expected_urls=500, invariant_sample=4)
    full_ds = flagship(pages_dataset(500, seed=1), expected_urls=500)
    pd.testing.assert_frame_equal(full_ds, row_sampled)

    # corrupt the FIRST file (always in files[::k]) -> sampled path raises
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    t = pq.read_table(files[0])
    bad = t.set_column(t.schema.get_field_index("text"), "text",
                       pa.array(["CORRUPTED"] * len(t), pa.string()))
    pq.write_table(bad, files[0])
    with pytest.raises(Exception, match="invariant violated"):
        flagship(corpus, expected_urls=2000, invariant_sample=2)


def test_resumable_etl_skips_done_shards(ray_session, tmp_path):
    import glob
    import json
    import os

    from perfect_bloomfilter_ray.pipelines.enrich import enrich_pages
    from perfect_bloomfilter_ray.sources.corpus import write_pages
    from perfect_bloomfilter_ray.stages.checkpoint import resumable_etl

    corpus = write_pages(str(tmp_path / "corpus"), 2000, seed=3, num_blocks=4)
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    assert len(files) >= 4
    out = str(tmp_path / "etl_out")

    m1 = resumable_etl(files, out, enrich_pages, shard_files=1)
    assert m1["num_built"] == len(files) and m1["num_resumed"] == 0
    # simulate a crashed run: nuke one shard's marker
    victim = os.path.join(out, "shard-00001", "_SUCCESS")
    os.remove(victim)
    m2 = resumable_etl(files, out, enrich_pages, shard_files=1)
    assert m2["num_built"] == 1 and m2["num_resumed"] == len(files) - 1
    # total output rows = corpus rows
    import ray.data as rd

    n = rd.read_parquet(
        [p for p in glob.glob(os.path.join(out, "shard-*", "*.parquet"))]
    ).count()
    assert n == 2000
    assert json.load(open(os.path.join(out, "manifest.json")))["num_shards"] == len(files)


def test_checkpointed_build_works_for_all_sketch_families(ray_session, tmp_path):
    import glob
    import os

    from perfect_bloomfilter_ray.sources.corpus import write_pages
    from perfect_bloomfilter_ray.stages.checkpoint import checkpointed_build
    from perfect_bloomfilter_ray.state.hll import HyperLogLog
    from perfect_bloomfilter_ray.state.theta import ThetaSketch

    corpus = write_pages(str(tmp_path / "c"), 1000, seed=5, num_blocks=4)
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    for factory in (lambda: HyperLogLog(12), lambda: ThetaSketch(1024)):
        merged, manifest = checkpointed_build(files, "url", factory, str(tmp_path / "ck"), stage=type(factory()).__name__)
        assert manifest["num_built"] == len(files)
        # ~980 distinct urls (2% dup frac); sketch estimate must be in range
        assert 900 <= merged.estimate() <= 1100


def test_grouped_mode_ties_and_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.topk import grouped_mode

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 2, 2, 3],
            "v": ["b", "a", "b", "x", "y", "x", "y", "z"],
        }
    )
    out = (
        grouped_mode(rd.from_pandas(df), "k", "v", num_blocks=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = {r.k: (r.v_mode, r.mode_count) for r in out.itertuples()}
    assert got[1] == ("b", 2)
    assert got[2] == ("x", 2)  # tie x/y at 2 -> smallest value wins
    assert got[3] == ("z", 1)


def test_compact_parquet_coalesces_small_files(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.stages.checkpoint import compact_parquet

    src = tmp_path / "many"
    (src / "part=a").mkdir(parents=True)
    (src / "part=b").mkdir(parents=True)
    n = 0
    for i in range(20):
        sub = "part=a" if i % 2 else "part=b"
        t = pa.table({"x": list(range(i * 10, i * 10 + 10))})
        pq.write_table(t, str(src / sub / f"f{i}.parquet"))
        n += 10
    out = tmp_path / "compact"
    man = compact_parquet(str(src), str(out), target_rows_per_file=100)
    assert man["in_files"] == 20 and man["rows"] == n and man["out_files"] == 2
    got = pq.read_table(str(out)).column("x").to_pylist()
    assert sorted(got) == list(range(200))
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) <= 4  # coalesced (ray may emit one file per block)
    # re-run resumes from the marker
    man2 = compact_parquet(str(src), str(out), target_rows_per_file=100)
    assert man2.get("resumed") is True


def test_delete_keys_surgical_rewrite(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.stages.checkpoint import delete_keys_from_partitioned

    root = tmp_path / "out"
    (root / "shard-0").mkdir(parents=True)
    (root / "shard-1").mkdir(parents=True)
    pq.write_table(pa.table({"uid": [1, 2, 3], "x": ["a", "b", "c"]}),
                   str(root / "shard-0" / "f0.parquet"))
    pq.write_table(pa.table({"uid": [10, 11], "x": ["d", "e"]}),
                   str(root / "shard-1" / "f1.parquet"))
    clean_path = str(root / "shard-1" / "f1.parquet")
    mtime_before = os.path.getmtime(clean_path)

    man = delete_keys_from_partitioned(str(root), "uid", [2, 99])
    assert man == {"files": 2, "rewritten": 1, "rows_deleted": 1}
    left = pq.read_table(str(root / "shard-0" / "f0.parquet"))
    assert left.column("uid").to_pylist() == [1, 3]
    assert os.path.getmtime(clean_path) == mtime_before  # untouched file

    # deleting everything in a file keeps an empty, schema-bearing file
    man2 = delete_keys_from_partitioned(str(root), "uid", [10, 11])
    assert man2["rows_deleted"] == 2
    t = pq.read_table(clean_path)
    assert len(t) == 0 and t.schema.names == ["uid", "x"]


def test_compact_parquet_rejects_inplace(ray_session, tmp_path):
    import pytest as _pytest

    from perfect_bloomfilter_ray.stages.checkpoint import compact_parquet

    d = tmp_path / "data"
    d.mkdir()
    with _pytest.raises(ValueError, match="non-overlapping"):
        compact_parquet(str(d), str(d))
    with _pytest.raises(ValueError, match="non-overlapping"):
        compact_parquet(str(d), str(d / "sub"))


def test_delete_keys_accepts_chunked_array(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from perfect_bloomfilter_ray.stages.checkpoint import delete_keys_from_partitioned

    root = tmp_path / "o"
    root.mkdir()
    pq.write_table(pa.table({"uid": [1, 2, 3]}), str(root / "f.parquet"))
    keys = pa.chunked_array([pa.array([2]), pa.array([3])])
    man = delete_keys_from_partitioned(str(root), "uid", keys)
    assert man["rows_deleted"] == 2
    assert pq.read_table(str(root / "f.parquet")).column("uid").to_pylist() == [1]
