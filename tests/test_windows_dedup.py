"""Gap-session windows and near-dup cluster removal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sessionize_gap_splits(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import sessionize

    base = pd.Timestamp("2026-01-01")
    rows = []
    # user 1: three events 5 min apart (1 session), then a 2h gap + one (2nd)
    for m in (0, 5, 10, 130):
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=m)})
    # user 2: single event
    rows.append({"user_id": 2, "ts": base})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = sessionize(ds, "user_id", "ts", gap="30min").to_pandas().sort_values("user_id")
    assert out[out.user_id == 1]["n_sessions"].iloc[0] == 2
    assert out[out.user_id == 1]["n_events"].iloc[0] == 4
    assert out[out.user_id == 2]["n_sessions"].iloc[0] == 1


def test_sessionize_event_level_ids(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.windows import sessionize

    base = pd.Timestamp("2026-01-01")
    df = pd.DataFrame(
        {"user_id": [7] * 3, "ts": [base, base + pd.Timedelta("1h"), base + pd.Timedelta("1h5min")]}
    )
    out = sessionize(rd.from_pandas(df), "user_id", "ts", gap="30min", stats=False).to_pandas()
    out = out.sort_values("ts")
    assert out["session_id"].tolist() == [0, 1, 1]


def test_pairs_to_clusters_union_find():
    from perfect_bloomfilter_ray.stages.dedup import pairs_to_clusters

    # chain 1-2, 2-3 plus isolated pair 10-11 → clusters {1,2,3}, {10,11}
    c = pairs_to_clusters([1, 2, 10], [2, 3, 11])
    assert c[2] == 1 and c[3] == 1 and c[11] == 10


def test_connected_components_distributed_matches_union_find(ray_session):
    import numpy as np
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import connected_components_pairs, pairs_to_clusters

    rng = np.random.default_rng(42)
    # 300 nodes, random chains/cliques of varied diameter (incl. a 40-long path)
    edges = []
    node = 0
    for size in [2, 3, 5, 40, 7, 2, 11, 30]:
        members = list(range(node, node + size))
        for a, b in zip(members, members[1:]):  # path → worst-case diameter
            edges.append((a, b))
        node += size
    extra = rng.integers(200, 300, size=(30, 2))
    edges += [(int(a), int(b)) for a, b in extra if a != b]
    id_a = [a for a, b in edges]
    id_b = [b for a, b in edges]

    expected = pairs_to_clusters(id_a, id_b)

    out = (
        connected_components_pairs(
            rd.from_items([{"id_a": a, "id_b": b} for a, b in edges]).repartition(5),
            num_blocks=8,
        )
        .to_pandas()
        .set_index("node")["root"]
        .to_dict()
    )
    # every endpoint labeled; roots equal the union-find min-roots
    for n in set(id_a) | set(id_b):
        assert out[n] == expected.get(n, n), n


def test_minhash_join_verify_path_matches_broadcast(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog and runs very far away today "
    docs = []
    for i in range(30):
        docs.append({"doc_id": i, "text": base * 6 + f"suffix {i % 3}"})
    docs.append({"doc_id": 100, "text": "completely different text about sketches " * 10})
    ds = rd.from_items(docs).repartition(4)

    broadcast = (
        minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    joined = (
        minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5, broadcast_max_pairs=0)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, joined[broadcast.columns])


def test_drop_near_duplicates_keeps_canonical(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import drop_near_duplicates

    text = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    near = text.replace("lazy", "sleepy")
    other = "completely different content about distributed sketching systems " * 8
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [text, near, other]})
    kept = drop_near_duplicates(rd.from_pandas(df), "text", "doc_id", threshold=0.5).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]  # min-id canonical survives


def test_drop_near_duplicates_join_path_matches_broadcast(ray_session):
    """broadcast_max_drop=0 forces the hash-co-partitioned anti-join; the
    kept set must be identical to the broadcast path's on a corpus with
    many dup clusters (and the corpus columns must survive unchanged)."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import drop_near_duplicates

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(200)]
    rows = []
    doc_id = 0
    for g in range(40):
        base = " ".join(rng.choice(words, size=60))
        copies = int(rng.integers(1, 4))
        for c in range(copies):
            # near-copy: flip a couple of tokens
            toks = base.split()
            for _ in range(c):
                toks[int(rng.integers(0, len(toks)))] = str(rng.choice(words))
            rows.append({"doc_id": doc_id, "text": " ".join(toks), "extra": f"e{doc_id}"})
            doc_id += 1
    df = pd.DataFrame(rows)

    def run(gate):
        return (
            drop_near_duplicates(
                rd.from_pandas(df), "text", "doc_id", threshold=0.5, broadcast_max_drop=gate
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    bcast = run(10**6)
    joined = run(0)
    assert len(bcast) < len(df)  # something was actually dropped
    pd.testing.assert_frame_equal(bcast, joined[bcast.columns])


def test_drop_near_duplicates_join_path_string_ids(ray_session):
    """Anti-join path with non-int ids (64-bit id-hash representative)."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import drop_near_duplicates

    # distinct tokens → many distinct shingles, so one swapped token keeps
    # Jaccard high (a periodic text collapses to ~10 distinct shingles and
    # never crosses the threshold)
    text = " ".join(f"w{i}" for i in range(120))
    near = text.replace("w60 ", "zz ")
    other = " ".join(f"v{i}" for i in range(120))
    df = pd.DataFrame({"doc_id": ["a", "b", "c"], "text": [text, near, other]})
    kept = drop_near_duplicates(
        rd.from_pandas(df), "text", "doc_id", threshold=0.5, broadcast_max_drop=0
    ).to_pandas()
    assert len(kept) == 2
    assert "c" in set(kept["doc_id"])  # the non-dup always survives
    assert set(kept["doc_id"]) <= {"a", "b", "c"}


def test_exact_dedup_normalized_key(ray_session):
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(
        {
            "doc_id": [3, 1, 2, 4],
            "text": ["Hello,  World!", "hello world", "totally different", "HELLO WORLD"],
        }
    )
    # raw dedup: all four distinct
    raw = exact_dedup(rd.from_pandas(df), "text", "doc_id").to_pandas()
    assert len(raw) == 4
    # normalized dedup: the three formatting variants collapse to min id (1)
    norm = exact_dedup(rd.from_pandas(df), "text", "doc_id", normalize=True).to_pandas()
    assert sorted(norm["doc_id"]) == [1, 2]


def test_curate_pipeline(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from perfect_bloomfilter_ray.pipelines.curate import curate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    got = sorted(r["doc_id"] for r in curate(ds, langs=("en",), min_chars=100).take_all())
    want = [
        r[0]
        for r in duckdb.sql(
            f"""
            WITH filtered AS (
                SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')
                WHERE lang = 'en' AND length(text) >= 100
            )
            SELECT min(doc_id) AS keep FROM filtered GROUP BY text ORDER BY keep
            """
        ).fetchall()
    ]
    assert got == want


def test_sliding_heavy_users_mg_matches_exact_at_low_cardinality(ray_session):
    """With window user-cardinality far below the MG summary width (m=256),
    Misra-Gries keeps every key with its exact count, so the sketch twin's
    trailing top-3 equals the exact fan-out query bucket-for-bucket
    (identical tie rule: count desc, user asc)."""
    from perfect_bloomfilter_ray.pipelines.extras import (
        sliding_heavy_users_exact,
        sliding_heavy_users_mg,
    )

    ex = sliding_heavy_users_exact("/root/testdata/sf0.001")
    mg = sliding_heavy_users_mg("/root/testdata/sf0.001")
    assert len(ex) == len(mg) > 0
    assert ex[["bucket", "rnk", "user_id"]].values.tolist() == mg[["bucket", "rnk", "user_id"]].values.tolist()
    assert ex["n"].values.tolist() == mg["n_est"].values.tolist()


def test_sliding_value_median_kll_brackets_exact(ray_session):
    """The KLL twin reports the same occurring buckets as the exact
    fan-out query, and at sf0.001 scale (buffer >> window rows) its
    estimates must land inside the window's value range bracketed by the
    exact discrete quantiles."""
    from perfect_bloomfilter_ray.pipelines.extras import (
        sliding_value_median_exact,
        sliding_value_median_kll,
    )

    ex = sliding_value_median_exact("/root/testdata/sf0.001")
    kl = sliding_value_median_kll("/root/testdata/sf0.001")
    assert len(ex) == len(kl) > 0
    assert ex["bucket"].tolist() == kl["bucket"].tolist()
    # p50 estimate can never exceed the exact p90, nor fall above p90's est
    assert (kl["p50_est"] <= kl["p90_est"] + 1e-12).all()
    assert (kl["p50_est"] <= ex["p90"]).all()


def test_word_containment_pairs_grouped(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.dedup import word_containment_pairs_grouped

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "g": ["s1"] * 4 + ["s2"],
            "text": [
                "alpha beta gamma delta",     # superset of doc 2
                "beta gamma",                  # contained in 1 (cont=1.0)
                "beta gamma epsilon",          # 2/2 of doc2 -> contained pair (2,3)? inter={beta,gamma}=2, min=2 -> 1.0
                "zeta eta",                    # disjoint
                "beta gamma",                  # different group: no cross-group pair
            ],
        }
    )
    out = (
        word_containment_pairs_grouped(
            rd.from_pandas(df).repartition(3), "g", "text", "doc_id", threshold=1.0
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {(1, 2), (2, 3)}
    r12 = out[(out["id_a"] == 1) & (out["id_b"] == 2)].iloc[0]
    assert r12["inter"] == 2 and r12["n_a"] == 4 and r12["n_b"] == 2
    assert r12["containment"] == 1.0


def test_bbit_jaccard_estimator_bound():
    """b-bit collision estimator within theory on synthetic known-J pairs."""
    import numpy as np

    from perfect_bloomfilter_ray.stages.dedup import bbit_jaccard_estimate

    rng = np.random.RandomState(0)
    P = 4096  # large so the sampling error is tiny and the bound is sharp
    for j_true in (0.0, 0.3, 0.7, 1.0):
        # simulate minhash agreement: with prob J signatures agree, else
        # independent uniform values
        agree = rng.rand(200, P) < j_true
        a = rng.randint(0, 1 << 62, (200, P)).astype(np.uint64)
        b = np.where(agree, a, rng.randint(0, 1 << 62, (200, P)).astype(np.uint64))
        for bbits in (1, 2):
            est = bbit_jaccard_estimate(a, b, bbits)
            se = 3.0 / np.sqrt(P) / (1 - 2.0**-bbits)
            assert np.abs(est - j_true).mean() < max(2 * se, 0.05), (j_true, bbits)


def test_bbit_more_bits_less_error():
    import numpy as np

    from perfect_bloomfilter_ray.stages.dedup import bbit_jaccard_estimate

    rng = np.random.RandomState(1)
    P = 256
    agree = rng.rand(500, P) < 0.5
    a = rng.randint(0, 1 << 62, (500, P)).astype(np.uint64)
    b = np.where(agree, a, rng.randint(0, 1 << 62, (500, P)).astype(np.uint64))
    e1 = np.abs(bbit_jaccard_estimate(a, b, 1) - 0.5).mean()
    e4 = np.abs(bbit_jaccard_estimate(a, b, 4) - 0.5).mean()
    assert e4 < e1
