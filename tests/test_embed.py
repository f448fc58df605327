"""Deterministic text embeddings: determinism, near-dup cosine, ANN at scale."""

import numpy as np
import pandas as pd


def test_embedding_deterministic_and_neardup_cosine(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.functions.embed import embed_pages

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog!",  # near-dup
        "completely different content about distributed sketch libraries",
    ] * 10
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = embed_pages(rd.from_pandas(df)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    v = np.stack([np.asarray(e, dtype=np.float32) for e in out["embedding"]])
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    # determinism across runs/partitionings
    out2 = embed_pages(rd.from_pandas(df).repartition(4)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    v2 = np.stack([np.asarray(e, dtype=np.float32) for e in out2["embedding"]])
    np.testing.assert_array_equal(v, v2)
    # near-dups highly similar; distinct texts not
    assert float(v[0] @ v[1]) > 0.95
    assert float(v[0] @ v[2]) < 0.8


def test_embed_then_ann_and_neardup(ray_session, sf_dir):
    import ray.data as rd

    from perfect_bloomfilter_ray.functions.embed import embed_pages
    from perfect_bloomfilter_ray.stages.ann import brute_force_topk, ivf_topk
    from perfect_bloomfilter_ray.stages.dedup import embedding_neardup_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    emb = embed_pages(docs).drop_columns(["text"]).materialize()
    qrows = sorted(emb.filter(expr="doc_id < 3").take_all(), key=lambda r: r["doc_id"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    exact = brute_force_topk(emb, queries, "embedding", "doc_id", 64, k=5)
    approx = ivf_topk(emb, queries, "embedding", "doc_id", 64, k=5, nlist=8, nprobe=4)
    # each query's own doc must be its top hit in the exact result
    for qid in range(3):
        top = exact[exact["query_id"] == qid].iloc[0]
        assert top["doc_id"] == qrows[qid]["doc_id"]
    # IVF recall sane on this small set
    rec = []
    for qid in range(3):
        e = set(exact[exact["query_id"] == qid]["doc_id"])
        a = set(approx[approx["query_id"] == qid]["doc_id"])
        rec.append(len(e & a) / len(e))
    assert np.mean(rec) >= 0.6
    # embedding near-dup stage runs over the generated column
    pairs = embedding_neardup_pairs(emb, "embedding", "doc_id", 64, cos_threshold=0.99).to_pandas()
    assert (pairs["cos"] >= 0.99).all() if len(pairs) else True
