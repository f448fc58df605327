"""Deterministic text embeddings — hashed bag-of-words random projection.

The container has no model runtimes, so the embedding column for
scale-testing the ANN / embedding-near-dup stages comes from a seeded,
fully deterministic feature-hash projection (the classic hashing trick,
Weinberger et al. 2009): each word hashes to a bucket and a sign, the
bucketed counts are projected onto a fixed seeded Gaussian matrix and
L2-normalized. Properties that matter for the pipelines:

- deterministic per text (same bytes → same vector, any process/engine);
- near-duplicate texts → high cosine (word multiset overlap dominates);
- vectorized end-to-end (polars word hashing + one reduceat + one matmul).

A real model slots in behind the same column contract (``list<float>[dim]``)
via an actor-pool ``map_batches`` stage (weights loaded once per actor).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from perfect_bloomfilter_ray.functions.hashing import splitmix64

_U64 = np.uint64
_EMB_SEED = 0xE3BED5EED


def _projection(n_buckets: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_buckets, dim)).astype(np.float32) / np.sqrt(dim)


class TextEmbedder:
    """Actor-pool batch callable: text column → ``embedding`` list<float>[dim].

    The projection matrix (n_buckets × dim) is built once per actor in
    ``__init__`` — the model-weights pattern; swap ``_projection`` for real
    weights without touching the pipeline.
    """

    def __init__(self, text_col: str = "text", dim: int = 64, n_buckets: int = 4096, seed: int = 17):
        self._text_col = text_col
        self._dim = dim
        self._n_buckets = n_buckets
        self._proj = _projection(n_buckets, dim, seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column(self._text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        s = pl.from_arrow(texts)
        norm = (
            s.str.to_lowercase()
            .str.replace_all(r"[^\w\s]", " ")
            .str.replace_all(r"\s+", " ")
            .str.strip_chars()
        )
        words = norm.str.split(" ")
        counts = np.maximum(words.list.len().to_numpy().astype(np.int64), 1)
        flat = words.explode().hash(seed=_EMB_SEED).to_numpy().astype(_U64)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        n = len(counts)

        bucket = (flat % _U64(self._n_buckets)).astype(np.int64)
        sign = np.where((splitmix64(flat) >> _U64(63)).astype(bool), 1.0, -1.0).astype(np.float32)
        # per-doc bucketed signed counts via one scatter-add into a (n, B) block
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        bow = np.zeros((n, self._n_buckets), dtype=np.float32)
        np.add.at(bow, (doc_idx, bucket), sign)
        vecs = bow @ self._proj  # (n, dim)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.maximum(norms, 1e-12)
        return t.append_column(
            "embedding",
            pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel()), self._dim),
        )


def embed_pages(ds, text_col: str = "text", dim: int = 64, concurrency=(2, 8), batch_size: int = 512):
    """Add a deterministic ``embedding`` column to a text Dataset
    (actor pool; projection built once per actor)."""
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs={"text_col": text_col, "dim": dim},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
