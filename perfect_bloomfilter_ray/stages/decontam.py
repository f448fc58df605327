"""Benchmark decontamination: drop corpus documents containing any word
n-gram that also appears in a benchmark ("held-out test set") document.

The standard LLM training-data hygiene step (GPT-3 appendix C's 13-gram
filter; The Pile / Dolma decontamination): benchmarks are tiny next to the
corpus, so the blocklist of benchmark n-gram fingerprints is built once,
broadcast through the object store (``ray.put``), and the corpus streams
through ONE ``map_batches`` pass doing a vectorized rolling-hash membership
check — no shuffle anywhere, which is the only shape that survives 100 TB.

Matching semantics: tokens are ``[a-z0-9]+`` runs of the lowercased text; a
document is contaminated iff any of its ``n`` consecutive tokens equal some
``n`` consecutive tokens of a benchmark document. Fingerprints are 64-bit
(collision odds ~2^-64 per comparison), so the result is exact for any
realistic corpus and is oracle-checked against a string-containment SQL
formulation (`decontaminated_docs` in pipelines/queries.py).

For blocklists too large to broadcast exactly (hundreds of benchmarks), feed
the same hashes through a BloomCascade (state/bloom.py) and exact-verify only
the hits; the sorted-array check here IS the reference semantics.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

from perfect_bloomfilter_ray.functions.hashing import splitmix64

_U64 = np.uint64
_GOLD = _U64(0x9E3779B97F4A7C15)
_TOKEN_RE = r"[a-z0-9]+"


def _ngram_hashes(texts: pl.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling 64-bit hashes of all word n-grams in a batch of texts.

    Returns ``(hashes, doc_idx)``: one entry per n-gram occurrence, tagged
    with the row index it came from. One polars tokenize + explode and
    ``n - 1`` vectorized mix steps over the flattened token stream — no
    per-document Python loop.
    """
    toks = texts.str.to_lowercase().str.extract_all(_TOKEN_RE)
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls()
    if len(flat) == 0:
        return np.empty(0, _U64), np.empty(0, np.int64)
    h = flat.hash(seed=0xDEC0).to_numpy().astype(_U64, copy=True)
    # combined[i] = mix over tokens i .. i+n-1 (order-sensitive)
    c = h.copy()
    with np.errstate(over="ignore"):
        for k in range(1, n):
            c[: len(c) - k] = splitmix64(c[: len(c) - k] * _GOLD + h[k:])
    # valid starts: the window must not cross a document boundary
    doc_of = np.repeat(np.arange(len(lens)), lens)
    starts = np.flatnonzero(lens >= n)
    if len(starts) == 0:
        return np.empty(0, _U64), np.empty(0, np.int64)
    ends = np.cumsum(lens)
    begins = ends - lens
    # per-doc valid start positions in the flat array
    counts = np.maximum(lens - n + 1, 0)
    idx = np.repeat(begins, counts) + _ranges(counts)
    return c[idx], doc_of[idx]


def _ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated [0..c) ranges for each c in counts (vectorized)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    out = np.ones(total, np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    out[0] = 0
    nz = counts > 0
    first = starts[nz]
    out[first[1:]] = 1 - counts[nz][:-1]
    return np.cumsum(out)


def build_blocklist(
    benchmark: Dataset, text_col: str = "text", n: int = 5
) -> np.ndarray:
    """Sorted unique n-gram fingerprints of the benchmark set.

    The benchmark is the SMALL side by contract (test sets, not the corpus) —
    per-batch unique hashes stream back to the driver and are deduped once;
    the result is meant to be ``ray.put`` once and shared by every task.
    """

    def grams(t: pa.Table) -> pa.Table:
        hs, _ = _ngram_hashes(pl.from_arrow(t.column(text_col)), n)
        return pa.table({"h": pa.array(np.unique(hs).view(np.int64))})

    parts = [
        b.column("h").to_numpy()
        for b in benchmark.select_columns([text_col])
        .map_batches(grams, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.empty(0, _U64)
    return np.unique(np.concatenate(parts).view(_U64))


def decontaminate(
    docs: Dataset,
    blocklist: "np.ndarray | object",
    text_col: str = "text",
    n: int = 5,
    drop: bool = True,
    flag_col: str = "contaminated",
) -> Dataset:
    """Filter (or flag) corpus documents containing a blocklisted n-gram.

    ``blocklist`` is the sorted uint64 array from :func:`build_blocklist`, or
    a ``ray.ObjectRef`` to one (preferred: ``ray.put`` it once so every task
    on a node reads the same shared-memory copy instead of re-shipping it
    per task through the closure).
    """
    import ray

    ref = blocklist if isinstance(blocklist, ray.ObjectRef) else ray.put(blocklist)

    def check(t: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        hs, doc_idx = _ngram_hashes(pl.from_arrow(t.column(text_col)), n)
        hit = np.zeros(len(t), dtype=bool)
        if len(hs) and len(bl):
            pos = np.searchsorted(bl, hs)
            pos[pos == len(bl)] = 0
            m = bl[pos] == hs
            hit[doc_idx[m]] = True
        if drop:
            return t.filter(pa.array(~hit))
        return t.append_column(flag_col, pa.array(hit))

    return docs.map_batches(check, batch_format="pyarrow")


def contamination_fraction(
    docs: Dataset,
    blocklist: "np.ndarray | object",
    text_col: str = "text",
    n: int = 5,
    frac_col: str = "contam_frac",
    ngrams_col: str = "n_grams",
) -> Dataset:
    """Per-document containment score against a benchmark blocklist: the
    fraction of the document's DISTINCT word n-grams that appear in the
    benchmark set (Dolma/The-Pile-style graded decontamination — a 0/1
    any-hit flag treats one boilerplate overlap like a verbatim test-set
    copy; the fraction lets the pipeline threshold instead of hard-drop).

    Same scale shape as :func:`decontaminate`: blocklist broadcast once,
    one shuffle-free ``map_batches`` pass, per-doc distinct + membership
    resolved with one lexsort + searchsorted + bincount per batch. Docs
    with no n-gram (fewer than ``n`` tokens) score 0 over 0 grams.
    """
    import ray

    ref = blocklist if isinstance(blocklist, ray.ObjectRef) else ray.put(blocklist)

    def score(t: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        hs, doc_idx = _ngram_hashes(pl.from_arrow(t.column(text_col)), n)
        ngr = np.zeros(len(t), np.int64)
        hits = np.zeros(len(t), np.int64)
        if len(hs):
            order = np.lexsort((hs, doc_idx))
            d_s, h_s = doc_idx[order], hs[order]
            keep = np.ones(len(h_s), dtype=bool)
            keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            d_u, h_u = d_s[keep], h_s[keep]
            ngr = np.bincount(d_u, minlength=len(t)).astype(np.int64)
            if len(bl):
                pos = np.searchsorted(bl, h_u)
                pos[pos == len(bl)] = 0
                m = bl[pos] == h_u
                hits = np.bincount(d_u[m], minlength=len(t)).astype(np.int64)
        frac = hits / np.maximum(ngr, 1)
        return t.append_column(ngrams_col, pa.array(ngr)).append_column(
            frac_col, pa.array(frac, pa.float64())
        )

    return docs.map_batches(score, batch_format="pyarrow")


def build_blocklist_dataset(
    benchmark: Dataset, text_col: str = "text", n: int = 5
) -> Dataset:
    """Benchmark n-gram fingerprints as a DATASET (one ``h`` int64 column).

    The scale path for blocklists too large to ``ray.put`` exactly (hundreds
    of benchmarks, or decontaminating one corpus slice against another):
    fingerprints stay distributed in the object store and are joined, never
    concatenated on the driver. Per-batch unique only — cross-batch
    duplicates are harmless for membership and not worth a shuffle.
    """

    def grams(t: pa.Table) -> pa.Table:
        hs, _ = _ngram_hashes(pl.from_arrow(t.column(text_col)), n)
        return pa.table({"h": pa.array(np.unique(hs).view(np.int64))})

    return benchmark.select_columns([text_col]).map_batches(grams, batch_format="pyarrow")


def decontaminate_bloom(
    docs: Dataset,
    benchmark: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    expected_grams: int | None = None,
    drop: bool = True,
    flag_col: str = "contaminated",
) -> Dataset:
    """Decontamination with a Bloom-cascade prefilter — EXACT result.

    The sketch library powering a pipeline op (the shape ``decontaminate``'s
    docstring names): instead of broadcasting the full 8-bytes-per-gram exact
    blocklist, build the cascading Bloom filter over the benchmark's n-gram
    fingerprints (~2 bytes/gram at the default budgets — 4x less broadcast
    traffic, and the filter is mergeable so the build is one tree-reduce),
    probe every corpus n-gram against it in a shuffle-free ``map_batches``
    pass, and exact-verify ONLY the Bloom-positive (doc, gram) pairs with a
    distributed hash join against the blocklist Dataset. False positives die
    in the join, so the output equals :func:`decontaminate` bit-for-bit
    (oracle-checked by ``bloom_decontaminated_docs``); the near-zero-FP
    cascade keeps the verify join's input a sliver of the corpus.

    The final contaminated-id set is broadcast — it is O(#contaminated docs),
    tiny by the decontamination contract (if a large corpus fraction is
    contaminated, the blocklist is wrong, not the broadcast). For an
    unbounded variant, swap the filter pass for the co-partitioned anti-join
    used by ``stages/dedup.incremental_new_rows``.
    """
    import ray

    from perfect_bloomfilter_ray.config import BloomConfig
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.stages.partitioning import choose_join_partitions
    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    bl = build_blocklist_dataset(benchmark, text_col, n).materialize()
    cap = expected_grams or max(1024, bl.count())
    bloom = sketch_global(bl, "h", lambda: BloomCascade.for_capacity(cap, BloomConfig()))
    bloom_ref = ray.put(bloom.to_bytes())

    def probe(t: pa.Table) -> pa.Table:
        from perfect_bloomfilter_ray.state.bloom import BloomCascade as BC

        f = BC.from_bytes(ray.get(bloom_ref))
        hs, doc_idx = _ngram_hashes(pl.from_arrow(t.column(text_col)), n)
        ids = t.column(id_col).to_numpy()
        if len(hs) == 0:
            return pa.table(
                {id_col: pa.array([], t.schema.field(id_col).type), "h": pa.array([], pa.int64())}
            )
        # distinct (doc, gram) before probing: repeated boilerplate grams
        # inside one doc probe once
        order = np.lexsort((hs, doc_idx))
        d_s, h_s = doc_idx[order], hs[order]
        keep = np.ones(len(h_s), dtype=bool)
        keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        d_u, h_u = d_s[keep], h_s[keep]
        hit = f.contains_column(pa.array(h_u.view(np.int64)))
        return pa.table({id_col: pa.array(ids[d_u[hit]]), "h": pa.array(h_u[hit].view(np.int64))})

    cand = docs.select_columns([id_col, text_col]).map_batches(probe, batch_format="pyarrow")
    verified = cand.join(
        bl, "inner", num_partitions=choose_join_partitions(), on=("h",), right_on=("h",)
    )
    bad_parts = [
        b.column(id_col).to_numpy()
        for b in verified.select_columns([id_col]).iter_batches(batch_format="pyarrow")
    ]
    bad = np.unique(np.concatenate(bad_parts)) if bad_parts else np.empty(0, np.int64)
    bad_ref = ray.put(bad)

    def finish(t: pa.Table) -> pa.Table:
        b = ray.get(bad_ref)
        ids = t.column(id_col).to_numpy()
        hit = np.zeros(len(t), dtype=bool)
        if len(b):
            pos = np.searchsorted(b, ids)
            pos[pos == len(b)] = 0
            hit = b[pos] == ids
        if drop:
            return t.filter(pa.array(~hit))
        return t.append_column(flag_col, pa.array(hit))

    return docs.map_batches(finish, batch_format="pyarrow")
