"""Deduplication stages — exact and near-duplicate, Ray-Data-first.

All stages follow the same scale shape: vectorized per-batch signature
computation (map_batches, zero-copy Arrow) → a shuffle ONLY of small
signature rows (never of document payloads) → per-group verification.

- ``exact_dedup``        content-hash partition + per-group keep-first
- ``minhash_lsh_pairs``  shingle → minhash (P perms) → banded LSH buckets →
                         groupby(band, band_hash) → candidate pairs +
                         minhash-estimated Jaccard
- ``simhash_pairs``      64-bit simhash → pigeonhole band buckets →
                         Hamming-verified pairs
- ``ngram_jaccard_verify`` exact n-gram Jaccard for a candidate-pair table
                         (join back to texts — the verify step after LSH)
- ``embedding_neardup_pairs`` random-hyperplane LSH buckets over an embedding
                         column → exact cosine verification within buckets

Partitioning assumption (documented per SURVEY §2.3 "custom operators"): a
duplicate pair is discovered iff it shares ≥1 LSH bucket; bucket sizes stay
small because signatures are uniform hashes — hot buckets (boilerplate text)
are capped by ``max_bucket`` with a log line, the standard web-dedup practice.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64
from perfect_bloomfilter_ray.functions.text import fingerprint64
from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

_U64 = np.uint64


# ---------------------------------------------------------------- exact dedup

def exact_dedup(
    ds: Dataset, text_col: str, id_col: str, normalize: bool = False, num_blocks: int | None = None
) -> Dataset:
    """Keep the lowest-id row per distinct text (hash-partitioned).

    The shuffle key is the 64-bit content fingerprint, not the text itself —
    groups co-locate by hash; the group fn then verifies on the real column
    so a fingerprint collision cannot merge two distinct texts.
    """
    num_blocks = choose_num_blocks(ds, num_blocks)

    # Coarse hash partition (fp % num_blocks) so equal texts co-locate, then
    # ONE vectorized keep-first per partition group. groupby on the raw
    # fingerprint would pay a Python map_groups call per distinct text;
    # num_blocks groups keep the per-group overhead at O(num_blocks) while
    # the inside stays polars-vectorized. Raise num_blocks with cluster size.
    def add_part(t: pa.Table) -> pa.Table:
        fp = fingerprint64(t.column(text_col), normalize=normalize)
        part = (fp.to_numpy().view(np.uint64) % _U64(num_blocks)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def keep_first_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        if normalize:
            # dedup key = normalized text (same normalization the routing
            # fingerprint uses), so formatting variants collapse to one doc
            df = df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.replace_all(r"[^\w\s]", "")
                .str.replace_all(r"\s+", " ")
                .str.strip_chars()
                .alias("_norm")
            )
            out = df.sort(id_col).unique(subset=["_norm"], keep="first", maintain_order=True)
            return out.to_arrow().drop_columns(["_part", "_norm"])
        out = df.sort(id_col).unique(subset=[text_col], keep="first", maintain_order=True)
        return out.to_arrow().drop_columns(["_part"])

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(keep_first_block, batch_format="pyarrow")
    )


# ------------------------------------------------------------- minhash + LSH

_SHINGLE_SEED = 0x5EED5EED
_PERM_A = splitmix64(np.arange(1, 257, dtype=_U64) * _U64(0x9E3779B97F4A7C15)) | _U64(1)
_PERM_B = splitmix64(np.arange(1, 257, dtype=_U64) * _U64(0xC2B2AE3D27D4EB4F))


def _word_hashes(texts: pl.Series, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Normalize → split to words → per-word 64-bit hashes, flat + row offsets.

    Empty texts contribute one sentinel word (polars explode yields one null
    row), so offsets always cover every doc.
    """
    norm = (
        texts.str.to_lowercase()
        .str.replace_all(r"[^\w\s]", " ")
        .str.replace_all(r"\s+", " ")
        .str.strip_chars()
    )
    words = norm.str.split(" ")
    counts = np.maximum(words.list.len().to_numpy().astype(np.int64), 1)
    flat = words.explode().hash(seed=seed).to_numpy().astype(_U64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    assert offsets[-1] == len(flat)
    return flat, offsets


def _shingle_hashes(texts: pl.Series, shingle_words: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word-shingle 64-bit hashes; returns (flat_hashes, doc_offsets).

    Shingle hash = splitmix of the weighted sum of its w word hashes —
    computed as w shifted adds over the flat word-hash array (no explode of
    string windows). Docs shorter than w words get one whole-doc shingle.
    """
    flat, w_off = _word_hashes(texts, _SHINGLE_SEED)
    counts = np.diff(w_off)
    n_sh = np.maximum(counts - shingle_words + 1, 1)
    sh_off = np.concatenate([[0], np.cumsum(n_sh)])

    # rolling combine over flat words: comb[i] = Σ_j flat[i+j]·C_j
    comb = np.zeros(len(flat), dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(shingle_words):
            c = _U64(0x9E3779B97F4A7C15 + 2 * j + 1)
            shifted = flat[j:] * c
            comb[: len(shifted)] += shifted
    comb = splitmix64(comb)

    # take the first n_sh[r] combos of each row (handles short docs: their
    # single "shingle" mixes whatever words exist plus the next row's words —
    # avoid that by overriding short rows with their own whole-doc combine)
    out = np.empty(int(sh_off[-1]), dtype=_U64)
    short = counts < shingle_words
    take_idx = _ranges(w_off[:-1], n_sh)
    out[:] = comb[take_idx]
    if short.any():
        # whole-doc hash for short rows (exact, no neighbor contamination)
        with np.errstate(over="ignore"):
            whole = np.add.reduceat(flat * _U64(0x9E3779B97F4A7C15), w_off[:-1])
        out[sh_off[:-1][short]] = splitmix64(whole[short])
    return out, sh_off


def _ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenated [starts[i], starts[i]+lengths[i]) index ranges, vectorized."""
    total = int(lengths.sum())
    if total == 0 or len(starts) == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(lengths)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - starts[:-1] - lengths[:-1] + 1
    return np.cumsum(out)


def _minhash_matrix_perm(flat: np.ndarray, offsets: np.ndarray, num_perms: int) -> np.ndarray:
    """(n_docs, P) classic minhash via P affine permutations + reduceat.

    Exact K-perm minwise hashing; O(P) passes over the shingle array — at
    ~0.6 ms/doc it is memory-bandwidth-bound and the scale bottleneck. Kept
    as the reference implementation; the default build path is OPH below.
    """
    n_docs = len(offsets) - 1
    out = np.empty((n_docs, num_perms), dtype=_U64)
    nonempty = np.diff(offsets) > 0
    with np.errstate(over="ignore"):
        for p in range(num_perms):
            ph = flat * _PERM_A[p] + _PERM_B[p]
            mins = np.full(n_docs, np.iinfo(np.uint64).max, dtype=_U64)
            if len(ph):
                red = np.minimum.reduceat(ph, offsets[:-1][nonempty])
                mins[nonempty] = red
            out[:, p] = mins
    return out


def _minhash_matrix(flat: np.ndarray, offsets: np.ndarray, num_perms: int) -> np.ndarray:
    """(n_docs, P) minhash matrix via One-Permutation Hashing with rotation
    densification (Li, Owen & Zhang 2012; Shrivastava & Li 2014).

    ONE pass over the shingle hashes: each hash lands in bin ``h % P`` and the
    per-(doc, bin) minimum is the sketch value; empty bins borrow the value of
    the nearest non-empty bin to their left (circularly), which keeps
    ``P(sig_a[j] == sig_b[j]) ≈ J`` unbiased. ~25x faster than the classic
    K-perm matrix and O(1) memory passes — the 100 TB-scale path. The
    estimator and LSH banding downstream are unchanged.
    """
    n_docs = len(offsets) - 1
    P = num_perms
    sentinel = np.iinfo(np.uint64).max
    if n_docs == 0:
        return np.empty((0, P), dtype=_U64)
    counts = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    bins = (flat % _U64(P)).astype(np.int64)
    sig = np.full(n_docs * P, sentinel, dtype=_U64)
    np.minimum.at(sig, doc_idx * P + bins, flat)
    sig = sig.reshape(n_docs, P)

    filled = sig != sentinel
    if filled.all():
        return sig
    # circular forward-fill: index of nearest filled bin at-or-before j
    col = np.arange(P, dtype=np.int64)[None, :]
    idx = np.where(filled, col, np.int64(-1))
    ff = np.maximum.accumulate(idx, axis=1)
    wrap = ff < 0  # positions before the doc's first filled bin wrap around
    if wrap.any():
        last = ff[:, -1]  # every doc has >=1 shingle -> >=1 filled bin
        rows = np.nonzero(wrap)[0]
        ff[wrap] = last[rows]
    return np.take_along_axis(sig, ff, axis=1)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 LSH band-bucket keys from an (n_docs, P)
    minhash signature matrix (P must be divisible by bands)."""
    n, num_perms = sig.shape
    assert num_perms % bands == 0
    rows_per_band = num_perms // bands
    out = np.empty((n, bands), dtype=_U64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            band = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            out[:, b] = splitmix64(
                band[:, 0] * _U64(0xA0761D6478BD642F)
                + sum(
                    band[:, j] * _U64(0xE7037ED1A0B428DB + 2 * j)
                    for j in range(1, rows_per_band)
                )
            )
    return out


def minhash_signatures(
    ds: Dataset, text_col: str, id_col: str, num_perms: int = 128, shingle_words: int = 5
) -> Dataset:
    """Dataset of (id, sig: list<uint64>[P]) minhash signatures."""

    def sig(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(t.column(text_col).combine_chunks() if isinstance(t.column(text_col), pa.ChunkedArray) else t.column(text_col))
        flat, offsets = _shingle_hashes(texts, shingle_words)
        mat = _minhash_matrix(flat, offsets, num_perms)
        return pa.table(
            {
                id_col: t.column(id_col),
                "sig": pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel().astype(np.uint64)), num_perms),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow")


def wminhash_signatures(
    ds: Dataset, text_col: str, id_col: str, num_perms: int = 64
) -> Dataset:
    """Dataset of (id, sig: list<uint64>[P]) ICWS WEIGHTED minhash
    signatures: per-doc term-FREQUENCY vectors sampled with Ioffe's
    consistent weighted sampling (state/wminhash.py), each (feature, t)
    sample condensed to one u64 — two docs collide on a sample with
    probability exactly their weighted Jaccard, so the unchanged LSH
    banding + collision-fraction verify downstream estimate J_w instead of
    set Jaccard. The right dedup lens when MULTIPLICITY matters (boilerplate
    pages that repeat one template block 50× vs once are near-identical as
    SETS but far apart weighted)."""
    from perfect_bloomfilter_ray.state.wminhash import icws_signature

    def sig(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(
            t.column(text_col).combine_chunks()
            if isinstance(t.column(text_col), pa.ChunkedArray)
            else t.column(text_col)
        )
        words = (
            texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        )
        counts = words.list.len().to_numpy().astype(np.int64)
        flat = words.explode().hash(seed=0x1C57).to_numpy().astype(_U64)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        n = len(counts)
        out = np.zeros((n, num_perms), dtype=_U64)
        for i in range(n):  # per-doc sampler; within-doc fully vectorized
            seg = flat[offsets[i] : offsets[i + 1]]
            if len(seg) == 0:
                continue
            uh, uc = np.unique(seg, return_counts=True)
            s = icws_signature(uh, uc.astype(np.float64), num_perms)
            with np.errstate(over="ignore"):
                out[i] = splitmix64(
                    s[:, 0].view(_U64) ^ splitmix64(s[:, 1].view(_U64))
                )
        return pa.table(
            {
                id_col: t.column(id_col),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(out.ravel()), num_perms
                ),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow")


def wminhash_lsh_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perms: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    **kwargs,
) -> Dataset:
    """Weighted near-duplicate pairs: ICWS signatures through the UNCHANGED
    LSH banding/bucketing/verify engine of :func:`minhash_lsh_pairs`
    (``est_jaccard`` in the output is the estimated WEIGHTED Jaccard)."""
    return minhash_lsh_pairs(
        ds,
        text_col,
        id_col,
        num_perms=num_perms,
        bands=bands,
        threshold=threshold,
        signatures=wminhash_signatures(ds, text_col, id_col, num_perms),
        **kwargs,
    )


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perms: int = 128,
    bands: int = 16,
    shingle_words: int = 5,
    threshold: float = 0.7,
    max_bucket: int = 64,
    num_blocks: int | None = None,
    broadcast_max_pairs: int = 500_000,
    signatures: Dataset | None = None,
) -> Dataset:
    """Near-duplicate candidate pairs with minhash-estimated Jaccard ≥ threshold.

    Output columns: (id_a, id_b, est_jaccard), id_a < id_b, deduplicated.
    Shuffle moves only (band, band_hash, id, sig) rows.

    Verification is size-gated: candidate pair sets up to
    ``broadcast_max_pairs`` resolve signatures via one broadcast (fast path,
    driver footprint bounded by the threshold); larger sets stay Datasets
    end-to-end and resolve signatures with a distributed hash-join — at a
    web-corpus dup rate the pair set is O(corpus) and must never be collected.

    ``signatures``: optionally a precomputed ``(id_col, sig:
    fixed_size_list<uint64>[num_perms])`` Dataset — everything downstream
    of signature computation (banding, bucketed pair generation, verify) is
    signature-scheme-agnostic, so alternative samplers (ICWS weighted
    minhash via :func:`wminhash_lsh_pairs`) reuse the whole engine; the
    collision fraction then estimates THAT scheme's similarity.
    """
    assert num_perms % bands == 0
    import ray

    num_blocks = choose_num_blocks(ds, num_blocks)

    # Materialized once because two consumers read it (banding now, candidate
    # verification later) — recomputing would shingle+hash every document
    # twice. The signature table is ~P·8 B/doc (~1 KB), ≈1% of corpus bytes;
    # it lives in the object store and spills, never the driver heap.
    if signatures is None:
        signatures = minhash_signatures(ds, text_col, id_col, num_perms, shingle_words)
    sigs = signatures.materialize()

    # Bucket with ID-ONLY rows: the shuffle moves 16 B/row, not the full
    # 128x8 B signature replicated per band (a 60x payload cut — at 100 TB
    # the difference between a groupby that fits and one that doesn't).
    # Ids travel as int64 (hash64 of the id column when it is not already an
    # integer): pair generation + dedup shuffle fixed-width ints instead of
    # e.g. url strings (measured 10x+ on a near-dup-heavy 1M-doc corpus);
    # original ids are restored from the candidate signature table at the
    # end. A 64-bit id collision (P ~ n^2/2^64) could alias two docs into one
    # pair — the est-jaccard verify then scores the wrong signature pair and
    # the pair is dropped or kept per that score; no corruption beyond that.
    # The band index is mixed INTO the bucket hash so one uniform int64 key
    # both partitions and groups; a cross-band 64-bit collision merely adds a
    # candidate pair that verification discards.
    from perfect_bloomfilter_ray.functions.hashing import hash64

    id_field = sigs.schema().base_schema.field(id_col)
    ids_are_ints = pa.types.is_integer(id_field.type)

    def _id64_of(col) -> np.ndarray:
        if ids_are_ints:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return hash64(col, 0x1D64).view(np.int64)

    def band_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        sig = np.asarray(t.column("sig").combine_chunks().flatten()).reshape(n, num_perms)
        id64 = _id64_of(t.column(id_col))
        bh_all = band_hashes(sig, bands)  # (n, bands)
        with np.errstate(over="ignore"):
            mixed = splitmix64(
                bh_all.T + (np.arange(bands, dtype=_U64) * _U64(0x9E3779B97F4A7C15))[:, None]
            )
        return pa.table(
            {
                # int64 bit-view: Ray's aggregate key path overflows on uint64
                "bhash": pa.array(mixed.ravel().view(np.int64)),
                # coarse partition id: the groupby key (num_blocks groups,
                # vectorized bucket logic inside — not one Python call per
                # 64-bit bucket)
                "_part": pa.array((mixed.ravel() % _U64(num_blocks)).astype(np.int32)),
                "_id64": pa.array(np.tile(id64, bands)),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    # Pair generation runs once per coarse partition (complete buckets per
    # partition by construction), vectorized inside — NOT one map_groups call
    # per 64-bit bucket, whose per-group Python overhead dominates when there
    # are ~#docs×bands tiny buckets.
    def pairs_in_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        if len(t) < 2:
            return empty
        bh = t.column("bhash").to_numpy()
        ids = t.column("_id64").to_numpy()
        # sort by (bucket, id): group slices below need bucket contiguity, and
        # id-order within a bucket makes the max_bucket cap deterministic
        # (lowest ids kept) regardless of block arrival order
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
        _, starts, counts = np.unique(bh, return_index=True, return_counts=True)
        # vectorize by bucket SIZE class: one gather + one triu per distinct
        # clipped size (<= max_bucket iterations total) — a per-bucket Python
        # loop dominates on near-dup-heavy corpora with 10^5+ hot buckets
        big = np.nonzero(counts > 1)[0]
        if not len(big):
            return empty
        cl = np.minimum(counts[big], max_bucket).astype(np.int64)
        out_a, out_b = [], []
        for c in np.unique(cl):
            sel = big[cl == c]
            idx = starts[sel][:, None] + np.arange(c)[None, :]
            gmat = ids[idx]  # rows already ascending (lexsort by id above)
            ii, jj = np.triu_indices(int(c), k=1)
            out_a.append(gmat[:, ii].ravel())
            out_b.append(gmat[:, jj].ravel())
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
            }
        )

    pairs = banded.groupby("_part").map_groups(pairs_in_block, batch_format="pyarrow")

    # a pair surfaces once per colliding band → dedup on a coarse partition
    # of the pair hash with one vectorized lexsort+diff per partition (a
    # two-key sort-based groupby over millions of pair rows measured 4x
    # slower on a near-dup-heavy corpus)
    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy().view(_U64)
        b = t.column("id_b").to_numpy().view(_U64)
        with np.errstate(over="ignore"):
            mix = splitmix64(a * _U64(0x9E3779B97F4A7C15) + b)
        return t.append_column("_ppart", pa.array((mix % _U64(num_blocks)).astype(np.int32)))

    def dedup_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        keep = np.empty(len(a), dtype=bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return pa.table({"id_a": pa.array(a[keep]), "id_b": pa.array(b[keep])})

    cand = (
        pairs.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("_ppart")
        .map_groups(dedup_part, batch_format="pyarrow")
    )

    # Verify: estimated Jaccard = matching signature fraction, computed only
    # for candidate pairs. The pair set size is what gates the strategy:
    # count it (cand is materialized by the groupby) and never collect it.
    import ray.data as rd

    cand = cand.materialize()
    n_cand = cand.count()
    out_id_type = id_field.type
    if n_cand == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], out_id_type),
                    "id_b": pa.array([], out_id_type),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        )

    if n_cand <= broadcast_max_pairs:
        return _verify_pairs_broadcast(
            cand, sigs, id_col, _id64_of, num_perms, threshold, n_cand
        )
    return _verify_pairs_join(cand, sigs, id_col, _id64_of, num_perms, threshold, num_blocks)


def _verify_pairs_broadcast(
    cand: Dataset,
    sigs: Dataset,
    id_col: str,
    _id64_of,
    num_perms: int,
    threshold: float,
    n_cand: int,
) -> Dataset:
    """Small-pair-set verify: candidate ids collected (bounded by the
    broadcast gate, NOT corpus size), their signatures semi-filtered out of
    the signature stream and broadcast to a final map over the pairs."""
    import ray
    import ray.data as rd

    cand_tbl = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_pydict(b)
        for b in cand.iter_batches(batch_format="pyarrow")
    )
    need = pc.unique(
        pa.concat_arrays(
            [cand_tbl.column("id_a").combine_chunks(), cand_tbl.column("id_b").combine_chunks()]
        )
    )
    need_ref = ray.put(need)

    def keep_needed(t: pa.Table) -> pa.Table:
        id64 = pa.array(_id64_of(t.column(id_col)))
        t = t.append_column("_id64", id64)
        return t.filter(pc.is_in(id64, value_set=ray.get(need_ref)))

    sig_small = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_pydict(b)
        for b in sigs.map_batches(keep_needed, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    # Broadcast plain numpy (sorted by id64) rather than the Arrow table:
    # numpy rides the object store zero-copy, and tasks resolve pair ids with
    # searchsorted — no per-task combine_chunks copy of the (potentially
    # hundreds of MB) signature matrix and no per-call index_in hash build
    # (measured 5x on a 1.7M-candidate corpus).
    id64_all = sig_small.column("_id64").to_numpy(zero_copy_only=False)
    sort_order = np.argsort(id64_all, kind="stable")
    id64_sorted = np.ascontiguousarray(id64_all[sort_order])
    mat_sorted = np.ascontiguousarray(
        np.asarray(sig_small.column("sig").combine_chunks().flatten())
        .reshape(len(sig_small), num_perms)[sort_order]
    )
    orig_sorted = (
        sig_small.column(id_col).combine_chunks()
        if isinstance(sig_small.column(id_col), pa.ChunkedArray)
        else sig_small.column(id_col)
    ).take(pa.array(sort_order))
    id64_ref = ray.put(id64_sorted)
    mat_ref = ray.put(mat_sorted)
    orig_ref = ray.put(orig_sorted)

    def verify(t: pa.Table) -> pa.Table:
        id64s = ray.get(id64_ref)
        mat = ray.get(mat_ref)
        ia = np.searchsorted(id64s, t.column("id_a").to_numpy())
        ib = np.searchsorted(id64s, t.column("id_b").to_numpy())
        est = (mat[ia] == mat[ib]).mean(axis=1)
        keep = est >= threshold
        ia, ib, est = ia[keep], ib[keep], est[keep]
        # map back to original ids; enforce id_a < id_b on the ORIGINAL ids
        orig = ray.get(orig_ref)
        a = orig.take(pa.array(ia))
        b = orig.take(pa.array(ib))
        swap = pc.greater(a, b)
        out_a = pc.if_else(swap, b, a)
        out_b = pc.if_else(swap, a, b)
        return pa.table({"id_a": out_a, "id_b": out_b, "est_jaccard": pa.array(est)})

    # parallelize verification: cand_tbl arrives as one block; split it so
    # the signature-gather compare runs across the pool
    cand_ds = rd.from_arrow(cand_tbl)
    if n_cand > 10_000:
        cand_ds = cand_ds.repartition(min(64, 1 + n_cand // 10_000))
    return cand_ds.map_batches(verify, batch_format="pyarrow")


def _verify_pairs_join(
    cand: Dataset,
    sigs: Dataset,
    id_col: str,
    _id64_of,
    num_perms: int,
    threshold: float,
    num_blocks: int,
) -> Dataset:
    """Large-pair-set verify: resolve each pair side's signature with a
    distributed equi-join (two passes, one per pair side — the necessary
    shuffle cost at O(corpus) pair counts), then compare signatures
    vectorized per partition. The pair set never touches the driver.

    The join is the repo's coarse-hash-partition shape (union both sides
    tagged, groupby hash(key) % num_blocks, searchsorted resolve inside) —
    NOT ``Dataset.join``: Acero rejects fixed_size_list payload columns
    (the signature), and concurrent join-aggregator actor pools deadlock on
    small CPU counts.

    The dominant cost is shuffling the ~1 KB/doc signature rows, twice (one
    pass per pair side). Before either pass, the signature stream is
    semi-filtered against a broadcast Bloom cascade of the candidate ids
    (built distributed over ``cand``, compact to ship) — only ~dup-rate of
    the corpus's signatures enter the shuffles; false positives merely ship
    a few extra rows. Measured 4x end-to-end on an 18%-dup 200k-doc corpus."""
    import ray

    from perfect_bloomfilter_ray.stages.membership import build_filter
    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    sig_type = pa.list_(pa.uint64(), num_perms)
    orig_type = sigs.schema().base_schema.field(id_col).type

    def part_of(k: np.ndarray) -> pa.Array:
        return pa.array((splitmix64(k.view(_U64)) % _U64(num_blocks)).astype(np.int32))

    # ---- candidate-id Bloom prefilter over the signature stream ----
    def cand_ids(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_id": pa.array(
                    np.concatenate([t.column("id_a").to_numpy(), t.column("id_b").to_numpy()])
                )
            }
        )

    n_cand = cand.count()  # cand is materialized by the caller
    need_bloom = build_filter(
        cand.map_batches(cand_ids, batch_format="pyarrow"), "_id", expected_keys=max(1024, 2 * n_cand)
    )
    bloom_ref = ray.put(need_bloom.to_bytes())

    def keep_candidate_sigs(t: pa.Table) -> pa.Table:
        f = BloomCascade.from_bytes(ray.get(bloom_ref))
        k = _id64_of(t.column(id_col))
        mask = f.contains_column(pa.array(k))
        t = t.append_column("_k64", pa.array(k))
        return t.filter(pa.array(mask))

    # filtered + materialized ONCE; both passes re-read these object-store
    # blocks instead of re-scanning (and re-shipping) the full signature
    # table. Repartition to the CPU count: the groupby's map-side sort
    # parallelism equals the upstream block count, and a single-file input
    # otherwise serializes the whole shuffle onto one task (measured 49 s for
    # an identity groupby on one 200 MB block vs 4 s split 16 ways).
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        cpus = 8
    sigs = (
        sigs.map_batches(keep_candidate_sigs, batch_format="pyarrow")
        .repartition(max(16, cpus))
        .materialize()
    )

    # ---- pass 1: resolve sig/orig of id_a, re-key rows by id_b ----
    def sig_rows(t: pa.Table) -> pa.Table:
        k = t.column("_k64").to_numpy()
        n = len(t)
        return pa.table(
            {
                "_k": pa.array(k),
                "_other": pa.nulls(n, pa.int64()),
                "_sig": t.column("sig").combine_chunks() if isinstance(t.column("sig"), pa.ChunkedArray) else t.column("sig"),
                "_orig": t.column(id_col),
                "_sig_a": pa.nulls(n, sig_type),
                "_orig_a": pa.nulls(n, orig_type),
                "_part": part_of(k),
                "_tag": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def cand_rows(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        n = len(t)
        return pa.table(
            {
                "_k": pa.array(a),
                "_other": t.column("id_b"),
                "_sig": pa.nulls(n, sig_type),
                "_orig": pa.nulls(n, orig_type),
                "_sig_a": pa.nulls(n, sig_type),
                "_orig_a": pa.nulls(n, orig_type),
                "_part": part_of(a),
                "_tag": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def resolve(t: pa.Table, rekey: bool) -> pa.Table:
        """Within one partition: probe rows (_tag=1) gather _sig/_orig of the
        sig rows (_tag=0) matching their _k; emit probe rows only, with the
        gathered values in _sig_a/_orig_a and (when rekey) _k := _other."""
        tag = t.column("_tag").to_numpy()
        sig_mask, probe_mask = tag == 0, tag == 1
        probe = t.filter(pa.array(probe_mask))
        n = len(probe)
        if n == 0:
            return probe
        st = t.filter(pa.array(sig_mask))
        skeys = st.column("_k").to_numpy()
        order = np.argsort(skeys, kind="stable")
        skeys_s = skeys[order]
        pos = np.searchsorted(skeys_s, probe.column("_k").to_numpy())
        pos = np.minimum(pos, max(len(skeys_s) - 1, 0))
        found = len(skeys_s) > 0
        hit = (skeys_s[pos] == probe.column("_k").to_numpy()) if found else np.zeros(n, bool)
        probe = probe.filter(pa.array(hit))  # inner-join semantics
        take = pa.array(order[pos[hit]], pa.int64())
        sig_src = st.column("_sig")
        orig_src = st.column("_orig")
        if isinstance(sig_src, pa.ChunkedArray):
            sig_src = sig_src.combine_chunks()
        if isinstance(orig_src, pa.ChunkedArray):
            orig_src = orig_src.combine_chunks()
        new_k = probe.column("_other") if rekey else probe.column("_k")
        return pa.table(
            {
                "_k": new_k,
                "_other": probe.column("_k") if rekey else probe.column("_other"),
                "_sig": probe.column("_sig"),
                "_orig": probe.column("_orig"),
                "_sig_a": sig_src.take(take),
                "_orig_a": orig_src.take(take),
                "_part": probe.column("_part"),
                "_tag": probe.column("_tag"),
            }
        )

    def repart(t: pa.Table) -> pa.Table:
        k = t.column("_k").to_numpy()
        return t.set_column(t.schema.get_field_index("_part"), "_part", part_of(k))

    pass1 = (
        sigs.map_batches(sig_rows, batch_format="pyarrow")
        .union(cand.map_batches(cand_rows, batch_format="pyarrow"))
        .groupby("_part")
        .map_groups(lambda t: resolve(t, rekey=True), batch_format="pyarrow")
        .map_batches(repart, batch_format="pyarrow")
    )

    # ---- pass 2: rows now keyed by id_b; resolve its sig/orig and verify ----
    def verify_part(t: pa.Table) -> pa.Table:
        tag = t.column("_tag").to_numpy()
        probe = t.filter(pa.array(tag == 1))
        st = t.filter(pa.array(tag == 0))
        empty = pa.table(
            {
                "id_a": pa.array([], orig_type),
                "id_b": pa.array([], orig_type),
                "est_jaccard": pa.array([], pa.float64()),
            }
        )
        n = len(probe)
        if n == 0 or len(st) == 0:
            return empty
        skeys = st.column("_k").to_numpy()
        order = np.argsort(skeys, kind="stable")
        skeys_s = skeys[order]
        pos = np.minimum(np.searchsorted(skeys_s, probe.column("_k").to_numpy()), len(skeys_s) - 1)
        hit = skeys_s[pos] == probe.column("_k").to_numpy()
        probe = probe.filter(pa.array(hit))
        take = pa.array(order[pos[hit]], pa.int64())
        smat = np.asarray(
            (st.column("_sig").combine_chunks() if isinstance(st.column("_sig"), pa.ChunkedArray) else st.column("_sig")).flatten()
        ).reshape(len(st), num_perms)
        A = np.asarray(
            (probe.column("_sig_a").combine_chunks() if isinstance(probe.column("_sig_a"), pa.ChunkedArray) else probe.column("_sig_a")).flatten()
        ).reshape(len(probe), num_perms)
        B = smat[order[pos[hit]]]
        est = (A == B).mean(axis=1) if len(probe) else np.empty(0)
        keep = est >= threshold
        probe = probe.filter(pa.array(keep))
        orig_src = st.column("_orig")
        if isinstance(orig_src, pa.ChunkedArray):
            orig_src = orig_src.combine_chunks()
        b = orig_src.take(take.filter(pa.array(keep)))
        a = probe.column("_orig_a")
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        swap = pc.greater(a, b)
        return pa.table(
            {
                "id_a": pc.if_else(swap, b, a),
                "id_b": pc.if_else(swap, a, b),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    return (
        sigs.map_batches(sig_rows, batch_format="pyarrow")
        .union(pass1)
        .groupby("_part")
        .map_groups(verify_part, batch_format="pyarrow")
    )



def _dedup_pairs(pairs: Dataset, num_blocks: int | None = None) -> Dataset:
    """Drop duplicate (id_a, id_b) rows (same pair surfacing from several
    bands/tables; its value column is identical on every surfacing). Coarse
    hash partition + one vectorized lexsort/diff per partition — a two-key
    sort-based groupby measured 4x slower at millions of pair rows."""
    num_blocks = choose_num_blocks(pairs, num_blocks)

    def add_part(t: pa.Table) -> pa.Table:
        a = hash64(t.column("id_a"), 0xDE0) 
        b = hash64(t.column("id_b"), 0xDE1)
        with np.errstate(over="ignore"):
            mix = splitmix64(a * _U64(0x9E3779B97F4A7C15) + b)
        return t.append_column("_ppart", pa.array((mix % _U64(num_blocks)).astype(np.int32)))

    def dedup_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_ppart"])
        if len(t) < 2:
            return t
        df = pl.from_arrow(t)
        return df.unique(subset=["id_a", "id_b"], keep="first", maintain_order=False).to_arrow()

    return pairs.map_batches(add_part, batch_format="pyarrow").groupby("_ppart").map_groups(
        dedup_part, batch_format="pyarrow"
    )


# ------------------------------------------------------------------- simhash

def simhash64(texts: pl.Series) -> np.ndarray:
    """64-bit simhash over word-token hashes (unweighted).

    Bit-plane reduceat keeps memory at O(total_words) regardless of 64 bits.
    The word hashes are first transposed into 8 contiguous byte planes so
    each bit pass reads 1 B/word instead of 8 (memory-bandwidth matters: 32
    concurrent workers on one node saturate the bus long before the ALUs),
    and the per-pass temporaries are preallocated once — no multi-MB
    malloc/munmap churn (mmap'd temporaries cause TLB-shootdown storms at
    high worker counts)."""
    flat, offsets = _word_hashes(texts, 0x51A4)
    counts = np.diff(offsets)
    n = len(counts)
    if n == 0:
        return np.zeros(0, dtype=_U64)
    planes = np.ascontiguousarray(flat.view(np.uint8).reshape(-1, 8).T)  # (8, W)
    starts = offsets[:-1]
    w = len(flat)
    bit = np.empty(w, dtype=np.uint8)
    acc = np.empty(w, dtype=np.int32)
    sig = np.zeros(n, dtype=_U64)
    for b in range(64):
        np.right_shift(planes[b >> 3], b & 7, out=bit)
        np.bitwise_and(bit, 1, out=bit)
        np.copyto(acc, bit)  # int32 accumulator: reduceat on uint8 would wrap
        ones = np.add.reduceat(acc, starts)
        sig |= (2 * ones > counts).astype(_U64) << _U64(b)
    return sig


def simhash_pairs(
    ds: Dataset,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 256,
    num_blocks: int | None = None,
) -> Dataset:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Signature pass here; banding + bucket verification are the shared
    ``hamming_pairs_u64`` machinery (also used by the perceptual-hash
    image dedup in stages/multimodal.py).
    Output: (id_a, id_b, hamming).
    """

    def sig(t: pa.Table) -> pa.Table:
        s = simhash64(pl.from_arrow(t.column(text_col).combine_chunks() if isinstance(t.column(text_col), pa.ChunkedArray) else t.column(text_col)))
        return pa.table(
            {
                id_col: t.column(id_col),
                "sig64": pa.array(s.view(np.int64)),
            }
        )

    return hamming_pairs_u64(
        ds.map_batches(sig, batch_format="pyarrow"),
        "sig64",
        id_col,
        max_hamming=max_hamming,
        bands=bands,
        max_bucket=max_bucket,
        num_blocks=num_blocks,
    )


def hamming_pairs_u64(
    ds: Dataset,
    hash_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 256,
    num_blocks: int | None = None,
) -> Dataset:
    """All id pairs whose precomputed 64-bit signatures are within
    ``max_hamming`` bits — the pigeonhole banding engine behind both
    simhash text dedup and perceptual-hash image dedup: split 64 bits into
    ``bands`` bands (must be > max_hamming); any pair within distance
    shares at least one exact band. Buckets are routed by a coarse
    partition of the (band, band-bits) key and verified with one
    vectorized Hamming pass per partition — per-group Python calls on
    millions of tiny buckets would dominate otherwise. ``hash_col`` is an
    int64 bit-view of the uint64 signature. Output: (id_a, id_b, hamming).
    """
    assert bands > max_hamming
    width = 64 // bands
    num_blocks = choose_num_blocks(ds, num_blocks)

    def band(t: pa.Table) -> pa.Table:
        s = t.column(hash_col).to_numpy(zero_copy_only=False).view(_U64)
        mask = _U64((1 << width) - 1)
        with np.errstate(over="ignore"):
            bkey = np.concatenate(
                [
                    splitmix64(((s >> _U64(b * width)) & mask) + _U64(b) * _U64(0x9E3779B97F4A7C15))
                    for b in range(bands)
                ]
            )
        return pa.table(
            {
                "bkey": pa.array(bkey.view(np.int64)),
                "_part": pa.array((bkey % _U64(num_blocks)).astype(np.int32)),
                id_col: pa.array(np.tile(t.column(id_col).to_numpy(), bands)),
                "simhash": pa.array(np.tile(s, bands).view(np.int64)),
            }
        )

    banded = ds.map_batches(band, batch_format="pyarrow")

    def verify_part(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        empty = pa.table(
            {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type), "hamming": pa.array([], pa.int64())}
        )
        if len(t) < 2:
            return empty
        bk = t.column("bkey").to_numpy()
        ids = t.column(id_col).to_numpy()
        sh = t.column("simhash").to_numpy().view(_U64)
        order = np.argsort(bk, kind="stable")
        bk, ids, sh = bk[order], ids[order], sh[order]
        _, starts, counts = np.unique(bk, return_index=True, return_counts=True)
        out_a, out_b, out_h = [], [], []
        for gi in np.nonzero(counts > 1)[0]:
            st = starts[gi]
            c = min(int(counts[gi]), max_bucket)
            gids, gsh = ids[st : st + c], sh[st : st + c]
            o = np.argsort(gids)
            gids, gsh = gids[o], gsh[o]
            ii, jj = np.triu_indices(c, k=1)
            x = gsh[ii] ^ gsh[jj]
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & _U64(1)).astype(np.int64)
                x >>= _U64(1)
                if not x.any():
                    break
            keep = ham <= max_hamming
            out_a.append(gids[ii[keep]])
            out_b.append(gids[jj[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), id_type),
                "id_b": pa.array(np.concatenate(out_b), id_type),
                "hamming": pa.array(np.concatenate(out_h)),
            }
        )

    pairs = banded.groupby("_part").map_groups(verify_part, batch_format="pyarrow")
    # a pair can surface from several bands; hamming is identical each time
    return _dedup_pairs(pairs)


# ------------------------------------------------- near-dup cluster + removal

def connected_components_pairs(
    pairs: Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_blocks: int | None = None,
    max_rounds: int = 25,
) -> Dataset:
    """Distributed connected components over an int64 edge Dataset.

    Returns a ``(node, root)`` Dataset covering every endpoint; ``root`` is
    the component minimum. Algorithm: iterated **hash-to-min** star
    contraction (Rastogi et al. 2013 "Finding Connected Components in
    Map-Reduce"): each round, every node's full neighborhood lands in one
    coarse partition (hash(src) % num_blocks → complete per-src groups), the
    neighborhood minimum ``m = min(N(u) ∪ u)`` is one reduceat, and every
    member reconnects to ``m`` — minima propagate two hops per round, so
    rounds = O(log diameter). Each round is a groupby shuffle of id-only
    edges; the pair set NEVER touches the driver (union-find over a
    web-corpus dup rate's O(corpus) pair set is a driver OOM).

    Fixpoint = every component a star; detected by (count, checksum) of the
    deduped edge set being stable across a round.
    """
    nb = choose_num_blocks(pairs, num_blocks)

    def norm(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy().astype(np.int64)
        b = t.column(id_b).to_numpy().astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table({"id_a": pa.array(lo[keep]), "id_b": pa.array(hi[keep])})

    edges = _dedup_pairs(pairs.map_batches(norm, batch_format="pyarrow"), nb).materialize()
    if edges.count() == 0:
        # rename_columns / schema inference need at least one block; an empty
        # edge set has a well-defined answer anyway
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "root": pa.array([], pa.int64())})
        )

    def edge_sig(e: Dataset) -> tuple:
        """(count, checksum) of the edge multiset, PARTITION-INVARIANT.

        The per-block partial must be the true block sum mod 2^40 — summing
        raw 64-bit hashes wraps mod 2^64 at block-dependent points, so the
        checksum would vary with block boundaries (which shift every round)
        and the fixpoint would never be detected: measured 25 max_rounds
        shuffles instead of ~8 on the sf0.01 chain graph. Per-element mod
        2^40 first, then exact chunked accumulation (each 2^20-element chunk
        sums below 2^60, no wrap), then mod again."""

        def chk(t: pa.Table) -> pa.Table:
            a = t.column("id_a").to_numpy().view(_U64)
            b = t.column("id_b").to_numpy().view(_U64)
            with np.errstate(over="ignore"):
                m = splitmix64(a * _U64(0x9E3779B97F4A7C15) + b) & _U64((1 << 40) - 1)
            s = 0
            for i in range(0, len(m), 1 << 20):
                s += int(m[i : i + (1 << 20)].sum())
            return pa.table({"n": pa.array([len(t)]), "s": pa.array([s % (1 << 40)])})

        r = e.map_batches(chk, batch_format="pyarrow").sum(["n", "s"])
        return (r["sum(n)"], (r["sum(s)"] or 0) % (1 << 40))

    def directed_part(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        h = splitmix64(src.view(_U64))
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "_part": pa.array((h % _U64(nb)).astype(np.int32)),
            }
        )

    def contract(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        uniq_src, starts = np.unique(src, return_index=True)
        m = np.minimum(np.minimum.reduceat(dst, starts), uniq_src)  # per-src neighborhood min
        m_rep = np.repeat(m, np.diff(np.concatenate([starts, [len(src)]])))
        # reconnect: (m, dst) for every neighbor, (m, src) for the node itself
        out_a = np.concatenate([m_rep, m])
        out_b = np.concatenate([dst, uniq_src])
        keep = out_a != out_b
        out_a, out_b = out_a[keep], out_b[keep]
        # dedup within the partition (one lexsort) — saves a whole groupby
        # shuffle per round vs a separate _dedup_pairs pass. Cross-partition
        # duplicates survive, which is fine: hash-to-min is idempotent over a
        # multiset and the fixpoint signature compares multisets.
        o = np.lexsort((out_b, out_a))
        out_a, out_b = out_a[o], out_b[o]
        first = np.ones(len(out_a), dtype=bool)
        first[1:] = (out_a[1:] != out_a[:-1]) | (out_b[1:] != out_b[:-1])
        return pa.table({"id_a": pa.array(out_a[first]), "id_b": pa.array(out_b[first])})

    sig = edge_sig(edges)
    for _ in range(max_rounds):
        new_edges = (
            edges.map_batches(directed_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(contract, batch_format="pyarrow")
        ).materialize()
        new_sig = edge_sig(new_edges)
        edges = new_edges
        if new_sig == sig:
            break
        sig = new_sig
    else:  # pragma: no cover - needs diameter > 2^25
        import warnings

        warnings.warn("connected_components_pairs hit max_rounds before fixpoint")

    # star edges: (root, member). Labels = members → root plus roots → self.
    def labels(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        roots = np.unique(a)
        return pa.table(
            {
                "node": pa.array(np.concatenate([b, roots])),
                "root": pa.array(np.concatenate([a, roots])),
            }
        )

    # roots surface once per partition → dedup (node, root) rows
    return _dedup_pairs(
        edges.map_batches(labels, batch_format="pyarrow").rename_columns(["id_a", "id_b"]), nb
    ).rename_columns(["node", "root"])


def pairs_to_clusters(id_a, id_b) -> dict:
    """Union-find over candidate pairs → {id: cluster_root} (root = min id).

    Driver-side reference implementation, kept for tests and small pair sets;
    the distributed path is ``connected_components_pairs`` above.
    """
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(id_a, id_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def drop_near_duplicates(
    ds: Dataset,
    text_col: str,
    id_col: str,
    num_perms: int = 128,
    bands: int = 16,
    threshold: float = 0.7,
    broadcast_max_drop: int = 2_000_000,
    num_blocks: int | None = None,
) -> Dataset:
    """Remove near-duplicate documents, keeping the min-id doc per cluster.

    minhash→LSH candidate pairs (distributed) → hash-to-min connected
    components (distributed, ``connected_components_pairs``) → resolve the
    drop set (non-root members) against the corpus. Neither the corpus, the
    pair set, nor the drop set is ever materialized on the driver: the drop
    ids stay a Dataset, and the resolve is **size-gated** (the same gate
    shape as ``minhash_lsh_pairs`` verification):

    - ≤ ``broadcast_max_drop`` drop ids → one object-store broadcast
      (``ray.put`` of an int64 array, read zero-copy by every filter task);
    - above the gate → a hash-co-partitioned anti-join: corpus rows and drop
      ids are tagged with ``hash(id64) % num_blocks`` and unioned, so ONE
      groupby shuffle co-locates each corpus row with exactly the drop ids
      that could match it. At a web corpus's dup rate (~10^11 drop ids at
      10^12 docs) no single process ever holds the drop set.

    Cluster representative: the minimum id (int id columns) / minimum 64-bit
    id-hash (other id types — deterministic, but not the lexicographic-min
    original id)."""
    import ray

    pairs = minhash_lsh_pairs(ds, text_col, id_col, num_perms, bands, threshold=threshold)

    id_type = pairs.schema().base_schema.field("id_a").type
    ids_are_ints = pa.types.is_integer(id_type)

    def col64(col) -> np.ndarray:
        if ids_are_ints:
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return hash64(col, 0x1D64).view(np.int64)

    def to64(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": pa.array(col64(t.column("id_a"))),
                "id_b": pa.array(col64(t.column("id_b"))),
            }
        )

    labels = connected_components_pairs(pairs.map_batches(to64, batch_format="pyarrow"))

    def non_roots(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t.column("node"), t.column("root")))).select(["node"])

    # O(#near-dup docs) rows, held in the (spillable) object store — never
    # concatenated on the driver. count() is exact and already-distributed.
    drop_ds = labels.map_batches(non_roots, batch_format="pyarrow").materialize()
    n_drop = drop_ds.count()
    if n_drop == 0:
        return ds

    if n_drop <= broadcast_max_drop:
        # small drop set: single shared-memory broadcast beats a shuffle
        drop = pa.concat_tables(
            ray.get(ref) for ref in drop_ds.to_arrow_refs()
        ).column("node").combine_chunks()
        drop_ref = ray.put(drop)

        def keep(t: pa.Table) -> pa.Table:
            id64 = pa.array(col64(t.column(id_col)))
            return t.filter(pc.invert(pc.is_in(id64, value_set=ray.get(drop_ref))))

        return ds.map_batches(keep, batch_format="pyarrow")

    # large drop set: hash-co-partitioned anti-join (drop ids never leave
    # the cluster). Corpus rows tagged _side=0 carry their real columns;
    # drop rows tagged _side=1 carry nulls — the union's schema is stable.
    from perfect_bloomfilter_ray.stages.joins import _arrow_schema_of
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    nb = choose_num_blocks(ds, num_blocks)
    corpus_schema = _arrow_schema_of(ds)
    corpus_cols = corpus_schema.names

    def tag_corpus(t: pa.Table) -> pa.Table:
        id64 = col64(t.column(id_col))
        cols = {c: t.column(c) for c in corpus_cols}
        cols["_id64"] = pa.array(id64)
        cols["_part"] = pa.array((splitmix64(id64.view(_U64)) % _U64(nb)).astype(np.int32))
        cols["_side"] = pa.array(np.zeros(len(t), dtype=np.int8))
        return pa.table(cols)

    def tag_drop(t: pa.Table) -> pa.Table:
        id64 = t.column("node").to_numpy()
        n = len(t)
        cols = {c: pa.nulls(n, corpus_schema.field(c).type) for c in corpus_cols}
        cols["_id64"] = pa.array(id64)
        cols["_part"] = pa.array((splitmix64(id64.view(_U64)) % _U64(nb)).astype(np.int32))
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    tagged = ds.map_batches(tag_corpus, batch_format="pyarrow").union(
        drop_ds.map_batches(tag_drop, batch_format="pyarrow")
    )

    def anti(t: pa.Table) -> pa.Table:
        side = t.column("_side").to_numpy()
        rows = t.filter(pa.array(side == 0))
        dropped = np.unique(t.column("_id64").to_numpy()[side == 1])
        keep_mask = ~np.isin(rows.column("_id64").to_numpy(), dropped, assume_unique=False)
        return rows.filter(pa.array(keep_mask)).select(corpus_cols)

    return tagged.groupby("_part").map_groups(anti, batch_format="pyarrow")


# ------------------------------------------------- exact n-gram Jaccard verify

def ngram_jaccard(texts_a: list[str], texts_b: list[str], n_words: int = 5) -> np.ndarray:
    """Exact word-n-gram Jaccard for aligned text pairs (verification kernel)."""

    def grams(s: str) -> set:
        w = s.lower().split()
        if len(w) < n_words:
            return {tuple(w)}
        return {tuple(w[i : i + n_words]) for i in range(len(w) - n_words + 1)}

    out = np.empty(len(texts_a))
    for i, (a, b) in enumerate(zip(texts_a, texts_b)):
        ga, gb = grams(a), grams(b)
        u = len(ga | gb)
        out[i] = len(ga & gb) / u if u else 1.0
    return out


# ------------------------------------------------------- embedding near-dup

def embedding_neardup_pairs(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    dim: int,
    cos_threshold: float = 0.95,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 7,
    max_bucket: int = 512,
) -> Dataset:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Random-hyperplane LSH (num_tables tables × num_planes bits) buckets
    normalized vectors; exact cosine verified within buckets. The hyperplanes
    are seeded-deterministic and recomputed in every task (cheaper than
    broadcasting). Output: (id_a, id_b, cos).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim)).astype(np.float32)
    num_blocks = choose_num_blocks(ds)

    def bucket(t: pa.Table) -> pa.Table:
        n = len(t)
        vecs = np.asarray(t.column(vec_col).combine_chunks().flatten()).reshape(n, dim).astype(np.float32)
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.maximum(norm, 1e-12)
        ids = t.column(id_col).to_numpy()
        keys, out_ids, out_vecs = [], [], []
        for tb in range(num_tables):
            bits = (vecs @ planes[tb].T) > 0  # (n, planes)
            key = (bits.astype(np.uint64) << np.arange(num_planes, dtype=_U64)[None, :]).sum(axis=1, dtype=np.uint64)
            with np.errstate(over="ignore"):
                keys.append(splitmix64(key + _U64(tb) * _U64(0x9E3779B97F4A7C15)))
            out_ids.append(ids)
            out_vecs.append(vecs)
        bkey = np.concatenate(keys)
        return pa.table(
            {
                "bkey": pa.array(bkey.view(np.int64)),
                "_part": pa.array((bkey % _U64(num_blocks)).astype(np.int32)),
                id_col: pa.array(np.concatenate(out_ids)),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(out_vecs).ravel()), dim
                ),
            }
        )

    banded = ds.map_batches(bucket, batch_format="pyarrow")

    # one vectorized verification pass per coarse partition (not per bucket)
    def verify_part(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type
        empty = pa.table(
            {"id_a": pa.array([], id_type), "id_b": pa.array([], id_type), "cos": pa.array([], pa.float64())}
        )
        if len(t) < 2:
            return empty
        bk = t.column("bkey").to_numpy()
        ids = t.column(id_col).to_numpy()
        vecs = np.asarray(t.column("vec").combine_chunks().flatten()).reshape(len(t), dim)
        order = np.argsort(bk, kind="stable")
        bk, ids, vecs = bk[order], ids[order], vecs[order]
        _, starts, counts = np.unique(bk, return_index=True, return_counts=True)
        out_a, out_b, out_c = [], [], []
        for gi in np.nonzero(counts > 1)[0]:
            st = starts[gi]
            c = min(int(counts[gi]), max_bucket)
            gids, gv = ids[st : st + c], vecs[st : st + c]
            o = np.argsort(gids)
            gids, gv = gids[o], gv[o]
            ii, jj = np.triu_indices(c, k=1)
            cos = (gv @ gv.T)[ii, jj]
            keep = cos >= cos_threshold
            out_a.append(gids[ii[keep]])
            out_b.append(gids[jj[keep]])
            out_c.append(cos[keep].astype(np.float64))
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), id_type),
                "id_b": pa.array(np.concatenate(out_b), id_type),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )

    pairs = banded.groupby("_part").map_groups(verify_part, batch_format="pyarrow")
    # same pair from several tables; cos is identical each time
    return _dedup_pairs(pairs)


# ------------------------------------------------------- incremental ingest

def incremental_new_rows(
    old: Dataset,
    new: Dataset,
    text_col: str,
    id_col: str,
    keep_cols: list[str] | None = None,
    normalize: bool = False,
    num_blocks: int | None = None,
) -> Dataset:
    """Incremental-ingest dedup: rows of ``new`` whose text does NOT already
    appear in ``old`` (SQL ``NOT EXISTS`` on the text column).

    The standing 100-TB use case: a fresh crawl slice lands and must be
    deduplicated against the existing corpus WITHOUT rescanning old×new
    pairwise. Shape (same contract as exact_dedup above): both sides are
    slimmed to ``(fingerprint-partition, text, id, keep_cols)`` — the old
    side ships ONLY its text + null id (never its payload columns) — then
    one union + coarse hash partition co-locates equal texts, and each
    partition runs ONE vectorized polars anti-join of new-vs-old. The
    shuffle key is the 64-bit content fingerprint; matching happens on the
    real text, so a fingerprint collision cannot drop a genuinely new row.

    Output: the surviving ``new`` rows (columns ``[id_col, text_col,
    *keep_cols]``). Old rows whose only difference is formatting are still
    distinct unless ``normalize=True`` (then both sides compare on the
    exact_dedup normalization).
    """
    keep_cols = list(keep_cols or [])
    nb = choose_num_blocks(new, num_blocks)
    sch = new.schema().base_schema
    if isinstance(sch, pa.Schema):
        types = {n: sch.field(n).type for n in (id_col, *keep_cols)}
    else:  # pandas-backed input: numpy dtypes (object == string)
        np_types = dict(zip(sch.names, sch.types))
        types = {
            n: (pa.string() if np_types[n] == np.dtype(object) else pa.from_numpy_dtype(np_types[n]))
            for n in (id_col, *keep_cols)
        }

    def slim(is_old: bool):
        def fn(t: pa.Table) -> pa.Table:
            fp = fingerprint64(t.column(text_col), normalize=normalize)
            part = (fp.to_numpy().view(np.uint64) % _U64(nb)).astype(np.int32)
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                "_part": pa.array(part),
                text_col: t.column(text_col),
                "_is_old": pa.array(np.full(len(t), is_old, dtype=np.bool_)),
            }
            for c in (id_col, *keep_cols):
                cols[c] = pa.nulls(len(t), type=types[c]) if is_old else t.column(c)
            return pa.table(cols)

        return fn

    def block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        if normalize:
            df = df.with_columns(
                pl.col(text_col)
                .str.to_lowercase()
                .str.replace_all(r"[^\w\s]", "")
                .str.replace_all(r"\s+", " ")
                .str.strip_chars()
                .alias("_key")
            )
        else:
            df = df.with_columns(pl.col(text_col).alias("_key"))
        olds = df.filter(pl.col("_is_old")).select("_key").unique()
        news = df.filter(~pl.col("_is_old"))
        return (
            news.join(olds, on="_key", how="anti")
            .drop(["_is_old", "_key"])
            .to_arrow()
        )

    slim_old = old.map_batches(slim(True), batch_format="pyarrow")
    slim_new = new.map_batches(slim(False), batch_format="pyarrow")
    return slim_old.union(slim_new).groupby("_part").map_groups(block, batch_format="pyarrow")


# ----------------------------------------------- grouped exact word Jaccard

def word_jaccard_pairs_grouped(
    ds: Dataset,
    group_col: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
) -> Dataset:
    """All intra-group document pairs with exact word-set Jaccard ≥
    ``threshold``. Output columns: ``[group_col, "id_a", "id_b", "jaccard"]``
    with ``id_a < id_b``.

    This is the EXACT, oracle-checkable member of the Jaccard family —
    ngram_jaccard above verifies LSH *candidates* (pair set depends on LSH
    parameters), whereas here the candidate set is "every pair sharing
    ``group_col``", reproducible in SQL with ``list_intersect`` on distinct
    word arrays. Pairwise-within-group is quadratic BY DESIGN: callers bound
    group sizes (a source/domain bucket, an LSH bucket after max_bucket
    capping) exactly like the verify stages above — this is verify-altitude,
    not corpus-altitude.

    Shape: groups co-locate via the groupby shuffle; each group runs one
    vectorized pass — tokenize (polars), factorize words (np.unique), build
    a docs×vocab incidence matrix, and get ALL pairwise intersection sizes
    from ONE integer matmul. No per-pair Python.

    Jaccard = |A∩B| / (|A|+|B|-|A∩B|) as a float64 division of exact small
    ints — bitwise identical across engines. Pairs where both word sets are
    empty are excluded (0/0).
    """
    empty = pa.table(
        {
            group_col: pa.array([], pa.string()),
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        n = len(t)
        if n < 2:
            return empty
        df = pl.from_arrow(t.select([group_col, id_col, text_col]))
        ids = df[id_col].to_numpy().astype(np.int64)
        toks = (
            df.select(
                pl.int_range(pl.len()).alias("_i"),
                pl.col(text_col).str.to_lowercase().str.extract_all(r"[a-z0-9]+").alias("_w"),
            )
            .explode("_w")
            .drop_nulls("_w")
            .unique()
        )
        rows = toks["_i"].to_numpy()
        words = toks["_w"].to_numpy()
        if len(words) == 0:
            return empty
        _, codes = np.unique(words, return_inverse=True)
        m = np.zeros((n, codes.max() + 1), dtype=np.int64)
        m[rows, codes] = 1
        sizes = m.sum(axis=1)
        inter = m @ m.T
        ii, jj = np.triu_indices(n, k=1)
        union = sizes[ii] + sizes[jj] - inter[ii, jj]
        ok = union > 0
        ii, jj, un = ii[ok], jj[ok], union[ok]
        jac = inter[ii, jj].astype(np.float64) / un.astype(np.float64)
        keep = jac >= threshold
        ii, jj, jac = ii[keep], jj[keep], jac[keep]
        a, b = ids[ii], ids[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        o = np.lexsort((b2, a2))
        return pa.table(
            {
                group_col: pa.array(np.asarray(df[group_col].to_numpy())[ii[o]]),
                "id_a": pa.array(a2[o]),
                "id_b": pa.array(b2[o]),
                "jaccard": pa.array(jac[o]),
            }
        )

    return ds.groupby(group_col).map_groups(block, batch_format="pyarrow")


def word_containment_pairs_grouped(
    ds: Dataset,
    group_col: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
) -> Dataset:
    """All intra-group pairs with exact word-set CONTAINMENT ≥ ``threshold``
    — the asymmetric twin of :func:`word_jaccard_pairs_grouped` for the
    quote/subset near-dup class symmetric Jaccard misses: a short document
    fully contained in a long one scores ``|A∩B|/min(|A|,|B|) = 1`` while
    its Jaccard is tiny (Broder 1997's containment measure).

    Same one-matmul incidence-matrix pass per co-located group; output
    columns ``[group_col, id_a, id_b, inter, n_a, n_b, containment]`` with
    ``id_a < id_b``, the three set sizes as exact int64 and containment as
    ONE float64 division of exact ints (÷ the smaller set size), so the
    emitted table hashes bit-identically against a SQL ``list_intersect``
    oracle. Pairs where the smaller word set is empty are excluded.
    """
    empty = pa.table(
        {
            group_col: pa.array([], pa.string()),
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "containment": pa.array([], pa.float64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        n = len(t)
        if n < 2:
            return empty
        df = pl.from_arrow(t.select([group_col, id_col, text_col]))
        ids = df[id_col].to_numpy().astype(np.int64)
        toks = (
            df.select(
                pl.int_range(pl.len()).alias("_i"),
                pl.col(text_col).str.to_lowercase().str.extract_all(r"[a-z0-9]+").alias("_w"),
            )
            .explode("_w")
            .drop_nulls("_w")
            .unique()
        )
        rows = toks["_i"].to_numpy()
        words = toks["_w"].to_numpy()
        if len(words) == 0:
            return empty
        _, codes = np.unique(words, return_inverse=True)
        m = np.zeros((n, codes.max() + 1), dtype=np.int64)
        m[rows, codes] = 1
        sizes = m.sum(axis=1)
        inter = m @ m.T
        ii, jj = np.triu_indices(n, k=1)
        small = np.minimum(sizes[ii], sizes[jj])
        ok = small > 0
        ii, jj, small = ii[ok], jj[ok], small[ok]
        cont = inter[ii, jj].astype(np.float64) / small.astype(np.float64)
        keep = cont >= threshold
        ii, jj, cont = ii[keep], jj[keep], cont[keep]
        iv = inter[ii, jj]
        a, b = ids[ii], ids[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        na = np.where(swap, sizes[jj], sizes[ii])
        nb = np.where(swap, sizes[ii], sizes[jj])
        o = np.lexsort((b2, a2))
        return pa.table(
            {
                group_col: pa.array(np.asarray(df[group_col].to_numpy())[ii[o]]),
                "id_a": pa.array(a2[o]),
                "id_b": pa.array(b2[o]),
                "inter": pa.array(iv[o]),
                "n_a": pa.array(na[o]),
                "n_b": pa.array(nb[o]),
                "containment": pa.array(cont[o]),
            }
        )

    return ds.groupby(group_col).map_groups(block, batch_format="pyarrow")


def bbit_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray, b: int = 1) -> np.ndarray:
    """b-bit minhash Jaccard estimator (Li & König, WWW 2010): keep only the
    low ``b`` bits of each minhash value; Ĵ = (P̂ − C)/(1 − C) where P̂ is
    the observed b-bit collision fraction and C = 2^−b is the chance
    collision rate (the large-domain simplification of Li-König's r-terms —
    exact here because shingle hashes live in 2^64 ≫ set sizes). Storage is
    b/64 of the full signature; variance grows by roughly 1/(1−C)², the
    documented trade. Inputs are (n_pairs, P) uint64 matrices; clipped to
    [0, 1]."""
    mask = np.uint64((1 << b) - 1)
    coll = ((sig_a & mask) == (sig_b & mask)).mean(axis=1)
    c = 1.0 / (1 << b)
    return np.clip((coll - c) / (1.0 - c), 0.0, 1.0)
