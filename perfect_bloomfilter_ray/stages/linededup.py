"""Line-level corpus deduplication (CCNet / RefinedWeb style).

Web corpora repeat boilerplate *lines* (nav bars, cookie banners, footers)
across millions of pages; document-level dedup never sees them. The standard
fix (CCNet §3.1, RefinedWeb §3.3) counts line occurrences corpus-wide and
drops every occurrence of any line that appears at least ``min_count`` times.

Scale shape:

- **Counting** is a map-side pre-aggregated groupby: each batch splits its
  documents into lines, hashes them to 64 bits, and emits one partial count
  per distinct line hash per batch — the shuffle carries distinct-lines-sized
  rows, never one row per occurrence.
- **The common-line set is broadcast**: lines with count ≥ ``min_count`` are
  collected as ONE sorted uint64 array (8 B/line), ``ray.put`` once, shared
  zero-copy by every task on a node. The drop pass is then shuffle-free —
  split, hash, ``searchsorted``, mask, reassemble, one ``map_batches``.
  The broadcast is bounded by the *duplicated*-line vocabulary, not the
  corpus; at web scale that is GBs, not TBs. When it outgrows a single
  object-store entry, feed the same hashes through the Bloom semi-join path
  (``stages/membership.py``) and exact-verify hits, or shard the pass per
  hash range — the kernel here is unchanged.

Line definitions are pluggable ``Splitter`` strategies so the engine and the
SQL oracle agree exactly:

- ``SepSplitter("\\n")`` — real-world newline/paragraph lines.
- ``TokenChunkSplitter(n)`` — fixed ``n``-token chunks of the ``[a-z0-9]+``
  lowercased token stream (used by the oracle query on the synthetic corpus,
  whose text has no newlines; SQL-expressible via ``generate_subscripts``).

Hashes are 64-bit (polars seeded hash); a collision erroneously drops a
unique line with probability ~#dup-lines × 2^-64 per line — negligible at
any realistic corpus size, and the SQL oracle (`line_dedup_stats`) compares
against exact string grouping, so a collision would surface as a hash-fail.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

_SEED = 0x11FEDEAD


class SepSplitter:
    """Split on a literal separator; strips outer whitespace per line and
    drops empty lines (a blank line is formatting, not content)."""

    def __init__(self, sep: str = "\n"):
        self.sep = sep

    def lines(self, texts: pl.Series) -> pl.Series:
        return (
            texts.str.split(self.sep)
            .list.eval(pl.element().str.strip_chars())
            .list.eval(pl.element().filter(pl.element().str.len_bytes() > 0))
        )


class TokenChunkSplitter:
    """Lines = consecutive ``n``-token chunks of the lowercased
    ``[a-z0-9]+`` token stream, joined by single spaces (the trailing
    partial chunk is a line too)."""

    def __init__(self, n: int = 8):
        self.n = n


def _chunk_lines_table(texts: pl.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(line_strings, doc_idx) for TokenChunkSplitter — flat, vectorized.

    One tokenize + explode, chunk ids by integer division of the
    within-document token position, one group-join back to line strings.
    """
    toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls()
    if len(flat) == 0:
        return np.empty(0, object), np.empty(0, np.int64)
    doc_of = np.repeat(np.arange(len(lens)), lens)
    ends = np.cumsum(lens)
    pos = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(ends - lens, lens)
    chunk = pos // n
    df = pl.DataFrame(
        {"_doc": doc_of, "_chunk": chunk, "tok": flat}
    )
    g = (
        df.group_by(["_doc", "_chunk"], maintain_order=True)
        .agg(pl.col("tok").str.join(" ").alias("line"))
    )
    return g["line"].to_numpy(), g["_doc"].to_numpy().astype(np.int64)


def _lines_of(texts: pl.Series, splitter) -> tuple[np.ndarray, np.ndarray]:
    """Flat (line_strings, doc_idx) for any splitter."""
    if isinstance(splitter, TokenChunkSplitter):
        return _chunk_lines_table(texts, splitter.n)
    ls = splitter.lines(texts)
    lens = ls.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = ls.explode().drop_nulls()
    return flat.to_numpy(), np.repeat(np.arange(len(lens)), lens)


def _hash_lines(lines: np.ndarray) -> np.ndarray:
    if len(lines) == 0:
        return np.empty(0, np.uint64)
    return pl.Series(lines).hash(seed=_SEED).to_numpy().astype(np.uint64, copy=True)


def common_line_hashes(
    ds: Dataset, text_col: str, min_count: int = 2, splitter=None
) -> Dataset:
    """``(lhash: int64-bit-view, cnt)`` for lines occurring ≥ min_count times.

    int64 bit-view keys because Ray's groupby key path rejects uint64 above
    2^63 (see stages/dedup.py for the same convention).
    """
    splitter = splitter or SepSplitter()

    def partial(t: pa.Table) -> pa.Table:
        lines, _ = _lines_of(pl.from_arrow(t.column(text_col)), splitter)
        h = _hash_lines(lines).view(np.int64)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"lhash": uniq, "pcnt": cnt.astype(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lhash")
        .aggregate(Sum("pcnt", alias_name="cnt"))
        .filter(expr=f"cnt >= {min_count}")
    )


def common_lines_broadcast(common_ds: Dataset) -> "ray.ObjectRef":  # noqa: F821
    """Collapse the common-line Dataset into one sorted uint64 broadcast.

    The one intentional driver materialization — bounded by the duplicated
    -line vocabulary (8 B/line). For blocklists beyond object-store entry
    size, use the Bloom path noted in the module docstring instead.
    """
    import ray

    parts = [
        t.column("lhash").to_numpy(zero_copy_only=False).view(np.uint64)
        for t in common_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    ]
    h = np.concatenate(parts) if parts else np.empty(0, np.uint64)
    h = np.sort(h)
    return ray.put(h)


def _rebuild(
    t: pa.Table,
    lines: np.ndarray,
    doc_of: np.ndarray,
    keep: np.ndarray,
    sep: str,
    rebuild_text: bool,
    text_col: str,
    out_col: str,
) -> pa.Table:
    """Shared output assembly for both drop paths: stats columns + optional
    rebuilt text. Identical arithmetic → the broadcast and co-partitioned
    paths produce bit-identical tables."""
    n_lines = np.bincount(doc_of, minlength=len(t)).astype(np.int64)
    kept_doc = doc_of[keep]
    n_kept = np.bincount(kept_doc, minlength=len(t)).astype(np.int64)
    lengths = np.fromiter((len(s) for s in lines[keep]), np.int64, count=int(keep.sum()))
    kept_chars = np.bincount(kept_doc, weights=lengths, minlength=len(t)).astype(np.int64)
    out = (
        t.append_column("n_lines", pa.array(n_lines))
        .append_column("n_lines_kept", pa.array(n_kept))
        .append_column("kept_chars", pa.array(kept_chars))
    )
    if rebuild_text:
        joined = (
            pl.DataFrame({"_doc": kept_doc, "line": lines[keep]})
            .group_by("_doc", maintain_order=True)
            .agg(pl.col("line").str.join(sep).alias("_new"))
        )
        new = np.full(len(t), "", object)
        new[joined["_doc"].to_numpy()] = joined["_new"].to_numpy()
        if out_col in out.column_names:
            out = out.drop_columns([out_col])
        out = out.append_column(out_col, pa.array(new, type=pa.string()))
    return out


def drop_common_lines(
    ds: Dataset,
    common_ref,
    text_col: str,
    splitter=None,
    rebuild_text: bool = True,
    out_col: str | None = None,
) -> Dataset:
    """Drop every occurrence of a common line; one shuffle-free pass.

    Appends ``n_lines`` / ``n_lines_kept`` / ``kept_chars`` (sum of kept
    line lengths, separators excluded) and, when ``rebuild_text``, the
    deduplicated text (kept lines joined by the separator) in ``out_col``
    (default: replace ``text_col``).
    """
    splitter = splitter or SepSplitter()
    sep = splitter.sep if isinstance(splitter, SepSplitter) else " "
    out_col = out_col or text_col

    def drop(t: pa.Table) -> pa.Table:
        import ray

        common = ray.get(common_ref)
        lines, doc_of = _lines_of(pl.from_arrow(t.column(text_col)), splitter)
        h = _hash_lines(lines)
        if len(common) and len(h):
            pos = np.searchsorted(common, h)
            pos[pos == len(common)] = 0
            keep = common[pos] != h
        else:
            keep = np.ones(len(h), bool)
        return _rebuild(t, lines, doc_of, keep, sep, rebuild_text, text_col, out_col)

    return ds.map_batches(drop, batch_format="pyarrow")


def _col64(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Canonical int64 view of an id column (int cast / 64-bit hash)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    from perfect_bloomfilter_ray.functions.hashing import hash64

    return hash64(col, 0x11D0).view(np.int64)


def drop_common_lines_join(
    ds: Dataset,
    common_ds: Dataset,
    text_col: str,
    id_col: str,
    splitter=None,
    rebuild_text: bool = True,
    out_col: str | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """Exact common-line drop with NO broadcast — the adversarial-corpus
    path where the ≥min_count line vocabulary is itself unbounded.

    Two shuffles, both co-partitioned tagged unions:

    1. **flag pass (id-only)** — every line occurrence is reduced to a
       ``(did64, line_idx, lhash)`` triple (24 B) and unioned with the
       common-line hashes, partitioned by ``hash(lhash)``; per-partition
       ``searchsorted`` membership yields drop flags ``(did64, line_idx)``.
       The shuffle never carries line text.
    2. **rebuild pass** — corpus rows and their flags are co-partitioned by
       ``hash(did64)``; within each group lines are recomputed (the splitter
       is deterministic) and flagged occurrences dropped via a polars join
       on ``(did, idx)``. Output assembly is the shared ``_rebuild`` — the
       result is bit-identical to the broadcast path's.

    ``id_col`` must uniquely identify documents (hashed to 64 bits for
    non-int types — the same convention as ``stages/dedup``).
    """
    import ray.data as rd

    from perfect_bloomfilter_ray.functions.hashing import splitmix64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    splitter = splitter or SepSplitter()
    sep = splitter.sep if isinstance(splitter, SepSplitter) else " "
    out_col = out_col or text_col
    nb = choose_num_blocks(ds, num_blocks)
    _u64 = np.uint64

    def line_pos(doc_of: np.ndarray, n_docs: int) -> np.ndarray:
        cnt = np.bincount(doc_of, minlength=n_docs)
        starts = np.cumsum(cnt) - cnt
        return np.arange(len(doc_of), dtype=np.int64) - starts[doc_of]

    # ---- pass 1: flags, partitioned by line hash -------------------------
    def triples(t: pa.Table) -> pa.Table:
        lines, doc_of = _lines_of(pl.from_arrow(t.column(text_col)), splitter)
        did = _col64(t.column(id_col))[doc_of]
        h = _hash_lines(lines).view(np.int64)
        return pa.table(
            {
                "_part": pa.array((splitmix64(h.view(_u64)) % _u64(nb)).astype(np.int32)),
                "side": pa.array(np.zeros(len(h), np.int8)),
                "lhash": pa.array(h),
                "did": pa.array(did),
                "idx": pa.array(line_pos(doc_of, len(t))),
            }
        )

    def common_rows(t: pa.Table) -> pa.Table:
        h = t.column("lhash").to_numpy()
        z = np.zeros(len(h), np.int64)
        return pa.table(
            {
                "_part": pa.array((splitmix64(h.view(_u64)) % _u64(nb)).astype(np.int32)),
                "side": pa.array(np.ones(len(h), np.int8)),
                "lhash": pa.array(h),
                "did": pa.array(z),
                "idx": pa.array(z),
            }
        )

    def member(t: pa.Table) -> pa.Table:
        side = t.column("side").to_numpy()
        h = t.column("lhash").to_numpy()
        cm = np.sort(h[side == 1])
        occ = side == 0
        ho = h[occ]
        if len(cm) and len(ho):
            pos = np.clip(np.searchsorted(cm, ho), 0, len(cm) - 1)
            hit = cm[pos] == ho
        else:
            hit = np.zeros(len(ho), bool)
        return pa.table(
            {
                "did": pa.array(t.column("did").to_numpy()[occ][hit]),
                "idx": pa.array(t.column("idx").to_numpy()[occ][hit]),
            }
        )

    flags = (
        ds.map_batches(triples, batch_format="pyarrow")
        .union(common_ds.map_batches(common_rows, batch_format="pyarrow"))
        .groupby("_part")
        .map_groups(member, batch_format="pyarrow")
    )

    # ---- pass 2: co-partition corpus with its flags by doc id -----------
    from perfect_bloomfilter_ray.stages.joins import _arrow_schema_of

    corpus_schema = _arrow_schema_of(ds)
    corpus_cols = list(corpus_schema.names)

    def tag_corpus(t: pa.Table) -> pa.Table:
        did = _col64(t.column(id_col))
        cols = {c: t.column(c) for c in corpus_cols}
        cols["_part"] = pa.array((splitmix64(did.view(_u64)) % _u64(nb)).astype(np.int32))
        cols["_side"] = pa.array(np.zeros(len(t), np.int8))
        cols["_did"] = pa.array(did)
        cols["_idx"] = pa.array(np.zeros(len(t), np.int64))
        return pa.table(cols)

    def tag_flags(t: pa.Table) -> pa.Table:
        did = t.column("did").to_numpy()
        cols = {c: pa.nulls(len(t), corpus_schema.field(c).type) for c in corpus_cols}
        cols["_part"] = pa.array((splitmix64(did.view(_u64)) % _u64(nb)).astype(np.int32))
        cols["_side"] = pa.array(np.ones(len(t), np.int8))
        cols["_did"] = pa.array(did)
        cols["_idx"] = t.column("idx")
        return pa.table(cols)

    def rebuild(t: pa.Table) -> pa.Table:
        side = t.column("_side").to_numpy()
        rows = t.filter(pa.array(side == 0))
        f_did = t.column("_did").to_numpy()[side == 1]
        f_idx = t.column("_idx").to_numpy()[side == 1]
        lines, doc_of = _lines_of(pl.from_arrow(rows.column(text_col)), splitter)
        did = rows.column("_did").to_numpy()[doc_of] if len(doc_of) else np.empty(0, np.int64)
        idx = line_pos(doc_of, len(rows))
        if len(f_did) and len(lines):
            j = pl.DataFrame({"did": did, "idx": idx}).join(
                pl.DataFrame({"did": f_did, "idx": f_idx, "_drop": np.ones(len(f_did), bool)}),
                on=["did", "idx"],
                how="left",
            )
            keep = j["_drop"].is_null().to_numpy()
        else:
            keep = np.ones(len(lines), bool)
        out = _rebuild(
            rows.select(corpus_cols), lines, doc_of, keep, sep, rebuild_text, text_col, out_col
        )
        return out

    return (
        ds.map_batches(tag_corpus, batch_format="pyarrow")
        .union(flags.map_batches(tag_flags, batch_format="pyarrow"))
        .groupby("_part")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def line_dedup(
    ds: Dataset,
    text_col: str,
    id_col: str,
    min_count: int = 2,
    splitter=None,
    rebuild_text: bool = True,
    out_col: str | None = None,
    broadcast_max_lines: int = 50_000_000,
    num_blocks: int | None = None,
) -> Dataset:
    """End-to-end CCNet line dedup with a size-gated resolve — the same
    broadcast-vs-join gate as minhash verification and near-dup removal:

    - common-line vocabulary ≤ ``broadcast_max_lines`` (the normal web
      corpus: boilerplate vocabularies are millions, 8 B each) → one
      object-store broadcast, shuffle-free drop pass;
    - above the gate (adversarial / machine-generated corpora) →
      ``drop_common_lines_join``: two co-partitioned shuffles, no process
      ever holds the vocabulary.
    """
    splitter = splitter or SepSplitter()
    common = common_line_hashes(ds, text_col, min_count=min_count, splitter=splitter).materialize()
    if common.count() <= broadcast_max_lines:
        ref = common_lines_broadcast(common)
        return drop_common_lines(
            ds, ref, text_col, splitter=splitter, rebuild_text=rebuild_text, out_col=out_col
        )
    return drop_common_lines_join(
        ds,
        common,
        text_col,
        id_col,
        splitter=splitter,
        rebuild_text=rebuild_text,
        out_col=out_col,
        num_blocks=num_blocks,
    )
