"""Inter-document duplicated-n-gram statistics (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

For each document: how many of its word n-gram positions use an n-gram that
also appears in at least ``min_docs`` distinct documents corpus-wide. The
per-doc duplicated fraction is the standard signal for (a) filtering
boilerplate-heavy pages and (b) targeting span-level dedup.

Execution shape (100-TB honest):

1. One ``map_batches`` pass tokenizes + rolling-hashes every n-gram
   (reuses ``decontam._ngram_hashes``) and dedups to DISTINCT
   ``(doc, gram)`` rows batch-side, keeping the position count — so the
   shuffle carries ~20 bytes per distinct doc-gram, never the text.
2. Rows route by gram hash; inside each coarse partition the docs-per-gram
   count is a plain run length (rows are globally distinct per (doc,gram)
   because each doc lives in exactly one input row/batch), and per-doc
   partial sums collapse the partition to ≤ one row per doc.
3. A final small ``groupby(doc)`` sums the partials; the fraction is an
   exact float64 division of int64 counts (bitwise equal to the SQL
   oracle's ``CAST(n_dup AS DOUBLE)/n_grams``).

Gram identity is the 64-bit rolling hash — collisions are ~2⁻⁶⁴ per pair
(same contract as decontam/minhash); the oracle check at test scale is
collision-free in practice.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from perfect_bloomfilter_ray.stages.decontam import _ngram_hashes
from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

_U64 = np.uint64


def dup_ngram_stats(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-document duplicated-n-gram stats: ``(id_col, n_grams, n_dup,
    dup_frac)``. ``n_grams`` counts all n-gram positions in the doc;
    ``n_dup`` those whose n-gram occurs in ≥ ``min_docs`` distinct docs.
    Documents with fewer than ``n`` tokens produce no output row (they have
    no n-grams), matching the SQL formulation."""
    nb = choose_num_blocks(docs, num_blocks)

    def grams(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(t.column(text_col))
        if isinstance(texts, pl.DataFrame):  # single-column table edge
            texts = texts.to_series()
        hs, di = _ngram_hashes(texts, n)
        if len(hs) == 0:
            return pa.table(
                {
                    "_id64": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "_part": pa.array([], pa.int32()),
                }
            )
        ids = t.column(id_col).to_numpy()
        # distinct (doc, gram) with position counts — one lexsort per batch
        o = np.lexsort((hs.view(np.int64), di))
        d_s, h_s = di[o], hs[o]
        new = np.ones(len(o), dtype=bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        starts = np.flatnonzero(new)
        c = np.diff(np.append(starts, len(o)))
        hu = h_s[starts]
        return pa.table(
            {
                "_id64": pa.array(ids[d_s[starts]].astype(np.int64)),
                "h": pa.array(hu.view(np.int64)),
                "c": pa.array(c.astype(np.int64)),
                "_part": pa.array((hu % _U64(nb)).astype(np.int32)),
            }
        )

    def per_part(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy()
        ids = t.column("_id64").to_numpy()
        c = t.column("c").to_numpy()
        o = np.argsort(h, kind="stable")
        h_s = h[o]
        new = np.ones(len(o), dtype=bool)
        new[1:] = h_s[1:] != h_s[:-1]
        starts = np.flatnonzero(new)
        run_lens = np.diff(np.append(starts, len(o)))
        # rows are globally distinct per (doc, gram) → run length IS the
        # number of distinct docs containing this gram
        dup = np.repeat(run_lens >= min_docs, run_lens)
        cs, ids_s = c[o], ids[o]
        dupc = np.where(dup, cs, 0)
        o2 = np.argsort(ids_s, kind="stable")
        ids2, cs2, dupc2 = ids_s[o2], cs[o2], dupc[o2]
        new2 = np.ones(len(o2), dtype=bool)
        new2[1:] = ids2[1:] != ids2[:-1]
        s2 = np.flatnonzero(new2)
        return pa.table(
            {
                id_col: pa.array(ids2[s2]),
                "pg": pa.array(np.add.reduceat(cs2, s2) if len(s2) else np.empty(0, np.int64)),
                "pd": pa.array(np.add.reduceat(dupc2, s2) if len(s2) else np.empty(0, np.int64)),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        g = t.column("n_grams").to_numpy().astype(np.int64)
        d = t.column("n_dup").to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_grams": pa.array(g),
                "n_dup": pa.array(d),
                "dup_frac": pa.array(d.astype(np.float64) / g),
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(grams, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("pg", alias_name="n_grams"), Sum("pd", alias_name="n_dup"))
        .map_batches(finish, batch_format="pyarrow")
    )


def remove_dup_spans(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    num_blocks: int | None = None,
    clean_col: str = "text_clean",
) -> Dataset:
    """Span-level dedup (the removal step of Lee et al. 2021): delete every
    token covered by a word n-gram that occurs in ≥ ``min_docs`` distinct
    documents, and rebuild the document from the surviving tokens.

    Output per doc (docs with ≥ 1 token): ``(id_col, n_tokens, n_removed,
    clean_col)``. The rebuilt text is the NORMALIZED token stream — lowercase
    ``[a-z0-9]+`` tokens joined by single spaces — i.e. exactly the token
    sequence the n-gram analysis ran on (and what the SQL oracle rebuilds).

    Two shuffles, both slim:

    1. n-gram occurrences ``(doc, pos, gram-hash)`` route by gram hash;
       inside each partition docs-per-gram is a boundary count over the
       (hash, doc)-sorted run, and only occurrences of duplicated grams
       survive — output volume is proportional to duplicated content.
    2. surviving ``(doc, pos)`` rows and the doc payload rows union (padded
       to one schema, the repo's manual-union join idiom — Acero joins
       choke on list payloads and chained-join plans) and route by doc-id
       hash; each partition rebuilds its docs in one vectorized pass
       (interval-delta cumsum for span coverage, one polars group_by join
       for the text). The doc text crosses the exchange exactly once.

    The input Dataset is consumed twice (occurrence pass + payload pass) —
    two scans of the source, no materialization.
    """
    from perfect_bloomfilter_ray.functions.hashing import splitmix64

    nb = choose_num_blocks(docs, num_blocks)
    tok_re = r"[a-z0-9]+"

    def _id_part(ids: np.ndarray) -> np.ndarray:
        return (splitmix64(ids.astype(_U64)) % _U64(nb)).astype(np.int32)

    def occurrences(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(t.column(text_col))
        hs, di = _ngram_hashes(texts, n)
        if len(hs) == 0:
            return pa.table(
                {
                    "_id64": pa.array([], pa.int64()),
                    "_text": pa.array([], pa.string()),
                    "_pos": pa.array([], pa.int32()),
                    "_part": pa.array([], pa.int32()),
                    "_h": pa.array([], pa.int64()),
                }
            )
        ids = t.column(id_col).to_numpy()
        # _ngram_hashes emits per doc in position order → pos is the offset
        # within the doc's run
        new = np.ones(len(di), dtype=bool)
        new[1:] = di[1:] != di[:-1]
        starts = np.flatnonzero(new)
        pos = np.arange(len(di), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(di)))
        )
        return pa.table(
            {
                "_id64": pa.array(ids[di].astype(np.int64)),
                "_text": pa.nulls(len(di), pa.string()),
                "_pos": pa.array(pos.astype(np.int32)),
                "_part": pa.array((hs % _U64(nb)).astype(np.int32)),
                "_h": pa.array(hs.view(np.int64)),
            }
        )

    def dup_positions(t: pa.Table) -> pa.Table:
        h = t.column("_h").to_numpy()
        ids = t.column("_id64").to_numpy()
        pos = t.column("_pos").to_numpy()
        o = np.lexsort((ids, h))
        h_s, id_s = h[o], ids[o]
        new_h = np.ones(len(o), dtype=bool)
        new_h[1:] = h_s[1:] != h_s[:-1]
        new_pair = new_h.copy()
        new_pair[1:] |= id_s[1:] != id_s[:-1]
        h_starts = np.flatnonzero(new_h)
        run_lens = np.diff(np.append(h_starts, len(o)))
        docs_per = np.add.reduceat(new_pair.astype(np.int64), h_starts)
        dup = np.repeat(docs_per >= min_docs, run_lens)
        keep_ids = id_s[dup]
        return pa.table(
            {
                "_id64": pa.array(keep_ids),
                "_text": pa.nulls(int(dup.sum()), pa.string()),
                "_pos": pa.array(pos[o][dup]),
                "_part": pa.array(_id_part(keep_ids)),
            }
        )

    def payload(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return pa.table(
            {
                "_id64": pa.array(ids),
                "_text": t.column(text_col),
                "_pos": pa.nulls(len(t), pa.int32()),
                "_part": pa.array(_id_part(ids)),
            }
        )

    def rebuild(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        d = df.filter(pl.col("_text").is_not_null()).sort("_id64")
        p = df.filter(pl.col("_text").is_null())
        ids_d = d["_id64"].to_numpy()
        toks = d["_text"].str.to_lowercase().str.extract_all(tok_re)
        lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls()
        total = int(lens.sum())
        begins = np.cumsum(lens) - lens
        delta = np.zeros(total + 1, dtype=np.int64)
        if len(p):
            di = np.searchsorted(ids_d, p["_id64"].to_numpy())
            pp = p["_pos"].to_numpy().astype(np.int64)
            s = begins[di] + pp
            e = begins[di] + np.minimum(pp + n, lens[di])
            np.add.at(delta, s, 1)
            np.add.at(delta, e, -1)
        cov = np.cumsum(delta[:total]) > 0
        doc_of = np.repeat(np.arange(len(ids_d)), lens)
        n_removed = np.bincount(doc_of[cov], minlength=len(ids_d)).astype(np.int64)
        kept_doc = doc_of[~cov]
        joined = (
            pl.DataFrame({"_doc": kept_doc, "tok": flat.filter(pl.Series(~cov))})
            .group_by("_doc", maintain_order=True)
            .agg(pl.col("tok").str.join(" ").alias("_new"))
        )
        clean = np.full(len(ids_d), "", object)
        clean[joined["_doc"].to_numpy()] = joined["_new"].to_numpy()
        has_tok = lens > 0
        return pa.table(
            {
                id_col: pa.array(ids_d[has_tok]),
                "n_tokens": pa.array(lens[has_tok]),
                "n_removed": pa.array(n_removed[has_tok]),
                clean_col: pa.array(clean[has_tok], pa.string()),
            }
        )

    occ = (
        docs.select_columns([id_col, text_col])
        .map_batches(occurrences, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(dup_positions, batch_format="pyarrow")
    )
    pay = docs.select_columns([id_col, text_col]).map_batches(
        payload, batch_format="pyarrow"
    )
    return pay.union(occ).groupby("_part").map_groups(rebuild, batch_format="pyarrow")
