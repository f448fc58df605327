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
