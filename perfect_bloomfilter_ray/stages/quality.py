"""Gopher-style repetition / quality filtering (Rae et al. 2021, "Scaling
Language Models: ... Gopher", table A1; also C4's heuristics): per-document
repetition metrics computed in one vectorized shuffle-free ``map_batches``
pass, plus a rule filter over them.

Metrics (tokens are ``[a-z0-9]+`` runs of the lowercased text):
- ``n_tokens``       token count
- ``frac_dup_words`` 1 - distinct_tokens / n_tokens   (0 for empty docs)
- ``mean_word_len``  total token chars / n_tokens     (0 for empty docs)
- ``top_bigram_frac``count of the most frequent word bigram / (n_tokens-1)
                     (0 when n_tokens < 2)

All formulas are plain IEEE float64 expressions over integers, so any engine
evaluating the same expression gets bit-identical values — which is what
makes the keep/drop decision oracle-checkable in SQL
(`repetition_filter_stats` in pipelines/queries.py).

Scale shape: polars tokenization + one flattened-hash numpy pass per batch
(same rolling-hash trick as stages/decontam.py); no shuffle, no per-row
Python, no driver state.
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

# Gopher-flavored defaults tuned so the synthetic corpus splits meaningfully
DEFAULT_RULES = {
    "max_frac_dup_words": 0.6,
    "max_top_bigram_frac": 0.10,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
}


def repetition_metrics(texts: pl.Series) -> dict[str, np.ndarray]:
    """Vectorized per-document repetition metrics for one batch."""
    toks = texts.str.to_lowercase().str.extract_all(_TOKEN_RE)
    n = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    nu = toks.list.n_unique().fill_null(0).to_numpy().astype(np.int64)
    chars = (
        toks.list.eval(pl.element().str.len_chars().cast(pl.Int64))
        .list.sum()
        .fill_null(0)
        .to_numpy()
        .astype(np.int64)
    )
    nf = n.astype(np.float64)
    safe = np.maximum(n, 1).astype(np.float64)
    frac_dup = np.where(n > 0, 1.0 - nu / safe, 0.0)
    mean_wlen = np.where(n > 0, chars / safe, 0.0)

    # most-frequent-bigram count per doc via flattened token hashes
    top_bg = np.zeros(len(n), dtype=np.int64)
    flat = toks.explode().drop_nulls()
    if len(flat):
        h = flat.hash(seed=0xB16A).to_numpy().astype(_U64, copy=True)
        doc_of = np.repeat(np.arange(len(n)), n)
        with np.errstate(over="ignore"):
            bg = splitmix64(h[:-1] * _GOLD + h[1:]) if len(h) > 1 else np.empty(0, _U64)
        # valid bigram starts: both tokens in the same doc
        valid = np.flatnonzero(doc_of[:-1] == doc_of[1:]) if len(h) > 1 else np.empty(0, np.int64)
        if len(valid):
            d, g = doc_of[valid], bg[valid]
            order = np.lexsort((g, d))
            d, g = d[order], g[order]
            new = np.empty(len(d), dtype=bool)
            new[0] = True
            new[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, len(d)))
            # max count per doc over its distinct bigrams
            dstart = np.flatnonzero(
                np.r_[True, d[starts][1:] != d[starts][:-1]]
            )
            top = np.maximum.reduceat(counts, dstart)
            top_bg[d[starts][dstart]] = top
    top_frac = np.where(n >= 2, top_bg / np.maximum(n - 1, 1).astype(np.float64), 0.0)
    return {
        "n_tokens": n,
        "frac_dup_words": frac_dup,
        "mean_word_len": mean_wlen,
        "top_bigram_frac": top_frac,
    }


def keep_mask(m: dict[str, np.ndarray], rules: dict | None = None) -> np.ndarray:
    r = {**DEFAULT_RULES, **(rules or {})}
    return (
        (m["frac_dup_words"] <= r["max_frac_dup_words"])
        & (m["top_bigram_frac"] <= r["max_top_bigram_frac"])
        & (m["mean_word_len"] >= r["min_mean_word_len"])
        & (m["mean_word_len"] <= r["max_mean_word_len"])
    )


def gopher_filter(
    ds: Dataset,
    text_col: str = "text",
    rules: dict | None = None,
    drop: bool = True,
    metrics_cols: bool = False,
) -> Dataset:
    """Filter (or flag+annotate) documents by repetition rules."""

    def fn(t: pa.Table) -> pa.Table:
        s = t.column(text_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        m = repetition_metrics(pl.from_arrow(s))
        keep = keep_mask(m, rules)
        if drop:
            t = t.filter(pa.array(keep))
            if metrics_cols:
                for k, v in m.items():
                    t = t.append_column(k, pa.array(v[keep]))
            return t
        t = t.append_column("keep", pa.array(keep))
        if metrics_cols:
            for k, v in m.items():
                t = t.append_column(k, pa.array(v))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def compression_ratio(texts, level: int = 6) -> np.ndarray:
    """zlib-compressed length / raw utf-8 length per text (the
    RefinedWeb/Gopher-family repetitiveness signal: boilerplate and
    near-duplicate padding compress far below natural prose). Deterministic
    for a fixed zlib version + level. Returns float64; empty/null texts
    get ratio 1.0."""
    import zlib

    out = np.ones(len(texts), dtype=np.float64)
    for i, s in enumerate(texts):
        if s:
            raw = s.encode("utf-8")
            if raw:
                out[i] = len(zlib.compress(raw, level)) / len(raw)
    return out


def compression_filter(
    ds,
    text_col: str = "text",
    min_ratio: float = 0.25,
    level: int = 6,
    out_col: str = "comp_ratio",
):
    """Append the per-doc compression ratio and a keep flag (ratio >=
    min_ratio drops pathologically repetitive documents). Shuffle-free
    map_batches; the zlib loop is per-string C work, the same altitude as
    the PII regex chain."""
    import polars as pl

    def fn(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(t.select([text_col]))[text_col].fill_null("").to_list()
        r = compression_ratio(texts, level)
        return t.append_column(out_col, pa.array(r)).append_column(
            "comp_keep", pa.array(r >= min_ratio)
        )

    return ds.map_batches(fn, batch_format="pyarrow")
