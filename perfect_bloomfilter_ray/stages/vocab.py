"""Corpus vocabulary statistics and TF-IDF scoring.

The featurization step of a classifier-based quality filter (CCNet / Dolma
style): build document frequencies over the whole corpus, derive IDF weights
for the retained vocabulary, then score every document in one streaming pass.

Scale shape (the part that matters at 100 TB):

- **Document frequency** is a map-side pre-aggregated groupby: each batch
  collapses to distinct ``(doc, token)`` pairs and emits one partial count
  per distinct token per batch, so the shuffle carries vocabulary-sized
  rows, never one row per token occurrence. A document never spans batches,
  so summing per-batch distinct counts is exactly df.
- **The vocabulary is bounded by ``min_df``** before it leaves the cluster:
  web-scale corpora have power-law vocabularies, and a df threshold keeps
  the broadcast in the hundreds of MB even at 10^12 docs. The broadcast is
  a sorted uint64 hash array + aligned float idf array (16 B/term, shared
  zero-copy from the object store by every task on a node) — not a Python
  dict of strings.
- **Scoring is shuffle-free**: one ``map_batches`` pass per document batch;
  ``sum_t tf(t) * idf(t)`` is computed as a segment-sum of idf over token
  *occurrences* (``np.bincount``), so no per-document tf grouping is ever
  materialized.

Oracle: `tfidf_doc_scores` in pipelines/queries.py re-derives df/idf/score
in DuckDB SQL on the same tokenization.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

TOKEN_RE = r"[a-z0-9]+"


def _tokens(texts: pl.Series) -> pl.Series:
    return texts.str.to_lowercase().str.extract_all(TOKEN_RE)


def document_frequency(ds: Dataset, text_col: str, min_df: int = 1) -> Dataset:
    """``(token, df)`` over the corpus; tokens appearing in < min_df docs cut.

    Map-side partial aggregation: per-batch distinct (doc, token) counts,
    then one vocabulary-sized groupby-sum.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([text_col]))
        out = (
            df.with_row_index("_doc")
            .with_columns(_tokens(pl.col(text_col)).alias("token"))
            .drop(text_col)
            .explode("token")
            .drop_nulls("token")
            .unique(["_doc", "token"])
            .group_by("token")
            .len(name="pdf")
            .with_columns(pl.col("pdf").cast(pl.Int64))
        )
        return out.to_arrow()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pdf", alias_name="df"))
    )
    if min_df > 1:
        out = out.filter(expr=f"df >= {min_df}")
    return out


def idf_broadcast(df_ds: Dataset, n_docs: int, seed: int = 0x1DF) -> "ray.ObjectRef":  # noqa: F821
    """Collapse a (token, df) Dataset into a broadcast IDF lookup.

    Returns an ObjectRef to ``(sorted_hashes: uint64[V], idf: float64[V])``
    with ``idf = ln(n_docs / df)``. The vocabulary must already be bounded
    (min_df) — this is the one intentional driver materialization, and it is
    vocabulary-sized, not corpus-sized.
    """
    import ray

    hs, idfs = [], []
    for t in df_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        s = pl.from_arrow(t.column("token")).hash(seed=seed).to_numpy().astype(np.uint64, copy=True)
        hs.append(s)
        idfs.append(np.log(float(n_docs) / t.column("df").to_numpy().astype(np.float64)))
    if hs:
        h = np.concatenate(hs)
        v = np.concatenate(idfs)
    else:
        h, v = np.empty(0, np.uint64), np.empty(0, np.float64)
    order = np.argsort(h, kind="stable")
    return ray.put((h[order], v[order]))


def _segment_sum(
    t: pa.Table, text_col: str, vh: np.ndarray, vals: np.ndarray, oov: float, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row ``sum over token occurrences of weight(token)`` where weight
    comes from the sorted broadcast vocabulary (``oov`` for misses), plus the
    per-row token counts. The shared kernel of TF-IDF and unigram-LM scoring:
    tokenize, hash, searchsorted, one ``np.bincount`` segment-sum."""
    toks = _tokens(pl.from_arrow(t.column(text_col)))
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls()
    sums = np.zeros(len(t), np.float64)
    if len(flat):
        h = flat.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
        if len(vh):
            pos = np.searchsorted(vh, h)
            pos[pos == len(vh)] = 0
            w = np.where(vh[pos] == h, vals[pos], oov)
        else:
            w = np.full(len(h), oov)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        sums = np.bincount(doc_of, weights=w, minlength=len(t))
    return sums, lens


def tfidf_score(
    ds: Dataset,
    idf_ref,
    text_col: str,
    score_col: str = "score",
    ntoks_col: str = "n_toks",
    seed: int = 0x1DF,
) -> Dataset:
    """Append ``sum_t tf*idf`` and total-token-count columns, streaming.

    ``sum_t tf(t)*idf(t) == sum over token occurrences of idf`` — so the
    kernel is: tokenize, hash, searchsorted into the broadcast vocabulary,
    segment-sum per row. Out-of-vocabulary tokens contribute 0.
    """

    def score(t: pa.Table) -> pa.Table:
        import ray

        vh, vi = ray.get(idf_ref)
        scores, lens = _segment_sum(t, text_col, vh, vi, 0.0, seed)
        return t.append_column(score_col, pa.array(scores)).append_column(
            ntoks_col, pa.array(lens)
        )

    return ds.map_batches(score, batch_format="pyarrow")


def token_counts(ds: Dataset, text_col: str, min_count: int = 1) -> Dataset:
    """``(token, cnt)`` occurrence counts over the corpus (not doc counts).

    Same map-side pre-aggregation shape as :func:`document_frequency`: the
    shuffle carries per-batch distinct-token partial counts, one row per
    distinct token per batch.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([text_col]))
        out = (
            df.select(_tokens(pl.col(text_col)).alias("token"))
            .explode("token")
            .drop_nulls("token")
            .group_by("token")
            .len(name="pcnt")
            .with_columns(pl.col("pcnt").cast(pl.Int64))
        )
        return out.to_arrow()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pcnt", alias_name="cnt"))
    )
    if min_count > 1:
        out = out.filter(expr=f"cnt >= {min_count}")
    return out


def unigram_logprob_broadcast(
    cnt_ds: Dataset, total_tokens: int, seed: int = 0x1DF
) -> "ray.ObjectRef":  # noqa: F821
    """Collapse a ``(token, cnt)`` Dataset into a broadcast negative-log-prob
    lookup: ``nll(t) = -ln(cnt / total)``; out-of-vocabulary tokens are
    scored downstream with the floor ``-ln(0.5 / total)`` (half a count).

    Same 16 B/term sorted-hash layout and min_count-bounded size contract as
    :func:`idf_broadcast`.
    """
    import ray

    hs, nls = [], []
    for t in cnt_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        s = pl.from_arrow(t.column("token")).hash(seed=seed).to_numpy().astype(np.uint64, copy=True)
        hs.append(s)
        nls.append(-np.log(t.column("cnt").to_numpy().astype(np.float64) / float(total_tokens)))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    v = np.concatenate(nls) if nls else np.empty(0, np.float64)
    order = np.argsort(h, kind="stable")
    oov = -np.log(0.5 / float(total_tokens))
    return ray.put((h[order], v[order], oov))


def unigram_nll_score(
    ds: Dataset,
    lp_ref,
    text_col: str,
    nll_col: str = "nll_per_tok",
    ntoks_col: str = "n_toks",
    seed: int = 0x1DF,
) -> Dataset:
    """Append per-token negative log-likelihood under the corpus unigram LM
    (the CCNet §4.2 quality signal, with a unigram model in place of KenLM —
    an honest stand-in: no external LM is available, and the scoring plumbing
    is identical). Low nll = head-heavy/common text; high = rare/noisy.
    Tokenless documents score 0. One shuffle-free ``map_batches`` pass.
    """

    def score(t: pa.Table) -> pa.Table:
        import ray

        vh, vn, oov = ray.get(lp_ref)
        sums, lens = _segment_sum(t, text_col, vh, vn, oov, seed)
        nll = np.divide(sums, lens, out=np.zeros_like(sums), where=lens > 0)
        return t.append_column(nll_col, pa.array(nll)).append_column(
            ntoks_col, pa.array(lens)
        )

    return ds.map_batches(score, batch_format="pyarrow")


def categorical_encode(
    ds: Dataset,
    col: str,
    out_col: str | None = None,
    min_count: int = 1,
) -> Dataset:
    """Frequency-ordered label encoding: map each category to a dense int
    code (0 = most frequent; ties broken by value, so the code book is
    deterministic and engine-reproducible). The feature-engineering step
    before embedding tables / gradient boosting.

    One small groupby builds the (value, count) vocabulary; the sorted code
    book broadcasts once via ``ray.put`` (bounded-category contract — same
    as idf_broadcast); encoding is a shuffle-free searchsorted map pass.
    Categories below ``min_count`` (or unseen) get null.
    """
    import ray

    out_col = out_col or f"{col}_code"
    vocab = (
        ds.select_columns([col])
        .groupby(col)
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    vocab = vocab[vocab["_c"] >= min_count]
    vocab = vocab.sort_values(["_c", col], ascending=[False, True]).reset_index(drop=True)
    vals = vocab[col].to_numpy()
    order = np.argsort(vals)
    lut_ref = ray.put((vals[order], np.arange(len(vals), dtype=np.int64)[order]))

    def encode(t: pa.Table) -> pa.Table:
        v_sorted, codes = ray.get(lut_ref)
        c = t.column(col)
        if len(v_sorted) == 0:
            return t.append_column(out_col, pa.nulls(len(t), pa.int64()))
        x = c.to_numpy(zero_copy_only=False)
        valid = ~c.is_null().to_numpy(zero_copy_only=False) if c.null_count else None
        if valid is not None:
            x = np.where(valid, x, v_sorted[0])  # sentinel; masked out below
        idx = np.clip(np.searchsorted(v_sorted, x), 0, len(v_sorted) - 1)
        hit = v_sorted[idx] == x
        if valid is not None:
            hit &= valid
        out = np.where(hit, codes[idx], 0)
        return t.append_column(out_col, pa.array(out, pa.int64(), mask=~hit))

    return ds.map_batches(encode, batch_format="pyarrow")


def bigram_counts(ds: Dataset, text_col: str, min_count: int = 1) -> Dataset:
    """``(w1, gram, cnt)`` counts of consecutive-token bigrams over the
    corpus (``gram`` = ``"w1 w2"``; the ``w1`` output column lets the
    conditional probability ``cnt(w1 w2) / cnt(w1)`` resolve at
    broadcast-build time). Same map-side pre-aggregation shape as
    :func:`token_counts`: one partial row per distinct bigram per batch —
    only (gram, pcnt) crosses the shuffle; ``w1`` is re-derived from the
    gram string afterwards (tokens contain no spaces, so the split is
    lossless) rather than shipped as a redundant extra string column.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([text_col]))
        toks = _tokens(pl.col(text_col))
        out = (
            df.select(
                toks.list.slice(0, toks.list.len() - 1).alias("w1"),
                toks.list.slice(1).alias("w2"),
            )
            .explode(["w1", "w2"])
            .drop_nulls()
            .select((pl.col("w1") + " " + pl.col("w2")).alias("gram"))
            .group_by("gram")
            .len(name="pcnt")
            .with_columns(pl.col("pcnt").cast(pl.Int64))
        )
        return out.to_arrow()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("pcnt", alias_name="cnt"))
    )
    # re-derive w1 from the gram string (only (gram, pcnt) crossed the shuffle)
    def add_w1(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return df.with_columns(
            pl.col("gram").str.split(" ").list.first().alias("w1")
        ).to_arrow()

    out = out.map_batches(add_w1, batch_format="pyarrow")
    if min_count > 1:
        out = out.filter(expr=f"cnt >= {min_count}")
    return out


def bigram_logprob_broadcast(
    big_ds: Dataset,
    uni_counts: "ray.ObjectRef | tuple",  # noqa: F821
    total_tokens: int,
    seed: int = 0x1DF,
) -> "ray.ObjectRef":  # noqa: F821
    """Collapse ``(w1, gram, cnt)`` bigram counts into a broadcast
    conditional negative-log-prob lookup: ``nll(w1 w2) = -ln(cnt(w1 w2) /
    cnt(w1))`` with ``cnt(w1)`` resolved from the unigram vocabulary
    (``uni_counts`` = the ``(sorted_hashes, counts)`` pair or an ObjectRef
    to one — see :func:`unigram_count_broadcast`). Bigrams whose ``w1``
    fell below the unigram vocabulary's min_count floor are skipped (they
    would need a count the broadcast no longer has); scoring treats them as
    OOV with the global floor ``-ln(0.5 / total_tokens)``.

    Same 16 B/term sorted-hash layout as :func:`idf_broadcast`.
    """
    import ray

    uh, ucnt = ray.get(uni_counts) if isinstance(uni_counts, ray.ObjectRef) else uni_counts
    hs, nls = [], []
    for t in big_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        gh = pl.from_arrow(t.column("gram")).hash(seed=seed).to_numpy().astype(np.uint64, copy=True)
        w1h = pl.from_arrow(t.column("w1")).hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
        c2 = t.column("cnt").to_numpy().astype(np.float64)
        if len(uh):
            pos = np.searchsorted(uh, w1h)
            pos[pos == len(uh)] = 0
            c1 = np.where(uh[pos] == w1h, ucnt[pos].astype(np.float64), np.nan)
        else:
            c1 = np.full(len(gh), np.nan)
        ok = np.isfinite(c1)
        hs.append(gh[ok])
        nls.append(np.log(c1[ok]) - np.log(c2[ok]))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    v = np.concatenate(nls) if nls else np.empty(0, np.float64)
    order = np.argsort(h, kind="stable")
    oov = -np.log(0.5 / float(total_tokens))
    return ray.put((h[order], v[order], oov))


def unigram_count_broadcast(cnt_ds: Dataset, seed: int = 0x1DF) -> "ray.ObjectRef":  # noqa: F821
    """``(sorted_hashes, counts)`` broadcast of a ``(token, cnt)`` Dataset —
    the raw-count sibling of :func:`unigram_logprob_broadcast`, shared by
    the bigram conditional model."""
    import ray

    hs, cs = [], []
    for t in cnt_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        s = pl.from_arrow(t.column("token")).hash(seed=seed).to_numpy().astype(np.uint64, copy=True)
        hs.append(s)
        cs.append(t.column("cnt").to_numpy().astype(np.int64))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    c = np.concatenate(cs) if cs else np.empty(0, np.int64)
    order = np.argsort(h, kind="stable")
    return ray.put((h[order], c[order]))


def bigram_nll_score(
    ds: Dataset,
    lp_ref,
    text_col: str,
    nll_col: str = "nll2_per_tok",
    nbigrams_col: str = "n_bigrams",
    seed: int = 0x1DF,
) -> Dataset:
    """Append per-bigram conditional negative log-likelihood under the
    corpus bigram LM (one step closer to CCNet's KenLM scoring than the
    unigram model: fluent common phrasing scores low even when individual
    tokens are rare). Documents with < 2 tokens score 0 over 0 bigrams.
    One shuffle-free ``map_batches`` pass.
    """

    def score(t: pa.Table) -> pa.Table:
        import ray

        vh, vn, oov = ray.get(lp_ref)
        df = pl.from_arrow(t.select([text_col]))
        toks = _tokens(pl.col(text_col))
        pairs = df.select(
            toks.list.slice(0, toks.list.len() - 1).alias("w1"),
            toks.list.slice(1).alias("w2"),
        )
        lens = pairs["w1"].list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = pairs.explode(["w1", "w2"]).drop_nulls()
        sums = np.zeros(len(t), np.float64)
        if len(flat):
            grams = (flat["w1"] + " " + flat["w2"]).rename("gram")
            gh = grams.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
            if len(vh):
                pos = np.searchsorted(vh, gh)
                pos[pos == len(vh)] = 0
                w = np.where(vh[pos] == gh, vn[pos], oov)
            else:
                w = np.full(len(gh), oov)
            doc_of = np.repeat(np.arange(len(lens)), lens)
            sums = np.bincount(doc_of, weights=w, minlength=len(t))
        nll = np.divide(sums, lens, out=np.zeros_like(sums), where=lens > 0)
        return t.append_column(nll_col, pa.array(nll)).append_column(
            nbigrams_col, pa.array(lens)
        )

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_query_stats(
    ds: Dataset, text_col: str, terms: list[str]
) -> tuple[dict[str, int], int]:
    """One corpus pass → (document frequency per query term, total token
    count). The query-term set is tiny (a handful of strings), so the
    per-batch partial is |terms|+1 rows — the shuffle is constant-width
    regardless of corpus size. String equality (no hashing) keeps the df
    counts exact.

    Returns ``({term: df}, total_tokens)`` on the driver (O(|terms|) state).
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([text_col]))
        toks = _tokens(pl.col(text_col))
        tmp = df.with_row_index("_doc").select("_doc", toks.alias("tok"))
        total = int(tmp["tok"].list.len().fill_null(0).sum())
        ex = tmp.explode("tok").drop_nulls("tok")
        pdf = (
            ex.filter(pl.col("tok").is_in(terms))
            .unique(["_doc", "tok"])
            .group_by("tok")
            .len(name="pdf")
            .with_columns(pl.col("pdf").cast(pl.Int64))
            .rename({"tok": "term"})
        )
        tot = pl.DataFrame({"term": ["\x00total"], "pdf": [total]}).with_columns(
            pl.col("pdf").cast(pl.Int64)
        )
        return pl.concat([pdf, tot]).to_arrow()

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("pdf", alias_name="df"))
        .to_pandas()
    )
    stats = dict(zip(agg["term"], agg["df"].astype(int)))
    total_tokens = stats.pop("\x00total", 0)
    return {t: stats.get(t, 0) for t in terms}, int(total_tokens)


def bm25_score(
    ds: Dataset,
    text_col: str,
    terms: list[str],
    dfs: dict[str, int],
    n_docs: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    score_col: str = "score",
    dl_col: str = "dl",
    nmatch_col: str = "n_terms",
    tfsum_col: str | None = None,
) -> Dataset:
    """Okapi BM25 scoring (Robertson/Sparck-Jones idf with Lucene's +1):
    ``sum_t ln(1 + (N - df + .5)/(df + .5)) * tf*(k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl))``. The corpus-level stats (df per term, N, avgdl) are
    O(|terms|) scalars passed by closure; scoring is one shuffle-free
    ``map_batches`` pass — tokenize, filter to the query terms, per-doc tf
    via a bincount over (doc, term) codes, vectorized score. Appends the
    score, document token length, and matched-term count.
    """
    t_list = list(terms)
    idf = np.array(
        [np.log(1.0 + (n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in t_list],
        np.float64,
    )
    T = len(t_list)

    def score(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([text_col]))
        toks = _tokens(pl.col(text_col))
        tmp = df.with_row_index("_doc").select("_doc", toks.alias("tok"))
        lens = tmp["tok"].list.len().fill_null(0).to_numpy().astype(np.int64)
        ex = tmp.explode("tok").drop_nulls("tok").filter(pl.col("tok").is_in(t_list))
        scores = np.zeros(len(t), np.float64)
        nmatch = np.zeros(len(t), np.int64)
        tfsum = np.zeros(len(t), np.int64)
        if len(ex):
            doc = ex["_doc"].to_numpy().astype(np.int64)
            tidx = (
                ex["tok"]
                .replace_strict(t_list, list(range(T)), return_dtype=pl.Int64)
                .to_numpy()
                .astype(np.int64)
            )
            tf = np.bincount(doc * T + tidx, minlength=len(t) * T).reshape(len(t), T)
            norm = k1 * (1.0 - b + b * lens / avgdl)  # (docs,)
            contrib = idf[None, :] * tf * (k1 + 1.0) / (tf + norm[:, None])
            contrib[tf == 0] = 0.0
            scores = contrib.sum(axis=1)
            nmatch = (tf > 0).sum(axis=1).astype(np.int64)
            tfsum = tf.sum(axis=1).astype(np.int64)
        out = (
            t.append_column(score_col, pa.array(scores))
            .append_column(dl_col, pa.array(lens))
            .append_column(nmatch_col, pa.array(nmatch))
        )
        if tfsum_col is not None:
            out = out.append_column(tfsum_col, pa.array(tfsum))
        return out

    return ds.map_batches(score, batch_format="pyarrow")


def int_idf_broadcast(
    df_ds: Dataset, n_docs: int, scale: int = 1_000_000, seed: int = 0x1DF
) -> "ray.ObjectRef":  # noqa: F821
    """Integer IDF surrogate lookup: ``idf_i = (n_docs * scale) // df`` —
    rank-equivalent to ln(n/df) (both monotone decreasing in df) but exact
    integer arithmetic, so scores built from it are engine-portable with no
    libm ``ln`` cross-engine 1-ulp risk. Same bounded-vocabulary sorted-hash
    broadcast contract as :func:`idf_broadcast` (16 B/term).
    """
    import ray

    hs, vals = [], []
    for t in df_ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        s = pl.from_arrow(t.column("token")).hash(seed=seed).to_numpy().astype(np.uint64, copy=True)
        hs.append(s)
        vals.append((n_docs * scale) // t.column("df").to_numpy().astype(np.int64))
    h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    v = np.concatenate(vals) if vals else np.empty(0, np.int64)
    order = np.argsort(h, kind="stable")
    return ray.put((h[order], v[order]))


def top_keyterms(
    ds: Dataset,
    idf_ref,
    text_col: str,
    id_col: str,
    k: int = 3,
    seed: int = 0x1DF,
) -> Dataset:
    """Per-document keyword extraction: the top-``k`` vocabulary terms by
    ``tf * idf_i`` (integer TF-IDF, ties broken by token asc). One
    shuffle-free ``map_batches`` pass — a document never spans batches, so
    per-doc tf grouping and the top-k both resolve inside the batch against
    the broadcast vocabulary. Out-of-vocabulary tokens are excluded (they
    have no df), matching the SQL oracle's inner join against the df table.

    Emits ``(id, rnk, token, tf, score)`` rows, ``rnk`` in 1..k.
    """

    def score(t: pa.Table) -> pa.Table:
        import ray

        vh, vi = ray.get(idf_ref)
        df = pl.from_arrow(t.select([id_col, text_col]))
        tf = (
            df.with_columns(_tokens(pl.col(text_col)).alias("token"))
            .drop(text_col)
            .explode("token")
            .drop_nulls("token")
            .group_by([id_col, "token"])
            .len(name="tf")
            .with_columns(pl.col("tf").cast(pl.Int64))
        )
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            }
        )
        if len(tf) == 0:
            return empty
        h = tf["token"].hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
        if len(vh) == 0:
            return empty
        pos = np.searchsorted(vh, h)
        pos[pos == len(vh)] = 0
        hit = vh[pos] == h
        tf = tf.with_columns(pl.Series("idf_i", np.where(hit, vi[pos], 0))).filter(
            pl.Series(hit)
        )
        if len(tf) == 0:
            return empty
        pdf = (
            tf.with_columns((pl.col("tf") * pl.col("idf_i")).alias("score"))
            .sort([id_col, "score", "token"], descending=[False, True, False])
            .to_pandas()
        )
        pdf["rnk"] = pdf.groupby(id_col).cumcount() + 1
        pdf = pdf[pdf["rnk"] <= k]
        return pa.table(
            {
                id_col: pa.array(pdf[id_col].to_numpy().astype(np.int64)),
                "rnk": pa.array(pdf["rnk"].to_numpy().astype(np.int64)),
                "token": pa.array(pdf["token"].astype(str).tolist(), pa.string()),
                "tf": pa.array(pdf["tf"].to_numpy().astype(np.int64)),
                "score": pa.array(pdf["score"].to_numpy().astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
