"""PPJoin-style prefix-filtered exact set-similarity self-join.

Exact word-set Jaccard join with threshold t over the WHOLE corpus (no
blocking key needed), via prefix filtering (Xiao et al., WWW'08 /
Chaudhuri et al., ICDE'06): order every document's distinct tokens by
GLOBAL document frequency ascending (ties by token), keep only the first
``p = |W| - ceil(t*|W|) + 1`` tokens as the *prefix*; any pair with
Jaccard >= t must share at least one prefix token (pigeonhole on the
suffix: the suffix holds ceil(t*|W|)-1 < t*|W| <= |A∩B| tokens).

Why this scales where LSH needs tuning and all-pairs dies:

- Prefix tokens are by construction the RAREST tokens of each document,
  so the candidate buckets (one per prefix token) are naturally small —
  the frequent tokens that would create quadratic buckets are exactly the
  ones the prefix excludes.
- Each document ships its token-hash set only ``p ≈ (1-t)|W|+1`` times
  (once per prefix token), and verification happens INSIDE the token
  bucket — one shuffle, no second resolve pass, no driver materialization.
  Duplicate verifications (pairs sharing several prefix tokens) collapse
  in a final (id_a, id_b) groupby.
- The df table broadcast is the repo's bounded-vocabulary contract (same
  as TF-IDF / unigram-LM scoring); for open vocabularies, hash tokens to
  a bounded df-sketch domain first.

Output: (id_a, id_b, sz_a, sz_b, inter, jaccard) with id_a < id_b —
jaccard is a float64 division of exact ints, bitwise identical to a SQL
list_intersect oracle.
"""

from __future__ import annotations

import math

import numpy as np
import polars as pl
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

_U64 = np.uint64

_EMPTY = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "sz_a": pa.array([], pa.int64()),
        "sz_b": pa.array([], pa.int64()),
        "inter": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }
)


def _doc_tokens(t: pa.Table, id_col: str, text_col: str) -> pl.DataFrame:
    """(id, tok) rows, tokens DISTINCT per doc, lowercased [a-z0-9]+."""
    df = pl.from_arrow(t.select([id_col, text_col]))
    return (
        df.select(
            pl.col(id_col).alias("_id"),
            pl.col(text_col).fill_null("").str.to_lowercase().str.extract_all(r"[a-z0-9]+").list.unique().alias("tok"),
        )
        .explode("tok")
        .drop_nulls("tok")
    )


def ppjoin_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_blocks: int | None = None,
) -> Dataset:
    """All document pairs with exact word-set Jaccard >= ``threshold``."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    import ray

    nb = choose_num_blocks(ds, num_blocks)

    # ---- pass 1: global token document frequencies (bounded-vocab LUT) ----
    def df_partial(t: pa.Table) -> pa.Table:
        g = _doc_tokens(t, id_col, text_col).group_by("tok").len(name="pn")
        return g.with_columns(pl.col("pn").cast(pl.Int64)).to_arrow()

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("pn", alias_name="df"))
        .to_pandas()
    )
    if df_tbl.empty:  # empty / all-empty-text input
        import ray.data as rd

        return rd.from_arrow(_EMPTY)
    # global prefix order: (df asc, token asc) -> dense order index
    df_tbl = df_tbl.sort_values(["df", "tok"]).reset_index(drop=True)
    order_ref = ray.put(
        pl.DataFrame({"tok": df_tbl["tok"].to_numpy(), "_ord": np.arange(len(df_tbl), dtype=np.int64)})
    )

    t_thr = float(threshold)

    # ---- pass 2: per doc, order tokens, emit prefix rows carrying the set ----
    def emit_prefix(t: pa.Table) -> pa.Table:
        order: pl.DataFrame = ray.get(order_ref)
        toks = _doc_tokens(t, id_col, text_col).join(order, on="tok", how="inner")
        if len(toks) == 0:
            return pa.table({"_ptok": pa.array([], pa.int64()), "_id": pa.array([], pa.int64()), "set": pa.array([], pa.list_(pa.int64()))})
        per_doc = (
            toks.sort(["_id", "_ord"])
            .group_by("_id", maintain_order=True)
            .agg(pl.col("_ord").alias("set"))
            .with_columns(
                pl.col("set").list.len().cast(pl.Int64).alias("_sz"),
            )
        )
        sz = per_doc["_sz"].to_numpy()
        p = sz - np.ceil(t_thr * sz).astype(np.int64) + 1
        per_doc = per_doc.with_columns(pl.Series("_p", p))
        ex = (
            per_doc.with_columns(pl.col("set").list.head(pl.col("_p")).alias("_pfx"))
            .explode("_pfx")
            .select(pl.col("_pfx").alias("_ptok"), pl.col("_id"), pl.col("set"))
        )
        return ex.to_arrow()

    prefixed = ds.map_batches(emit_prefix, batch_format="pyarrow")

    # ---- pass 3: verify inside each prefix-token bucket ----
    def route(t: pa.Table) -> pa.Table:
        k = t.column("_ptok").to_numpy().astype(np.int64, copy=False).view(_U64)
        # splitmix-style scramble so consecutive order ids spread over blocks
        z = (k + _U64(0x9E3779B97F4A7C15)) * _U64(0xBF58476D1CE4E5B9)
        return t.append_column("_part", pa.array((z % _U64(nb)).astype(np.int32)))

    def verify_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        outs = []
        for (_ptok,), g in df.group_by(["_ptok"]):
            k = len(g)
            if k < 2:
                continue
            # one doc can reach the same bucket via one prefix token only, so
            # rows here are distinct docs; dedupe defensively anyway
            g = g.unique(subset=["_id"], keep="first").sort("_id")
            k = len(g)
            if k < 2:
                continue
            ids = g["_id"].to_numpy()
            sets = g["set"].to_list()
            sizes = np.array([len(s) for s in sets], dtype=np.int64)
            # incidence matmul over the bucket-local vocabulary
            flat = np.concatenate([np.asarray(s, dtype=np.int64) for s in sets])
            uniq, inv = np.unique(flat, return_inverse=True)
            inc = np.zeros((k, len(uniq)), dtype=np.int32)
            row = np.repeat(np.arange(k), sizes)
            inc[row, inv] = 1
            inter = inc @ inc.T
            iu, ju = np.triu_indices(k, k=1)
            iv = inter[iu, ju].astype(np.int64)
            union = sizes[iu] + sizes[ju] - iv
            jac = iv / union
            m = jac >= t_thr
            if not m.any():
                continue
            outs.append(
                pa.table(
                    {
                        "id_a": pa.array(ids[iu[m]]),
                        "id_b": pa.array(ids[ju[m]]),
                        "sz_a": pa.array(sizes[iu[m]]),
                        "sz_b": pa.array(sizes[ju[m]]),
                        "inter": pa.array(iv[m]),
                        "jaccard": pa.array(jac[m]),
                    }
                )
            )
        if not outs:
            return _EMPTY
        return pa.concat_tables(outs)

    verified = (
        prefixed.map_batches(route, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(verify_block, batch_format="pyarrow")
    )

    # a pair sharing several prefix tokens verifies in several buckets with
    # identical numbers — collapse to one row. Coarse hash(pair) partitions +
    # per-partition unique, NOT a per-pair groupby (the distinct_pairs
    # 3x lesson: Ray's sort-based aggregate pays for ordering a pair space
    # that a set union never needs).
    return _dedup_pair_rows(verified, "id_a", "id_b", nb)


__all__ = ["ppjoin_pairs", "ppjoin_pairs_rs"]


def _prefix_len(n: int, t: float) -> int:
    """Reference prefix length (exposed for tests)."""
    return n - math.ceil(t * n) + 1


def _dedup_pair_rows(verified: Dataset, a_col: str, b_col: str, nb: int) -> Dataset:
    """Collapse duplicate pair rows (identical across every column) via a
    coarse hash(pair) partition + per-partition ``unique``."""
    from perfect_bloomfilter_ray.functions.hashing import hash64

    def route_pair(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        h = hash64(df[a_col], 0xE1A) * _U64(0x9E3779B97F4A7C15) + hash64(df[b_col], 0xE2B)
        return df.with_columns(
            pl.Series("_part", (h % _U64(nb)).astype(np.int32))
        ).to_arrow()

    def uniq(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.drop_columns(["_part"]))
            .unique(subset=[a_col, b_col])
            .to_arrow()
        )

    return (
        verified.map_batches(route_pair, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(uniq, batch_format="pyarrow")
    )


def ppjoin_pairs_rs(
    ds_r: Dataset,
    ds_s: Dataset,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_blocks: int | None = None,
) -> Dataset:
    """R-S (cross-collection) prefix-filtered exact set-similarity join:
    all pairs (id_r, id_s) with word-set Jaccard >= ``threshold`` where the
    two sides come from DIFFERENT collections (e.g. a fresh crawl slice
    joined against a reference corpus — the similarity-dedup shape that
    containment/minhash ingest checks approximate).

    Same three passes as :func:`ppjoin_pairs` — one global df order over
    the UNION of both sides (the pigeonhole argument only needs one
    consistent total order), prefix rows tagged with their side, and
    bucket-local verification — but the incidence matmul is RECTANGULAR
    (R-side rows x S-side rows), so no same-side pair is ever scored.
    Output: (id_r, id_s, sz_r, sz_s, inter, jaccard)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    import ray
    import ray.data as rd

    empty = pa.table(
        {
            "id_r": pa.array([], pa.int64()),
            "id_s": pa.array([], pa.int64()),
            "sz_r": pa.array([], pa.int64()),
            "sz_s": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.select([id_col, text_col]).append_column(
                "_side", pa.array(np.full(len(t), side, dtype=np.int8))
            )

        return fn

    both = ds_r.map_batches(tag(0), batch_format="pyarrow").union(
        ds_s.map_batches(tag(1), batch_format="pyarrow")
    )
    nb = choose_num_blocks(both, num_blocks)

    def df_partial(t: pa.Table) -> pa.Table:
        g = _doc_tokens(t, id_col, text_col).group_by("tok").len(name="pn")
        return g.with_columns(pl.col("pn").cast(pl.Int64)).to_arrow()

    df_tbl = (
        both.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("pn", alias_name="df"))
        .to_pandas()
    )
    if df_tbl.empty:
        return rd.from_arrow(empty)
    df_tbl = df_tbl.sort_values(["df", "tok"]).reset_index(drop=True)
    order_ref = ray.put(
        pl.DataFrame(
            {"tok": df_tbl["tok"].to_numpy(), "_ord": np.arange(len(df_tbl), dtype=np.int64)}
        )
    )

    t_thr = float(threshold)

    def emit_prefix(t: pa.Table) -> pa.Table:
        order: pl.DataFrame = ray.get(order_ref)
        side = pl.from_arrow(t.select([id_col, "_side"])).rename({id_col: "_id"})
        toks = _doc_tokens(t, id_col, text_col).join(order, on="tok", how="inner")
        if len(toks) == 0:
            return pa.table(
                {
                    "_ptok": pa.array([], pa.int64()),
                    "_id": pa.array([], pa.int64()),
                    "_side": pa.array([], pa.int8()),
                    "set": pa.array([], pa.list_(pa.int64())),
                }
            )
        per_doc = (
            toks.sort(["_id", "_ord"])
            .group_by("_id", maintain_order=True)
            .agg(pl.col("_ord").alias("set"))
            .with_columns(pl.col("set").list.len().cast(pl.Int64).alias("_sz"))
            .join(side.unique(subset=["_id"]), on="_id", how="left")
        )
        sz = per_doc["_sz"].to_numpy()
        p = sz - np.ceil(t_thr * sz).astype(np.int64) + 1
        ex = (
            per_doc.with_columns(pl.Series("_p", p))
            .with_columns(pl.col("set").list.head(pl.col("_p")).alias("_pfx"))
            .explode("_pfx")
            .select(pl.col("_pfx").alias("_ptok"), pl.col("_id"), pl.col("_side"), pl.col("set"))
        )
        return ex.to_arrow()

    prefixed = both.map_batches(emit_prefix, batch_format="pyarrow")

    def route(t: pa.Table) -> pa.Table:
        k = t.column("_ptok").to_numpy().astype(np.int64, copy=False).view(_U64)
        z = (k + _U64(0x9E3779B97F4A7C15)) * _U64(0xBF58476D1CE4E5B9)
        return t.append_column("_part", pa.array((z % _U64(nb)).astype(np.int32)))

    def verify_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        outs = []
        for (_ptok,), g in df.group_by(["_ptok"]):
            g = g.unique(subset=["_id", "_side"], keep="first")
            gr = g.filter(pl.col("_side") == 0).sort("_id")
            gs = g.filter(pl.col("_side") == 1).sort("_id")
            if len(gr) == 0 or len(gs) == 0:
                continue
            ids_r, ids_s = gr["_id"].to_numpy(), gs["_id"].to_numpy()
            sets_r, sets_s = gr["set"].to_list(), gs["set"].to_list()
            szr = np.array([len(s) for s in sets_r], dtype=np.int64)
            szs = np.array([len(s) for s in sets_s], dtype=np.int64)
            flat = np.concatenate(
                [np.asarray(s, dtype=np.int64) for s in sets_r + sets_s]
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            kr, ks = len(ids_r), len(ids_s)
            inc = np.zeros((kr + ks, len(uniq)), dtype=np.int32)
            row = np.repeat(np.arange(kr + ks), np.concatenate([szr, szs]))
            inc[row, inv] = 1
            inter = inc[:kr] @ inc[kr:].T  # rectangular: R rows x S rows
            iu, ju = np.nonzero(inter)
            iv = inter[iu, ju].astype(np.int64)
            union = szr[iu] + szs[ju] - iv
            jac = iv / union
            m = jac >= t_thr
            if not m.any():
                continue
            outs.append(
                pa.table(
                    {
                        "id_r": pa.array(ids_r[iu[m]]),
                        "id_s": pa.array(ids_s[ju[m]]),
                        "sz_r": pa.array(szr[iu[m]]),
                        "sz_s": pa.array(szs[ju[m]]),
                        "inter": pa.array(iv[m]),
                        "jaccard": pa.array(jac[m]),
                    }
                )
            )
        if not outs:
            return empty
        return pa.concat_tables(outs)

    verified = (
        prefixed.map_batches(route, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(verify_block, batch_format="pyarrow")
    )

    out = _dedup_pair_rows(verified, "id_r", "id_s", nb).materialize()
    if out.count() == 0:
        # zero qualifying pairs: a grouped-empty Dataset loses its schema —
        # hand back the typed empty table instead
        return rd.from_arrow(empty)
    return out
