"""Driver-facing analytics suite: Ray pipelines + DuckDB oracle SQL pairs.

Every entry is registered with ``@q(name, sql=...)``: the Ray callable takes
``sf_dir`` and returns a Dataset / DataFrame / Table; ``sql`` is the ANSI-SQL
equivalent DuckDB runs on the same parquet (views pre-registered by the
driver). Column names match EXACTLY between both sides; float aggregates are
rounded identically on both sides (addition order differs between engines).

Entries without ``sql`` are genuinely non-SQL-expressible (sketch estimates,
LSH candidates) — the driver records a rows-only check and pytest holds the
error-bound tests instead.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Mean, Min, Sum

from perfect_bloomfilter_ray.stages.partitioning import choose_join_partitions

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


# Opt-in per-process projection cache for _t (bench suite only — set
# GRAFT_T_CACHE=1). The suite runs ~400 pipelines over the same ten tables;
# materializing each distinct (table, columns) projection ONCE keeps the
# decoded Arrow blocks in the object store across queries, replacing
# hundreds of repeated parquet scans. Correctness-neutral: materialized
# Datasets are immutable and every consumer maps over the same blocks.
# On a cluster the same role is played by stages/adaptive.cached_result
# (disk-backed, stat-signature keyed); this in-memory variant is the
# single-process suite's equivalent.
_T_CACHE: dict = {}


def _t(sf_dir: str, name: str, columns: list[str] | None = None):
    import os

    import ray.data as rd

    if os.environ.get("GRAFT_T_CACHE") == "1":
        # key on the Ray session: a MaterializedDataset's blocks die with
        # the object store, so entries must not survive ray.shutdown()/init
        import ray

        ctx = ray.get_runtime_context() if ray.is_initialized() else None
        session = getattr(ctx, "get_job_id", lambda: None)() if ctx else None
        if _T_CACHE.get("_session") != session:
            _T_CACHE.clear()  # blocks from a previous Ray session are dead
            _T_CACHE["_session"] = session
        key = (sf_dir, name, tuple(columns) if columns else None)
        ds = _T_CACHE.get(key)
        if ds is None:
            ds = _T_CACHE[key] = rd.read_parquet(
                f"{sf_dir}/{name}.parquet", columns=columns
            ).materialize()
        return ds
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _round(df: pd.DataFrame, spec: dict[str, int]) -> pd.DataFrame:
    for c, d in spec.items():
        df[c] = df[c].astype(float).round(d)
    return df


# ---------------------------------------------------------------------------
# Exact aggregates / joins / sorts (SQL-oracle-backed)
# ---------------------------------------------------------------------------


@q(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           round(avg(l_quantity), 4)                                  AS avg_qty,
           count(*)                                                   AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(sf_dir: str):
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return t.append_column("disc_price", disc)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    return _round(out, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4})


@q(
    "top_orders_by_revenue",
    sql="""
    SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def top_orders_by_revenue(sf_dir: str):
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "revenue": r})

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    out = _round(out, {"revenue": 2})
    out = out.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


@q(
    "order_priority_count",
    sql="""
    SELECT o_orderpriority, count(*) AS n FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def order_priority_count(sf_dir: str):
    return (
        _t(sf_dir, "orders", ["o_orderpriority"])
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"))
        .sort("o_orderpriority")
    )


@q(
    "nation_customer_balance",
    sql="""
    SELECT n.n_name, count(*) AS n_customers, round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def nation_customer_balance(sf_dir: str):
    cust = _t(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    joined = cust.join(nation, "inner", num_partitions=choose_join_partitions(min_partitions=4), on=("c_nationkey",), right_on=("n_nationkey",))
    out = (
        joined.groupby("n_name")
        .aggregate(Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="total_acctbal"))
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    return _round(out, {"total_acctbal": 2})


@q(
    "region_supplier_balance",
    sql="""
    SELECT r.r_name, count(*) AS n_suppliers, round(sum(s.s_acctbal), 2) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)
def region_supplier_balance(sf_dir: str):
    """Dimension joins via broadcast lookup (no shuffle of the fact side —
    the nation/region tables are tiny; Ray-native hash join coverage lives in
    nation_customer_balance)."""
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    sup = _t(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _t(sf_dir, "region", ["r_regionkey", "r_name"])
    j1 = broadcast_lookup_join(sup, nation, on="s_nationkey", right_on="n_nationkey")
    j2 = broadcast_lookup_join(j1, region, on="n_regionkey", right_on="r_regionkey")
    out = (
        j2.groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("s_acctbal", alias_name="total_acctbal"))
        .to_pandas()
        .sort_values("r_name")
        .reset_index(drop=True)
    )
    return _round(out, {"total_acctbal": 2})


@q(
    "events_hourly",
    sql="""
    SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type, hour ORDER BY event_type, hour
    """,
)
def events_hourly(sf_dir: str):
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def trunc(t: pa.Table) -> pa.Table:
        return t.append_column("hour", pc.floor_temporal(t.column("ts"), unit="hour"))

    out = (
        ds.map_batches(trunc, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    return _round(out, {"sum_value": 2})


@q(
    "heavy_hitter_users_exact",
    sql="""
    SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 20
    """,
)
def heavy_hitter_users_exact(sf_dir: str):
    out = (
        _t(sf_dir, "events", ["user_id"])
        .groupby("user_id")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["n", "user_id"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return out


@q(
    "distinct_users_per_type",
    sql="""
    SELECT event_type, count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def distinct_users_per_type(sf_dir: str):
    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_c"))
    return (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="distinct_users"))
        .sort("event_type")
    )


@q(
    "docs_stats_per_lang",
    sql="""
    SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def docs_stats_per_lang(sf_dir: str):
    out = (
        _t(sf_dir, "documents", ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Mean("n_chars", alias_name="avg_chars"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_chars": 4})


@q(
    "dedup_exact_docs",
    sql="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    ORDER BY doc_id
    """,
)
def dedup_exact_docs(sf_dir: str):
    from perfect_bloomfilter_ray.stages.dedup import exact_dedup

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    out = exact_dedup(ds, "text", "doc_id").select_columns(["doc_id", "lang", "n_chars"])
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


@q(
    "doc_token_stats",
    sql="""
    SELECT lang,
           CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens,
           round(avg(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END), 4) AS avg_tokens
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def doc_token_stats(sf_dir: str):
    from perfect_bloomfilter_ray.functions.text import token_count

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t.column("lang"), "tokens": token_count(t.column("text"))})

    out = (
        ds.map_batches(tok, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("tokens", alias_name="total_tokens"), Mean("tokens", alias_name="avg_tokens"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_tokens": 4})


@q(
    "doc_bpe_token_stats",
    sql="""
    SELECT lang,
           CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_bpe_tokens,
           round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))), 4) AS avg_bpe_tokens
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def doc_bpe_token_stats(sf_dir: str):
    """GPT-style pre-tokenizer counting (letter runs + digit singles +
    punctuation singles) per language — the second token-counting mode next
    to whitespace tokens (doc_token_stats)."""
    from perfect_bloomfilter_ray.functions.text import bpe_ish_token_count

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t.column("lang"), "tokens": bpe_ish_token_count(t.column("text"))})

    out = (
        ds.map_batches(tok, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("tokens", alias_name="total_bpe_tokens"), Mean("tokens", alias_name="avg_bpe_tokens"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_bpe_tokens": 4})


@q(
    "part_brand_stats",
    sql="""
    SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def part_brand_stats(sf_dir: str):
    out = (
        _t(sf_dir, "part", ["p_brand", "p_retailprice"])
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_parts"), Mean("p_retailprice", alias_name="avg_price"))
        .to_pandas()
        .sort_values("p_brand")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_price": 4})


@q(
    "monthly_shipments",
    sql="""
    SELECT date_trunc('month', l_shipdate) AS month, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY month ORDER BY month
    """,
)
def monthly_shipments(sf_dir: str):
    ds = _t(sf_dir, "lineitem", ["l_shipdate", "l_quantity"])

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {"month": pc.floor_temporal(t.column("l_shipdate"), unit="month"), "l_quantity": t.column("l_quantity")}
        )

    out = (
        ds.map_batches(trunc, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty"))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    return _round(out, {"sum_qty": 2})


@q(
    "events_value_histogram",
    sql="""
    SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS n
    FROM events GROUP BY bucket ORDER BY bucket
    """,
)
def events_value_histogram(sf_dir: str):
    ds = _t(sf_dir, "events", ["value"])

    def bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t.column("value"), pa.scalar(50.0))), pa.int64())
        return pa.table({"bucket": b})

    return ds.map_batches(bucket, batch_format="pyarrow").groupby("bucket").aggregate(Count(alias_name="n")).sort("bucket")


@q(
    "median_nchars_per_lang",
    sql="""
    SELECT lang, round(quantile_cont(n_chars, 0.5), 4) AS median_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def median_nchars_per_lang(sf_dir: str):
    """Exact per-lang median via distinct-(lang, n_chars) count partials
    (stages/quantiles.grouped_quantiles_from_counts): lang has ~5 values,
    so the old whole-group map_groups shipped ~20% of the corpus into one
    task. The count-partial shape is a NARROW groupby shuffle whose output
    is bounded by |langs| x |char-count domain|, independent of row count;
    the exact quantile_cont falls out of the weighted distribution."""
    from perfect_bloomfilter_ray.stages.quantiles import grouped_quantiles_from_counts

    ds = _t(sf_dir, "documents", ["lang", "n_chars"])
    out = (
        grouped_quantiles_from_counts(ds, "lang", "n_chars", [0.5], kind="cont", names=["median_chars"])
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round(out[["lang", "median_chars"]], {"median_chars": 4})


# ---------------------------------------------------------------------------
# Bloom semi/anti joins (SQL-backed: FPR ~3e-13 makes them exact in practice)
# ---------------------------------------------------------------------------


@q(
    "bloom_semijoin_building_orders",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    ORDER BY o_orderkey
    """,
)
def bloom_semijoin_building_orders(sf_dir: str):
    from perfect_bloomfilter_ray.stages.membership import bloom_semi_join

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    out = bloom_semi_join(orders, cust, "o_custkey", "c_custkey", expected_keys=200_000)
    return (
        out.select_columns(["o_orderkey", "o_totalprice"]).to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    )


@q(
    "bloom_antijoin_customers_without_f_orders",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def bloom_antijoin_customers_without_f_orders(sf_dir: str):
    from perfect_bloomfilter_ray.stages.membership import bloom_semi_join

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).filter(expr="o_orderstatus == 'F'")
    out = bloom_semi_join(cust, orders, "c_custkey", "o_custkey", expected_keys=2_000_000, anti=True)
    df = out.select_columns(["c_custkey", "c_name"]).to_pandas()
    if df.empty:
        df = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype="object")})
    return df.sort_values("c_custkey").reset_index(drop=True)


@q(
    "union_distinct_custkeys",
    sql="""
    SELECT custkey FROM (
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    ) ORDER BY custkey
    """,
)
def union_distinct_custkeys(sf_dir: str):
    """Set op coverage: Dataset.union of two filtered streams + distinct."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    ords = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 400000"
    )

    def pick(col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"custkey": t.column(col)})

        return f

    u = cust.map_batches(pick("c_custkey"), batch_format="pyarrow").union(
        ords.map_batches(pick("o_custkey"), batch_format="pyarrow")
    )
    out = u.groupby("custkey").aggregate(Count(alias_name="_c")).drop_columns(["_c"]).sort("custkey")
    return out


@q(
    "props_k_stats",
    sql="""
    SELECT event_type,
           round(avg(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)), 4) AS avg_k,
           max(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def props_k_stats(sf_dir: str):
    """JSON property parser (vectorized polars json_decode inside
    map_batches) + grouped aggregate over the extracted field."""
    import polars as pl

    ds = _t(sf_dir, "events", ["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t.column("props").combine_chunks())
        k = s.str.json_path_match("$.k").cast(pl.Int64)
        return pa.table({"event_type": t.column("event_type"), "k": k.to_arrow()})

    out = (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Mean("k", alias_name="avg_k"), Max("k", alias_name="max_k"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_k": 4})


@q(
    "user_sessions",
    sql="""
    WITH d AS (
        SELECT user_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        FROM events
    )
    SELECT user_id, CAST(1 + sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM d GROUP BY user_id ORDER BY user_id
    """,
)
def user_sessions(sf_dir: str):
    """Gap-based session windows (30 min) per user — groupby.map_groups with
    per-group event-time sort (stages/windows.py)."""
    from perfect_bloomfilter_ray.stages.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    out = sessionize(ds, "user_id", "ts", gap="30min").to_pandas()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


@q("neardup_removed_docs")
def neardup_removed_docs(sf_dir: str):
    """End-to-end near-dup removal: MinHash-LSH pairs → union-find clusters →
    broadcast drop-set filter. Rows-only (sketch-dependent membership)."""
    from perfect_bloomfilter_ray.stages.dedup import drop_near_duplicates

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    kept = drop_near_duplicates(ds, "text", "doc_id", threshold=0.6)
    return (
        kept.select_columns(["doc_id", "lang"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


@q(
    "semijoin_exact_auto_parts",
    sql="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'STANDARD%')
      AND p_size >= 30
    ORDER BY p_partkey
    """,
)
def semijoin_exact_auto_parts(sf_dir: str):
    """Exact broadcast semi-join (small key set shipped via ray.put; no
    shuffle — contrast with bloom_semijoin_* for unbounded build sides)."""
    from perfect_bloomfilter_ray.stages.joins import broadcast_semi_join

    part = _t(sf_dir, "part", ["p_partkey", "p_name", "p_size"]).filter(expr="p_size >= 30")
    std = _t(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: t.filter(pc.starts_with(t.column("p_type"), "STANDARD")),
        batch_format="pyarrow",
    )
    out = broadcast_semi_join(part, std, on="p_partkey")
    return (
        out.select_columns(["p_partkey", "p_name"]).to_pandas().sort_values("p_partkey").reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@q(
    "ann_topk_bruteforce",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 4)
    SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
               ) AS rk
        FROM q CROSS JOIN embeddings e
    ) WHERE rk <= 10 ORDER BY query_id, vec_id
    """,
)
def ann_topk_bruteforce(sf_dir: str):
    from perfect_bloomfilter_ray.stages.ann import brute_force_topk

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id < 4").take_all()
    dim = len(qrows[0]["embedding"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sorted(qrows, key=lambda r: r["vec_id"])])
    df = brute_force_topk(emb, queries, "embedding", "vec_id", dim, k=10)
    out = df[["query_id", "vec_id"]].astype({"query_id": "int64", "vec_id": "int64"})
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sketch estimates + dedup/LSH candidates (rows-only checks; bounds in pytest)
# ---------------------------------------------------------------------------


@q("hll_distinct_users_per_type")
def hll_distinct_users_per_type(sf_dir: str):
    from perfect_bloomfilter_ray.state.hll import HyperLogLog
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    out = sketch_grouped(
        ds, "event_type", "user_id", lambda: HyperLogLog(12),
        name="distinct_users_est", finalize_fn=lambda s: float(s.estimate()),
    )
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


@q("cms_heavy_hitter_users")
def cms_heavy_hitter_users(sf_dir: str):
    from perfect_bloomfilter_ray.state.cms import CountMinSketch
    from perfect_bloomfilter_ray.stages.agg import sketch_global

    ds = _t(sf_dir, "events", ["user_id"])
    cms = sketch_global(ds, "user_id", lambda: CountMinSketch(eps=1e-4, delta=1e-3), name="cms")
    exact_top = (
        ds.groupby("user_id").aggregate(Count(alias_name="n")).to_pandas()
        .sort_values(["n", "user_id"], ascending=[False, True]).head(20)
    )
    probes = pa.array(exact_top["user_id"].to_numpy())
    est = cms.estimate_column(probes)
    return pd.DataFrame(
        {"user_id": exact_top["user_id"].to_numpy(), "est_count": est.astype("int64")}
    ).reset_index(drop=True)


@q(
    "order_rank_per_customer",
    sql="""
    SELECT o_orderkey,
           rank()       OVER w AS price_rank,
           dense_rank() OVER w AS price_dense_rank,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS price_rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    ORDER BY o_orderkey
    """,
)
def order_rank_per_customer(sf_dir: str):
    """Ranking window functions (rank/dense_rank/row_number per customer by
    price) via the coarse-partition vectorized kernel — no per-key Python."""
    from perfect_bloomfilter_ray.stages.windows import ranked

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = (
        ranked(
            ds,
            "o_custkey",
            "o_totalprice",
            descending=True,
            tie_cols=["o_orderkey"],
            rank_col="price_rank",
            dense_rank_col="price_dense_rank",
            row_number_col="price_rn",
        )
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    return out[["o_orderkey", "price_rank", "price_dense_rank", "price_rn"]]


@q(
    "mg_heavy_hitter_users",
    sql="""
    SELECT user_id, count(*) AS n FROM events
    GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20
    """,
)
def mg_heavy_hitter_users(sf_dir: str):
    """Heavy-hitter SET via the Misra-Gries mergeable summary — one pass,
    no groupby shuffle of the key space (CMS needs the candidate keys handed
    to it; MG maintains them). m=65536 keeps the 64k-counter summary tiny
    while exceeding the distinct-user count through sf1.0 (sf0.1 has 1.5k
    distinct users, sf1.0 15k — m=4096 silently went approximate at sf1.0,
    caught by the 10x oracle sweep), so retained counts are exact and the
    DuckDB oracle applies; beyond m distinct keys the summary degrades
    gracefully to its guaranteed N/(m+1) error by design. The trim/merge
    error path is property-tested in tests/test_merge_properties."""
    from perfect_bloomfilter_ray.state.spacesaving import MisraGries
    from perfect_bloomfilter_ray.stages.agg import sketch_global

    ds = _t(sf_dir, "events", ["user_id"])
    mg = sketch_global(ds, "user_id", lambda: MisraGries(65536), name="mg")
    top = mg.top_k(20)
    return pd.DataFrame(
        {"user_id": [int(k) for k, _ in top], "n": [int(c) for _, c in top]}
    )


@q("kll_nchars_quantiles")
def kll_nchars_quantiles(sf_dir: str):
    from perfect_bloomfilter_ray.state.kll import KLLSketch
    from perfect_bloomfilter_ray.stages.agg import sketch_global

    ds = _t(sf_dir, "documents", ["n_chars"])
    s = sketch_global(ds, "n_chars", lambda: KLLSketch(256), name="kll")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    return pd.DataFrame({"q": qs, "n_chars_quantile": [s.quantile(x) for x in qs]})


@q("tdigest_value_quantiles")
def tdigest_value_quantiles(sf_dir: str):
    from perfect_bloomfilter_ray.state.tdigest import TDigest
    from perfect_bloomfilter_ray.stages.agg import sketch_global

    ds = _t(sf_dir, "events", ["value"])
    s = sketch_global(ds, "value", lambda: TDigest(200), name="td")
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    return pd.DataFrame({"q": qs, "value_quantile": [s.quantile(x) for x in qs]})


@q(
    "bloom_membership_roundtrip",
    sql="""
    SELECT CAST(count(*) AS BIGINT) AS inserted, CAST(count(*) AS BIGINT) AS members,
           CAST(0 AS BIGINT) AS false_negatives, CAST(100000 AS BIGINT) AS fresh_probes,
           CAST(0 AS BIGINT) AS false_positives
    FROM events
    """,
)
def bloom_membership_roundtrip(sf_dir: str):
    """check→insert→check conformance over the events user space (the
    sync_test.rs contract, distributed): 0 FP on fresh, 0 FN on inserted.

    The SQL oracle encodes the CONTRACT, not a recomputation: members ==
    inserted (a Bloom filter admits no false negatives by construction) and
    zero observed false positives over the 100k fresh probes (expected FPs ≈
    3e-8 at the cascade's ~3.1e-13/lookup bound — the reference observed 0
    over 100M probes, tests/sync_test.rs:49-55). A hash-mismatch on this row
    is a real conformance regression, exactly what the gate should catch."""
    import ray

    from perfect_bloomfilter_ray.stages.membership import build_filter
    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    # materialize the slim projection once: count comes from block metadata
    # and the build + check passes re-read object-store blocks instead of
    # scanning parquet three more times (was 8.1 s of the bench suite)
    ds = _t(sf_dir, "events", ["event_id"]).materialize()
    n_total = ds.count()
    filt = build_filter(ds, "event_id", expected_keys=max(1024, n_total))
    ref = ray.put(filt.to_bytes())

    def member_partial(t: pa.Table) -> pa.Table:
        f = BloomCascade.from_bytes(ray.get(ref))
        return pa.table({"m": pa.array([int(f.contains_column(t.column("event_id")).sum())])})

    n_member = int(ds.map_batches(member_partial, batch_format="pyarrow").sum("m"))
    fresh = pa.array(np.arange(10_000_000, 10_100_000))
    fp = int(filt.contains_column(fresh).sum())
    return pd.DataFrame(
        {"inserted": [n_total], "members": [n_member], "false_negatives": [n_total - n_member], "fresh_probes": [100_000], "false_positives": [fp]}
    )


@q("minhash_dedup_pairs")
def minhash_dedup_pairs(sf_dir: str):
    from perfect_bloomfilter_ray.stages.dedup import minhash_lsh_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_pairs(ds, "text", "doc_id", num_perms=128, bands=16, threshold=0.5)
    df = out.to_pandas()
    if len(df):
        df = df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        df["est_jaccard"] = df["est_jaccard"].round(4)
    return df


@q("simhash_dedup_pairs")
def simhash_dedup_pairs(sf_dir: str):
    from perfect_bloomfilter_ray.stages.dedup import simhash_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    df = simhash_pairs(ds, "text", "doc_id", max_hamming=3).to_pandas()
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True) if len(df) else df


@q("embedding_neardup_pairs")
def embedding_neardup_pairs_q(sf_dir: str):
    from perfect_bloomfilter_ray.stages.dedup import embedding_neardup_pairs

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim = len(emb.take(1)[0]["embedding"])
    df = embedding_neardup_pairs(emb, "embedding", "vec_id", dim, cos_threshold=0.95).to_pandas()
    if len(df):
        df = df.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        df["cos"] = df["cos"].round(4)
    return df


@q(
    "lang_id_documents",
    # mirror of functions.text.lang_id: per-lang marker-hit counts, argmax
    # with first-max tie-break in marker-dict order (the CASE order below),
    # 'und' when no marker hits. ASCII corpus → RE2 \b == Rust-regex \b.
    sql="""
    WITH s AS (
        SELECT lang,
            len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b')) AS s_en,
            len(regexp_extract_all(lower(text), '\\b(der|und|die|nicht|ist)\\b')) AS s_de,
            len(regexp_extract_all(lower(text), '\\b(le|et|les|des|est)\\b')) AS s_fr,
            len(regexp_extract_all(lower(text), '\\b(el|los|que|es|una)\\b')) AS s_es,
            len(regexp_extract_all(lower(text), '\\b(il|che|di|per|una)\\b')) AS s_it,
            len(regexp_extract_all(lower(text), '\\b(o|que|um|para|com)\\b')) AS s_pt,
            len(regexp_extract_all(lower(text), '\\b(de|het|een|niet|van)\\b')) AS s_nl,
            len(regexp_extract_all(lower(text), '\\b(i|v|ne|na|chto)\\b')) AS s_ru,
            len(regexp_extract_all(lower(text), '\\b(de|shi|le|zai|you)\\b')) AS s_zh,
            len(regexp_extract_all(lower(text), '\\b(no|ni|wa|wo|ga)\\b')) AS s_ja
        FROM documents
    ), p AS (
        SELECT lang,
            CASE WHEN greatest(s_en,s_de,s_fr,s_es,s_it,s_pt,s_nl,s_ru,s_zh,s_ja) = 0 THEN 'und'
                 WHEN s_en = greatest(s_en,s_de,s_fr,s_es,s_it,s_pt,s_nl,s_ru,s_zh,s_ja) THEN 'en'
                 WHEN s_de = greatest(s_de,s_fr,s_es,s_it,s_pt,s_nl,s_ru,s_zh,s_ja) THEN 'de'
                 WHEN s_fr = greatest(s_fr,s_es,s_it,s_pt,s_nl,s_ru,s_zh,s_ja) THEN 'fr'
                 WHEN s_es = greatest(s_es,s_it,s_pt,s_nl,s_ru,s_zh,s_ja) THEN 'es'
                 WHEN s_it = greatest(s_it,s_pt,s_nl,s_ru,s_zh,s_ja) THEN 'it'
                 WHEN s_pt = greatest(s_pt,s_nl,s_ru,s_zh,s_ja) THEN 'pt'
                 WHEN s_nl = greatest(s_nl,s_ru,s_zh,s_ja) THEN 'nl'
                 WHEN s_ru = greatest(s_ru,s_zh,s_ja) THEN 'ru'
                 WHEN s_zh = greatest(s_zh,s_ja) THEN 'zh'
                 ELSE 'ja' END AS pred
        FROM s
    )
    SELECT lang, pred, count(*) AS n FROM p GROUP BY lang, pred ORDER BY lang, pred
    """,
)
def lang_id_documents(sf_dir: str):
    """Heuristic language-ID vs the labeled lang column (accuracy report)."""
    from perfect_bloomfilter_ray.functions.text import lang_id

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def ident(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t.column("lang"), "pred": lang_id(t.column("text"))})

    out = ds.map_batches(ident, batch_format="pyarrow").groupby(["lang", "pred"]).aggregate(Count(alias_name="n"))
    return out.to_pandas().sort_values(["lang", "pred"]).reset_index(drop=True)


@q(
    "doc_quality_scores",
    # mirror of functions.text.quality_score (length / punctuation / stopword
    # heuristic, clip == least∘greatest), per-doc round(6) then avg round(4)
    # on both sides so summation-order ulps cannot flip the hash
    sql="""
    WITH f AS (
        SELECT lang,
            CAST(length(text) AS DOUBLE) AS nc,
            CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS nt,
            CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS np,
            CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|a|for)\\b')) AS DOUBLE) AS ns
        FROM documents
    ), s AS (
        SELECT lang,
            least(greatest(nc / 500.0, 0), 1) * least(greatest((20000.0 - nc) / 20000.0, 0), 1) AS ls,
            1.0 - least(greatest(abs(np / greatest(nc, 1.0) - 0.03) * 10.0, 0), 1) AS ps,
            least(greatest((ns / greatest(nt, 1.0)) * 5.0, 0), 1) AS ss
        FROM f
    )
    SELECT lang, round(avg(round((ls + ps + ss) / 3.0, 6)), 4) AS avg_quality, count(*) AS n
    FROM s GROUP BY lang ORDER BY lang
    """,
)
def doc_quality_scores(sf_dir: str):
    from perfect_bloomfilter_ray.functions.text import quality_score

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text"])

    def score(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t.column("lang"), "score": quality_score(t.column("text"))})

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Mean("score", alias_name="avg_quality"), Count(alias_name="n"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_quality": 4})


@q(
    "fingerprint_distinct_per_lang",
    sql="""
    SELECT lang,
           count(DISTINCT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9_ \t\n]', '', 'g'), '[ \t\n]+', ' ', 'g'))) AS distinct_norm
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def fingerprint_distinct_per_lang(sf_dir: str):
    """64-bit content-fingerprint dedup key: distinct normalized docs per
    lang. Oracle counts distinct normalized text directly — equal unless the
    64-bit hash collides (P ~ n^2/2^64)."""
    from perfect_bloomfilter_ray.functions.text import fingerprint64

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t.column("lang"), "fp": fingerprint64(t.column("text"))})

    pairs = ds.map_batches(fp, batch_format="pyarrow").groupby(["lang", "fp"]).aggregate(Count(alias_name="_c"))
    return pairs.groupby("lang").aggregate(Count(alias_name="distinct_norm")).sort("lang")


@q("ngram_jaccard_verified_pairs")
def ngram_jaccard_verified_pairs(sf_dir: str):
    """MinHash-LSH candidates exactly verified by n-gram Jaccard (the
    candidate→verify dedup pattern at scale: cheap sketch recall, exact
    precision on the tiny candidate set)."""
    from perfect_bloomfilter_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cand = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.4).to_pandas()
    if not len(cand):
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    # fetch ONLY the candidate docs' texts: broadcast the (small) id set and
    # stream-filter the corpus — never materialize the full table
    need = set(cand["id_a"]) | set(cand["id_b"])

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("doc_id"), value_set=pa.array(list(need)))
        return t.filter(mask)

    texts = {
        r["doc_id"]: r["text"]
        for r in ds.map_batches(keep, batch_format="pyarrow").take_all()
    }
    jac = ngram_jaccard(
        [texts[i] for i in cand["id_a"]], [texts[i] for i in cand["id_b"]], n_words=5
    )
    out = pd.DataFrame({"id_a": cand["id_a"], "id_b": cand["id_b"], "jaccard": np.round(jac, 4)})
    out = out[out["jaccard"] >= 0.5]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


@q("image_feature_stats")
def image_feature_stats(sf_dir: str):
    """Multimodal pipeline on REAL pixels: each doc's text renders to real
    PNG bytes (stdlib encoder) → actor-pool stdlib PNG DECODE (zlib inflate
    + unfilter) → feature extraction → global stats. Rows-only (no SQL can
    run a codec)."""
    from perfect_bloomfilter_ray.stages.multimodal import (
        PngDecoder,
        image_pipeline,
        text_to_png_payload,
    )

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_bin(t: pa.Table) -> pa.Table:
        return pa.table({"blob": text_to_png_payload(t.column("text"), 32, 32)})

    media = ds.map_batches(to_bin, batch_format="pyarrow")
    feats = image_pipeline(
        media, "blob", decode_hw=(32, 32), concurrency=(1, 4), batch_size=128,
        decoder_cls=PngDecoder,
    )
    out = feats.aggregate(
        Count(alias_name="n_media"),
        Mean("px_mean", alias_name="avg_px_mean"),
        Mean("row_energy", alias_name="avg_row_energy"),
    )
    return pd.DataFrame([out]).round(4)


@q("ann_topk_lsh")
def ann_topk_lsh(sf_dir: str):
    from perfect_bloomfilter_ray.stages.ann import lsh_topk

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id < 4").take_all()
    dim = len(qrows[0]["embedding"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sorted(qrows, key=lambda r: r["vec_id"])])
    df = lsh_topk(emb, queries, "embedding", "vec_id", dim, k=10)
    return df[["query_id", "vec_id"]].astype({"query_id": "int64", "vec_id": "int64"}).sort_values(["query_id", "vec_id"]).reset_index(drop=True)

# ---------------------------------------------------------------------------
# Multi-way joins, grouped top-k, as-of join, IVF ANN
# ---------------------------------------------------------------------------


@q(
    "q3_shipping_priority",
    sql="""
    SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: small dimension (filtered customers) broadcast-semi
    onto orders — no shuffle of the order stream — then one Ray-native hash
    join orders⨝lineitem on the order key (the only big-big exchange), with
    both fact sides filter-pruned before the shuffle."""
    from perfect_bloomfilter_ray.stages.joins import broadcast_semi_join

    cutoff = pd.Timestamp("1998-01-01")
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    bldg_orders = broadcast_semi_join(
        orders.map_batches(
            lambda t: t.filter(pc.less(t.column("o_orderdate"), pa.scalar(cutoff))), batch_format="pyarrow"
        ),
        cust,
        on="o_custkey",
        right_on="c_custkey",
    )

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(cutoff)))
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev": rev})

    joined = li.map_batches(li_rev, batch_format="pyarrow").join(
        bldg_orders.map_batches(lambda t: t.drop_columns(["o_custkey"]), batch_format="pyarrow"),
        "inner",
        num_partitions=choose_join_partitions(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = (
        joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
    )
    out = _round(out, {"revenue": 2})
    out = out.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return out[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]].reset_index(drop=True)


@q(
    "top_orders_per_priority",
    sql="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn <= 3
    ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """,
)
def top_orders_per_priority(sf_dir: str):
    """Grouped top-k (top 3 orders by price per priority class) via the
    partial-top-k combiner stage — the shuffle moves ≤ k rows per key per
    block, never the whole table."""
    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    ds = _t(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
    out = grouped_top_k(ds, "o_orderpriority", "o_totalprice", k=3, tie_cols=["o_orderkey"]).to_pandas()
    out = out.sort_values(
        ["o_orderpriority", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    ).reset_index(drop=True)
    return out[["o_orderpriority", "o_orderkey", "o_totalprice"]]


@q(
    "events_asof_last_order",
    sql="""
    WITH ded AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           d.last_orderkey, d.o_orderdate AS last_orderdate
    FROM events e
    ASOF LEFT JOIN ded d ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
    ORDER BY e.event_id
    """,
)
def events_asof_last_order(sf_dir: str):
    """As-of join: each event matched to the user's most recent order at or
    before the event time (build side deduped per (key, ts) by max orderkey so
    the payload is deterministic). Broadcast + packed searchsorted — no
    shuffle of the event stream."""
    from perfect_bloomfilter_ray.stages.joins import asof_join_broadcast

    events = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    ded = (
        orders.groupby(["o_custkey", "o_orderdate"])
        .aggregate(Max("o_orderkey", alias_name="last_orderkey"))
    )
    joined = asof_join_broadcast(
        events,
        ded,
        on="user_id",
        big_ts="ts",
        right_on="o_custkey",
        small_ts="o_orderdate",
        how="left",
        prefix="",
    )
    out = joined.to_pandas().rename(columns={"o_orderdate": "last_orderdate"})
    out = out[["event_id", "user_id", "last_orderkey", "last_orderdate"]]
    return out.sort_values("event_id").reset_index(drop=True)


@q(
    "events_asof_last_order_partitioned",
    sql="""
    WITH ded AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS last_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           d.last_orderkey, d.o_orderdate AS last_orderdate
    FROM events e
    ASOF LEFT JOIN ded d ON e.user_id = d.o_custkey AND e.ts >= d.o_orderdate
    ORDER BY e.event_id
    """,
)
def events_asof_last_order_partitioned(sf_dir: str):
    """Big-big as-of join: same semantics as events_asof_last_order but via
    the hash-co-partitioned path (``asof_join_partitioned``) — the scale
    variant for build sides too large to broadcast. Must be row-identical to
    the broadcast result and the DuckDB ASOF oracle."""
    from perfect_bloomfilter_ray.stages.joins import asof_join_partitioned

    events = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])
    ded = (
        orders.groupby(["o_custkey", "o_orderdate"])
        .aggregate(Max("o_orderkey", alias_name="last_orderkey"))
    )
    joined = asof_join_partitioned(
        events,
        ded,
        on="user_id",
        big_ts="ts",
        right_on="o_custkey",
        small_ts="o_orderdate",
        how="left",
        prefix="",
    )
    out = joined.to_pandas().rename(columns={"o_orderdate": "last_orderdate"})
    out = out[["event_id", "user_id", "last_orderkey", "last_orderdate"]]
    return out.sort_values("event_id").reset_index(drop=True)


@q("ann_topk_ivf")
def ann_topk_ivf(sf_dir: str):
    """IVF-partitioned approximate top-k (the ANN scale path next to LSH):
    spherical-k-means cells, probe the 6 nearest cells per query. Rows-only;
    recall vs brute force is asserted in tests."""
    from perfect_bloomfilter_ray.stages.ann import ivf_topk

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id < 4").take_all()
    dim = len(qrows[0]["embedding"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sorted(qrows, key=lambda r: r["vec_id"])])
    df = ivf_topk(emb, queries, "embedding", "vec_id", dim, k=10, nlist=16, nprobe=6)
    return df[["query_id", "vec_id"]].astype({"query_id": "int64", "vec_id": "int64"}).sort_values(["query_id", "vec_id"]).reset_index(drop=True)


@q(
    "user_sliding_5min_activity",
    sql="""
    SELECT event_id,
           count(*) OVER w            AS w_count,
           round(sum(value) OVER w, 2) AS w_sum
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING AND CURRENT ROW
    )
    ORDER BY event_id
    """,
)
def user_sliding_5min_activity(sf_dir: str):
    """Per-event sliding 5-minute window (count + value sum over the same
    user's trailing window) — SQL RANGE-frame semantics via one hash shuffle
    and a vectorized searchsorted per group."""
    from perfect_bloomfilter_ray.stages.windows import sliding_window_agg

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = sliding_window_agg(
        ds, "user_id", "ts", value_col="value", window="5min", out_sum="w_sum"
    ).to_pandas()
    out = out[["event_id", "w_count", "w_sum"]].sort_values("event_id").reset_index(drop=True)
    return _round(out, {"w_sum": 2})


@q(
    "orders_price_band_totals",
    sql="""
    WITH bands(band, lo, hi) AS (VALUES
        ('p00_10k',        0.0,  10000.0),
        ('p10_50k',    10000.0,  50000.0),
        ('p50_150k',   50000.0, 150000.0),
        ('p150k_inf', 150000.0,      1e18)
    )
    SELECT b.band, count(*) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band ORDER BY b.band
    """,
)
def orders_price_band_totals(sf_dir: str):
    """Inequality (range) join: each order matched to its price band via the
    broadcast interval-lookup stage (a BETWEEN join hash engines can't do
    without a cross product), then a tiny groupby. Totals are integer CENTS
    (floor(x*100 + 0.5), same tree both sides): a rounded float sum hashed
    equal at sf0.1 by luck but diverged at sf1.0 — ordered float sums
    across engines are never hash-stable (suite policy)."""
    from perfect_bloomfilter_ray.stages.joins import range_join_broadcast

    bands = pa.table(
        {
            "band": ["p00_10k", "p10_50k", "p50_150k", "p150k_inf"],
            "lo": [0.0, 10000.0, 50000.0, 150000.0],
            "hi": [10000.0, 50000.0, 150000.0, 1e18],
        }
    )
    ds = _t(sf_dir, "orders", ["o_totalprice"])
    joined = range_join_broadcast(ds, bands, "o_totalprice", "lo", "hi", how="inner")

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)), pa.int64()
        )
        return pa.table({"band": t.column("band"), "cents": c})

    out = (
        joined.map_batches(cents, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    return out.astype({"n_orders": "int64", "total_cents": "int64"})


@q(
    "q5_local_supplier_volume",
    sql="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY n_name
    """,
)
def q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape (6 tables): ONE big-big hash join (orders⨝lineitem on
    the order key); every other table is dimension-scale and resolves as a
    broadcast lookup on the streaming side — the local-supplier condition
    (c_nationkey = s_nationkey) becomes a vectorized filter after two lookups.
    """
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t.column("o_orderdate"), pa.scalar(lo)),
                pc.less(t.column("o_orderdate"), pa.scalar(hi)),
            )
        ).drop_columns(["o_orderdate"]),
        batch_format="pyarrow",
    )

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev": pc.multiply(
                    t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
                ),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        orders, "inner", num_partitions=choose_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",)
    )
    j1 = broadcast_lookup_join(
        joined, _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), on="o_custkey", right_on="c_custkey"
    )
    j2 = broadcast_lookup_join(
        j1, _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]), on="l_suppkey", right_on="s_suppkey"
    )

    def local_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("c_nationkey"), t.column("s_nationkey")))

    j3 = broadcast_lookup_join(
        j2.map_batches(local_only, batch_format="pyarrow"),
        _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]),
        on="s_nationkey",
        right_on="n_nationkey",
    )
    j4 = broadcast_lookup_join(
        j3, _t(sf_dir, "region", ["r_regionkey", "r_name"]), on="n_regionkey", right_on="r_regionkey"
    )

    def asia(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("r_name"), pa.scalar("ASIA")))

    out = (
        j4.map_batches(asia, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    return _round(out, {"revenue": 2})


@q(
    "user_event_type_pivot",
    sql="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click'    THEN value ELSE 0 END), 2) AS click_value,
           round(sum(CASE WHEN event_type = 'view'     THEN value ELSE 0 END), 2) AS view_value,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value,
           count(*) AS n_events
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def user_event_type_pivot(sf_dir: str):
    """Pivot via conditional aggregation: event types become columns inside
    one map_batches (vectorized if_else), then a single groupby — no
    per-type scan, no second shuffle."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def widen(t: pa.Table) -> pa.Table:
        v, et = t.column("value"), t.column("event_type")
        zero = pa.scalar(0.0)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "click_value": pc.if_else(pc.equal(et, pa.scalar("click")), v, zero),
                "view_value": pc.if_else(pc.equal(et, pa.scalar("view")), v, zero),
                "purchase_value": pc.if_else(pc.equal(et, pa.scalar("purchase")), v, zero),
            }
        )

    out = (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("click_value", alias_name="click_value"),
            Sum("view_value", alias_name="view_value"),
            Sum("purchase_value", alias_name="purchase_value"),
            Count(alias_name="n_events"),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return _round(out, {"click_value": 2, "view_value": 2, "purchase_value": 2})


@q(
    "docs_hash_sample_stats",
    sql="""
    SELECT lang, count(*) AS n, round(sum(n_chars), 2) AS total_chars
    FROM documents
    WHERE (doc_id * 2654435761) % 10 = 0
    GROUP BY lang ORDER BY lang
    """,
)
def docs_hash_sample_stats(sf_dir: str):
    """Deterministic hash-based sampling (Knuth multiplicative residue on the
    id): the reproducible, engine-portable alternative to random_sample —
    the same rows are selected on every engine and every run, so sampled
    pipelines stay oracle-comparable and resumable."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def sample(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = (ids.astype(np.int64) * 2654435761) % 10 == 0
        return t.filter(pa.array(keep))

    out = (
        ds.map_batches(sample, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round(out, {"total_chars": 2})


@q("video_frame_stats")
def video_frame_stats(sf_dir: str):
    """Multimodal video path smoke: binary payloads → actor-pool frame
    sampling (stub codec) → per-frame image features → per-frame-index
    stats. Rows-only (no SQL equivalent for the stubbed codec)."""
    from perfect_bloomfilter_ray.stages.multimodal import video_pipeline

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_bin(t: pa.Table) -> pa.Table:
        return pa.table({"blob": pc.cast(t.column("text"), pa.binary())})

    media = ds.map_batches(to_bin, batch_format="pyarrow")
    feats = video_pipeline(media, "blob", frames=4, frame_hw=(16, 16), concurrency=(1, 4), batch_size=128)
    out = (
        feats.groupby("frame")
        .aggregate(
            Count(alias_name="n_frames"),
            Mean("px_mean", alias_name="avg_px_mean"),
            Mean("row_energy", alias_name="avg_row_energy"),
        )
        .to_pandas()
        .sort_values("frame")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_px_mean": 4, "avg_row_energy": 4})


@q(
    "curated_corpus_stats",
    sql="""
    WITH filtered AS (
        SELECT doc_id, lang, text, n_chars FROM documents
        WHERE lang IN ('en', 'de') AND length(text) >= 200
    ), ded AS (
        SELECT min(doc_id) AS keep_id FROM filtered GROUP BY text
    )
    SELECT f.lang, count(*) AS n_docs, CAST(sum(f.n_chars) AS BIGINT) AS total_chars
    FROM filtered f JOIN ded d ON f.doc_id = d.keep_id
    GROUP BY f.lang ORDER BY f.lang
    """,
)
def curated_corpus_stats(sf_dir: str):
    """End-to-end curation chain (lang allowlist + length floor + exact
    dedup keeping the lowest id) — the oracle-checkable core of the
    training-data preparation pipeline; near-dup removal layers on top
    (see neardup_removed_docs)."""
    from perfect_bloomfilter_ray.pipelines.curate import curate

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "text", "n_chars"])
    out = (
        curate(ds, langs=("en", "de"), min_chars=200)
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out


@q(
    "stratified_sample_docs",
    sql="""
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang ORDER BY (doc_id * 2654435761) % 1000000007, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20 ORDER BY lang, doc_id
    """,
)
def stratified_sample_docs(sf_dir: str):
    """Deterministic k-per-group sampling (smallest multiplicative-hash
    residue per lang) — reproducible fixture/eval sampling that any engine
    can replicate exactly, built on the grouped top-k combiner."""
    from perfect_bloomfilter_ray.stages.topk import stratified_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang"])
    out = stratified_sample(ds, "lang", "doc_id", k=20).to_pandas()
    return out[["lang", "doc_id"]].sort_values(["lang", "doc_id"]).reset_index(drop=True)


@q(
    "weighted_sample_docs",
    sql="""
    SELECT lang, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY pow(((doc_id % 1000000007) * (2654435761 % 1000000007) % 1000000007 + 1)
                                 / 1000000008.0,
                             1.0 / greatest(n_chars, 1)) DESC, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 10 ORDER BY lang, doc_id
    """,
)
def weighted_sample_docs(sf_dir: str):
    """Weight-proportional deterministic sampling (Efraimidis-Spirakis A-ES,
    weight = document length): the training-data mixing primitive —
    length-biased doc selection per language, reproducible on any engine."""
    from perfect_bloomfilter_ray.stages.topk import weighted_sample

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    out = weighted_sample(ds, "lang", "doc_id", "n_chars", k=10).to_pandas()
    return out[["lang", "doc_id", "n_chars"]].sort_values(["lang", "doc_id"]).reset_index(drop=True)


def _user_event_chain_edges(ds):
    """Chain-graph edges shared by the connected-components queries: within
    each (user, event_type) group, consecutive event ids are linked — a
    component's diameter equals its size, genuinely exercising hash-to-min
    propagation. Keys co-locate via a coarse hash partition sized from the
    cluster (``choose_num_blocks``), not a static constant."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    nb = np.uint64(choose_num_blocks(ds))

    def add_part(t: pa.Table) -> pa.Table:
        h = hash64(t.column("user_id"), 0xCC01)
        return t.append_column("_part", pa.array((h % nb).astype(np.int32)))

    def chain_edges(t: pa.Table) -> pa.Table:
        import polars as pl

        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        if len(t) < 2:
            return empty
        df = pl.from_arrow(t.drop_columns(["_part"])).sort(["user_id", "event_type", "event_id"])
        ids = df["event_id"].to_numpy()
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        if not same.any():
            return empty
        return pa.table(
            {
                "id_a": pa.array(ids[:-1][same].astype(np.int64)),
                "id_b": pa.array(ids[1:][same].astype(np.int64)),
            }
        )

    return (
        ds.select_columns(["event_id", "user_id", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(chain_edges, batch_format="pyarrow")
    )


@q(
    "user_event_chain_components",
    sql="""
    WITH g AS (
        SELECT event_id,
               min(event_id) OVER (PARTITION BY user_id, event_type) AS root,
               count(*)      OVER (PARTITION BY user_id, event_type) AS n
        FROM events
    )
    SELECT event_id AS node, root FROM g WHERE n > 1 ORDER BY node
    """,
)
def user_event_chain_components(sf_dir: str):
    """Distributed connected components, oracle-checked: edges CHAIN the
    event ids of each (user, event_type) group — consecutive ids only, so a
    component's diameter equals its size and the hash-to-min propagation is
    genuinely exercised (tens of rounds' worth of hops collapsed in
    O(log d)); the component root must equal min(event_id) per group, which
    SQL states directly with a window function."""
    from perfect_bloomfilter_ray.stages.dedup import connected_components_pairs

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type"])
    out = connected_components_pairs(_user_event_chain_edges(ds)).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


@q("theta_user_overlap")
def theta_user_overlap(sf_dir: str):
    """Theta/KMV set-operation sketches: estimated distinct-user union,
    intersection, difference, and Jaccard between 'click' and 'purchase'
    event streams — the audience-overlap query HLL cannot answer. Rows-only;
    error bounds + exact counterpart checked in tests and
    user_overlap_exact."""
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.theta import ThetaSketch

    def users_of(event_type: str):
        ds = _t(sf_dir, "events", ["event_type", "user_id"]).filter(
            expr=f"event_type == '{event_type}'"
        )
        return sketch_global(ds, "user_id", lambda: ThetaSketch(4096), "theta")

    a, b = users_of("click"), users_of("purchase")
    union = ThetaSketch(4096).merge(a).merge(b)
    return pd.DataFrame(
        [
            {
                "click_users_est": round(a.estimate(), 1),
                "purchase_users_est": round(b.estimate(), 1),
                "union_est": round(union.estimate(), 1),
                "intersect_est": round(a.intersect_estimate(b), 1),
                "click_not_purchase_est": round(a.a_not_b_estimate(b), 1),
                "jaccard_est": round(a.jaccard_estimate(b), 4),
            }
        ]
    )


@q(
    "user_overlap_exact",
    sql="""
    SELECT
        (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'click') AS click_users,
        (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS purchase_users,
        (SELECT count(*) FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) AS n_both
    """,
)
def user_overlap_exact(sf_dir: str):
    """Exact set-op counterpart of theta_user_overlap: distinct user sets per
    event type intersected via broadcast semi-join (INTERSECT in SQL)."""
    from perfect_bloomfilter_ray.stages.joins import broadcast_semi_join

    def distinct_users(event_type: str):
        return (
            _t(sf_dir, "events", ["event_type", "user_id"])
            .filter(expr=f"event_type == '{event_type}'")
            .groupby("user_id")
            .aggregate(Count(alias_name="_c"))
            .drop_columns(["_c"])
        )

    click, purchase = distinct_users("click"), distinct_users("purchase")
    n_click = click.count()
    n_purchase = purchase.count()
    n_both = broadcast_semi_join(click, purchase, on="user_id").count()
    return pd.DataFrame(
        [{"click_users": n_click, "purchase_users": n_purchase, "n_both": n_both}]
    )


@q(
    "customers_order_counts_outer",
    sql="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
)
def customers_order_counts_outer(sf_dir: str):
    """LEFT OUTER join coverage (Ray-native hash join): every customer kept,
    zero-filled aggregates for customers with no orders."""
    cust = _t(sf_dir, "customer", ["c_custkey"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    joined = cust.join(
        orders,
        "left_outer",
        num_partitions=choose_join_partitions(),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def widen(t: pa.Table) -> pa.Table:
        has = pc.is_valid(t.column("o_orderkey"))
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "has_order": pc.cast(has, pa.int64()),
                "spend": pc.if_else(has, t.column("o_totalprice"), pa.scalar(0.0)),
            }
        )

    out = (
        joined.map_batches(widen, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("has_order", alias_name="n_orders"), Sum("spend", alias_name="total_spent"))
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    return _round(out, {"total_spent": 2})


@q(
    "orders_events_full_outer",
    sql="""
    SELECT coalesce(o.k, e.k) AS custkey, o.n_orders, e.n_events
    FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1) o
    FULL OUTER JOIN (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1) e
      ON o.k = e.k
    ORDER BY custkey
    """,
)
def orders_events_full_outer(sf_dir: str):
    """FULL OUTER join coverage (Ray-native hash join): per-customer order
    counts against per-user event counts — keys present on either side
    survive, the missing side's count is null."""
    orders = (
        _t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
        .materialize()
    )
    events = (
        _t(sf_dir, "events", ["user_id"]).groupby("user_id").aggregate(Count(alias_name="n_events"))
    )
    # size the exchange from key cardinality: a hash partition that receives
    # ZERO rows from one side crashes Ray's join finalize (schemaless empty
    # table); >=64 expected keys per partition makes that statistically
    # impossible, and tiny inputs collapse to one partition (always safe)
    nparts = max(1, min(8, orders.count() // 64))
    joined = orders.join(
        events, "full_outer", num_partitions=nparts, on=("o_custkey",), right_on=("user_id",)
    )

    def fuse(t: pa.Table) -> pa.Table:
        # Ray's full_outer coalesces both key columns into the LEFT key name
        return pa.table(
            {
                "custkey": t.column("o_custkey"),
                "n_orders": t.column("n_orders"),
                "n_events": t.column("n_events"),
            }
        )

    out = (
        joined.map_batches(fuse, batch_format="pyarrow")
        .to_pandas()
        .sort_values("custkey")
        .reset_index(drop=True)
    )
    return out


@q(
    "sharded_bloom_roundtrip",
    sql="""
    SELECT CAST(least(2000, count(*)) AS BIGINT) AS inserted_probed,
           CAST(least(2000, count(*)) AS BIGINT) AS hits,
           CAST(2000 AS BIGINT) AS fresh_probed,
           CAST(0 AS BIGINT) AS false_positives
    FROM orders
    """,
)
def sharded_bloom_roundtrip(sf_dir: str):
    """Reference shard geometry end-to-end: build a jump-hash-routed sharded
    filter over order keys, probe inserted + fresh keys through the actor-pool
    membership stage. The SQL oracle encodes the conformance contract (see
    bloom_membership_roundtrip): hits == probes (no false negatives), zero
    observed false positives over 2000 fresh probes (expected ≈ 6e-10 under
    the per-lookup bound)."""
    from perfect_bloomfilter_ray.stages.membership import build_sharded_filter

    orders = _t(sf_dir, "orders", ["o_orderkey"])
    # capacity from the data, not a constant: a hardcoded 20k plan was 75x
    # under at sf1.0 (1.5M orders), starving bits/key and breaking the
    # zero-FP contract — caught by the 10x oracle sweep
    filt = build_sharded_filter(
        orders, "o_orderkey", num_shards=16, expected_keys=max(1024, orders.count())
    )

    import numpy as np_

    inserted = _t(sf_dir, "orders", ["o_orderkey"]).limit(2000).to_pandas()["o_orderkey"].to_numpy()
    fresh = np_.arange(10_000_000, 10_002_000)
    hits = int(filt.contains_column(pa.array(inserted)).sum())
    fps = int(filt.contains_column(pa.array(fresh)).sum())
    return pd.DataFrame([{"inserted_probed": len(inserted), "hits": hits, "fresh_probed": len(fresh), "false_positives": fps}])


@q(
    "user_event_lag_cum",
    sql="""
    SELECT event_id,
           lag(value)  OVER w AS lag_value,
           lead(value) OVER w AS lead_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
    ORDER BY event_id
    """,
)
def user_event_lag_cum(sf_dir: str):
    """lag/lead/running-sum window functions per user (ORDER BY ts) — the
    ordered-window trio via one vectorized pass per coarse key partition."""
    from perfect_bloomfilter_ray.stages.windows import lag_lead_cum

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = lag_lead_cum(ds, "user_id", "ts", "value").to_pandas()
    out = out[["event_id", "lag_value", "lead_value", "cum_value"]].sort_values("event_id").reset_index(drop=True)
    return _round(out, {"cum_value": 2})


@q("hll_distinct_user_type_pairs")
def hll_distinct_user_type_pairs(sf_dir: str):
    """Composite-key sketching: HLL over the canonical byte encoding of
    (user_id, event_type) pairs — the reference's 'consistent binary
    representation per type' rule applied to multi-column keys. Rows-only;
    exact counterpart below."""
    from perfect_bloomfilter_ray.functions.keys import key_bytes
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.hll import HyperLogLog

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def composite(t: pa.Table) -> pa.Table:
        a = key_bytes(t.column("user_id"))
        b = key_bytes(t.column("event_type"))
        return pa.table({"pair": pc.binary_join_element_wise(a, b, pa.scalar(b"\x1f", pa.binary()))})

    pairs = ds.map_batches(composite, batch_format="pyarrow")
    s = sketch_global(pairs, "pair", lambda: HyperLogLog(14), "hll")
    return pd.DataFrame([{"distinct_pairs_est": round(s.estimate(), 1)}])


@q(
    "distinct_user_type_pairs_exact",
    sql="SELECT count(DISTINCT (user_id, event_type)) AS n_pairs FROM events",
)
def distinct_user_type_pairs_exact(sf_dir: str):
    out = (
        _t(sf_dir, "events", ["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_c"))
        .count()
    )
    return pd.DataFrame([{"n_pairs": out}])


@q(
    "events_type_rollup",
    sql="""
    SELECT coalesce(event_type, 'ALL') AS event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY ROLLUP (event_type)
    ORDER BY event_type
    """,
)
def events_type_rollup(sf_dir: str):
    """ROLLUP emulation: per-type aggregates plus the grand total in one
    result — the leaf groupby runs once and the total folds from the leaf
    rows (combiner reuse), not from a second scan of the table."""
    ds = _t(sf_dir, "events", ["event_type", "value"])
    leaf = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    total = pd.DataFrame(
        [{"event_type": "ALL", "n": int(leaf["n"].sum()), "sum_value": float(leaf["sum_value"].sum())}]
    )
    out = pd.concat([leaf, total], ignore_index=True).sort_values("event_type").reset_index(drop=True)
    return _round(out, {"sum_value": 2})


@q(
    "embedding_dim_stats",
    sql="""
    SELECT d.dim,
           round(avg(CAST(e.embedding[d.dim + 1] AS DOUBLE)), 6) AS mean_v,
           round(min(CAST(e.embedding[d.dim + 1] AS DOUBLE)), 6) AS min_v,
           round(max(CAST(e.embedding[d.dim + 1] AS DOUBLE)), 6) AS max_v
    FROM embeddings e, (SELECT unnest(range(8)) AS dim) d
    GROUP BY d.dim ORDER BY d.dim
    """,
)
def embedding_dim_stats(sf_dir: str):
    """List-column unnest: explode the embedding vectors to (dim, value)
    rows inside map_batches (one reshape, no Python loop) and aggregate the
    first 8 dimensions — the UNNEST WITH ORDINALITY shape."""
    ds = _t(sf_dir, "embeddings", ["embedding"])

    def explode(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = len(col[0])
        mat = np.asarray(col.flatten(), dtype=np.float64).reshape(len(t), dim)[:, :8]
        n, d = mat.shape
        return pa.table(
            {
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "v": pa.array(mat.ravel()),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Mean("v", alias_name="mean_v"), Min("v", alias_name="min_v"), Max("v", alias_name="max_v"))
        .to_pandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    return _round(out, {"mean_v": 6, "min_v": 6, "max_v": 6})


@q("kll_nchars_quantiles_per_lang")
def kll_nchars_quantiles_per_lang(sf_dir: str):
    """Grouped quantile sketches: one KLL per lang via the two-phase
    partial/merge shuffle tree (the grouped path for a non-HLL sketch).
    Rows-only; the exact grouped median lives in median_nchars_per_lang."""
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped
    from perfect_bloomfilter_ray.state.kll import KLLSketch

    ds = _t(sf_dir, "documents", ["lang", "n_chars"])
    out = sketch_grouped(
        ds,
        key="lang",
        col="n_chars",
        factory=lambda: KLLSketch(256),
        name="p50_est",
        finalize_fn=lambda s: float(s.quantile(0.5)),
    )
    return out.to_pandas().sort_values("lang").reset_index(drop=True)


@q(
    "bloom_prefiltered_join_revenue",
    sql="""
    SELECT o.o_orderpriority, count(*) AS n_lines,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '2001-01-01'
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def bloom_prefiltered_join_revenue(sf_dir: str):
    """Runtime-filter pushdown: the selective side (recent orders) builds a
    compact Bloom cascade; lineitem is stream-filtered against it BEFORE the
    join's all-to-all shuffle, so the exchange moves only matching lines.
    Result is exact — the hash join discards Bloom false positives."""
    from perfect_bloomfilter_ray.stages.membership import bloom_prefiltered_join

    cutoff = pd.Timestamp("2001-01-01")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("o_orderdate"), pa.scalar(cutoff))).drop_columns(
            ["o_orderdate"]
        ),
        batch_format="pyarrow",
    )
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    joined = bloom_prefiltered_join(orders, li, on="o_orderkey", right_on="l_orderkey", expected_keys=1 << 16)
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_lines"), Sum("l_extendedprice", alias_name="total_price"))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return _round(out, {"total_price": 2})


@q("embed_ann_pipeline")
def embed_ann_pipeline(sf_dir: str):
    """Text → deterministic embedding (actor pool, weights-once-per-actor) →
    IVF ANN top-k, end to end over the documents table. Rows-only (the
    embedding kernel has no SQL equivalent); determinism + recall asserted
    in tests/test_embed.py."""
    import ray.data as rd

    from perfect_bloomfilter_ray.functions.embed import embed_pages
    from perfect_bloomfilter_ray.stages.ann import ivf_topk

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    emb = embed_pages(docs).drop_columns(["text"]).materialize()
    qrows = sorted(emb.filter(expr="doc_id < 4").take_all(), key=lambda r: r["doc_id"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    df = ivf_topk(emb, queries, "embedding", "doc_id", 64, k=10, nlist=16, nprobe=6)
    return df[["query_id", "doc_id"]].astype({"query_id": "int64", "doc_id": "int64"}).sort_values(
        ["query_id", "doc_id"]
    ).reset_index(drop=True)


@q("cms_revenue_heavy_users")
def cms_revenue_heavy_users(sf_dir: str):
    """WEIGHTED count-min: top users by total event value (each update adds
    the row's value, not 1) — approximate top-k via CMS estimates over the
    exact candidate id set. Rows-only; exact counterpart below."""
    from perfect_bloomfilter_ray.state.cms import CountMinSketch

    ds = _t(sf_dir, "events", ["user_id", "value"])

    # weighted updates need the weight column alongside the key: use a
    # per-batch partial + the UDAF merge path via multi_sketch_global's
    # machinery is unweighted, so build partials explicitly here
    from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch

    def partial(t: pa.Table) -> pa.Table:
        s = CountMinSketch(1e-3, 1e-3)
        w = np.round(t.column("value").to_numpy(zero_copy_only=False) * 100).astype(np.int64)  # cents
        s.update_column(t.column("user_id"), weights=w)
        return pa.table({"p": pa.array([dumps_sketch(s)], pa.binary())})

    merged = CountMinSketch(1e-3, 1e-3)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged.merge(loads_sketch(row["p"]))

    users = _t(sf_dir, "events", ["user_id"]).groupby("user_id").aggregate(Count(alias_name="_c")).to_pandas()
    uids = pa.array(users["user_id"].to_numpy())
    est = merged.estimate_column(uids) / 100.0
    out = pd.DataFrame({"user_id": users["user_id"], "est_total_value": np.round(est, 2)})
    return out.sort_values(["est_total_value", "user_id"], ascending=[False, True]).head(10).reset_index(drop=True)


@q(
    "revenue_heavy_users_exact",
    sql="""
    SELECT user_id, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id LIMIT 10
    """,
)
def revenue_heavy_users_exact(sf_dir: str):
    out = (
        _t(sf_dir, "events", ["user_id", "value"])
        .groupby("user_id")
        .aggregate(Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out = _round(out, {"total_value": 2})
    return out.sort_values(["total_value", "user_id"], ascending=[False, True]).head(10).reset_index(drop=True)


@q(
    "q10_returned_item_customers",
    sql="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q10_returned_item_customers(sf_dir: str):
    """TPC-H Q10 shape: returned-lineitem revenue per customer — one
    big-big hash join (pre-filtered lineitem ⨝ orders), broadcast customer
    dimension, then grouped revenue + top-20."""
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: (lambda f: pa.table(
            {
                "l_orderkey": f.column("l_orderkey"),
                "rev": pc.multiply(f.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), f.column("l_discount"))),
            }
        ))(t.filter(pc.equal(t.column("l_returnflag"), pa.scalar("R")))),
        batch_format="pyarrow",
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(
        orders, "inner", num_partitions=choose_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",)
    )
    j2 = broadcast_lookup_join(
        joined, _t(sf_dir, "customer", ["c_custkey", "c_name"]), on="o_custkey", right_on="c_custkey"
    )
    out = (
        j2.groupby(["o_custkey", "c_name"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
        .rename(columns={"o_custkey": "c_custkey"})
    )
    out = _round(out, {"revenue": 2})
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True]).head(20)
    return out[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


@q(
    "event_session_ids",
    sql="""
    SELECT event_id,
           CAST(sum(CASE WHEN gap THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM (
        SELECT event_id, user_id, ts,
               coalesce(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        > INTERVAL 30 MINUTE, FALSE) AS gap
        FROM events
    )
    ORDER BY event_id
    """,
)
def event_session_ids(sf_dir: str):
    """Event-level sessionization: every event tagged with its gap-session
    index within the user (30-minute gap) — the stats=False sessionize path,
    verified against the SQL window-function formulation."""
    from perfect_bloomfilter_ray.stages.windows import sessionize

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = sessionize(ds, "user_id", "ts", gap="30min", stats=False).to_pandas()
    return out[["event_id", "session_id"]].sort_values("event_id").reset_index(drop=True)


@q(
    "latest_event_per_user",
    sql="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
)
def latest_event_per_user(sf_dir: str):
    """Grouped argmax (last_value per key): each user's most recent event via
    grouped top-k with k=1 — no global sort, combiner-bounded shuffle."""
    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    ds = _t(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])

    def ts_i64(t: pa.Table) -> pa.Table:
        return t.append_column("_ts", pc.cast(t.column("ts"), pa.int64())).drop_columns(["ts"])

    keyed = ds.map_batches(ts_i64, batch_format="pyarrow")
    # order by ts desc with event_id desc tiebreak: use a combined desc sort
    # key (ts,event_id are both int64; top-1 by _ts then event_id)
    def rank_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_neg_eid", pc.negate(pc.cast(t.column("event_id"), pa.int64()))
        )

    out = (
        grouped_top_k(
            keyed.map_batches(rank_key, batch_format="pyarrow"),
            "user_id",
            "_ts",
            k=1,
            descending=True,
            tie_cols=["_neg_eid"],
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out = out.rename(columns={"event_id": "last_event_id", "event_type": "last_event_type"})
    return out[["user_id", "last_event_id", "last_event_type"]]


@q("audio_frame_rms_stats")
def audio_frame_rms_stats(sf_dir: str):
    """Multimodal audio path on REAL samples: each doc's text renders to a
    real WAV clip (stdlib encoder) → actor-pool stdlib WAV DECODE → frame
    sampling → per-frame RMS → per-frame-index stats. Rows-only."""
    from perfect_bloomfilter_ray.stages.multimodal import (
        AudioFrameSampleStage,
        WavFrameDecoder,
        media_dataset_from_binary,
        text_to_wav_payload,
    )

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def to_bin(t: pa.Table) -> pa.Table:
        return pa.table({"blob": text_to_wav_payload(t.column("text"), n_samples=2048)})

    media = media_dataset_from_binary(ds.map_batches(to_bin, batch_format="pyarrow"), "blob")
    frames = media.map_batches(
        AudioFrameSampleStage,
        fn_constructor_kwargs={"frames": 4, "frame_samples": 128, "decoder_cls": WavFrameDecoder},
        batch_size=256,
        concurrency=(1, 4),
        batch_format="pyarrow",
    )
    out = (
        frames.groupby("frame")
        .aggregate(Count(alias_name="n"), Mean("rms", alias_name="avg_rms"))
        .to_pandas()
        .sort_values("frame")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_rms": 4})


@q(
    "decontaminated_docs",
    sql="""
    WITH toks AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ),
    bench AS (SELECT * FROM toks WHERE (doc_id * 2654435761) % 10 = 3),
    corp  AS (SELECT * FROM toks WHERE (doc_id * 2654435761) % 10 <> 3),
    bgrams AS (
      SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS g
      FROM (SELECT t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM bench WHERE len(t) >= 5)
    ),
    cg AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM corp WHERE len(t) >= 5)
    ),
    contaminated AS (SELECT DISTINCT c.doc_id FROM cg c JOIN bgrams b USING (g))
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM contaminated)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM corp GROUP BY lang ORDER BY lang
    """,
)
def decontaminated_docs(sf_dir: str):
    """Benchmark decontamination (GPT-3 appendix-C style n-gram filter): a
    deterministic 10% hash-slice of documents plays the held-out benchmark;
    the rest is the corpus. The benchmark's 5-gram fingerprints are built
    once, broadcast via ray.put, and the corpus streams through one
    shuffle-free map_batches membership pass (stages/decontam.py). The SQL
    oracle re-derives the same contaminated set with string n-grams."""
    from perfect_bloomfilter_ray.stages.decontam import build_blocklist, decontaminate

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def split(bench_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy().astype(np.int64)
            m = (ids * 2654435761) % 10 == 3
            return t.filter(pa.array(m if bench_side else ~m))

        return fn

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    corp = docs.map_batches(split(False), batch_format="pyarrow")
    blocklist = build_blocklist(bench, "text", n=5)
    flagged = decontaminate(corp, blocklist, n=5, drop=False)

    def to_int(t: pa.Table) -> pa.Table:
        return t.append_column("c_int", pc.cast(t.column("contaminated"), pa.int64()))

    return (
        flagged.map_batches(to_int, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("c_int", alias_name="n_contaminated"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )


@q(
    "pii_redaction_stats",
    sql=r"""
    WITH aug AS (
      SELECT lang,
             text || ' contact user' || doc_id || '@' || source ||
             '.org or 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
             CAST((doc_id * 7) % 256 AS VARCHAR) AS t
      FROM documents
    ),
    r1 AS (
      SELECT lang, len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
      FROM aug
    ),
    r2 AS (
      SELECT lang, n_email,
             len(regexp_extract_all(t, '\b\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\b')) AS n_phone,
             regexp_replace(t, '\b\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\b', '<PHONE>', 'g') AS t
      FROM r1
    ),
    r3 AS (
      SELECT lang, n_email, n_phone,
             len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
             regexp_replace(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t
      FROM r2
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS emails,
           CAST(sum(n_phone) AS BIGINT) AS phones,
           CAST(sum(n_ipv4) AS BIGINT) AS ipv4s,
           CAST(sum(len(t)) AS BIGINT) AS redacted_chars
    FROM r3 GROUP BY lang ORDER BY lang
    """,
)
def pii_redaction_stats(sf_dir: str):
    """PII scrubbing (stages/pii.py): the corpus text is augmented with a
    deterministic contact string derived from (doc_id, source) — the
    synthetic table has no organic PII — then streamed through the
    email→phone→IPv4 redaction chain; per-lang match counts and redacted
    lengths are oracle-checked against nested DuckDB regexp_replace."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.pii import scrub_pii

    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def augment(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        aug = df.with_columns(
            (
                pl.col("text")
                + pl.lit(" contact user")
                + pl.col("doc_id").cast(pl.Utf8)
                + pl.lit("@")
                + pl.col("source")
                + pl.lit(".org or 555-123-")
                + (pl.col("doc_id") % 10000).cast(pl.Utf8).str.zfill(4)
                + pl.lit(" at 10.0.")
                + (pl.col("doc_id") % 256).cast(pl.Utf8)
                + pl.lit(".")
                + ((pl.col("doc_id") * 7) % 256).cast(pl.Utf8)
            ).alias("t")
        ).select(["lang", "t"])
        return aug.to_arrow()

    red = scrub_pii(ds.map_batches(augment, batch_format="pyarrow"), text_col="t")

    def lens(t: pa.Table) -> pa.Table:
        return t.append_column("t_len", pc.utf8_length(t.column("t")).cast(pa.int64()))

    return (
        red.map_batches(lens, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_email", alias_name="emails"),
            Sum("n_phone", alias_name="phones"),
            Sum("n_ipv4", alias_name="ipv4s"),
            Sum("t_len", alias_name="redacted_chars"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )


@q(
    "repetition_filter_stats",
    sql="""
    WITH toks AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, len(t) AS n,
             CASE WHEN len(t) > 0
                  THEN 1.0 - len(list_distinct(t)) * 1.0 / len(t) ELSE 0.0 END AS fd,
             CASE WHEN len(t) > 0
                  THEN list_aggregate(list_transform(t, x -> len(x)), 'sum') * 1.0 / len(t)
                  ELSE 0.0 END AS mwl,
             t
      FROM toks
    ),
    bg AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS g
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM m WHERE n >= 2)
    ),
    bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    mx AS (SELECT doc_id, max(c) AS mc FROM bc GROUP BY doc_id),
    f AS (
      SELECT lang, n, fd, mwl,
             CASE WHEN n >= 2 THEN mc * 1.0 / (n - 1) ELSE 0.0 END AS tbf
      FROM m LEFT JOIN mx USING (doc_id)
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN fd <= 0.6 AND tbf <= 0.10 AND mwl >= 3.0 AND mwl <= 10.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(avg(fd), 4)  AS avg_frac_dup,
           round(avg(mwl), 4) AS avg_word_len,
           round(avg(tbf), 4) AS avg_top_bigram
    FROM f GROUP BY lang ORDER BY lang
    """,
)
def repetition_filter_stats(sf_dir: str):
    """Gopher-style repetition filter (stages/quality.py): per-doc duplicate
    -word fraction, mean word length and top-bigram fraction in one
    shuffle-free pass; keep decision + metric averages per lang are
    oracle-checked against a list-function SQL formulation (identical IEEE
    expressions on both sides make the float threshold comparisons exact)."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.quality import gopher_filter

    ds = _t(sf_dir, "documents", ["text", "lang"])
    flagged = gopher_filter(ds, "text", drop=False, metrics_cols=True)

    def to_int(t: pa.Table) -> pa.Table:
        return t.append_column("k_int", pc.cast(t.column("keep"), pa.int64()))

    out = (
        flagged.map_batches(to_int, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("k_int", alias_name="n_kept"),
            Mean("frac_dup_words", alias_name="avg_frac_dup"),
            Mean("mean_word_len", alias_name="avg_word_len"),
            Mean("top_bigram_frac", alias_name="avg_top_bigram"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round(out, {"avg_frac_dup": 4, "avg_word_len": 4, "avg_top_bigram": 4})


@q(
    "top_tokens_per_lang",
    sql="""
    WITH toks AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    c AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY lang, token),
    r AS (SELECT lang, token, cnt,
                 row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
          FROM c)
    SELECT lang, token, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 10 ORDER BY lang, rnk
    """,
)
def top_tokens_per_lang(sf_dir: str):
    """Vocabulary building: exact token frequencies per language. The scale
    shape is map-side pre-aggregation — each batch explodes to tokens and
    collapses to per-batch (lang, token) partial counts BEFORE the shuffle,
    so the exchange carries one row per distinct pair per block, not one per
    token occurrence — then a global groupby-sum and a grouped top-k."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    ds = _t(sf_dir, "documents", ["text", "lang"])

    def partial_counts(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.with_columns(
                pl.col("text").str.to_lowercase().str.extract_all(r"[a-z0-9]+").alias("token")
            )
            .drop("text")
            .explode("token")
            .drop_nulls("token")
            .group_by(["lang", "token"])
            .len(name="pcnt")
            .with_columns(pl.col("pcnt").cast(pl.Int64))
            .to_arrow()
        )

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("pcnt", alias_name="cnt"))
    )
    top = grouped_top_k(counts, "lang", "cnt", k=10, descending=True, tie_cols=["token"])
    out = top.to_pandas().sort_values(["lang", "cnt", "token"], ascending=[True, False, True]).reset_index(drop=True)
    out["rnk"] = out.groupby("lang").cumcount() + 1
    return out


@q(
    "tfidf_doc_scores",
    sql="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
      HAVING count(DISTINCT doc_id) >= 5
    ),
    n AS (SELECT count(*) AS n FROM documents),
    samp AS (SELECT doc_id, lang FROM documents WHERE doc_id % 7 = 0),
    st AS (SELECT t.doc_id, t.token FROM toks t JOIN samp USING (doc_id)),
    sc AS (
      SELECT st.doc_id, sum(ln(CAST(n.n AS DOUBLE) / df.df)) AS vscore
      FROM st JOIN df USING (token) CROSS JOIN n GROUP BY st.doc_id
    ),
    nt AS (SELECT doc_id, count(*) AS n_toks FROM st GROUP BY doc_id)
    SELECT s.doc_id, s.lang,
           CAST(coalesce(nt.n_toks, 0) AS BIGINT) AS n_toks,
           round(coalesce(sc.vscore, 0), 4) AS score
    FROM samp s LEFT JOIN sc USING (doc_id) LEFT JOIN nt USING (doc_id)
    ORDER BY s.doc_id
    """,
)
def tfidf_doc_scores(sf_dir: str):
    """Corpus-wide TF-IDF featurization (stages/vocab.py): document
    frequencies via map-side pre-aggregated groupby, a min_df-bounded IDF
    vocabulary broadcast as sorted hashes + weights (16 B/term), then one
    shuffle-free scoring pass where sum_t tf*idf is a segment-sum of idf
    over token occurrences. A deterministic ~1% doc_id slice is scored so
    the oracle row set stays engine-portable; df/N always cover the FULL
    corpus."""
    from perfect_bloomfilter_ray.stages.vocab import (
        document_frequency,
        idf_broadcast,
        tfidf_score,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    n_docs = docs.count()  # parquet metadata, no scan
    dfreq = document_frequency(docs, "text", min_df=5)
    ref = idf_broadcast(dfreq, n_docs)
    def slice7(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return t.filter(pa.array(ids % 7 == 0))

    sample = docs.map_batches(slice7, batch_format="pyarrow")
    scored = tfidf_score(sample, ref, "text")
    out = (
        scored.select_columns(["doc_id", "lang", "n_toks", "score"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return _round(out, {"score": 4})


@q(
    "packed_shard_stats",
    sql="""
    WITH p AS (
      SELECT doc_id, n_chars, (doc_id * 2654435761) % 1000003 AS okey,
             ((doc_id * 2654435761) % 1000003) % 16 AS shard_part
      FROM documents
    ),
    c AS (
      SELECT shard_part, n_chars,
             coalesce(sum(n_chars) OVER (PARTITION BY shard_part
                 ORDER BY okey, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM p
    )
    SELECT shard_part, CAST(cum // 4096 AS BIGINT) AS shard_seq,
           count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM c GROUP BY shard_part, shard_seq ORDER BY shard_part, shard_seq
    """,
)
def packed_shard_stats(sf_dir: str):
    """Training-shard packing (stages/shards.py): greedy fixed-budget
    packing made scalable by hash-partitioning docs into coarse partitions
    and taking one vectorized exclusive running sum per partition; a shard
    is (part, seq) and is also the resume/lineage unit. Engine-portable
    multiplicative-hash part/order keys let the SQL oracle reproduce the
    exact assignment with a window running-sum."""
    from perfect_bloomfilter_ray.stages.shards import pack_shards

    docs = _t(sf_dir, "documents", ["doc_id", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        okey = (ids * 2654435761) % 1000003
        return t.append_column("okey", pa.array(okey)).append_column(
            "shard_part", pa.array(okey % 16)
        )

    packed = pack_shards(
        docs.map_batches(keyed, batch_format="pyarrow"),
        cost_col="n_chars",
        budget=4096,
        part_col="shard_part",
        order_col="okey",
        id_col="doc_id",
    )
    out = (
        packed.groupby(["shard_part", "shard_seq"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
        .to_pandas()
        .sort_values(["shard_part", "shard_seq"])
        .reset_index(drop=True)
    )
    return out


@q(
    "lang_balanced_sample",
    sql="""
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    m AS (SELECT min(cnt) AS mn FROM c),
    thr AS (SELECT lang, (mn * 1000000) // cnt AS thr FROM c CROSS JOIN m),
    k AS (
      SELECT d.lang, d.n_chars FROM documents d JOIN thr USING (lang)
      WHERE (d.doc_id * 2654435761) % 1000000 < thr.thr
    )
    SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM k GROUP BY lang ORDER BY lang
    """,
)
def lang_balanced_sample(sf_dir: str):
    """Domain/language mixture rebalancing: downsample every language to the
    smallest language's count with a deterministic hash threshold. Pass 1 is
    a language-cardinality groupby (tiny result on the driver); pass 2 is a
    shuffle-free vectorized filter keeping rows whose multiplicative-hash
    residue clears the per-language integer rate — reproducible across
    engines and runs, no RNG state."""
    docs = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    counts = docs.groupby("lang").aggregate(Count(alias_name="cnt")).to_pandas()
    mn = int(counts["cnt"].min())
    langs = counts["lang"].tolist()
    thr = np.array([(mn * 1000000) // int(c) for c in counts["cnt"]], np.int64)
    lang_arr = pa.array(langs)

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        codes = pc.index_in(t.column("lang"), value_set=lang_arr).to_numpy(zero_copy_only=False)
        mask = (ids * 2654435761) % 1000000 < thr[codes.astype(np.int64)]
        return t.filter(pa.array(mask))

    out = (
        docs.map_batches(keep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_kept"), Sum("n_chars", alias_name="kept_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out


@q(
    "line_dedup_stats",
    sql="""
    WITH t AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ),
    u AS (
      SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
      FROM t
    ),
    l AS (
      SELECT doc_id, (i - 1) // 8 AS chunk,
             string_agg(tok, ' ' ORDER BY i) AS line
      FROM u GROUP BY doc_id, (i - 1) // 8
    ),
    c AS (SELECT line, count(*) AS cnt FROM l GROUP BY line),
    k AS (
      SELECT l.doc_id, count(*) AS n_lines,
             count(*) FILTER (WHERE c.cnt < 2) AS n_kept,
             coalesce(sum(length(l.line)) FILTER (WHERE c.cnt < 2), 0) AS kept_chars
      FROM l JOIN c USING (line) GROUP BY l.doc_id
    )
    SELECT d.lang,
           count(*) AS n_docs,
           CAST(coalesce(sum(k.n_lines), 0) AS BIGINT) AS lines_total,
           CAST(coalesce(sum(k.n_kept), 0) AS BIGINT) AS lines_kept,
           CAST(coalesce(sum(k.kept_chars), 0) AS BIGINT) AS chars_kept,
           count(*) FILTER (WHERE coalesce(k.n_kept, 0) = 0) AS docs_emptied
    FROM documents d LEFT JOIN k USING (doc_id)
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def line_dedup_stats(sf_dir: str):
    """CCNet-style line-level dedup (stages/linededup.py): count line
    occurrences corpus-wide via map-side partial groupby, broadcast the
    sorted common-line hash set once, then one shuffle-free drop pass.
    Lines here are 8-token chunks (TokenChunkSplitter) because the
    synthetic corpus has no newlines; the SQL oracle groups the exact
    line STRINGS, so a 64-bit hash collision would surface as a hash-fail."""
    from perfect_bloomfilter_ray.stages.linededup import (
        TokenChunkSplitter,
        common_line_hashes,
        common_lines_broadcast,
        drop_common_lines,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "lang", "text"])
    sp = TokenChunkSplitter(8)
    common = common_line_hashes(docs, "text", min_count=2, splitter=sp)
    ref = common_lines_broadcast(common)
    dropped = drop_common_lines(docs, ref, "text", splitter=sp, rebuild_text=False)

    def stats(t: pa.Table) -> pa.Table:
        emptied = pc.equal(t.column("n_lines_kept"), 0)
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_lines": t.column("n_lines"),
                "n_lines_kept": t.column("n_lines_kept"),
                "kept_chars": t.column("kept_chars"),
                "emptied": pc.cast(emptied, pa.int64()),
            }
        )

    out = (
        dropped.map_batches(stats, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_lines", alias_name="lines_total"),
            Sum("n_lines_kept", alias_name="lines_kept"),
            Sum("kept_chars", alias_name="chars_kept"),
            Sum("emptied", alias_name="docs_emptied"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out


@q(
    "unigram_perplexity_scores",
    sql="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    v AS (SELECT token, c FROM cnt WHERE c >= 5),
    tot AS (SELECT count(*) AS n FROM toks),
    samp AS (SELECT doc_id, lang FROM documents WHERE doc_id % 5 = 0),
    st AS (SELECT t.doc_id, t.token FROM toks t JOIN samp USING (doc_id)),
    s AS (
      SELECT st.doc_id, count(*) AS n_toks,
             sum(-ln(coalesce(v.c, 0.5) / tot.n)) AS nll
      FROM st LEFT JOIN v USING (token) CROSS JOIN tot GROUP BY st.doc_id
    )
    SELECT sa.doc_id, sa.lang,
           CAST(coalesce(s.n_toks, 0) AS BIGINT) AS n_toks,
           round(coalesce(s.nll / s.n_toks, 0), 4) AS nll_per_tok
    FROM samp sa LEFT JOIN s USING (doc_id)
    ORDER BY sa.doc_id
    """,
)
def unigram_perplexity_scores(sf_dir: str):
    """CCNet-style LM quality scoring (stages/vocab.py): corpus unigram
    counts via map-side partial groupby, a min_count-bounded logprob
    vocabulary broadcast (16 B/term), then one shuffle-free pass scoring
    mean per-token negative log-likelihood (OOV floored at half a count).
    A deterministic 20% doc_id slice is scored; counts always cover the
    FULL corpus."""
    from perfect_bloomfilter_ray.stages.vocab import (
        token_counts,
        unigram_logprob_broadcast,
        unigram_nll_score,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    cnts = token_counts(docs, "text", min_count=5)

    def ntok(t: pa.Table) -> pa.Table:
        import polars as pl

        n = (
            pl.from_arrow(t.column("text"))
            .str.to_lowercase()
            .str.extract_all("[a-z0-9]+")
            .list.len()
            .fill_null(0)
            .sum()
        )
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    total = int(
        docs.map_batches(ntok, batch_format="pyarrow").aggregate(Sum("n", alias_name="n"))["n"]
    )
    ref = unigram_logprob_broadcast(cnts, total)

    def slice5(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return t.filter(pa.array(ids % 5 == 0))

    sample = docs.map_batches(slice5, batch_format="pyarrow")
    out = (
        unigram_nll_score(sample, ref, "text")
        .select_columns(["doc_id", "lang", "n_toks", "nll_per_tok"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return _round(out, {"nll_per_tok": 4})


# ---------------------------------------------------------------------------
# Exact quantiles / trimming / training order / cube / normalization /
# incremental ingest (round-2 batch 2, all SQL-oracle-backed)
# ---------------------------------------------------------------------------


@q(
    "exact_value_quantiles_per_type",
    sql="""
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def exact_value_quantiles_per_type(sf_dir: str):
    """Exact grouped quantiles (discrete — actual data values, so equality
    with the SQL oracle is bitwise, no rounding). stages/quantiles.py."""
    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])
    qds = exact_grouped_quantiles(
        ds, "event_type", "value", [0.25, 0.5, 0.9], kind="disc", names=["p25", "p50", "p90"]
    )
    counts = ds.groupby("event_type").aggregate(Count(alias_name="n"))
    out = (
        qds.to_pandas()
        .merge(counts.to_pandas(), on="event_type")
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out[["event_type", "p25", "p50", "p90", "n"]]


@q(
    "value_trimmed_stats_per_type",
    sql="""
    WITH b AS (
      SELECT event_type,
             quantile_disc(value, 0.05) AS lo,
             quantile_disc(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n,
           round(sum(e.value), 4) AS sum_value,
           round(avg(e.value), 6) AS avg_value
    FROM events e JOIN b USING (event_type)
    WHERE e.value BETWEEN b.lo AND b.hi
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def value_trimmed_stats_per_type(sf_dir: str):
    """Winsor-style per-group outlier trim ([p05, p95] discrete bounds are
    data values — the boundary comparison is engine-exact) then streamed
    re-aggregation. stages/quantiles.quantile_trim."""
    from perfect_bloomfilter_ray.stages.quantiles import quantile_trim

    ds = _t(sf_dir, "events", ["event_type", "value"])
    trimmed = quantile_trim(ds, "event_type", "value", 0.05, 0.95)
    agg = trimmed.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
    )
    out = agg.to_pandas().sort_values("event_type").reset_index(drop=True)
    return _round(out, {"sum_value": 4, "avg_value": 6})


@q(
    "global_shuffle_head",
    sql="""
    SELECT doc_id,
           (doc_id % 1000000007) * (2654435761 % 1000000007) % 1000000007 AS shuffle_key
    FROM documents ORDER BY shuffle_key, doc_id LIMIT 100
    """,
)
def global_shuffle_head(sf_dir: str):
    """Deterministic global training-order shuffle (range-partitioned
    distributed sort on a modular-hash residue); first 100 docs in shuffle
    order. stages/shards.deterministic_shuffle."""
    from perfect_bloomfilter_ray.stages.shards import deterministic_shuffle

    ds = _t(sf_dir, "documents", ["doc_id"])
    return deterministic_shuffle(ds, "doc_id").limit(100)


@q(
    "orders_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def orders_cube(sf_dir: str):
    """CUBE grouping: ONE distributed pass computes the finest grouping;
    the three coarser levels aggregate that tiny result driver-side (the
    standard cube optimization — never re-scan the fact table per level).
    Totals in integer CENTS (identical floor(x*100+0.5) tree both sides):
    the rounded float sum matched through sf0.1 by accumulation-order luck
    and diverged at sf1.0 — caught by the 10x oracle sweep."""
    ds = _t(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderpriority": t.column("o_orderpriority"),
                "cents": c,
            }
        )

    finest = (
        ds.map_batches(cents, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="total_cents"))
        .to_pandas()
    )
    levels = [finest.copy()]
    for keys in (["o_orderstatus"], ["o_orderpriority"], []):
        if keys:
            g = finest.groupby(keys, as_index=False)[["n", "total_cents"]].sum()
        else:
            g = pd.DataFrame(
                {"n": [finest["n"].sum()], "total_cents": [finest["total_cents"].sum()]}
            )
        for missing in ("o_orderstatus", "o_orderpriority"):
            if missing not in keys:
                g[missing] = None
        levels.append(g[["o_orderstatus", "o_orderpriority", "n", "total_cents"]])
    out = pd.concat(levels, ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out


@q(
    "normalized_text_stats",
    sql="""
    WITH n AS (
      SELECT lang, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT lang, count(DISTINCT norm) AS n_distinct,
           CAST(sum(len(norm)) AS BIGINT) AS total_len
    FROM n GROUP BY lang ORDER BY lang
    """,
)
def normalized_text_stats(sf_dir: str):
    """Text normalization (functions/text.normalize_text, SQL-portable) +
    exact per-lang distinct count. Distinct shuffles only batch-deduped
    (lang, norm) pairs routed by content fingerprint (collision-safe: the
    per-partition unique compares real strings); total_len is a map-side
    partial sum — the full text never shuffles for it."""
    import polars as pl

    from perfect_bloomfilter_ray.functions.text import fingerprint64, normalize_text
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    ds = _t(sf_dir, "documents", ["lang", "text"])
    nb = choose_num_blocks(ds)

    def pairs(t: pa.Table) -> pa.Table:
        norm = normalize_text(t.column("text"))
        tbl = pa.table({"lang": t.column("lang"), "norm": norm})
        uniq = pl.from_arrow(tbl).unique().to_arrow()
        fp = fingerprint64(uniq.column("norm"), normalize=False)
        part = (fp.to_numpy().view(np.uint64) % np.uint64(nb)).astype(np.int32)
        return uniq.append_column("_part", pa.array(part))

    def distinct_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"])).unique()
        out = df.group_by("lang").len(name="part_n")
        return out.with_columns(pl.col("part_n").cast(pl.Int64)).to_arrow()

    distinct = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(distinct_block, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("part_n", alias_name="n_distinct"))
    )

    def len_partial(t: pa.Table) -> pa.Table:
        norm = pl.from_arrow(pa.table({"x": normalize_text(t.column("text"))}))
        lens = norm["x"].str.len_chars().cast(pl.Int64)
        return (
            pl.DataFrame({"lang": pl.from_arrow(t.column("lang")), "plen": lens})
            .group_by("lang")
            .agg(pl.col("plen").sum())
            .to_arrow()
        )

    lens = (
        ds.map_batches(len_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("plen", alias_name="total_len"))
    )
    out = (
        distinct.to_pandas()
        .merge(lens.to_pandas(), on="lang")
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["n_distinct"] = out["n_distinct"].astype("int64")
    out["total_len"] = out["total_len"].astype("int64")
    return out[["lang", "n_distinct", "total_len"]]


@q(
    "incremental_ingest_new_docs",
    sql="""
    WITH old AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
         new AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 >= 8)
    SELECT lang, count(*) AS n_new
    FROM new WHERE NOT EXISTS (SELECT 1 FROM old WHERE old.text = new.text)
    GROUP BY lang ORDER BY lang
    """,
)
def incremental_ingest_new_docs(sf_dir: str):
    """Incremental-ingest dedup: the 'new crawl slice' (doc_id % 10 >= 8)
    anti-joined by content against the standing corpus — one union +
    fingerprint-partitioned shuffle, old side slimmed to text only.
    stages/dedup.incremental_new_rows."""
    from perfect_bloomfilter_ray.stages.dedup import incremental_new_rows

    docs = _t(sf_dir, "documents", ["doc_id", "lang", "text"])

    def _slice(old: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            m = (ids % 10 < 8) if old else (ids % 10 >= 8)
            return t.filter(pa.array(m))

        return fn

    old = docs.map_batches(_slice(True), batch_format="pyarrow")
    new = docs.map_batches(_slice(False), batch_format="pyarrow")
    surviving = incremental_new_rows(old, new, "text", "doc_id", keep_cols=["lang"])
    out = (
        surviving.groupby("lang")
        .aggregate(Count(alias_name="n_new"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out


@q(
    "word_jaccard_source_pairs",
    sql="""
    WITH w AS (
      SELECT doc_id, source,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS words
      FROM documents
    ), p AS (
      SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
             (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) AS jaccard
      FROM w a JOIN w b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(a.words) + len(b.words) > 0
    )
    SELECT source, id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
    ORDER BY source, id_a, id_b
    """,
)
def word_jaccard_source_pairs(sf_dir: str):
    """Exact word-set Jaccard over all intra-source pairs — the
    oracle-checkable member of the Jaccard dedup family (the LSH variants
    are rows-only because their candidate sets depend on LSH parameters).
    One incidence-matrix matmul per source group; Jaccard is a float64
    division of exact ints, bitwise identical to the SQL oracle.
    stages/dedup.word_jaccard_pairs_grouped."""
    from perfect_bloomfilter_ray.stages.dedup import word_jaccard_pairs_grouped

    docs = _t(sf_dir, "documents", ["doc_id", "source", "text"])
    return word_jaccard_pairs_grouped(docs, "source", "text", "doc_id", threshold=0.8)


# ---------------------------------------------------------------------------
# Correlation / ntile / table profiling
# ---------------------------------------------------------------------------


@q(
    "corr_qty_price_per_flag",
    sql="""
    SELECT l_returnflag,
           count(*)                                           AS n,
           round(covar_samp(l_quantity, l_extendedprice), 2)  AS covar_samp,
           round(corr(l_quantity, l_extendedprice), 6)        AS corr
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def corr_qty_price_per_flag(sf_dir: str):
    """Per-group Pearson correlation + sample covariance via centered
    partial moments (Chan et al. parallel-variance merge) — exact in one
    map pass + one slim partial shuffle. stages/agg.grouped_corr."""
    from perfect_bloomfilter_ray.stages.agg import grouped_corr

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
    out = (
        grouped_corr(ds, "l_returnflag", "l_quantity", "l_extendedprice")
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    out["covar_samp"] = out["covar_samp"].round(2)
    out["corr"] = out["corr"].round(6)
    return out[["l_returnflag", "n", "covar_samp", "corr"]]


@q(
    "orders_ntile_by_custkey",
    sql="""
    SELECT o_orderkey,
           ntile(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS nt
    FROM orders ORDER BY o_orderkey
    """,
)
def orders_ntile_by_custkey(sf_dir: str):
    """NTILE(4) window over each customer's orders by date — same coarse
    hash-partition + single vectorized pass as rank/dense_rank
    (stages/windows.ranked); tie broken by o_orderkey so the bucket
    assignment is engine-portable."""
    from perfect_bloomfilter_ray.stages.windows import ranked

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    out = ranked(
        ds,
        "o_custkey",
        "o_orderdate",
        tie_cols=["o_orderkey"],
        rank_col=None,
        ntile=4,
        ntile_col="nt",
    )
    return out.select_columns(["o_orderkey", "nt"]).sort("o_orderkey")


@q(
    "documents_profile",
    sql="""
    SELECT 'doc_id' AS col_name, count(doc_id) AS n,
           count(*) - count(doc_id) AS n_null, count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS DOUBLE) AS min_num, CAST(max(doc_id) AS DOUBLE) AS max_num
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(n_chars), count(*) - count(n_chars), count(DISTINCT n_chars),
           CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE)
    FROM documents
    UNION ALL
    SELECT 'lang', count(lang), count(*) - count(lang), count(DISTINCT lang), NULL, NULL
    FROM documents
    UNION ALL
    SELECT 'source', count(source), count(*) - count(source), count(DISTINCT source), NULL, NULL
    FROM documents
    ORDER BY col_name
    """,
)
def documents_profile(sf_dir: str):
    """Per-column table profile (n / nulls / exact distinct / numeric
    min-max) in two streaming passes; all profiled columns share ONE slim
    deduped value shuffle. stages/profile.profile_table."""
    from perfect_bloomfilter_ray.stages.profile import profile_table

    ds = _t(sf_dir, "documents", ["doc_id", "n_chars", "lang", "source"])
    return profile_table(ds, num_cols=["doc_id", "n_chars"], str_cols=["lang", "source"])


@q(
    "dup_ngram_doc_stats",
    sql="""
    WITH w AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(words[i:i+4], ' ') AS gram
      FROM w, UNNEST(range(1, len(words) - 3)) AS t(i)
    ), d AS (
      SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
    ), per AS (
      SELECT g.doc_id,
             count(*) AS n_grams,
             sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
      FROM g LEFT JOIN d USING (gram) GROUP BY g.doc_id
    )
    SELECT doc_id, n_grams, CAST(n_dup AS BIGINT) AS n_dup,
           CAST(n_dup AS DOUBLE) / n_grams AS dup_frac
    FROM per ORDER BY doc_id
    """,
)
def dup_ngram_doc_stats(sf_dir: str):
    """Inter-document duplicated-n-gram fraction (Lee et al. 2021 dedup
    signal): per doc, the share of its word 5-gram positions whose 5-gram
    appears in >= 2 distinct docs corpus-wide. Distinct (doc,gram) rows
    shuffle once by gram hash; the fraction is an exact int/int float64
    division. stages/ngramdup.dup_ngram_stats."""
    from perfect_bloomfilter_ray.stages.ngramdup import dup_ngram_stats

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    out = dup_ngram_stats(docs, "text", "doc_id", n=5, min_docs=2)
    return out.sort("doc_id")


@q(
    "order_price_percentiles_per_cust",
    sql="""
    SELECT o_orderkey,
           percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS pr,
           cume_dist()    OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS cd
    FROM orders ORDER BY o_orderkey
    """,
)
def order_price_percentiles_per_cust(sf_dir: str):
    """percent_rank / cume_dist windows — value-run arithmetic shared with
    rank/dense_rank in the same single vectorized pass; both are exact
    int/int float64 divisions, bitwise equal to any SQL engine.
    stages/windows.ranked."""
    from perfect_bloomfilter_ray.stages.windows import ranked

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = ranked(
        ds,
        "o_custkey",
        "o_totalprice",
        rank_col=None,
        percent_rank_col="pr",
        cume_dist_col="cd",
    )
    return out.select_columns(["o_orderkey", "pr", "cd"]).sort("o_orderkey")


@q(
    "event_value_zscores",
    sql="""
    SELECT event_id,
           round((value - avg(value)    OVER (PARTITION BY event_type))
                 / stddev_samp(value)   OVER (PARTITION BY event_type), 4) AS z
    FROM events ORDER BY event_id
    """,
)
def event_value_zscores(sf_dir: str):
    """Per-category z-score feature normalization: grouped mean/std via
    centered-moment partials reduced to one row per key, broadcast once
    (ray.put), then one shuffle-free map pass applies the affine transform.
    stages/agg.zscore_normalize."""
    from perfect_bloomfilter_ray.stages.agg import zscore_normalize

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])
    out = zscore_normalize(ds, "event_type", "value", out_col="z")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "z": pc.round(t.column("z"), ndigits=4),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow").sort("event_id")


@q(
    "embedding_centroid_cosine",
    sql="""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding[i] AS DOUBLE) AS x, i
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), c AS (
      SELECT label, i, avg(x) AS cx FROM e GROUP BY label, i
    ), dots AS (
      SELECT e.vec_id,
             sum(e.x * c.cx) AS dot, sum(e.x * e.x) AS nx, sum(c.cx * c.cx) AS nc
      FROM e JOIN c ON e.label = c.label AND e.i = c.i GROUP BY e.vec_id
    )
    SELECT vec_id, round(dot / (sqrt(nx) * sqrt(nc)), 4) AS cos_centroid
    FROM dots ORDER BY vec_id
    """,
)
def embedding_centroid_cosine(sf_dir: str):
    """Semantic-outlier scoring: per-label embedding centroid (one partial
    row per key per block, driver merge of labels x blocks tiny partials,
    broadcast once), then a shuffle-free cosine pass.
    stages/centroids.cosine_to_centroid."""
    from perfect_bloomfilter_ray.stages.centroids import cosine_to_centroid

    ds = _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
    out = cosine_to_centroid(ds, "label", "embedding")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cos_centroid": pc.round(t.column("cos_centroid"), ndigits=4),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow").sort("vec_id")


@q(
    "dup_span_removed_docs",
    sql="""
    WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
               FROM documents),
    g AS (SELECT doc_id, i, array_to_string(words[i:i+4], ' ') AS gram
          FROM w, UNNEST(range(1, len(words) - 3)) t(i)),
    d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    cov AS (SELECT DISTINCT g.doc_id, j
            FROM g JOIN d USING (gram), UNNEST(range(g.i, g.i + 5)) t(j)),
    tok AS (SELECT doc_id, j, words[j] AS word
            FROM w, UNNEST(range(1, len(words) + 1)) t(j)),
    kept AS (
      SELECT tok.doc_id, string_agg(tok.word, ' ' ORDER BY tok.j) AS text_clean
      FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.j = cov.j
      WHERE cov.j IS NULL GROUP BY tok.doc_id
    ),
    rem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM cov GROUP BY doc_id)
    SELECT w.doc_id, len(w.words) AS n_tokens,
           COALESCE(rem.n_removed, 0) AS n_removed,
           COALESCE(kept.text_clean, '') AS text_clean
    FROM w LEFT JOIN rem USING (doc_id) LEFT JOIN kept USING (doc_id)
    WHERE len(w.words) > 0 ORDER BY doc_id
    """,
)
def dup_span_removed_docs(sf_dir: str):
    """Span-level dedup transform (Lee et al. 2021 removal step): tokens
    covered by any corpus-duplicated 5-gram are deleted and the doc rebuilt
    from survivors. Duplicate detection shuffles slim (doc,pos,hash) rows
    by gram hash; the rebuild co-partitions doc payloads with surviving
    positions by doc-id hash (manual union join). The full rebuilt text is
    oracle-compared string-for-string. stages/ngramdup.remove_dup_spans."""
    from perfect_bloomfilter_ray.stages.ngramdup import remove_dup_spans

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return remove_dup_spans(docs, "text", "doc_id", n=5, min_docs=2).sort("doc_id")


@q(
    "event_value_histogram",
    sql="""
    WITH b AS (
      SELECT CAST(least(floor((value - 0.0) / 25.0), 19) AS BIGINT) AS bin
      FROM events WHERE value IS NOT NULL AND value >= 0.0 AND value < 500.0
    )
    SELECT bin, 0.0 + bin * 25.0 AS bin_lo, 0.0 + (bin + 1) * 25.0 AS bin_hi,
           count(*) AS n
    FROM b GROUP BY bin ORDER BY bin
    """,
)
def event_value_histogram(sf_dir: str):
    """Fixed-width histogram: per-block np.bincount partials (<= nbins rows
    per block), tiny groupby merge, float64 binning bit-identical to the SQL
    floor. stages/quantiles.histogram."""
    from perfect_bloomfilter_ray.stages.quantiles import histogram

    ds = _t(sf_dir, "events", ["value"])
    return histogram(ds, "value", 0.0, 500.0, 20).sort("bin")


@q(
    "chunked_documents",
    sql="""
    WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS words
               FROM documents),
    c AS (
      SELECT doc_id, k AS chunk_idx,
             least(k*48 + 64, len(words)) - k*48 AS n_tokens,
             array_to_string(words[k*48 + 1 : least(k*48 + 64, len(words))], ' ') AS chunk
      FROM w, UNNEST(range(0, greatest(1, (len(words) - 64 + 47) // 48 + 1))) t(k)
      WHERE len(words) > 0
    )
    SELECT doc_id, chunk_idx, n_tokens, chunk FROM c ORDER BY doc_id, chunk_idx
    """,
)
def chunked_documents(sf_dir: str):
    """Fixed-size token chunking with overlap (size=64, overlap=16) — the
    context-window prep expansion; one shuffle-free map_batches pass, all
    chunk strings oracle-compared. stages/shards.chunk_documents."""
    from perfect_bloomfilter_ray.stages.shards import chunk_documents

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(docs, "text", "doc_id", size=64, overlap=16).sort(
        ["doc_id", "chunk_idx"]
    )


@q(
    "user_funnel_view_click_purchase",
    sql="""
    WITH a AS (
      SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY user_id
    ), b AS (
      SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN a ON e.user_id = a.user_id
      WHERE e.event_type = 'click' AND e.ts > a.t0 GROUP BY e.user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN b ON e.user_id = b.user_id
      WHERE e.event_type = 'purchase' AND e.ts > b.t1 GROUP BY e.user_id
    )
    SELECT 0 AS stage_idx, 'view' AS stage, count(*) AS users FROM a
    UNION ALL SELECT 1, 'click', count(*) FROM b
    UNION ALL SELECT 2, 'purchase', count(*) FROM c
    ORDER BY stage_idx
    """,
)
def user_funnel_view_click_purchase(sf_dir: str):
    """Greedy ordered funnel (earliest view, then earliest later click, then
    earliest later purchase) — per-key segment-min passes inside coarse hash
    partitions, one tiny count row per stage per partition.
    stages/windows.funnel_counts."""
    from perfect_bloomfilter_ray.stages.windows import funnel_counts

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_counts(ds, "user_id", "ts", "event_type", ["view", "click", "purchase"])


def _docs_parity_slice(sf_dir: str, even: bool):
    # alternating blocks of 20 consecutive docs: both halves see every
    # source (source cycles with doc_id), so INTERSECT is non-trivial
    docs = _t(sf_dir, "documents", ["doc_id", "lang", "source"])

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        m = ((ids // 20) % 2 == 0) if even else ((ids // 20) % 2 == 1)
        return t.filter(pa.array(m)).drop_columns(["doc_id"])

    return docs.map_batches(fn, batch_format="pyarrow")


@q(
    "lang_source_intersect",
    sql="""
    SELECT lang, source FROM documents WHERE (doc_id // 20) % 2 = 0
    INTERSECT
    SELECT lang, source FROM documents WHERE (doc_id // 20) % 2 = 1
    ORDER BY lang, source
    """,
)
def lang_source_intersect(sf_dir: str):
    """SQL INTERSECT: distinct (lang, source) pairs present in both corpus
    halves (alternating 20-doc blocks) — batch-side dedup, one slim tagged shuffle, value-equality
    inside partitions. stages/setops.intersect_distinct."""
    from perfect_bloomfilter_ray.stages.setops import intersect_distinct

    a = _docs_parity_slice(sf_dir, True)
    b = _docs_parity_slice(sf_dir, False)
    return intersect_distinct(a, b, ["lang", "source"]).sort(["lang", "source"])


@q(
    "lang_source_except",
    sql="""
    SELECT lang, source FROM documents WHERE (doc_id // 20) % 2 = 0
    EXCEPT
    SELECT lang, source FROM documents WHERE (doc_id // 20) % 2 = 1
    ORDER BY lang, source
    """,
)
def lang_source_except(sf_dir: str):
    """SQL EXCEPT: distinct (lang, source) pairs only in the even half.
    stages/setops.except_distinct (same exchange as intersect)."""
    from perfect_bloomfilter_ray.stages.setops import except_distinct

    a = _docs_parity_slice(sf_dir, True)
    b = _docs_parity_slice(sf_dir, False)
    out = except_distinct(a, b, ["lang", "source"]).sort(["lang", "source"]).to_pandas()
    if out.empty:
        # Ray's to_pandas drops columns on an empty Dataset — at sf0.1 the
        # difference IS empty; hand back the typed empty frame
        out = pd.DataFrame({"lang": pd.Series(dtype=object), "source": pd.Series(dtype=object)})
    return out


@q(
    "user_event_paths",
    sql="""
    SELECT user_id, count(*) AS n_steps,
           string_agg(event_type, '->' ORDER BY ts, event_id) AS path
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def user_event_paths(sf_dir: str):
    """Clickstream path extraction: SQL string_agg(... ORDER BY ts) per
    user — one polars sort + group_by join per coarse key partition.
    stages/windows.grouped_path_string."""
    from perfect_bloomfilter_ray.stages.windows import grouped_path_string

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    return grouped_path_string(
        ds, "user_id", "ts", "event_type", sep="->", tie_cols=["event_id"]
    ).sort("user_id")


@q(
    "event_value_robust_zscores",
    sql="""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type
    ), d AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN m USING (event_type) GROUP BY e.event_type
    )
    SELECT event_id, round((value - med) / (1.4826 * mad), 4) AS rz
    FROM events JOIN m USING (event_type) JOIN d USING (event_type)
    ORDER BY event_id
    """,
)
def event_value_robust_zscores(sf_dir: str):
    """Robust (median/MAD) outlier scores per category — two exact-quantile
    passes + broadcast LUT scoring, no data-row shuffle beyond the quantile
    exchanges. stages/quantiles.robust_zscore."""
    from perfect_bloomfilter_ray.stages.quantiles import robust_zscore

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])
    out = robust_zscore(ds, "event_type", "value", out_col="rz")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t.column("event_id"), "rz": pc.round(t.column("rz"), ndigits=4)}
        )

    return out.map_batches(fin, batch_format="pyarrow").sort("event_id")


@q(
    "event_type_cooccurrence",
    sql="""
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS item_a, b.event_type AS item_b, count(*) AS n
    FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def event_type_cooccurrence(sf_dir: str):
    """Market-basket support counts: for each unordered event-type pair, how
    many distinct users exhibit both — batch-side dedup, key-co-located
    vectorized self-join per partition, tiny pair-count merge.
    stages/cooccur.cooccurrence_counts."""
    from perfect_bloomfilter_ray.stages.cooccur import cooccurrence_counts

    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    out = (
        cooccurrence_counts(ds, "user_id", "event_type")
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


@q(
    "lang_categorical_codes",
    sql="""
    WITH v AS (SELECT lang, count(*) AS _c FROM documents GROUP BY lang),
    codes AS (
        SELECT lang,
               CAST(row_number() OVER (ORDER BY _c DESC, lang) - 1 AS BIGINT) AS lang_code
        FROM v WHERE _c >= 10
    )
    SELECT d.doc_id, d.lang, c.lang_code
    FROM documents d LEFT JOIN codes c USING (lang)
    WHERE d.doc_id % 7 = 0
    ORDER BY d.doc_id
    """,
)
def lang_categorical_codes(sf_dir: str):
    """Frequency-ordered label encoding (stages/vocab.categorical_encode):
    one category-sized groupby builds the code book (code 0 = most frequent,
    ties by value), broadcast once, then a shuffle-free searchsorted map
    pass; categories under min_count=10 encode as null. A deterministic
    1-in-7 doc slice keeps the checked output small while the code book
    always covers the full corpus."""
    from perfect_bloomfilter_ray.stages.vocab import categorical_encode

    docs = _t(sf_dir, "documents", ["doc_id", "lang"])
    enc = categorical_encode(docs, "lang", out_col="lang_code", min_count=10)

    def slice7(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return t.filter(pa.array(ids % 7 == 0))

    return (
        enc.map_batches(slice7, batch_format="pyarrow")
        .select_columns(["doc_id", "lang", "lang_code"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


@q(
    "user_value_rolling_mean",
    sql="""
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS roll_mean3
    FROM events ORDER BY event_id
    """,
)
def user_value_rolling_mean(sf_dir: str):
    """Row-count-frame rolling mean (stages/windows.rolling_row_agg): each
    event's mean value over the same user's last 3 events ordered by
    (ts, event_id) — the ROWS-frame twin of the RANGE-frame sliding window.
    Coarse hash partition on user, one vectorized lexsort + prefix-sum pass
    per partition."""
    from perfect_bloomfilter_ray.stages.windows import rolling_row_agg

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = rolling_row_agg(
        ds, "user_id", "ts", "value", n_rows=3, tie_cols=["event_id"], out_mean="roll_mean3"
    )

    def fin(t: pa.Table) -> pa.Table:
        # np.round matches DuckDB's round(DOUBLE) (nearest double to the
        # 4-dp decimal); pc.round can keep a 1-ulp offset from the input
        m = np.round(t.column("roll_mean3").to_numpy(zero_copy_only=False), 4)
        return pa.table({"event_id": t.column("event_id"), "roll_mean3": pa.array(m)})

    return out.map_batches(fin, batch_format="pyarrow").sort("event_id")


@q(
    "skew_join_event_order_revenue",
    sql="""
    SELECT e.event_type, count(*) AS n_pairs,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events e JOIN orders o ON e.user_id = o.o_custkey
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def skew_join_event_order_revenue(sf_dir: str):
    """Skew-aware hybrid big-big join (stages/joins.skew_join): hot left
    keys (≥80 events here) resolve against a broadcast right slice with a
    vectorized many-to-many expansion — never entering the shuffle — while
    the de-skewed remainder takes the ordinary hash join; the union is
    row-identical to a plain inner join (the SQL oracle)."""
    from perfect_bloomfilter_ray.stages.joins import skew_join

    events = _t(sf_dir, "events", ["user_id", "event_type"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = skew_join(
        events, orders, on="user_id", right_on="o_custkey",
        hot_count_threshold=80, hot_top_k=16,
        num_partitions=choose_join_partitions(min_partitions=4),
    )
    # map-side partial aggregation: the 1M-row join output collapses to a
    # few rows per block before the (tiny) groupby — without this the
    # sort-shuffle pays one giant map-side sort over the whole union
    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        # integer CENTS (identical floor(x*100+0.5) tree both sides): the
        # rounded float sum diverged at sf1.0 — suite policy, see BASELINE
        return (
            pl.from_arrow(t.select(["event_type", "o_totalprice"]))
            .with_columns(
                (pl.col("o_totalprice") * 100.0 + 0.5).floor().cast(pl.Int64).alias("cents")
            )
            .group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                pl.col("cents").sum().alias("ps"),
            )
            .to_arrow()
        )

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("pn", alias_name="n_pairs"), Sum("ps", alias_name="total_cents"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["total_cents"] = out["total_cents"].astype("int64")
    return out


@q(
    "contamination_fraction_docs",
    sql="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ),
    bench AS (SELECT * FROM toks WHERE (doc_id * 2654435761) % 10 = 3),
    corp  AS (SELECT * FROM toks WHERE (doc_id * 2654435761) % 10 <> 3),
    bgrams AS (
      SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS g
      FROM (SELECT t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM bench WHERE len(t) >= 5)
    ),
    cg AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM corp WHERE len(t) >= 5)
    )
    SELECT cg.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) AS contam_frac
    FROM cg LEFT JOIN bgrams b ON cg.g = b.g
    GROUP BY cg.doc_id ORDER BY cg.doc_id
    """,
)
def contamination_fraction_docs(sf_dir: str):
    """Graded decontamination (stages/decontam.contamination_fraction): per
    corpus doc, the fraction of its distinct 5-grams found in the benchmark
    slice's blocklist — broadcast blocklist, one shuffle-free scoring pass.
    Same deterministic 10% benchmark split as `decontaminated_docs`."""
    from perfect_bloomfilter_ray.stages.decontam import (
        build_blocklist,
        contamination_fraction,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def split(bench_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy().astype(np.int64)
            m = (ids * 2654435761) % 10 == 3
            return t.filter(pa.array(m if bench_side else ~m))

        return fn

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    corp = docs.map_batches(split(False), batch_format="pyarrow")
    blocklist = build_blocklist(bench, "text", n=5)
    scored = contamination_fraction(corp, blocklist, n=5)

    def fin(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("n_grams"), 0)
        t = t.filter(keep)
        # exact hits/n_grams division of ints — NO rounding: round(x, 4)
        # flips between numpy half-even and SQL half-away exactly at the
        # .00005 boundaries a big corpus eventually hits (sf0.1 did)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": t.column("n_grams"),
                "contam_frac": t.column("contam_frac"),
            }
        )

    return scored.map_batches(fin, batch_format="pyarrow").sort("doc_id")


@q(
    "event_value_quantile_bins",
    sql="""
    WITH th AS (
      SELECT event_type,
             quantile_disc(value, 0.25) AS t1,
             quantile_disc(value, 0.50) AS t2,
             quantile_disc(value, 0.75) AS t3
      FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           CAST((e.value > t1)::INT + (e.value > t2)::INT + (e.value > t3)::INT
                AS BIGINT) AS bin
    FROM events e JOIN th USING (event_type)
    ORDER BY e.event_id
    """,
)
def event_value_quantile_bins(sf_dir: str):
    """Equi-depth feature binning (stages/quantiles.quantile_bin): per event
    type, exact discrete quartile cut points (one coarse-partitioned
    vectorized pass), broadcast one row per group, then a shuffle-free
    threshold-count map assigns each event its 0-3 bin code."""
    from perfect_bloomfilter_ray.stages.quantiles import quantile_bin

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"])
    out = quantile_bin(ds, "event_type", "value", n_bins=4, bin_col="bin")
    return (
        out.select_columns(["event_id", "bin"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


@q(
    "bigram_perplexity_scores",
    sql="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
    ),
    ut AS (SELECT doc_id, unnest(t) AS token FROM toks),
    cnt AS (SELECT token, count(*) AS c1 FROM ut GROUP BY token),
    uni AS (SELECT token, c1 FROM cnt WHERE c1 >= 5),
    tot AS (SELECT count(*) AS n FROM ut),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS g
      FROM toks, UNNEST(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2
    ),
    bgc AS (SELECT w1, g, count(*) AS c2 FROM bg GROUP BY 1, 2 HAVING count(*) >= 3),
    vocab AS (
      SELECT bgc.g, ln(uni.c1) - ln(bgc.c2) AS nll
      FROM bgc JOIN uni ON bgc.w1 = uni.token
    ),
    samp AS (SELECT doc_id, lang FROM documents WHERE doc_id % 5 = 0),
    sb AS (SELECT b.doc_id, b.g FROM bg b JOIN samp USING (doc_id)),
    s AS (
      SELECT sb.doc_id, count(*) AS n_bigrams,
             sum(coalesce(v.nll, -ln(0.5 / tot.n))) AS nll
      FROM sb LEFT JOIN vocab v ON sb.g = v.g CROSS JOIN tot GROUP BY sb.doc_id
    )
    SELECT sa.doc_id, sa.lang,
           CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           round(coalesce(s.nll / s.n_bigrams, 0), 4) AS nll2_per_tok
    FROM samp sa LEFT JOIN s USING (doc_id)
    ORDER BY sa.doc_id
    """,
)
def bigram_perplexity_scores(sf_dir: str):
    """Bigram conditional-LM quality scoring (stages/vocab.py): corpus
    bigram counts via map-side partial groupby, conditional nll(w1 w2) =
    -ln(c2/c1) resolved against the unigram vocabulary at broadcast-build
    time, then one shuffle-free pass scoring mean per-bigram nll over a
    deterministic 20% doc slice (OOV / sub-min_count bigrams floored at
    half a count over the corpus). One step closer to CCNet's KenLM than
    the unigram model."""
    from perfect_bloomfilter_ray.stages.vocab import (
        bigram_counts,
        bigram_logprob_broadcast,
        bigram_nll_score,
        token_counts,
        unigram_count_broadcast,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    uni = token_counts(docs, "text", min_count=5)

    def ntok(t: pa.Table) -> pa.Table:
        import polars as pl

        n = (
            pl.from_arrow(t.column("text"))
            .str.to_lowercase()
            .str.extract_all("[a-z0-9]+")
            .list.len()
            .fill_null(0)
            .sum()
        )
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    total = int(
        docs.map_batches(ntok, batch_format="pyarrow").aggregate(Sum("n", alias_name="n"))["n"]
    )
    uref = unigram_count_broadcast(uni)
    big = bigram_counts(docs, "text", min_count=3)
    lp = bigram_logprob_broadcast(big, uref, total)

    def slice5(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return t.filter(pa.array(ids % 5 == 0))

    sample = docs.map_batches(slice5, batch_format="pyarrow")
    out = (
        bigram_nll_score(sample, lp, "text")
        .select_columns(["doc_id", "lang", "n_bigrams", "nll2_per_tok"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["nll2_per_tok"] = np.round(out["nll2_per_tok"].to_numpy(), 4)
    return out


@q(
    "user_modal_event_type",
    sql="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT user_id, event_type, cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS rn
      FROM c
    )
    SELECT user_id, event_type AS event_type_mode, CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1 ORDER BY user_id
    """,
)
def user_modal_event_type(sf_dir: str):
    """Grouped mode (stages/topk.grouped_mode): each user's most frequent
    event type with deterministic tie-breaking (count desc, value asc) —
    per-batch partial pair counts, one coarse-partitioned vectorized
    sum + argmax pass."""
    from perfect_bloomfilter_ray.stages.topk import grouped_mode

    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    out = (
        grouped_mode(ds, "user_id", "event_type", mode_col="event_type_mode")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out["mode_count"] = out["mode_count"].astype("int64")
    return out[["user_id", "event_type_mode", "mode_count"]]


@q(
    "event_type_association_scores",
    sql="""
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
    p AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b, count(*) AS n
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    m AS (SELECT event_type, count(*) AS nk FROM d GROUP BY 1),
    tot AS (SELECT count(DISTINCT user_id) AS nu FROM events)
    SELECT item_a, item_b, n,
           round(CAST(n AS DOUBLE) * nu / (ma.nk * mb.nk), 4) AS lift,
           round(ln(CAST(n AS DOUBLE) * nu / (ma.nk * mb.nk)), 4) AS pmi
    FROM p
    JOIN m ma ON p.item_a = ma.event_type
    JOIN m mb ON p.item_b = mb.event_type
    CROSS JOIN tot
    ORDER BY item_a, item_b
    """,
)
def event_type_association_scores(sf_dir: str):
    """Association-rule scoring (stages/cooccur): pair support counts +
    per-item marginal distinct-key counts + total distinct keys → lift
    = n·N/(n_a·n_b) and PMI = ln(lift) per unordered event-type pair.
    All three inputs are distributed aggregates; the scoring join runs on
    the items²-bounded pair table (driver post-agg altitude)."""
    from perfect_bloomfilter_ray.stages.cooccur import (
        cooccurrence_counts,
        item_marginals,
    )

    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    pairs = cooccurrence_counts(ds, "user_id", "event_type").to_pandas()
    marg = item_marginals(ds, "user_id", "event_type").to_pandas()

    def pdist(t: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(t.select(["user_id"])).unique().to_arrow()

    n_users = (
        ds.select_columns(["user_id"])  # reuse the loaded dataset, no re-scan
        .map_batches(pdist, batch_format="pyarrow")
        .groupby("user_id")
        .count()
        .count()
    )

    mk = dict(zip(marg["item"], marg["nk"]))
    out = pairs.sort_values(["item_a", "item_b"]).reset_index(drop=True)
    na = out["item_a"].map(mk).to_numpy().astype(np.int64)
    nb = out["item_b"].map(mk).to_numpy().astype(np.int64)
    lift = out["n"].to_numpy().astype(np.float64) * n_users / (na * nb)
    out["n"] = out["n"].astype("int64")
    out["lift"] = np.round(lift, 4)
    out["pmi"] = np.round(np.log(lift), 4)
    return out


@q(
    "hourly_distinct_users",
    sql="""
    SELECT date_trunc('hour', ts) AS bucket,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def hourly_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT) per time window: map-only hour truncation
    (stages/windows.time_bucket), per-batch distinct (bucket, user) partials
    so the dedup shuffle carries pair-distinct rows only, a pair groupby,
    then a tiny per-bucket count merged with the plain event counts. The
    exact twin of the HLL-per-window pattern."""
    from perfect_bloomfilter_ray.stages.windows import time_bucket

    ds = time_bucket(
        _t(sf_dir, "events", ["ts", "user_id"]), "ts", "hour", out_col="bucket"
    )

    def pdist(t: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(t.select(["bucket", "user_id"])).unique().to_arrow()

    users = (
        ds.map_batches(pdist, batch_format="pyarrow")
        .groupby(["bucket", "user_id"])
        .count()
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["bucket"]))
            .group_by("bucket")
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    n_users = (
        users.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("pn", alias_name="n_users"))
        .to_pandas()
    )
    n_events = (
        ds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("pn", alias_name="n_events"))
        .to_pandas()
    )
    out = n_users.merge(n_events, on="bucket").sort_values("bucket").reset_index(drop=True)
    out["n_users"] = out["n_users"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out


@q("ann_topk_quantized")
def ann_topk_quantized(sf_dir: str):
    """Int8-quantized cosine top-k (stages/ann.quantize_embeddings +
    quantized_topk): per-vector symmetric scalar quantization to a
    fixed_size_list<int8> column (4x less scan bandwidth), block-level
    candidate top-(rescore*k), exact driver merge. Recall vs the float
    brute force is property-tested (rows-only query, like the LSH/IVF
    variants)."""
    from perfect_bloomfilter_ray.stages.ann import quantize_embeddings, quantized_topk

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id < 4").take_all()
    dim = len(qrows[0]["embedding"])
    queries = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sorted(qrows, key=lambda r: r["vec_id"])]
    )
    qds = quantize_embeddings(emb, "embedding", dim)
    df = quantized_topk(qds, queries, "qvec", "qscale", "vec_id", dim, k=10)
    return (
        df[["query_id", "vec_id"]]
        .astype({"query_id": "int64", "vec_id": "int64"})
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )


@q("ann_topk_ivf_persisted")
def ann_topk_ivf_persisted(sf_dir: str):
    """Persisted IVF index (stages/ann.ivf_build_index / ivf_query_index):
    the embeddings table is re-written once as cell-partitioned Parquet +
    a centroid table; queries load the tiny centroids and read ONLY their
    probed cells' files (path-level pruning — at 10^12 rows a query scans
    ~nprobe/nlist of the corpus from storage). Rows-only like the other
    approximate ANN variants; recall + self-hit property-tested."""
    import tempfile

    from perfect_bloomfilter_ray.stages.ann import ivf_build_index, ivf_query_index

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qrows = emb.filter(expr="vec_id < 4").take_all()
    dim = len(qrows[0]["embedding"])
    queries = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sorted(qrows, key=lambda r: r["vec_id"])]
    )
    idx = tempfile.mkdtemp(prefix="pbf_ivf_idx_", dir="/tmp")
    ivf_build_index(emb, "embedding", "vec_id", dim, idx, nlist=16)
    df = ivf_query_index(idx, queries, k=10, nprobe=4)
    return (
        df[["query_id", "vec_id"]]
        .astype({"query_id": "int64", "vec_id": "int64"})
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )


@q(
    "budget_selected_docs",
    sql="""
    WITH t AS (
      SELECT doc_id, n_chars,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_chars, toks,
             sum(toks) OVER (ORDER BY n_chars DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, n_chars, CAST(toks AS BIGINT) AS toks
    FROM r WHERE cum <= 12000 ORDER BY doc_id
    """,
)
def budget_selected_docs(sf_dir: str):
    """Token-budget corpus selection (stages/shards.select_within_budget):
    keep the best documents (here: longest by n_chars, ties by doc_id)
    whose cumulative token cost fits a global budget — implemented as a
    distributed threshold search (per-batch cost histograms over score
    buckets, boundary bucket refined then resolved row-exactly), never a
    global sort + prefix scan. Integer costs make the result row-identical
    to the SQL window-cumsum rule."""
    from perfect_bloomfilter_ray.stages.shards import select_within_budget

    docs = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def add_toks(t: pa.Table) -> pa.Table:
        import polars as pl

        toks = (
            pl.from_arrow(t.column("text"))
            .str.to_lowercase()
            .str.extract_all("[a-z0-9]+")
            .list.len()
            .fill_null(0)
            .cast(pl.Int64)
        )
        return t.drop_columns(["text"]).append_column("toks", toks.to_arrow())

    # materialize the 24 B/row (id, score, cost) projection ONCE: the
    # threshold search re-scans its input per histogram round, and without
    # this the regex tokenization would re-execute on every round (was ~9 s
    # of the bench suite, ~3.5 s after). Slim + spillable at scale.
    ds = docs.map_batches(add_toks, batch_format="pyarrow").materialize()
    out = (
        select_within_budget(ds, "n_chars", "toks", "doc_id", 12000.0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out[["doc_id", "n_chars", "toks"]]


@q(
    "user_retention_cohorts",
    sql="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    e AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(date_diff('week', f.cohort, date_trunc('week', e.ts)) AS BIGINT)
                 AS offset_w
      FROM events e JOIN f USING (user_id)
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort, offset_w, count(*) AS n_users
    FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def user_retention_cohorts(sf_dir: str):
    """Cohort retention matrix: each user's cohort = the Monday of their
    first event's week; for every (cohort, week-offset) cell, how many
    distinct users were active. ONE all-to-all: batch-local distinct
    (user, week) pairs are hash-co-partitioned by user, so each partition
    holds every week of its users — cohort (min week) and offsets resolve
    inside the block and only tiny per-partition cell counts leave it.
    Replaces the earlier groupby-min + hash-join + pair-distinct plan
    (4 exchanges) with 1 big + 1 tiny exchange."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    WEEK_US = 7 * 86400 * 1_000_000

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    nb = np.uint64(choose_num_blocks(ds))

    def wk(t: pa.Table) -> pa.Table:
        import polars as pl

        w = pc.floor_temporal(t.column("ts"), unit="week")
        tbl = pa.table(
            {
                "user_id": t.column("user_id"),
                "wk": pc.cast(pc.cast(w, pa.timestamp("us")), pa.int64()),
            }
        )
        tbl = pl.from_arrow(tbl).unique().to_arrow()
        h = hash64(tbl.column("user_id"), 0x5E55)
        return tbl.append_column("_part", pa.array((h % nb).astype(np.int32)))

    def per_part(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t.select(["user_id", "wk"])).unique()
        df = df.with_columns(pl.col("wk").min().over("user_id").alias("cohort_us"))
        df = df.with_columns(((pl.col("wk") - pl.col("cohort_us")) // WEEK_US).alias("offset_w"))
        return (
            df.group_by(["cohort_us", "offset_w"])
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    cells = (
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(wk, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )
    out = (
        cells.groupby(["cohort_us", "offset_w"])
        .aggregate(Sum("pn", alias_name="n_users"))
        .to_pandas()
    )
    out["cohort"] = pd.to_datetime(out["cohort_us"], unit="us").dt.strftime("%Y-%m-%d")
    out["n_users"] = out["n_users"].astype("int64")
    out["offset_w"] = out["offset_w"].astype("int64")
    return (
        out[["cohort", "offset_w", "n_users"]]
        .sort_values(["cohort", "offset_w"])
        .reset_index(drop=True)
    )


@q(
    "event_type_transitions",
    sql="""
    WITH s AS (
      SELECT event_type AS state_from,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS state_to
      FROM events
    )
    SELECT state_from, state_to, count(*) AS n
    FROM s WHERE state_to IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def event_type_transitions(sf_dir: str):
    """First-order Markov transition matrix
    (stages/windows.transition_counts): consecutive event-type pairs within
    each user's (ts, event_id)-ordered stream, counted across users — one
    vectorized sort + within-key shift per coarse partition, partial pair
    counts, tiny final groupby-sum."""
    from perfect_bloomfilter_ray.stages.windows import transition_counts

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    out = (
        transition_counts(ds, "user_id", "ts", "event_type", tie_cols=["event_id"])
        .to_pandas()
        .sort_values(["state_from", "state_to"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


@q(
    "embedding_moment_stats",
    sql="""
    WITH e AS (
      SELECT CAST(embedding[i] AS DOUBLE) AS x, i
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    )
    SELECT CAST(i AS BIGINT) AS dim_i,
           round(avg(x), 4) AS mean,
           round(var_samp(x), 4) AS var
    FROM e GROUP BY i ORDER BY i
    """,
)
def embedding_moment_stats(sf_dir: str):
    """The distributed sufficient statistics behind PCA
    (state/moments.EmbeddingMoments via the shared sketch partial/tree-merge
    path): per-dimension mean and sample variance from one (n, Σx, ΣxxT)
    reduction — the shuffle carries (dim + dim²)-float partials, never
    vectors. The eigen step on top is pure driver numpy (pytest parity)."""
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.moments import EmbeddingMoments

    emb = _t(sf_dir, "embeddings", ["embedding"])
    dim = len(emb.take(1)[0]["embedding"])
    m = sketch_global(emb, "embedding", lambda: EmbeddingMoments(dim))
    var = np.diag(m.covariance())
    return pd.DataFrame(
        {
            "dim_i": np.arange(1, dim + 1, dtype=np.int64),
            "mean": np.round(m.mean(), 4),
            "var": np.round(var, 4),
        }
    )


@q("embedding_pca_projections")
def embedding_pca_projections(sf_dir: str):
    """Distributed PCA (stages/pca.py): fit top-2 components from the
    mergeable moments sketch, then one shuffle-free projection pass.
    Rows-only (eigensolver output; numpy parity in pytest), deterministic
    via fixed component signs."""
    from perfect_bloomfilter_ray.stages.pca import pca_fit, pca_transform

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    dim = len(emb.take(1)[0]["embedding"])
    model = pca_fit(emb, "embedding", dim, k=2)
    out = (
        pca_transform(emb, model, "embedding", dim)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    proj = np.stack(out["pca"].to_numpy())
    return pd.DataFrame(
        {
            "vec_id": out["vec_id"].astype("int64"),
            "p1": np.round(proj[:, 0], 4),
            "p2": np.round(proj[:, 1], 4),
        }
    )


@q(
    "events_band_window_activity",
    sql="""
    SELECT e.event_id,
           count(*) AS n_window,
           round(sum(b.value), 4) AS window_value
    FROM events e JOIN events b
      ON e.user_id = b.user_id
     AND b.ts BETWEEN e.ts - INTERVAL 10 MINUTE AND e.ts
    GROUP BY e.event_id ORDER BY e.event_id
    """,
)
def events_band_window_activity(sf_dir: str):
    """Big-big temporal band join (stages/joins.band_join_partitioned): for
    each event, EVERY event by the same user in the trailing 10 minutes
    (self included) — both sides co-partitioned on the key in one shuffle,
    per-partition packed searchsorted 1:N expansion, then per-event partial
    aggregates re-merged by a tiny groupby (oversized join blocks can be
    sliced mid-event by Ray's output buffer, so partials alone would
    duplicate events). The 1:N twin of the RANGE-frame sliding window
    (which returns only count/sum, not match rows)."""
    from perfect_bloomfilter_ray.stages.joins import band_join_partitioned

    left = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    right = _t(sf_dir, "events", ["user_id", "ts", "value"])
    joined = band_join_partitioned(
        left, right, on="user_id", big_ts="ts", window="10min",
        right_on="user_id", small_ts="ts",
    )

    # per-batch PARTIALS + a groupby re-aggregation: Ray slices oversized
    # map_groups output blocks mid-table, so an event's matches CAN straddle
    # blocks at scale — partials alone would emit duplicate per-event rows
    def agg_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["event_id", "band_value"]))
            .group_by("event_id")
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                pl.col("band_value").sum().alias("ps"),
            )
            .to_arrow()
        )

    out = (
        joined.map_batches(agg_partial, batch_format="pyarrow")
        .groupby("event_id")
        .aggregate(Sum("pn", alias_name="n_window"), Sum("ps", alias_name="window_value"))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["n_window"] = out["n_window"].astype("int64")
    out["window_value"] = np.round(out["window_value"].to_numpy(dtype=np.float64), 4)
    return out


@q(
    "event_zorder_keys",
    sql="""
    WITH t AS (
      SELECT event_id,
             user_id & 65535 AS u,
             CAST(floor(value) AS BIGINT) & 65535 AS v
      FROM events
    )
    SELECT event_id, CAST((((u >> 0) & 1) << 0) + (((v >> 0) & 1) << 1) + (((u >> 1) & 1) << 2) + (((v >> 1) & 1) << 3) + (((u >> 2) & 1) << 4) + (((v >> 2) & 1) << 5) + (((u >> 3) & 1) << 6) + (((v >> 3) & 1) << 7) + (((u >> 4) & 1) << 8) + (((v >> 4) & 1) << 9) + (((u >> 5) & 1) << 10) + (((v >> 5) & 1) << 11) + (((u >> 6) & 1) << 12) + (((v >> 6) & 1) << 13) + (((u >> 7) & 1) << 14) + (((v >> 7) & 1) << 15) + (((u >> 8) & 1) << 16) + (((v >> 8) & 1) << 17) + (((u >> 9) & 1) << 18) + (((v >> 9) & 1) << 19) + (((u >> 10) & 1) << 20) + (((v >> 10) & 1) << 21) + (((u >> 11) & 1) << 22) + (((v >> 11) & 1) << 23) + (((u >> 12) & 1) << 24) + (((v >> 12) & 1) << 25) + (((u >> 13) & 1) << 26) + (((v >> 13) & 1) << 27) + (((u >> 14) & 1) << 28) + (((v >> 14) & 1) << 29) + (((u >> 15) & 1) << 30) + (((v >> 15) & 1) << 31) AS BIGINT) AS zkey
    FROM t ORDER BY event_id
    """,
)
def event_zorder_keys(sf_dir: str):
    """Z-order (Morton) clustering keys (stages/partitioning.zorder_key2):
    interleave (user_id, floor(value)) bits into one int64 key — sort or
    range-partition by it before writing and readers filtering on EITHER
    column prune files (the Delta/Iceberg OPTIMIZE ZORDER trick). The magic-
    mask expansion is vectorized; the SQL oracle spells out all 32 bit
    shifts explicitly."""
    from perfect_bloomfilter_ray.stages.partitioning import zorder_key2

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def zk(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.floor(t.column("value").to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "zkey": pa.array(zorder_key2(u, v, 16)),
            }
        )

    return ds.map_batches(zk, batch_format="pyarrow").sort("event_id")


@q(
    "sliding_distinct_users_exact",
    sql="""
    WITH p AS (
      SELECT DISTINCT date_trunc('hour', ts) AS b, user_id FROM events
    ),
    x AS (
      SELECT DISTINCT b + to_hours(o) AS bucket, user_id
      FROM p, UNNEST([0, 1, 2]) AS t(o)
    ),
    hours AS (SELECT DISTINCT date_trunc('hour', ts) AS bucket FROM events)
    SELECT h.bucket, count(*) AS n_users
    FROM x JOIN hours h USING (bucket)
    GROUP BY h.bucket ORDER BY h.bucket
    """,
)
def sliding_distinct_users_exact(sf_dir: str):
    """Trailing 3-hour sliding DISTINCT user count per hour, exact: each
    distinct (hour, user) pair fans out to the 3 target buckets it covers
    (flat expansion, bounded ×window) carrying its fan-out offset; the pair
    groupby keeps the MIN offset, so "bucket really occurs" (some pair has
    offset 0) falls out of the same shuffle — no second scan of the input.
    A tiny per-bucket count finishes."""
    from ray.data.aggregate import Min

    from perfect_bloomfilter_ray.stages.windows import time_bucket

    ds = time_bucket(
        _t(sf_dir, "events", ["ts", "user_id"]), "ts", "hour", out_col="b"
    )

    HOUR_US = 3_600_000_000

    def expand(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t.select(["b", "user_id"]))
            .unique()
            .with_columns(pl.col("b").cast(pl.Int64).alias("bus"))
        )
        out = (
            df.join(pl.DataFrame({"o": [0, 1, 2]}), how="cross")
            .with_columns((pl.col("bus") + pl.col("o") * HOUR_US).alias("bucket_us"))
            .group_by(["bucket_us", "user_id"])
            .agg(pl.col("o").min().cast(pl.Int64).alias("po"))
        )
        return out.to_arrow()

    pairs = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["bucket_us", "user_id"])
        .aggregate(Min("po", alias_name="mo"))
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["bucket_us", "mo"]))
            .group_by("bucket_us")
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                pl.col("mo").min().cast(pl.Int64).alias("pmo"),
            )
            .to_arrow()
        )

    counts = (
        pairs.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket_us")
        .aggregate(Sum("pn", alias_name="n_users"), Min("pmo", alias_name="mo"))
        .to_pandas()
    )
    # a bucket is real iff some event actually occurred in it (offset 0);
    # pure fan-out targets past the last event hour are dropped
    counts = counts[counts["mo"] == 0]
    counts["bucket"] = pd.to_datetime(counts["bucket_us"], unit="us")
    counts["n_users"] = counts["n_users"].astype("int64")
    return counts[["bucket", "n_users"]].sort_values("bucket").reset_index(drop=True)


@q("sliding_distinct_users_theta")
def sliding_distinct_users_theta(sf_dir: str):
    """Theta-sketch twin of `sliding_distinct_users_exact`: one mergeable
    theta sketch per hour (two-phase partial/merge tree), then the trailing
    3-hour estimate per hour is a driver-side union of 3 tiny sketches —
    the classic sliding-distinct-at-scale shape (per-bucket sketches are
    built once and reused by every overlapping window). Rows-only; error
    vs the exact twin is bounded by the sketch's published rel_error."""
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped
    from perfect_bloomfilter_ray.stages.windows import time_bucket
    from perfect_bloomfilter_ray.state.theta import ThetaSketch

    ds = time_bucket(
        _t(sf_dir, "events", ["ts", "user_id"]), "ts", "hour", out_col="b"
    )

    def to_i64(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": pc.cast(pc.cast(t.column("b"), pa.timestamp("us")), pa.int64()),
             "user_id": t.column("user_id")}
        )

    per_hour = sketch_grouped(
        ds.map_batches(to_i64, batch_format="pyarrow"),
        "b", "user_id", lambda: ThetaSketch(4096),
        name="skb", finalize_fn=lambda s: s.to_bytes(),
    ).to_pandas()
    HOUR_US = 3_600_000_000
    sk = {int(r.b): ThetaSketch.from_bytes(r.skb) for r in per_hour.itertuples()}
    rows = []
    for b in sorted(sk):
        m = ThetaSketch(4096)
        for o in (0, 1, 2):
            prev = b - o * HOUR_US
            if prev in sk:
                m.merge(sk[prev])  # merge copies hashes in; sources unchanged
        rows.append((pd.to_datetime(b, unit="us"), int(round(m.estimate()))))
    return pd.DataFrame(rows, columns=["bucket", "n_users_est"])


@q(
    "component_best_representatives",
    sql="""
    WITH g AS (
      SELECT event_id, value,
             min(event_id) OVER (PARTITION BY user_id, event_type) AS root,
             count(*)      OVER (PARTITION BY user_id, event_type) AS n
      FROM events
    ),
    r AS (
      SELECT root, event_id, value,
             row_number() OVER (PARTITION BY root ORDER BY value DESC, event_id) AS rn
      FROM g WHERE n > 1
    )
    SELECT root, event_id AS rep, round(value, 4) AS rep_value
    FROM r WHERE rn = 1 ORDER BY root
    """,
)
def component_best_representatives(sf_dir: str):
    """Keep-best-per-cluster representative selection: the curation step
    after near-dup clustering that keeps the HIGHEST-quality member of each
    duplicate cluster (not the arbitrary min-id). Components come from the
    same oracle-checked chain graph as `user_event_chain_components`
    (distributed hash-to-min CC); members resolve their score via a
    co-partitioned hash join; the winner per component is a grouped top-1
    (partial-top-k combiner, ties to the smallest id)."""
    from perfect_bloomfilter_ray.stages.dedup import connected_components_pairs
    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    comp = connected_components_pairs(_user_event_chain_edges(ds))  # (node, root)
    scored = comp.join(
        ds.select_columns(["event_id", "value"]),
        "inner", num_partitions=choose_join_partitions(min_partitions=4),
        on=("node",), right_on=("event_id",),
    )
    best = grouped_top_k(
        scored, "root", "value", k=1, descending=True, tie_cols=["node"]
    ).to_pandas()
    out = pd.DataFrame(
        {
            "root": best["root"].astype("int64"),
            "rep": best["node"].astype("int64"),
            "rep_value": np.round(best["value"].to_numpy(dtype=np.float64), 4),
        }
    )
    return out.sort_values("root").reset_index(drop=True)


@q(
    "events_data_quality",
    sql="""
    SELECT * FROM (
      SELECT 0 AS rule_id, 'not_null' AS rule, 'user_id' AS col,
             CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violations FROM events
      UNION ALL
      SELECT 1, 'in_range', 'value',
             CAST(sum(CASE WHEN value IS NOT NULL
                            AND NOT (value >= 0 AND value <= 50)
                           THEN 1 ELSE 0 END) AS BIGINT) FROM events
      UNION ALL
      SELECT 2, 'in_set', 'event_type',
             CAST(sum(CASE WHEN event_type IS NOT NULL
                            AND event_type NOT IN ('view', 'click', 'purchase')
                           THEN 1 ELSE 0 END) AS BIGINT) FROM events
      UNION ALL
      SELECT 3, 'matches', 'props',
             CAST(sum(CASE WHEN props IS NOT NULL
                            AND NOT regexp_matches(props, '"k": [0-9]+')
                           THEN 1 ELSE 0 END) AS BIGINT) FROM events
      UNION ALL
      SELECT 4, 'unique', 'event_id',
             (SELECT count(*) - count(DISTINCT event_id) FROM events)
    ) ORDER BY rule_id
    """,
)
def events_data_quality(sf_dir: str):
    """Data-contract gate (stages/validate.validate_rules): violation
    counts for a rule list — null checks, ranges, enums, regex format,
    uniqueness — in one streaming vectorized pass (uniqueness adds one
    pre-aggregated distinct shuffle). The accept/reject step before an
    ingest batch enters the corpus."""
    from perfect_bloomfilter_ray.stages.validate import validate_rules

    ds = _t(sf_dir, "events", ["event_id", "user_id", "event_type", "value", "props"])
    rules = [
        {"rule": "not_null", "col": "user_id"},
        {"rule": "in_range", "col": "value", "lo": 0.0, "hi": 50.0},
        {"rule": "in_set", "col": "event_type", "values": ["view", "click", "purchase"]},
        {"rule": "matches", "col": "props", "pattern": '"k": [0-9]+'},
        {"rule": "unique", "col": "event_id"},
    ]
    return validate_rules(ds, rules)


@q(
    "event_type_pagerank",
    sql="""
    WITH raw AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
      FROM events
    ),
    e AS (SELECT DISTINCT src, dst FROM raw WHERE dst IS NOT NULL),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM e UNION SELECT dst FROM e)),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
    r1 AS (
      SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.w, 0) AS r
      FROM nodes nd CROSS JOIN nn LEFT JOIN (
        SELECT e.dst AS node, sum(r0.r / deg.outdeg) AS w
        FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) s USING (node)
    ),
    r2 AS (
      SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.w, 0) AS r
      FROM nodes nd CROSS JOIN nn LEFT JOIN (
        SELECT e.dst AS node, sum(r1.r / deg.outdeg) AS w
        FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) s USING (node)
    ),
    r3 AS (
      SELECT nd.node, (1 - 0.85) / nn.n + 0.85 * coalesce(s.w, 0) AS r
      FROM nodes nd CROSS JOIN nn LEFT JOIN (
        SELECT e.dst AS node, sum(r2.r / deg.outdeg) AS w
        FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst) s USING (node)
    )
    SELECT node, round(r, 6) AS rank FROM r3 ORDER BY node
    """,
)
def event_type_pagerank(sf_dir: str):
    """Iterative PageRank (stages/graph.pagerank) over the directed
    event-type transition graph: 3 power iterations, damping 0.85, no
    dangling redistribution — each iteration streams the edge list through
    one pre-aggregated contribution pass + dst groupby while the
    node-cardinality rank vector broadcasts. The SQL oracle unrolls the
    same recurrence through 3 CTE join rounds."""
    from perfect_bloomfilter_ray.stages.graph import pagerank
    from perfect_bloomfilter_ray.stages.windows import transition_counts

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    edges = transition_counts(
        ds, "user_id", "ts", "event_type", tie_cols=["event_id"]
    ).map_batches(
        lambda t: pa.table({"src": t.column("state_from"), "dst": t.column("state_to")}),
        batch_format="pyarrow",
    )
    out = pagerank(edges, iters=3, damping=0.85)
    out["rank"] = np.round(out["rank"].to_numpy(dtype=np.float64), 6)
    return out.rename(columns={"node": "node"})


@q(
    "events_grouping_sets",
    sql="""
    SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events
    GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
    ORDER BY event_type NULLS FIRST, day NULLS FIRST
    """,
)
def events_grouping_sets(sf_dir: str):
    """GROUPING SETS (the general form behind the existing CUBE/ROLLUP
    queries): ONE distributed pass computes the finest (event_type, day)
    aggregate; every requested coarser set re-aggregates the tiny finest
    table driver-side — the fact table is never re-scanned per set."""
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"), format="%Y-%m-%d")
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": day,
                "value": t.column("value"),
            }
        )

    finest = (
        _t(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total"))
        .to_pandas()
    )
    sets = [["event_type", "day"], ["event_type"], ["day"]]
    levels = []
    for keys in sets:
        if keys == ["event_type", "day"]:
            g = finest.copy()
        else:
            g = finest.groupby(keys, as_index=False)[["n", "total"]].sum()
        for missing in ("event_type", "day"):
            if missing not in keys:
                g[missing] = None
        levels.append(g[["event_type", "day", "n", "total"]])
    out = pd.concat(levels, ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out = _round(out, {"total": 2})
    return (
        out.sort_values(["event_type", "day"], na_position="first")
        .reset_index(drop=True)
    )


@q(
    "docs_train_val_test_split",
    sql="""
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                  WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
    FROM s GROUP BY split, lang ORDER BY split, lang
    """,
)
def docs_train_val_test_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split (multiplicative-hash
    residue on the id — engine-portable, rerun-stable, leakage-free because
    assignment depends only on the id): a map-only pass tags every row, a
    tiny groupby reports the per-(split, lang) composition. The assignment
    column is what a shard writer partitions by."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def tag(t: pa.Table) -> pa.Table:
        r = (t.column("doc_id").to_numpy().astype(np.int64) * 2654435761) % 100
        split = np.where(r < 80, "train", np.where(r < 90, "val", "test"))
        return t.append_column("split", pa.array(split))

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby(["split", "lang"])
        .aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="chars"))
        .to_pandas()
        .sort_values(["split", "lang"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    out["chars"] = out["chars"].astype("int64")
    return out


@q("user_value_ewma")
def user_value_ewma(sf_dir: str):
    """Per-user EWMA of event values (stages/windows.ewma, α=0.3, pandas
    adjust=False semantics) — rows-only: the recursion has no portable SQL
    form; pandas parity is property-tested. A deterministic 1-in-11 event
    slice keeps the checked output small (smoothing always runs over the
    full per-user stream before slicing)."""
    from perfect_bloomfilter_ray.stages.windows import ewma

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = ewma(ds, "user_id", "ts", "value", alpha=0.3, tie_cols=["event_id"])

    def fin(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy().astype(np.int64)
        t = t.filter(pa.array(ids % 11 == 0))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "ewma": pa.array(np.round(t.column("ewma").to_numpy(zero_copy_only=False), 6)),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow").sort("event_id")


# ---------------------------------------------------------------------------
# Round-3 additions
# ---------------------------------------------------------------------------


@q(
    "selfjoin_size_users_exact",
    sql="""
    SELECT CAST(sum(c * c) AS BIGINT) AS f2, CAST(count(*) AS BIGINT) AS n_keys
    FROM (SELECT count(*) AS c FROM events GROUP BY user_id)
    """,
)
def selfjoin_size_users_exact(sf_dir: str):
    """Exact self-join size F2 = Σ count(key)² — the quantity a planner
    needs to size a self-equi-join's exchange and detect skew. Per-batch
    partial counts collapse the shuffle to one row per (batch, key); the
    exact twin of `f2_selfjoin_size_est`'s AMS sketch."""
    import polars as pl

    ds = _t(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).group_by("user_id").len(name="c").to_arrow()

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("c", alias_name="c"))
    )

    def square(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy().astype(np.int64)
        return pa.table({"f2p": pa.array([int((c * c).sum())]), "kp": pa.array([len(c)])})

    agg = counts.map_batches(square, batch_format="pyarrow")
    row = agg.sum(["f2p", "kp"])
    return pd.DataFrame({"f2": [int(row["sum(f2p)"])], "n_keys": [int(row["sum(kp)"])]})


@q("f2_selfjoin_size_est")
def f2_selfjoin_size_est(sf_dir: str):
    """AMS/Fast-AMS F2 sketch estimate of the events.user_id self-join size
    (state/ams.py: linear Count-Sketch counters, byte-exact mergeable) —
    rows-only: the estimate is error-bounded in pytest against the exact F2;
    `selfjoin_size_users_exact` is the SQL twin."""
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.ams import AMSSketch

    ds = _t(sf_dir, "events", ["user_id"])
    s = sketch_global(ds, "user_id", lambda: AMSSketch(width=2048, depth=5), name="ams")
    return pd.DataFrame(
        {
            "f2_est": [s.estimate_f2()],
            "rel_error_bound": [s.rel_error],
            "total_updates": [s.total],
        }
    )


@q(
    "user_event_entropy",
    sql="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS c FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_types,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
    FROM c GROUP BY user_id ORDER BY user_id
    """,
)
def user_event_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution (nats) — the
    behavioral-diversity signal (bot detection: near-zero entropy; mixture
    monitoring per corpus slice). H = ln(tot) − Σ c·ln(c)/tot over the
    grouped counts, so one pair-count shuffle + one tiny per-user groupby —
    the per-term ln is vectorized, never per-row Python."""
    import polars as pl

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).group_by(["user_id", "event_type"]).len(name="c").to_arrow()

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def terms(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy().astype(np.float64)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "c": t.column("c"),
                "clnc": pa.array(c * np.log(c)),
            }
        )

    out = (
        counts.map_batches(terms, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_types"),
            Sum("c", alias_name="tot"),
            Sum("clnc", alias_name="clnc"),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ent = np.log(out["tot"].to_numpy(dtype=np.float64)) - out["clnc"].to_numpy() / out[
        "tot"
    ].to_numpy(dtype=np.float64)
    res = pd.DataFrame(
        {
            "user_id": out["user_id"],
            "n_types": out["n_types"].astype("int64"),
            "entropy": np.round(ent, 6),
        }
    )
    return res


@q(
    "value_psi_train_val",
    sql="""
    WITH s AS (
      SELECT CASE WHEN value < 10 THEN 0 WHEN value < 25 THEN 1 WHEN value < 50 THEN 2
                  WHEN value < 100 THEN 3 WHEN value < 200 THEN 4 ELSE 5 END AS bin,
             CASE WHEN (user_id * 2654435761) % 10 < 8 THEN 1 ELSE 0 END AS tr
      FROM events
    ),
    b AS (SELECT bin, CAST(sum(tr) AS DOUBLE) AS na, CAST(sum(1 - tr) AS DOUBLE) AS nb
          FROM s GROUP BY bin),
    t AS (SELECT sum(na) AS ta, sum(nb) AS tb, count(*) AS k FROM b)
    SELECT bin, CAST(na AS BIGINT) AS n_train, CAST(nb AS BIGINT) AS n_val,
           round(((na+1)/(ta+k) - (nb+1)/(tb+k)) * ln(((na+1)/(ta+k)) / ((nb+1)/(tb+k))), 8)
             AS psi_term
    FROM b, t ORDER BY bin
    """,
)
def value_psi_train_val(sf_dir: str):
    """Population-stability-index drift check between the deterministic
    train/val user split: fixed-width value bins, Laplace-smoothed per-split
    shares, per-bin PSI term (Σ terms = the PSI). The distribution-drift
    gate a 100 TB ingest pipeline runs between corpus snapshots — one
    map-only binning pass + a 6-row groupby; no row ever leaves its block."""
    ds = _t(sf_dir, "events", ["user_id", "value"])
    edges = np.array([10.0, 25.0, 50.0, 100.0, 200.0])

    def tag(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, v, side="right").astype(np.int64)
        tr = ((t.column("user_id").to_numpy() * 2654435761) % 10 < 8).astype(np.int64)
        return pa.table({"bin": pa.array(b), "tr": pa.array(tr)})

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="n"), Sum("tr", alias_name="na"))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    na = out["na"].to_numpy(dtype=np.float64)
    nb = out["n"].to_numpy(dtype=np.float64) - na
    ta, tb, k = na.sum(), nb.sum(), float(len(out))
    p, qq = (na + 1) / (ta + k), (nb + 1) / (tb + k)
    return pd.DataFrame(
        {
            "bin": out["bin"].astype("int64"),
            "n_train": na.astype("int64"),
            "n_val": nb.astype("int64"),
            "psi_term": np.round((p - qq) * np.log(p / qq), 8),
        }
    )


@q(
    "priority_sample_docs",
    sql="""
    SELECT doc_id, lang, n_chars, (doc_id * 2654435761) % 1000000007 AS pri
    FROM documents ORDER BY pri, doc_id LIMIT 100
    """,
)
def priority_sample_docs(sf_dir: str):
    """Exact-size uniform sample without replacement (bottom-k priority
    sampling): order every row by a deterministic key hash, keep the global
    k smallest via per-block partial top-k + one merge task
    (stages/topk.global_top_k) — no full sort, no range shuffle, mergeable
    and rerun-stable, unlike reservoir sampling under re-partitioning."""
    from perfect_bloomfilter_ray.stages.topk import global_top_k

    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pri(t: pa.Table) -> pa.Table:
        p = (t.column("doc_id").to_numpy() * 2654435761) % 1000000007
        return t.append_column("pri", pa.array(p.astype(np.int64)))

    out = global_top_k(
        ds.map_batches(pri, batch_format="pyarrow"), "pri", 100, tie_cols=["doc_id"]
    )
    return out.to_pandas().sort_values(["pri", "doc_id"]).reset_index(drop=True)


@q(
    "bloom_decontaminated_docs",
    sql="""
    WITH toks AS (
      SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ),
    bench AS (SELECT * FROM toks WHERE (doc_id * 2654435761) % 10 = 3),
    corp  AS (SELECT * FROM toks WHERE (doc_id * 2654435761) % 10 <> 3),
    bgrams AS (
      SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS g
      FROM (SELECT t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM bench WHERE len(t) >= 5)
    ),
    cg AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM corp WHERE len(t) >= 5)
    ),
    contaminated AS (SELECT DISTINCT c.doc_id FROM cg c JOIN bgrams b USING (g))
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM contaminated)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
    FROM corp GROUP BY lang ORDER BY lang
    """,
)
def bloom_decontaminated_docs(sf_dir: str):
    """`decontaminated_docs` through the BLOOM-PREFILTER scale path
    (stages/decontam.decontaminate_bloom): the cascading Bloom filter is
    built over the benchmark's n-gram fingerprints by tree-reduce, corpus
    n-grams probe it shuffle-free, and only Bloom-positive (doc, gram) pairs
    are exact-verified by a distributed hash join — false positives die in
    the join, so the result (and the SQL oracle) is IDENTICAL to the exact
    broadcast path while broadcasting ~4x fewer bytes."""
    from perfect_bloomfilter_ray.stages.decontam import decontaminate_bloom

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def split(bench_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy().astype(np.int64)
            m = (ids * 2654435761) % 10 == 3
            return t.filter(pa.array(m if bench_side else ~m))

        return fn

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    corp = docs.map_batches(split(False), batch_format="pyarrow")
    flagged = decontaminate_bloom(corp, bench, n=5, drop=False)

    def to_int(t: pa.Table) -> pa.Table:
        return t.append_column("c_int", pc.cast(t.column("contaminated"), pa.int64()))

    return (
        flagged.map_batches(to_int, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("c_int", alias_name="n_contaminated"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )


@q(
    "prefix_hamming_pairs",
    sql="""
    WITH d AS (
      SELECT doc_id, source, n_chars // 64 AS lb,
             rpad(substr(lower(text), 1, 24), 24, '~') AS pfx
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(hamming(a.pfx, b.pfx) AS BIGINT) AS dist
    FROM d a JOIN d b ON a.source = b.source AND a.lb = b.lb AND a.doc_id < b.doc_id
    WHERE hamming(a.pfx, b.pfx) <= 3
    ORDER BY id_a, id_b
    """,
)
def prefix_hamming_pairs(sf_dir: str):
    """Blocked fuzzy-match pair join (stages/fuzzy.py): within
    (source, length-bucket) blocks, emit document pairs whose 24-char
    lowercased text prefixes differ in ≤ 3 positions — entity-resolution
    blocking; the block keys are the documented recall/partitioning
    assumption. Exact SQL oracle via DuckDB's hamming()."""
    from perfect_bloomfilter_ray.stages.fuzzy import blocked_hamming_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"])

    def lb(t: pa.Table) -> pa.Table:
        return t.append_column(
            "lb", pa.array(t.column("n_chars").to_numpy() // 64, pa.int64())
        )

    out = blocked_hamming_pairs(
        ds.map_batches(lb, batch_format="pyarrow"),
        id_col="doc_id",
        text_col="text",
        block_cols=["source", "lb"],
        prefix_len=24,
        max_dist=3,
    )
    df = out.to_pandas()
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True) if len(df) else df


@q(
    "token_posting_lists",
    sql="""
    WITH n AS (SELECT count(*) AS nd FROM documents),
    toks AS (
      SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY token),
    sel AS (SELECT token, df FROM df, n WHERE df * 10 BETWEEN 5 * nd AND 9 * nd),
    r AS (
      SELECT t.token, t.doc_id,
             row_number() OVER (PARTITION BY t.token ORDER BY t.doc_id) AS rn
      FROM toks t JOIN sel USING (token)
    )
    SELECT r.token, s.df,
           string_agg(CAST(r.doc_id AS VARCHAR), ',' ORDER BY r.doc_id) AS postings
    FROM r JOIN sel s ON r.token = s.token
    WHERE r.rn <= 8
    GROUP BY r.token, s.df ORDER BY r.token
    """,
)
def token_posting_lists(sf_dir: str):
    """Inverted-index build (search-index shape): distinct (token, doc)
    postings, document frequency per token, and the first 8 doc ids as the
    stored posting prefix — restricted to a RELATIVE df band [0.5n, 0.9n]
    (too-common and too-rare tokens are index noise; relative so the band is
    scale-invariant). One distinct-pair shuffle + a broadcast of the
    selected-token dictionary + the partial-top-k combiner; the full posting
    lists never materialize anywhere."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join
    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.with_columns(
                pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]+").alias("token")
            )
            .drop("text")
            .explode("token")
            .drop_nulls()
            .unique()
        )
        return out.select(["token", "doc_id"]).to_arrow()

    pairs = (
        docs.map_batches(toks, batch_format="pyarrow")
        .groupby(["token", "doc_id"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    pairs = pairs.materialize()  # reused by the df count AND the top-k pass
    nd = docs.count()
    dfc = pairs.groupby("token").aggregate(Count(alias_name="df"))

    def band(t: pa.Table) -> pa.Table:
        d = t.column("df").to_numpy().astype(np.int64)
        return t.filter(pa.array((d * 10 >= 5 * nd) & (d * 10 <= 9 * nd)))

    sel = dfc.map_batches(band, batch_format="pyarrow")
    in_band = broadcast_lookup_join(pairs, sel, on="token")
    top = grouped_top_k(in_band, ["token"], "doc_id", 8, descending=False, tie_cols=[])
    df = top.to_pandas()
    if not len(df):
        return pd.DataFrame({"token": [], "df": [], "postings": []})
    out = (
        df.sort_values(["token", "doc_id"])
        .groupby(["token", "df"], as_index=False)
        .agg(postings=("doc_id", lambda s: ",".join(str(x) for x in s)))
        [["token", "df", "postings"]]
        .sort_values("token")
        .reset_index(drop=True)
    )
    out["df"] = out["df"].astype("int64")
    return out


@q(
    "geo_mean_value_per_type",
    sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(exp(avg(ln(value))), 6) AS geo_mean,
           round(count(*) / sum(1.0 / value), 6) AS harm_mean
    FROM events WHERE value > 0 GROUP BY event_type ORDER BY event_type
    """,
)
def geo_mean_value_per_type(sf_dir: str):
    """Grouped geometric + harmonic means — the log-domain aggregate family
    (rate/ratio metrics where the arithmetic mean lies). Partials are plain
    Σln(v) and Σ1/v per group, so the whole thing is one map + one tiny
    groupby, same cost as an avg. Non-positive values are excluded (both
    means are undefined there), matching the oracle's WHERE."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def terms(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        pos = v > 0
        v = v[pos]
        return pa.table(
            {
                "event_type": t.column("event_type").filter(pa.array(pos)),
                "lnv": pa.array(np.log(v)),
                "inv": pa.array(1.0 / v),
            }
        )

    out = (
        ds.map_batches(terms, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("lnv", alias_name="lnv"),
            Sum("inv", alias_name="inv"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    n = out["n"].to_numpy(dtype=np.float64)
    res = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "n": out["n"].astype("int64"),
            "geo_mean": np.round(np.exp(out["lnv"].to_numpy() / n), 6),
            "harm_mean": np.round(n / out["inv"].to_numpy(), 6),
        }
    )
    return res


@q(
    "temperature_sampled_langs",
    sql="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT max(pow(n, 0.5)) AS mx FROM c),
    p AS (SELECT lang, pow(n, 0.5) / mx AS keep_p FROM c, m)
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
    FROM documents d JOIN p USING (lang)
    WHERE ((d.doc_id * 2654435761) % 1000000) / 1000000.0 < p.keep_p
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def temperature_sampled_langs(sf_dir: str):
    """Temperature-scaled language mixing (mT5/XLM-R α-sampling, α=0.5):
    per-language keep probability ∝ n_lang^α normalized by the largest, so
    low-resource languages are up-weighted relative to their share. The
    per-row decision is a deterministic hash threshold (rerun-stable,
    leakage-free); the language histogram is a tiny groupby broadcast back
    as a keep_p lookup — no shuffle touches the corpus rows."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang"])
    counts = ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    pw = np.power(counts["n"].to_numpy(dtype=np.float64), 0.5)
    lang_keys = pa.array(counts["lang"].tolist())
    lang_p = pw / pw.max()

    def keep(t: pa.Table) -> pa.Table:
        u = ((t.column("doc_id").to_numpy() * 2654435761) % 1000000) / 1000000.0
        idx = pc.index_in(t.column("lang"), value_set=lang_keys).to_numpy(zero_copy_only=False)
        p = lang_p[idx]
        return t.filter(pa.array(u < p))

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_kept"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    return out


@q(
    "importance_sampled_docs",
    sql="""
    WITH m AS (SELECT max(n_chars) AS mx FROM documents)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM documents, m
    WHERE ((doc_id * 2654435761) % 1000000) / 1000000.0 < CAST(n_chars AS DOUBLE) / mx
    GROUP BY lang ORDER BY lang
    """,
)
def importance_sampled_docs(sf_dir: str):
    """Per-document importance resampling (DSIR shape): keep probability
    proportional to a per-doc weight (here length; in production a quality
    or domain-relevance score), decided by the same deterministic hash
    threshold as every sampler in the library. One tiny global max broadcast
    + one map-only pass."""
    ds = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    mx = float(ds.max("n_chars"))

    def keep(t: pa.Table) -> pa.Table:
        u = ((t.column("doc_id").to_numpy() * 2654435761) % 1000000) / 1000000.0
        w = t.column("n_chars").to_numpy().astype(np.float64) / mx
        return t.filter(pa.array(u < w))

    out = (
        ds.map_batches(keep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Count(alias_name="n_kept"), Sum("n_chars", alias_name="chars_kept"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["chars_kept"] = out["chars_kept"].astype("int64")
    return out


@q(
    "trending_event_types_hourly",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT hour, event_type, n,
                 row_number() OVER (PARTITION BY hour ORDER BY n DESC, event_type) AS rnk
          FROM h)
    SELECT hour, event_type, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3 ORDER BY hour, rnk
    """,
)
def trending_event_types_hourly(sf_dir: str):
    """Trending items per time window: hourly (bucket, type) counts, then
    top-3 types per hour through the partial-top-k combiner — the
    leaderboard query every event pipeline runs; composition of the
    time-bucket and grouped-top-k operators."""
    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.table({"hour": hour, "event_type": t.column("event_type")})

    counts = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n"))
    )
    top = grouped_top_k(counts, ["hour"], "n", 3, descending=True, tie_cols=["event_type"])
    df = top.to_pandas().sort_values(["hour", "n", "event_type"], ascending=[True, False, True])
    df["rnk"] = df.groupby("hour").cumcount() + 1
    df["n"] = df["n"].astype("int64")
    df["rnk"] = df["rnk"].astype("int64")
    return df.reset_index(drop=True)


@q(
    "schema_evolution_union",
    sql="""
    WITH a AS (SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0),
    b AS (SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 2 = 1),
    u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(count(lang) AS BIGINT) AS n_lang,
           CAST(count(source) AS BIGINT) AS n_source, CAST(sum(n_chars) AS BIGINT) AS chars
    FROM u
    """,
)
def schema_evolution_union(sf_dir: str):
    """Schema-evolution-tolerant ingest: two corpus snapshots whose schemas
    drifted (one kept `lang`, the other added `source`) concatenated with
    UNION ALL BY NAME semantics (stages/setops.union_by_name — typed null
    padding inside map_batches, no shuffle), then profiled. The everyday
    shape of multi-vintage data lakes."""
    from perfect_bloomfilter_ray.stages.setops import union_by_name

    def half(even: bool, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            return t.filter(pa.array((ids % 2 == 0) == even)).select(cols)

        return fn

    a = _t(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        half(True, ["doc_id", "lang", "n_chars"]), batch_format="pyarrow"
    )
    b = _t(sf_dir, "documents", ["doc_id", "source", "n_chars"]).map_batches(
        half(False, ["doc_id", "source", "n_chars"]), batch_format="pyarrow"
    )
    u = union_by_name(a, b)

    def profile(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "np": pa.array([len(t)]),
                "nl": pa.array([len(t) - t.column("lang").null_count]),
                "ns": pa.array([len(t) - t.column("source").null_count]),
                "ch": pa.array([int(pc.sum(t.column("n_chars")).as_py() or 0)]),
            }
        )

    row = u.map_batches(profile, batch_format="pyarrow").sum(["np", "nl", "ns", "ch"])
    return pd.DataFrame(
        {
            "n": [int(row["sum(np)"])],
            "n_lang": [int(row["sum(nl)"])],
            "n_source": [int(row["sum(ns)"])],
            "chars": [int(row["sum(ch)"])],
        }
    )


@q(
    "value_trend_per_type",
    sql="""
    WITH s AS (
      SELECT event_type,
             CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS DOUBLE)
               / 3600000000.0 AS x,
             value AS y
      FROM events
    ),
    a AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
          FROM s GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
           round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS intercept,
           round(pow(n*sxy - sx*sy, 2) / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
    FROM a ORDER BY event_type
    """,
)
def value_trend_per_type(sf_dir: str):
    """Grouped OLS trend (stages/agg.grouped_ols): slope of value over time
    (per hour) per event type, from mergeable raw power sums — the
    drift/trend detector a monitoring pipeline runs per slice. x is hours
    since a fixed origin on BOTH sides (raw epoch-µs squared would leave
    float64's exact-integer range)."""
    from perfect_bloomfilter_ray.stages.agg import grouped_ols, ols_finalize

    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])
    origin_us = pd.Timestamp("2024-01-01").value // 1000

    def xy(t: pa.Table) -> pa.Table:
        x = (t.column("ts").cast(pa.int64()).to_numpy() - origin_us) / 3.6e9
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": pa.array(x),
                "y": t.column("value"),
            }
        )

    sums = (
        grouped_ols(ds.map_batches(xy, batch_format="pyarrow"), "event_type", "x", "y")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    fin = ols_finalize(sums, ndigits=6)
    return pd.concat([sums[["event_type"]], fin], axis=1)


@q(
    "value_shape_stats_per_type",
    sql="""
    WITH a AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
             sum(value) AS s1, sum(value*value) AS s2,
             sum(value*value*value) AS s3, sum(value*value*value*value) AS s4
      FROM events GROUP BY event_type
    ),
    m AS (SELECT event_type, n, s1/n AS mu,
                 s2/n - (s1/n)*(s1/n) AS m2,
                 s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3,
                 s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                      - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
          FROM a)
    SELECT event_type, CAST(n AS BIGINT) AS n, round(mu, 6) AS mean_value,
           round(m3 / pow(m2, 1.5), 6) AS skew,
           round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM m ORDER BY event_type
    """,
)
def value_shape_stats_per_type(sf_dir: str):
    """Grouped distribution-shape moments (population skewness + excess
    kurtosis) from raw power sums Σv..Σv⁴ — mergeable one-pass partials,
    the tail-shape signal for outlier policies. The oracle computes the
    IDENTICAL central-moment expansion, so only summation order differs."""
    import polars as pl

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        v = pl.col("value")
        return (
            df.group_by("event_type")
            .agg(
                pl.len().alias("n"),
                v.sum().alias("s1"),
                (v**2).sum().alias("s2"),
                (v**3).sum().alias("s3"),
                (v**4).sum().alias("s4"),
            )
            .to_arrow()
        )

    sums = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
            Sum("s3", alias_name="s3"),
            Sum("s4", alias_name="s4"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    n = sums["n"].to_numpy(dtype=np.float64)
    s1, s2 = sums["s1"].to_numpy(), sums["s2"].to_numpy()
    s3, s4 = sums["s3"].to_numpy(), sums["s4"].to_numpy()
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu
    m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu
    return pd.DataFrame(
        {
            "event_type": sums["event_type"],
            "n": sums["n"].astype("int64"),
            "mean_value": np.round(mu, 6),
            "skew": np.round(m3 / np.power(m2, 1.5), 6),
            "excess_kurtosis": np.round(m4 / (m2 * m2) - 3, 6),
        }
    )


@q(
    "nation_revenue_share",
    sql="""
    WITH r AS (
      SELECT n.n_name AS nation, sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT nation, round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (), 6) AS share
    FROM r ORDER BY nation
    """,
)
def nation_revenue_share(sf_dir: str):
    """Percent-of-total contribution analysis: revenue per nation and its
    share of the global total. Fact-to-dim resolution via the broadcast
    lookup join (customer→nation never shuffles the orders stream); the
    window-over-aggregate total is computed on the 25-row result."""
    from perfect_bloomfilter_ray.stages.joins import broadcast_lookup_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"])
    j = broadcast_lookup_join(orders, cust, on="o_custkey", right_on="c_custkey")
    j = broadcast_lookup_join(j, nation, on="c_nationkey", right_on="n_nationkey")
    out = (
        j.groupby("n_name")
        .aggregate(Sum("o_totalprice", alias_name="revenue"))
        .to_pandas()
        .rename(columns={"n_name": "nation"})
        .sort_values("nation")
        .reset_index(drop=True)
    )
    total = out["revenue"].sum()
    out["share"] = np.round(out["revenue"] / total, 6)
    out["revenue"] = out["revenue"].round(2)
    return out


@q(
    "cumulative_user_adoption",
    sql="""
    WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS d FROM events GROUP BY user_id),
    c AS (SELECT d, count(*) AS new_users FROM f GROUP BY d)
    SELECT d, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT) AS cum_users
    FROM c ORDER BY d
    """,
)
def cumulative_user_adoption(sf_dir: str):
    """Adoption curve: first-touch day per user (groupby-min), new users per
    day, running cumulative total. The first-touch pass is the only shuffle
    (per-batch min partials); the cumsum runs over the ~30-row daily series
    on the driver."""
    import polars as pl

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def day_partial(t: pa.Table) -> pa.Table:
        d = pc.floor_temporal(t.column("ts"), unit="day")
        return (
            pl.from_arrow(pa.table({"user_id": t.column("user_id"), "d": d}))
            .group_by("user_id")
            .agg(pl.col("d").min())
            .to_arrow()
        )

    first = (
        ds.map_batches(day_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("d", alias_name="d"))
    )
    daily = (
        first.groupby("d")
        .aggregate(Count(alias_name="new_users"))
        .to_pandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    daily["new_users"] = daily["new_users"].astype("int64")
    daily["cum_users"] = daily["new_users"].cumsum().astype("int64")
    return daily


@q(
    "weighted_avg_price_per_flag",
    sql="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wavg_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def weighted_avg_price_per_flag(sf_dir: str):
    """Frequency-weighted grouped mean (weight = quantity): the aggregate
    shape for unit-price-over-volume metrics. Partials are Σw·x and Σw —
    mergeable, one scan, one tiny groupby."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def wterms(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "wx": pc.multiply(t.column("l_extendedprice"), t.column("l_quantity")),
                "w": t.column("l_quantity"),
            }
        )

    out = (
        ds.map_batches(wterms, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("wx", alias_name="wx"), Sum("w", alias_name="w"), Count(alias_name="n")
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    res = pd.DataFrame(
        {
            "l_returnflag": out["l_returnflag"],
            "wavg_price": np.round(out["wx"] / out["w"], 6),
            "n": out["n"].astype("int64"),
        }
    )
    return res


@q(
    "region_nation_cross",
    sql="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    ORDER BY r_name, n_name
    """,
)
def region_nation_cross(sf_dir: str):
    """Cartesian dimension enumeration via the broadcast cross join
    (stages/joins.cross_join_broadcast): every row × every variant — the
    shape for config/bucket expansion before a coverage check."""
    from perfect_bloomfilter_ray.stages.joins import cross_join_broadcast

    region = _t(sf_dir, "region", ["r_name"])
    nation = _t(sf_dir, "nation", ["n_name"])
    out = cross_join_broadcast(region, nation).to_pandas()
    return out.sort_values(["r_name", "n_name"]).reset_index(drop=True)


@q(
    "user_interarrival_stats",
    sql="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id, CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(sum(gap_us) // count(gap_us) AS BIGINT) AS mean_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL GROUP BY user_id ORDER BY user_id
    """,
)
def user_interarrival_stats(sf_dir: str):
    """Per-user inter-arrival gap statistics (activity cadence / bot
    signal): consecutive-event time deltas within each user's ordered
    stream, aggregated to count / mean / max. Same co-partitioned window
    shape as the lag/lead trio: coarse hash partition on user, one
    vectorized lexsort+diff pass per partition, then a tiny per-user
    groupby of gap partials. The mean is floor-division microseconds —
    integer-exact on both sides (a float mean can land on an exact .5 and
    split between banker's and half-away rounding)."""
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
    from perfect_bloomfilter_ray.stages.windows import _add_part

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id"])
    nb = choose_num_blocks(ds)

    def gaps(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        if len(t) == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "gap_us": pa.array([], pa.int64())}
            )
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        eid = t.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        same = np.zeros(len(uid_s), dtype=bool)
        same[1:] = uid_s[1:] == uid_s[:-1]
        gap = np.empty(len(ts_s), dtype=np.int64)
        gap[1:] = ts_s[1:] - ts_s[:-1]
        keep = same
        return pa.table({"user_id": pa.array(uid_s[keep]), "gap_us": pa.array(gap[keep])})

    out = (
        _add_part(ds, "user_id", nb)
        .groupby("_part")
        .map_groups(gaps, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_gaps"),
            Sum("gap_us", alias_name="sum_gap"),
            Max("gap_us", alias_name="max_gap_us"),
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    res = pd.DataFrame(
        {
            "user_id": out["user_id"],
            "n_gaps": out["n_gaps"].astype("int64"),
            "mean_gap_us": (
                out["sum_gap"].to_numpy().astype(np.int64)
                // out["n_gaps"].to_numpy().astype(np.int64)
            ),
            "max_gap_us": out["max_gap_us"].astype("int64"),
        }
    )
    return res


@q(
    "knn_join_sampled",
    sql="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 7),
    p AS (SELECT q.qid, e.vec_id, q.qe, e.embedding AS ee
          FROM q, embeddings e WHERE e.vec_id <> q.qid),
    t AS (SELECT qid, vec_id,
                 list_sum(list_transform(list_zip(qe, ee),
                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dot,
                 list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS qq,
                 list_sum(list_transform(ee, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS cc
          FROM p),
    r AS (SELECT qid, vec_id, round(dot / (sqrt(qq) * sqrt(cc)), 6) AS cos,
                 row_number() OVER (PARTITION BY qid
                   ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 6) DESC, vec_id) AS rnk
          FROM t WHERE qq > 0 AND cc > 0)
    SELECT qid, vec_id, cos, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3 ORDER BY qid, rnk
    """,
)
def knn_join_sampled(sf_dir: str):
    """Exact kNN JOIN: a deterministic query slice of the embedding table
    joined to its own top-3 cosine neighbors (self excluded) — the
    similarity-search shape as a JOIN (dedup candidate mining, related-item
    retrieval) rather than a point lookup. Queries broadcast once; each
    block scores float64 cosine against every query, keeps a per-block
    partial top-k, the driver merges blocks×k rows. Ranking uses the
    ROUNDED cosine (6dp) + vec_id on both sides, so float 1-ulp noise can
    never flip a rank."""
    import ray

    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def is_q(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        return t.filter(pa.array(ids % 100 == 7))

    qt = pa.concat_tables(
        emb.map_batches(is_q, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    q_ids = qt.column("vec_id").to_numpy()
    q_mat = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    ref = ray.put((q_ids, q_mat, q_norm))
    k = 3

    def score(t: pa.Table) -> pa.Table:
        qi, qm, qn = ray.get(ref)
        ids = t.column("vec_id").to_numpy()
        emb_col = t.column("embedding")
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        flat = emb_col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        v = flat.reshape(len(t), -1)
        vn = np.sqrt((v * v).sum(axis=1))
        ok = vn > 0
        cos = np.round((v @ qm.T) / (vn[:, None] * qn[None, :]), 6)
        rows_q, rows_id, rows_cos = [], [], []
        for j in range(len(qi)):
            c = np.where(ok & (ids != qi[j]), cos[:, j], -np.inf)
            # tie-aware partial top-k: rounded cos desc, vec_id asc — keeps
            # the same rows the global rank would, even across equal scores
            order = np.lexsort((ids, -c))
            top = order[: min(k, len(order))]
            top = top[np.isfinite(c[top])]
            rows_q.append(np.full(len(top), qi[j], dtype=np.int64))
            rows_id.append(ids[top])
            rows_cos.append(c[top])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(rows_q)),
                "vec_id": pa.array(np.concatenate(rows_id)),
                "cos": pa.array(np.concatenate(rows_cos)),
            }
        )

    df = emb.map_batches(score, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["qid", "cos", "vec_id"], ascending=[True, False, True])
    df = df.groupby("qid", sort=True).head(k).reset_index(drop=True)
    df["rnk"] = df.groupby("qid").cumcount() + 1
    df["rnk"] = df["rnk"].astype("int64")
    return df


@q(
    "orders_snapshot_diff",
    sql="""
    WITH a AS (SELECT o_orderkey AS k, round(o_totalprice, 2) AS v
               FROM orders WHERE o_orderkey % 11 <> 0),
    b AS (SELECT o_orderkey AS k,
                 round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                            ELSE o_totalprice END, 2) AS v
          FROM orders WHERE o_orderkey % 13 <> 0),
    j AS (SELECT a.v AS va, b.v AS vb FROM a FULL OUTER JOIN b ON a.k = b.k)
    SELECT CAST(sum(CASE WHEN va IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
           CAST(sum(CASE WHEN vb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
           CAST(sum(CASE WHEN va IS NOT NULL AND vb IS NOT NULL AND va <> vb
                         THEN 1 ELSE 0 END) AS BIGINT) AS changed,
           CAST(sum(CASE WHEN va = vb THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
    FROM j
    """,
)
def orders_snapshot_diff(sf_dir: str):
    """Snapshot reconciliation (table diff by key): two deterministic
    'versions' of the orders table — one with rows missing, one with rows
    modified — full-outer-joined on the key, classified per row into
    added / removed / changed / unchanged, and counted. The nightly
    data-integrity diff between ingest snapshots; the join is Ray's hash
    join, the classification one vectorized pass of partials."""

    def version(bench: str):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy()
            v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
            if bench == "a":
                keep = k % 11 != 0
                vv = np.round(v, 2)
            else:
                keep = k % 13 != 0
                vv = np.round(np.where(k % 7 == 0, v + 1, v), 2)
            return pa.table({"k": pa.array(k[keep]), "v": pa.array(vv[keep])})

        return fn

    base = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    a = base.map_batches(version("a"), batch_format="pyarrow").materialize()
    b = base.map_batches(version("b"), batch_format="pyarrow")
    nparts = max(1, min(8, a.count() // 64))
    j = a.join(b, "full_outer", num_partitions=nparts, on=("k",), right_on=("k",), right_suffix="_b")

    def classify(t: pa.Table) -> pa.Table:
        va = t.column("v").to_numpy(zero_copy_only=False)
        vb = t.column("v_b").to_numpy(zero_copy_only=False)
        a_null, b_null = np.isnan(va), np.isnan(vb)
        both = ~a_null & ~b_null
        return pa.table(
            {
                "added": pa.array([int(a_null.sum())]),
                "removed": pa.array([int(b_null.sum())]),
                "changed": pa.array([int((both & (va != vb)).sum())]),
                "unchanged": pa.array([int((both & (va == vb)).sum())]),
            }
        )

    row = j.map_batches(classify, batch_format="pyarrow").sum(
        ["added", "removed", "changed", "unchanged"]
    )
    return pd.DataFrame(
        {
            "added": [int(row["sum(added)"])],
            "removed": [int(row["sum(removed)"])],
            "changed": [int(row["sum(changed)"])],
            "unchanged": [int(row["sum(unchanged)"])],
        }
    )


@q(
    "decayed_user_scores_exact",
    sql="""
    WITH w AS (
      SELECT user_id,
             exp(-((epoch_us(TIMESTAMP '2024-02-01') - epoch_us(ts)) / 3600000000.0)
                 / 168.0) AS wt
      FROM events
    )
    SELECT user_id, round(sum(wt), 6) AS decayed_score
    FROM w GROUP BY user_id
    ORDER BY round(sum(wt), 6) DESC, user_id LIMIT 10
    """,
)
def decayed_user_scores_exact(sf_dir: str):
    """Time-decayed activity ranking: each event contributes
    exp(-age/168h) at a fixed reference instant, summed per user — the
    'recent heavy hitters' metric (stale bursts fade, fresh activity
    dominates). Exact path: vectorized decay weights + per-batch partial
    sums; the CMS twin (`cms_decayed_heavy_users`) answers the same query
    from a fixed-size sketch with integer micro-unit weights."""
    import polars as pl

    ds = _t(sf_dir, "events", ["user_id", "ts"])
    ref_us = pd.Timestamp("2024-02-01").value // 1000

    def wts(t: pa.Table) -> pa.Table:
        age_h = (ref_us - t.column("ts").cast(pa.int64()).to_numpy()) / 3.6e9
        w = np.exp(-age_h / 168.0)
        return (
            pl.from_arrow(pa.table({"user_id": t.column("user_id"), "wt": pa.array(w)}))
            .group_by("user_id")
            .agg(pl.col("wt").sum())
            .to_arrow()
        )

    out = (
        ds.map_batches(wts, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("wt", alias_name="decayed_score"))
        .to_pandas()
    )
    out["decayed_score"] = np.round(out["decayed_score"], 6)
    out = out.sort_values(["decayed_score", "user_id"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


@q("cms_decayed_heavy_users")
def cms_decayed_heavy_users(sf_dir: str):
    """The sketch path of `decayed_user_scores_exact`: a count-min sketch
    updated with integer micro-unit decay weights (round(wt·1e6)) — fixed
    memory regardless of user cardinality, mergeable across partitions.
    Rows-only; the ε·total error bound vs the exact scores is asserted in
    pytest."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])
    ref_us = pd.Timestamp("2024-02-01").value // 1000

    def partial(t: pa.Table) -> pa.Table:
        from perfect_bloomfilter_ray.state.base import dumps_sketch
        from perfect_bloomfilter_ray.state.cms import CountMinSketch as CMS

        age_h = (ref_us - t.column("ts").cast(pa.int64()).to_numpy()) / 3.6e9
        w = np.round(np.exp(-age_h / 168.0) * 1e6).astype(np.int64)
        s = CMS(1e-4, 1e-3)
        s.update_column(t.column("user_id"), weights=w)
        return pa.table({"p": pa.array([dumps_sketch(s)], pa.binary())})

    from perfect_bloomfilter_ray.state.base import loads_sketch
    from perfect_bloomfilter_ray.state.cms import CountMinSketch as CMS

    parts = ds.map_batches(partial, batch_format="pyarrow")
    acc = CMS(1e-4, 1e-3)
    for row in parts.take_all():
        acc.merge(loads_sketch(row["p"]))

    udf = _t(sf_dir, "events", ["user_id"]).groupby("user_id").aggregate(Count()).to_pandas()
    ucol = pa.array(udf["user_id"].to_numpy())
    est = acc.estimate_column(ucol) / 1e6
    out = pd.DataFrame({"user_id": udf["user_id"], "decayed_score_est": np.round(est, 4)})
    return (
        out.sort_values(["decayed_score_est", "user_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


@q(
    "user_peak_minute_rate",
    sql="""
    WITH m AS (
      SELECT user_id, date_trunc('minute', ts) AS minute, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT user_id, minute, n,
                 row_number() OVER (PARTITION BY user_id ORDER BY n DESC, minute) AS rnk
          FROM m)
    SELECT user_id, minute AS peak_minute, CAST(n AS BIGINT) AS peak_rate
    FROM r WHERE rnk = 1 AND n >= 2 ORDER BY user_id
    """,
)
def user_peak_minute_rate(sf_dir: str):
    """Peak per-minute request rate per user (crawler politeness / burst
    detection): (user, minute) bucket counts, then the grouped top-1 via the
    partial-top-k combiner with a deterministic earliest-minute tie-break.
    Only bursty users (peak ≥ 2) surface."""
    from perfect_bloomfilter_ray.stages.topk import grouped_top_k

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "minute": pc.floor_temporal(t.column("ts"), unit="minute"),
            }
        )

    counts = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["user_id", "minute"])
        .aggregate(Count(alias_name="n"))
    )
    top = grouped_top_k(counts, ["user_id"], "n", 1, descending=True, tie_cols=["minute"])
    df = top.to_pandas()
    df = df[df["n"] >= 2].rename(columns={"minute": "peak_minute", "n": "peak_rate"})
    df["peak_rate"] = df["peak_rate"].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "peak_minute", "peak_rate"]
    ]


@q(
    "weekly_value_change_per_type",
    sql="""
    WITH w AS (
      SELECT event_type, date_trunc('week', ts) AS week, round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, total,
           round(total - lag(total) OVER (PARTITION BY event_type ORDER BY week), 2)
             AS wow_change
    FROM w ORDER BY event_type, week
    """,
)
def weekly_value_change_per_type(sf_dir: str):
    """Period-over-period trend report: weekly value totals per event type
    with week-over-week deltas. The heavy part (weekly sums) is one
    distributed groupby; the lag runs over the tiny (type × week) result."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "week": pc.floor_temporal(t.column("ts"), unit="week"),
                "value": t.column("value"),
            }
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "week"])
        .aggregate(Sum("value", alias_name="total"))
        .to_pandas()
        .sort_values(["event_type", "week"])
        .reset_index(drop=True)
    )
    out["total"] = out["total"].round(2)
    out["wow_change"] = (out["total"] - out.groupby("event_type")["total"].shift(1)).round(2)
    return out


@q(
    "cuckoo_membership_roundtrip",
    sql="""
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS inserted,
           CAST(count(DISTINCT user_id) AS BIGINT) AS members,
           CAST(0 AS BIGINT) AS false_negatives,
           CAST(count(DISTINCT user_id) AS BIGINT) AS deleted,
           CAST(0 AS BIGINT) AS post_delete_members
    FROM events
    """,
)
def cuckoo_membership_roundtrip(sf_dir: str):
    """Cuckoo-filter conformance (Fan et al. 2014): insert→check→DELETE→check
    over the distinct event users. The SQL oracle encodes the deterministic
    contract: members == inserted (a cuckoo filter has no false negatives),
    and after deleting every inserted key the table is EMPTY — post-delete
    membership is exactly 0, the capability the reference's Bloom tiers
    (`filter.rs`, add-only bits) cannot express at all. The distinct-key set
    and the distributed build/check run as Dataset stages; deletion mutates
    ONE filter object and therefore streams id-only batches through it
    sequentially (a shared-mutable-state op by nature, documented)."""
    import ray

    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.cuckoo import CuckooFilter

    distinct = (
        _t(sf_dir, "events", ["user_id"]).groupby("user_id").count().drop_columns(["count()"])
    ).materialize()
    n = distinct.count()
    filt = sketch_global(distinct, "user_id", lambda: CuckooFilter.for_capacity(max(1024, n)))
    ref = ray.put(filt.to_bytes())

    def member_partial(t: pa.Table) -> pa.Table:
        f = CuckooFilter.from_bytes(ray.get(ref))
        return pa.table({"m": pa.array([int(f.contains_column(t.column("user_id")).sum())])})

    n_member = int(distinct.map_batches(member_partial, batch_format="pyarrow").sum("m"))
    n_deleted = 0
    for b in distinct.iter_batches(batch_format="pyarrow", batch_size=65536):
        n_deleted += int(filt.delete_column(b.column("user_id")).sum())
    post = int((filt.buckets != 0).sum())  # empty table => 0 members for ANY probe
    return pd.DataFrame(
        {
            "inserted": [n],
            "members": [n_member],
            "false_negatives": [n - n_member],
            "deleted": [n_deleted],
            "post_delete_members": [post],
        }
    )


@q("dd_value_quantiles_per_type")
def dd_value_quantiles_per_type(sf_dir: str):
    """Grouped DDSketch (relative-error quantiles, Masson et al. VLDB'19) per
    event type via the two-phase partial/merge shuffle tree. Rows-only; the
    exact twin is exact_value_quantiles_per_type, and the guarantee differs
    from KLL/t-digest: value error <= alpha RELATIVE, the right contract for
    long-tailed metrics. Merge is per-bucket addition — exactly
    associative/commutative, the best fit for Ray's pairwise combine tree."""
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped
    from perfect_bloomfilter_ray.state.ddsketch import DDSketch

    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = sketch_grouped(
        ds, key="event_type", col="value", factory=lambda: DDSketch(0.01), name="dd"
    ).to_pandas()
    sk = [DDSketch.from_bytes(b) for b in out["dd"]]
    return pd.DataFrame(
        {
            "event_type": out["event_type"],
            "p50_est": [s.quantile(0.5) for s in sk],
            "p95_est": [s.quantile(0.95) for s in sk],
            "p99_est": [s.quantile(0.99) for s in sk],
        }
    ).sort_values("event_type").reset_index(drop=True)


@q(
    "join_size_users_exact",
    sql="""
    WITH pu AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
             CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_n
      FROM events GROUP BY user_id
    )
    SELECT CAST(sum(a_n) AS BIGINT) AS a_rows, CAST(sum(b_n) AS BIGINT) AS b_rows,
           CAST(sum(a_n * b_n) AS BIGINT) AS join_size
    FROM pu
    """,
)
def join_size_users_exact(sf_dir: str):
    """Exact equi-join cardinality |A ⋈ B| between the two deterministic
    event halves, WITHOUT running the join: per-key count partials on both
    sides in one pass, then Σ a_n·b_n. One groupby exchange over (user, 2
    ints) instead of materializing the (possibly quadratic) join output —
    the planner-statistics shape. Sketch twin: cms_join_size_users."""
    ds = _t(sf_dir, "events", ["event_id", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"user_id": t.column("user_id"), "eid": t.column("event_id")}))
        return (
            df.group_by("user_id")
            .agg(
                (pl.col("eid") % 2 == 0).sum().cast(pl.Int64).alias("a_n"),
                (pl.col("eid") % 2 == 1).sum().cast(pl.Int64).alias("b_n"),
            )
            .to_arrow()
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("a_n", alias_name="a_n"), Sum("b_n", alias_name="b_n"))
    )

    def prod(t: pa.Table) -> pa.Table:
        a = t.column("a_n").to_numpy()
        b = t.column("b_n").to_numpy()
        return pa.table(
            {
                "a_rows": pa.array([int(a.sum())], pa.int64()),
                "b_rows": pa.array([int(b.sum())], pa.int64()),
                "join_size": pa.array([int((a * b).sum())], pa.int64()),
            }
        )

    parts = per_user.map_batches(prod, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "a_rows": [int(parts["a_rows"].sum())],
            "b_rows": [int(parts["b_rows"].sum())],
            "join_size": [int(parts["join_size"].sum())],
        }
    )


@q("cms_join_size_users")
def cms_join_size_users(sf_dir: str):
    """Join-size ESTIMATION from two independently-built CMS sketches
    (Cormode & Muthukrishnan 2005 inner product): each event half builds its
    own count-min over user_id by tree-reduce; the estimate is min over rows
    of the counter dot product — never under, over by <= ε·N_A·N_B w.p.
    1-δ. Rows-only; exact twin join_size_users_exact. This is the shape a
    distributed optimizer uses to size a join it has not run."""
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.cms import CountMinSketch

    ds = _t(sf_dir, "events", ["event_id", "user_id"])

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(t.column("event_id"), pa.scalar(1)), pa.scalar(parity))
            return t.filter(m)

        return fn

    mk = lambda: CountMinSketch(eps=3e-5, delta=0.01)  # noqa: E731
    a = sketch_global(ds.map_batches(half(0), batch_format="pyarrow"), "user_id", mk)
    b = sketch_global(ds.map_batches(half(1), batch_format="pyarrow"), "user_id", mk)
    return pd.DataFrame(
        {
            "a_rows": [a.total],
            "b_rows": [b.total],
            "join_size_est": [a.inner_product(b)],
        }
    )


@q(
    "doc_length_ols_coeffs",
    sql="""
    WITH f AS (
      SELECT CAST(n_chars AS BIGINT) AS y,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS x1,
             CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT) AS x2
      FROM documents
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x1*x1) AS DOUBLE) AS s11, CAST(sum(x2*x2) AS DOUBLE) AS s22,
             CAST(sum(x1*x2) AS DOUBLE) AS s12,
             CAST(sum(x1*y) AS DOUBLE) AS s1y, CAST(sum(x2*y) AS DOUBLE) AS s2y,
             CAST(sum(y*y) AS DOUBLE) AS syy
      FROM f
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))
                 / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)), 8) AS b0,
           round((n*(s1y*s22 - s2y*s12) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))
                 / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)), 8) AS b1,
           round((n*(s11*s2y - s12*s1y) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))
                 / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)), 8) AS b2
    FROM s
    """,
)
def doc_length_ols_coeffs(sf_dir: str):
    """Multi-feature linear regression (n_chars ~ ws_tokens + long_tokens)
    fit distributively from MERGEABLE integer power sums: each batch emits
    exact int64 partial sums of (1, x1, x2, y, x1², x2², x1x2, x1y, x2y);
    the normal equations are solved once on the driver by Cramer's rule.
    Every input to the float math is an exactly-reproducible integer, and
    both sides evaluate the identical cofactor expression — so the oracle
    hash-matches bit-for-bit despite the 3×3 solve. Generalizes
    grouped_ols (1 feature) to the multi-feature case."""
    ds = _t(sf_dir, "documents", ["text", "n_chars"])

    def sums(t: pa.Table) -> pa.Table:
        import polars as pl

        txt = pl.from_arrow(pa.table({"text": t.column("text")}))["text"]
        y = t.column("n_chars").to_numpy().astype(np.int64)
        x1 = txt.str.count_matches(r"\S+").cast(pl.Int64).to_numpy().astype(np.int64)
        x2 = txt.str.count_matches(r"[a-z]{7,}").cast(pl.Int64).to_numpy().astype(np.int64)
        cols = {
            "n": np.int64(len(y)),
            "s1": x1.sum(),
            "s2": x2.sum(),
            "sy": y.sum(),
            "s11": (x1 * x1).sum(),
            "s22": (x2 * x2).sum(),
            "s12": (x1 * x2).sum(),
            "s1y": (x1 * y).sum(),
            "s2y": (x2 * y).sum(),
        }
        return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in cols.items()})

    p = ds.map_batches(sums, batch_format="pyarrow").to_pandas().sum()
    n, s1, s2, sy = float(p["n"]), float(p["s1"]), float(p["s2"]), float(p["sy"])
    s11, s22, s12 = float(p["s11"]), float(p["s22"]), float(p["s12"])
    s1y, s2y = float(p["s1y"]), float(p["s2y"])
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) / det
    b1 = (n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) / det
    b2 = (n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) / det
    return pd.DataFrame(
        {"n": [int(p["n"])], "b0": [round(b0, 8)], "b1": [round(b1, 8)], "b2": [round(b2, 8)]}
    )


@q(
    "value_ttest_click_purchase",
    sql="""
    WITH s AS (
      SELECT
        CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        sum(CASE WHEN event_type='click' THEN value ELSE 0 END) AS sx1,
        sum(CASE WHEN event_type='click' THEN value*value ELSE 0 END) AS sq1,
        CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END) AS sx2,
        sum(CASE WHEN event_type='purchase' THEN value*value ELSE 0 END) AS sq2
      FROM events WHERE event_type IN ('click','purchase')
    )
    SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_purchase,
           round(sx1/n1 - sx2/n2, 4) AS mean_diff,
           round((sx1/n1 - sx2/n2) /
                 sqrt(((sq1 - sx1*sx1/n1)/(n1-1))/n1 + ((sq2 - sx2*sx2/n2)/(n2-1))/n2), 4)
               AS t_stat,
           round(pow(((sq1 - sx1*sx1/n1)/(n1-1))/n1 + ((sq2 - sx2*sx2/n2)/(n2-1))/n2, 2) /
                 (pow(((sq1 - sx1*sx1/n1)/(n1-1))/n1, 2)/(n1-1)
                  + pow(((sq2 - sx2*sx2/n2)/(n2-1))/n2, 2)/(n2-1)), 2) AS welch_df
    FROM s
    """,
)
def value_ttest_click_purchase(sf_dir: str):
    """Two-sample Welch t-test between click and purchase event values,
    computed from one distributed pass of conditional (n, Σx, Σx²) partials
    — the A/B-test primitive. Both sides evaluate the identical
    sum-of-squares formula from the same aggregates, rounded to absorb
    addition-order ulps."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"et": t.column("event_type"), "v": t.column("value")}))
        out = {}
        for tag, name in (("click", "1"), ("purchase", "2")):
            g = df.filter(pl.col("et") == tag)["v"]
            out[f"n{name}"] = float(len(g))
            out[f"sx{name}"] = float(g.sum()) if len(g) else 0.0
            out[f"sq{name}"] = float((g * g).sum()) if len(g) else 0.0
        return pa.table({k: pa.array([v], pa.float64()) for k, v in out.items()})

    p = ds.map_batches(part, batch_format="pyarrow").to_pandas().sum()
    n1, sx1, sq1 = p["n1"], p["sx1"], p["sq1"]
    n2, sx2, sq2 = p["n2"], p["sx2"], p["sq2"]
    se1 = ((sq1 - sx1 * sx1 / n1) / (n1 - 1)) / n1
    se2 = ((sq2 - sx2 * sx2 / n2) / (n2 - 1)) / n2
    t_stat = (sx1 / n1 - sx2 / n2) / math.sqrt(se1 + se2)
    df_w = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
    return pd.DataFrame(
        {
            "n_click": [int(n1)],
            "n_purchase": [int(n2)],
            "mean_diff": [round(sx1 / n1 - sx2 / n2, 4)],
            "t_stat": [round(t_stat, 4)],
            "welch_df": [round(df_w, 2)],
        }
    )


@q(
    "user_value_rolling_median",
    sql="""
    SELECT event_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
               AS roll_med5
    FROM events ORDER BY event_id
    """,
)
def user_value_rolling_median(sf_dir: str):
    """ROWS-frame rolling MEDIAN per key (robust rolling statistic — the
    outlier-resistant twin of user_value_rolling_mean): each event's median
    value over the same user's last 5 events. Same single vectorized pass
    per coarse partition; the median comes from a masked sliding-window
    view + nanmedian, no per-key Python."""
    from perfect_bloomfilter_ray.stages.windows import rolling_row_agg

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = rolling_row_agg(
        ds,
        "user_id",
        "ts",
        "value",
        n_rows=5,
        tie_cols=["event_id"],
        out_mean=None,
        out_median="roll_med5",
    )

    def fin(t: pa.Table) -> pa.Table:
        m = np.round(t.column("roll_med5").to_numpy(zero_copy_only=False), 6)
        return pa.table({"event_id": t.column("event_id"), "roll_med5": pa.array(m)})

    return out.map_batches(fin, batch_format="pyarrow").sort("event_id")


@q(
    "lang_readability_profile",
    sql="""
    WITH f AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS words,
             CAST(length(text) - len(regexp_extract_all(text, '\\s')) AS BIGINT) AS word_chars,
             CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS syls,
             CAST(len(regexp_extract_all(text, '[a-z0-9]{7,}')) AS BIGINT) AS long_words
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(word_chars) AS DOUBLE) / sum(words), 6) AS avg_word_len,
           round(CAST(sum(syls) AS DOUBLE) / sum(words), 6) AS avg_syllables_per_word,
           round(CAST(sum(long_words) AS DOUBLE) / sum(words), 6) AS long_word_ratio
    FROM f GROUP BY lang ORDER BY lang
    """,
)
def lang_readability_profile(sf_dir: str):
    """Readability / lexical-complexity profile per language (Flesch-family
    signals: word length, vowel-group syllable approximation, long-word
    ratio). All per-batch partials are exact int64 sums, so the final
    ratios are bit-reproducible against the oracle."""
    ds = _t(sf_dir, "documents", ["lang", "text"])

    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"lang": t.column("lang"), "text": t.column("text")}))
        return (
            df.with_columns(
                pl.col("text").str.count_matches(r"[a-z0-9]+").cast(pl.Int64).alias("words"),
                (
                    pl.col("text").str.len_chars().cast(pl.Int64)
                    - pl.col("text").str.count_matches(r"\s").cast(pl.Int64)
                ).alias("word_chars"),
                pl.col("text").str.count_matches(r"[aeiou]+").cast(pl.Int64).alias("syls"),
                pl.col("text").str.count_matches(r"[a-z0-9]{7,}").cast(pl.Int64).alias("long_words"),
            )
            .group_by("lang")
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("words").sum(),
                pl.col("word_chars").sum(),
                pl.col("syls").sum(),
                pl.col("long_words").sum(),
            )
            .to_arrow()
        )

    out = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("words", alias_name="words"),
            Sum("word_chars", alias_name="word_chars"),
            Sum("syls", alias_name="syls"),
            Sum("long_words", alias_name="long_words"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    res = pd.DataFrame(
        {
            "lang": out["lang"],
            "n_docs": out["n_docs"].astype("int64"),
            "avg_word_len": (out["word_chars"].astype(float) / out["words"]).round(6),
            "avg_syllables_per_word": (out["syls"].astype(float) / out["words"]).round(6),
            "long_word_ratio": (out["long_words"].astype(float) / out["words"]).round(6),
        }
    )
    return res


@q(
    "vocab_edit_distance_pairs",
    sql="""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w FROM documents
    ),
    cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    v AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT 5000)
    SELECT a.w AS wa, b.w AS wb, CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
    FROM v a, v b
    WHERE a.w < b.w AND levenshtein(a.w, b.w) <= 2
    ORDER BY wa, wb
    """,
)
def vocab_edit_distance_pairs(sf_dir: str):
    """Spell-correction candidate mining: all edit-distance-≤2 pairs within
    the top-5000 corpus vocabulary, found by SymSpell deletion-neighborhood
    blocking (O(V·L²) keys, tiny buckets) instead of the oracle's O(V²)
    levenshtein cross join — identical rows, structurally cheaper."""
    from perfect_bloomfilter_ray.stages.fuzzy import edit_vocab_pairs

    ds = _t(sf_dir, "documents", ["text"])
    return edit_vocab_pairs(ds, "text", top_words=5000, max_distance=2).to_pandas()


@q(
    "weekly_stickiness",
    sql="""
    WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
    dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
    wau AS (SELECT date_trunc('week', d) AS w, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM du GROUP BY 1)
    SELECT strftime(wau.w, '%Y-%m-%d') AS week,
           CAST(count(*) AS BIGINT) AS n_days,
           wau.wau,
           round(CAST(sum(dau.dau) AS DOUBLE) / count(*), 6) AS avg_dau,
           round(CAST(sum(dau.dau) AS DOUBLE) / (count(*) * wau.wau), 6) AS stickiness
    FROM dau JOIN wau ON date_trunc('week', dau.d) = wau.w
    GROUP BY wau.w, wau.wau ORDER BY week
    """,
)
def weekly_stickiness(sf_dir: str):
    """Product-analytics stickiness (avg DAU / WAU per week): ONE
    pair-distinct exchange over (day, user) — the corpus-sized step — then
    the week-level dedup and counts run over the already-deduped pair set
    (orders of magnitude smaller). Integer sums → bit-exact ratios."""
    ds = _t(sf_dir, "events", ["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        d = pc.cast(pc.cast(pc.floor_temporal(t.column("ts"), unit="day"), pa.timestamp("us")), pa.int64())
        return pl.from_arrow(pa.table({"d": d, "user_id": t.column("user_id")})).unique().to_arrow()

    pairs = (
        ds.map_batches(day_pairs, batch_format="pyarrow").groupby(["d", "user_id"]).count()
    ).materialize()  # deduped (day,user) set: reused by BOTH counts below

    def dau_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["d"])).group_by("d").len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64)).to_arrow()
        )

    WEEK_US = 7 * 86400 * 1_000_000
    EPOCH_MON_SHIFT = 3 * 86400 * 1_000_000  # 1970-01-01 is a Thursday

    def week_pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        d = t.column("d").to_numpy()
        w = (d + EPOCH_MON_SHIFT) // WEEK_US * WEEK_US - EPOCH_MON_SHIFT
        return pl.from_arrow(pa.table({"w": pa.array(w), "user_id": t.column("user_id")})).unique().to_arrow()

    dau = (
        pairs.map_batches(dau_partial, batch_format="pyarrow")
        .groupby("d").aggregate(Sum("pn", alias_name="dau")).to_pandas()
    )
    wau = (
        pairs.map_batches(week_pairs, batch_format="pyarrow")
        .groupby(["w", "user_id"]).count()
    )

    def wau_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["w"])).group_by("w").len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64)).to_arrow()
        )

    wau_df = (
        wau.map_batches(wau_partial, batch_format="pyarrow")
        .groupby("w").aggregate(Sum("pn", alias_name="wau")).to_pandas()
    )
    dau["w"] = (dau["d"] + EPOCH_MON_SHIFT) // WEEK_US * WEEK_US - EPOCH_MON_SHIFT
    agg = dau.groupby("w").agg(n_days=("d", "count"), sum_dau=("dau", "sum")).reset_index()
    out = agg.merge(wau_df, on="w")
    out["week"] = pd.to_datetime(out["w"], unit="us").dt.strftime("%Y-%m-%d")
    out["avg_dau"] = (out["sum_dau"].astype(float) / out["n_days"]).round(6)
    out["stickiness"] = (out["sum_dau"].astype(float) / (out["n_days"] * out["wau"])).round(6)
    out["n_days"] = out["n_days"].astype("int64")
    out["wau"] = out["wau"].astype("int64")
    return (
        out[["week", "n_days", "wau", "avg_dau", "stickiness"]]
        .sort_values("week")
        .reset_index(drop=True)
    )


@q(
    "event_value_skyline",
    sql="""
    WITH s AS (
      SELECT event_id, value, epoch_us(ts) AS ts_us FROM events
      WHERE (event_id * 2654435761) % 100 = 7
    )
    SELECT event_id, round(value, 6) AS value, ts_us FROM s p
    WHERE NOT EXISTS (
      SELECT 1 FROM s q
      WHERE q.value >= p.value AND q.ts_us >= p.ts_us
        AND (q.value > p.value OR q.ts_us > p.ts_us)
    )
    ORDER BY event_id
    """,
)
def event_value_skyline(sf_dir: str):
    """Skyline / Pareto frontier (Börzsönyi ICDE'01): the non-dominated
    events under (maximize value, maximize recency) — 'no later event was
    also more valuable'. Block-local frontier pass + one exact merge over
    the tiny union; the oracle is the quadratic NOT-EXISTS dominance
    definition over the same deterministic hash slice."""
    from perfect_bloomfilter_ray.stages.skyline import skyline_2d

    ds = _t(sf_dir, "events", ["event_id", "value", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        keep = (eid * 2654435761) % 100 == 7
        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        return pa.table(
            {"event_id": t.column("event_id"), "value": t.column("value"), "ts_us": ts_us}
        ).filter(pa.array(keep))

    sky = skyline_2d(ds.map_batches(prep, batch_format="pyarrow"), "value", "ts_us")
    out = sky.to_pandas().sort_values("event_id").reset_index(drop=True)
    out["value"] = out["value"].round(6)
    return out[["event_id", "value", "ts_us"]]


@q(
    "purchase_attribution",
    sql="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type IN ('view','click') THEN event_type END AS touch,
             CASE WHEN event_type IN ('view','click') THEN epoch_us(ts) END AS touch_us
      FROM events WHERE event_type IN ('view','click','purchase')
    ),
    w AS (
      SELECT event_id, event_type, epoch_us(ts) AS ts_us,
             last_value(touch IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                                  ROWS UNBOUNDED PRECEDING) AS last_touch,
             last_value(touch_us IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                                     ROWS UNBOUNDED PRECEDING) AS lt_us
      FROM s
    )
    SELECT event_id, last_touch, CAST((ts_us - lt_us) // 1000000 AS BIGINT) AS lag_s
    FROM w WHERE event_type = 'purchase' ORDER BY event_id
    """,
)
def purchase_attribution(sf_dir: str):
    """Last-touch marketing attribution: each purchase is credited to the
    same user's most recent preceding view/click (purchases with no prior
    touch stay null). Built on the grouped forward-fill window
    (stages/windows.grouped_ffill — last_value IGNORE NULLS semantics):
    tag touch rows, carry (touch, touch_ts) forward per user in one
    vectorized co-partitioned pass, filter to purchases. Integer lag
    seconds → bit-exact oracle."""
    from perfect_bloomfilter_ray.stages.windows import grouped_ffill

    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        keep = pc.is_in(et, value_set=pa.array(["view", "click", "purchase"]))
        t = t.filter(keep)
        et = t.column("event_type")
        is_touch = pc.is_in(et, value_set=pa.array(["view", "click"]))
        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        return (
            t.append_column("touch", pc.if_else(is_touch, et, pa.nulls(len(t), pa.string())))
            .append_column("touch_us", pc.if_else(is_touch, ts_us, pa.nulls(len(t), pa.int64())))
            .append_column("ts_us", ts_us)
        )

    filled = grouped_ffill(
        ds.map_batches(tag, batch_format="pyarrow"),
        "user_id",
        "ts",
        ["touch", "touch_us"],
        tie_cols=["event_id"],
    )

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), pa.scalar("purchase")))
        lag = pc.divide(pc.subtract(t.column("ts_us"), t.column("touch_us")), pa.scalar(1_000_000))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "last_touch": t.column("touch"),
                "lag_s": pc.cast(lag, pa.int64()),
            }
        )

    return filled.map_batches(fin, batch_format="pyarrow").sort("event_id")


@q(
    "user_coverage_intervals",
    sql="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             greatest(epoch_us(ts) + CAST(trunc(value * 60000000) AS BIGINT), epoch_us(ts)) AS e
      FROM events
    ),
    o AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM iv
    ),
    fl AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS ni FROM o),
    isl AS (
      SELECT user_id, s, e,
             sum(ni) OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING)
                 AS island
      FROM fl
    ),
    agg AS (SELECT user_id, island, min(s) AS i_s, max(e) AS i_e FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(i_e - i_s) AS BIGINT) AS covered_us
    FROM agg GROUP BY user_id ORDER BY user_id
    """,
)
def user_coverage_intervals(sf_dir: str):
    """Gaps-and-islands interval union per key: each event spans
    [ts, ts + value minutes]; overlapping spans merge into islands and the
    per-user covered time is the union length — the classic uptime /
    watch-time / coverage aggregate. One coarse co-partitioned exchange,
    then a single vectorized pass per partition: per-key running max of
    interval ends (key-offset trick keeps accumulate from crossing keys),
    island starts where start > previous running max, per-island extents by
    reduceat. Integer microseconds → bit-exact oracle."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])
    nb = np.uint64(choose_num_blocks(ds))

    def prep(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()).to_numpy()
        dur = (t.column("value").to_numpy(zero_copy_only=False) * 60000000.0).astype(np.int64)
        e = np.maximum(s + dur, s)
        out = pa.table({"user_id": t.column("user_id"), "s": pa.array(s), "e": pa.array(e)})
        h = hash64(out.column("user_id"), 0x5E55)
        return out.append_column("_part", pa.array((h % nb).astype(np.int32)))

    def per_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], t.schema.field("user_id").type),
                    "n_islands": pa.array([], pa.int64()),
                    "covered_us": pa.array([], pa.int64()),
                }
            )
        uid = t.column("user_id").to_numpy()
        s = t.column("s").to_numpy()
        e = t.column("e").to_numpy()
        order = np.lexsort((e, s, uid))
        u_s, s_s, e_s = uid[order], s[order], e[order]
        n = len(order)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = u_s[1:] != u_s[:-1]
        # key-offset trick: a per-key monotone offset larger than the global
        # span makes one global maximum.accumulate respect key boundaries
        span = int(e_s.max() - s_s.min()) + 1
        kidx = np.cumsum(first) - 1
        off = kidx * np.int64(span + 1)
        runmax = np.maximum.accumulate(e_s - s_s.min() + off)
        new_island = np.ones(n, dtype=bool)
        new_island[1:] = (s_s[1:] - s_s.min() + off[1:]) > runmax[:-1]
        isl_starts = np.flatnonzero(new_island)
        isl_end = np.maximum.reduceat(e_s, isl_starts)
        isl_len = isl_end - s_s[isl_starts]
        isl_key = kidx[isl_starts]
        key_starts = np.flatnonzero(np.concatenate([[True], isl_key[1:] != isl_key[:-1]]))
        n_isl = np.diff(np.append(key_starts, len(isl_starts)))
        covered = np.add.reduceat(isl_len, key_starts)
        keys_out = pc.take(t.column("user_id"), pa.array(order[np.flatnonzero(first)], pa.int64()))
        return pa.table(
            {
                "user_id": keys_out,
                "n_islands": pa.array(n_isl.astype(np.int64)),
                "covered_us": pa.array(covered.astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out


@q(
    "orders_scd2_history",
    sql="""
    WITH a AS (SELECT o_orderkey AS k, round(o_totalprice, 2) AS v
               FROM orders WHERE o_orderkey % 11 <> 0),
    b AS (SELECT o_orderkey AS k,
                 round(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                            ELSE o_totalprice END, 2) AS v
          FROM orders WHERE o_orderkey % 13 <> 0),
    j AS (SELECT coalesce(a.k, b.k) AS k, a.v AS va, b.v AS vb
          FROM a FULL OUTER JOIN b ON a.k = b.k)
    SELECT k, va AS v, CAST(1 AS BIGINT) AS valid_from,
           CASE WHEN vb IS NULL OR va <> vb THEN CAST(2 AS BIGINT) END AS valid_to
    FROM j WHERE va IS NOT NULL
    UNION ALL
    SELECT k, vb, CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
    FROM j WHERE vb IS NOT NULL AND (va IS NULL OR va <> vb)
    ORDER BY k, valid_from
    """,
)
def orders_scd2_history(sf_dir: str):
    """Slowly-changing-dimension (SCD type 2) history build: the two
    deterministic order snapshots become a versioned dimension — unchanged
    rows stay open (valid_to null), changed rows close at version 2 and
    reopen with the new value, removals close, additions open at 2. The
    warehouse-ETL sibling of orders_snapshot_diff: same full-outer join,
    but the classification EMITS history rows instead of counting."""

    def version(which: str):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy()
            v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
            if which == "a":
                keep = k % 11 != 0
                vv = np.round(v, 2)
            else:
                keep = k % 13 != 0
                vv = np.round(np.where(k % 7 == 0, v + 1, v), 2)
            return pa.table({"k": pa.array(k[keep]), "v": pa.array(vv[keep])})

        return fn

    base = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    a = base.map_batches(version("a"), batch_format="pyarrow").materialize()
    b = base.map_batches(version("b"), batch_format="pyarrow")
    nparts = max(1, min(8, a.count() // 64))
    j = a.join(b, "full_outer", num_partitions=nparts, on=("k",), right_on=("k",), right_suffix="_b")

    def emit(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        va = t.column("v").to_numpy(zero_copy_only=False)
        vb = t.column("v_b").to_numpy(zero_copy_only=False)
        a_has, b_has = ~np.isnan(va), ~np.isnan(vb)
        closed = a_has & (~b_has | (va != vb))  # v1 rows that end at version 2
        new_open = b_has & (~a_has | (va != vb))  # v2 rows opening at version 2
        ks, vs, vf, vt = [], [], [], []
        # v1 rows (valid_from 1): closed ones get valid_to 2, others stay open
        ks.append(k[a_has])
        vs.append(va[a_has])
        vf.append(np.full(int(a_has.sum()), 1, dtype=np.int64))
        vt.append(np.where(closed[a_has], 2.0, np.nan))
        # v2 rows (valid_from 2, open)
        ks.append(k[new_open])
        vs.append(vb[new_open])
        vf.append(np.full(int(new_open.sum()), 2, dtype=np.int64))
        vt.append(np.full(int(new_open.sum()), np.nan))
        vt_arr = np.concatenate(vt)
        return pa.table(
            {
                "k": pa.array(np.concatenate(ks)),
                "v": pa.array(np.concatenate(vs)),
                "valid_from": pa.array(np.concatenate(vf)),
                "valid_to": pa.array(
                    np.where(np.isnan(vt_arr), 0, vt_arr).astype(np.int64),
                    mask=np.isnan(vt_arr),
                ),
            }
        )

    return (
        j.map_batches(emit, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )


@q(
    "user_key_skew_report",
    sql="""
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS i FROM c)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS total,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           round((2.0 * sum(i * cnt) - (count(*) + 1) * sum(cnt))
                 / (count(*) * sum(cnt)), 8) AS gini,
           round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 8) AS top1_share
    FROM r
    """,
)
def user_key_skew_report(sf_dir: str):
    """Shuffle-skew diagnostic for a groupby key: Gini coefficient and
    top-key share of the per-user event counts — the number an engine
    checks before choosing salting. Computed WITHOUT collecting the
    per-key counts: a count-of-counts table (distinct count value ->
    multiplicity, tiny by construction) fully determines the rank-weighted
    Gini sum (consecutive-rank blocks), so the driver sees O(distinct
    counts) rows even at 10^9 keys. Integer sums -> bit-exact oracle."""
    ds = _t(sf_dir, "events", ["user_id"])
    per_user = ds.groupby("user_id").count()

    def coc(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["count()"]))
            .rename({"count()": "cnt"})
            .group_by("cnt")
            .len(name="m")
            .with_columns(pl.col("m").cast(pl.Int64))
            .to_arrow()
        )

    cc = (
        per_user.map_batches(coc, batch_format="pyarrow")
        .groupby("cnt")
        .aggregate(Sum("m", alias_name="m"))
        .to_pandas()
        .sort_values("cnt")
        .reset_index(drop=True)
    )
    v = cc["cnt"].to_numpy().astype(np.int64)
    m = cc["m"].to_numpy().astype(np.int64)
    n = int(m.sum())
    total = int((v * m).sum())
    rank_base = np.concatenate([[0], np.cumsum(m)[:-1]])  # ranks before each block
    sum_i = m * rank_base + m * (m + 1) // 2  # Σ ranks inside each block
    s_icnt = int((v * sum_i).sum())
    gini = (2.0 * s_icnt - (n + 1) * total) / (n * total)
    return pd.DataFrame(
        {
            "n_keys": [n],
            "total": [total],
            "max_cnt": [int(v.max())],
            "gini": [round(gini, 8)],
            "top1_share": [round(float(v.max()) / total, 8)],
        }
    )


@q(
    "label_centroid_similarity",
    sql="""
    WITH e AS (
      SELECT label, CAST(embedding[i] AS DOUBLE) AS x, i
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    c AS (SELECT label, i, avg(x) AS cx FROM e GROUP BY label, i)
    SELECT a.label AS label_a, b.label AS label_b,
           round(sum(a.cx * b.cx)
                 / (sqrt(sum(a.cx * a.cx)) * sqrt(sum(b.cx * b.cx))), 4) AS cos_sim
    FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
    GROUP BY a.label, b.label ORDER BY label_a, label_b
    """,
)
def label_centroid_similarity(sf_dir: str):
    """Label-confusability matrix for embedding spaces: pairwise cosine
    between per-label centroids — near-1 pairs are candidate label merges /
    mislabeling hotspots. Reuses the grouped-centroid partials (one tiny
    (label, n, sum-vector) row per key per block); the pairwise cosine runs
    on the labels × dim table, driver-side small."""
    from perfect_bloomfilter_ray.stages.centroids import grouped_centroids

    ds = _t(sf_dir, "embeddings", ["label", "embedding"])
    cents = grouped_centroids(ds, "label", "embedding")
    labels = sorted(cents)
    rows = []
    for i, a in enumerate(labels):
        ca = cents[a]
        for b in labels[i + 1 :]:
            cb = cents[b]
            cos = float(np.dot(ca, cb) / (np.sqrt(np.dot(ca, ca)) * np.sqrt(np.dot(cb, cb))))
            rows.append((a, b, round(cos, 4)))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "cos_sim"])


@q(
    "nb_event_type_confusion",
    sql="""
    WITH f AS (
      SELECT event_id, event_type AS actual,
             CAST(extract(hour FROM ts) AS BIGINT) AS h,
             CAST(extract(dow FROM ts) AS BIGINT) AS d
      FROM events
    ),
    pri AS (SELECT actual AS t, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
    ph AS (SELECT actual AS t, h, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2),
    pd_ AS (SELECT actual AS t, d, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2),
    types AS (SELECT DISTINCT actual AS t FROM f),
    scored AS (
      SELECT f.event_id, f.actual, ty.t,
             CAST(pri.n * (coalesce(ph.n, 0) + 1) * (coalesce(pd_.n, 0) + 1) AS DOUBLE)
               / ((pri.n + 24.0) * (pri.n + 7.0)) AS score
      FROM f CROSS JOIN types ty
      JOIN pri ON pri.t = ty.t
      LEFT JOIN ph ON ph.t = ty.t AND ph.h = f.h
      LEFT JOIN pd_ ON pd_.t = ty.t AND pd_.d = f.d
    ),
    pred AS (
      SELECT event_id, actual, t AS pred,
             row_number() OVER (PARTITION BY event_id ORDER BY score DESC, t) AS rk
      FROM scored
    )
    SELECT actual, pred, CAST(count(*) AS BIGINT) AS n
    FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def nb_event_type_confusion(sf_dir: str):
    """Naive Bayes classifier trained AND applied distributed: predict the
    event type from (hour-of-day, day-of-week) with add-1 smoothing; output
    the confusion matrix. Training = three tiny count groupbys (types,
    types×24, types×7) broadcast as lookup tables; inference = one
    shuffle-free vectorized scoring pass. Scores are exact rationals
    (integer products / integer-valued doubles, no transcendental log), so
    the argmax — ties broken by type name — is bit-identical to the SQL
    oracle on any platform."""
    ds = _t(sf_dir, "events", ["event_id", "event_type", "ts"])

    def feats(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        return pa.table(
            {
                "actual": t.column("event_type"),
                "h": pc.cast(pc.hour(ts), pa.int64()),
                "d": pc.cast(pc.day_of_week(ts, count_from_zero=True, week_start=7), pa.int64()),
            }
        )

    # slim (label, hour, dow) projection materialized once: reused by the
    # three training counts AND the inference pass; spillable, ~10 B/row
    fds = ds.map_batches(feats, batch_format="pyarrow").materialize()
    pri = fds.groupby("actual").count().to_pandas().rename(columns={"count()": "n"})
    ph = fds.groupby(["actual", "h"]).count().to_pandas().rename(columns={"count()": "n"})
    pdw = fds.groupby(["actual", "d"]).count().to_pandas().rename(columns={"count()": "n"})
    types = sorted(pri["actual"])
    tix = {t: i for i, t in enumerate(types)}
    k = len(types)
    pri_n = np.zeros(k, dtype=np.int64)
    for r in pri.itertuples():
        pri_n[tix[r.actual]] = r.n
    h_n = np.zeros((k, 24), dtype=np.int64)
    for r in ph.itertuples():
        h_n[tix[r.actual], r.h] = r.n
    d_n = np.zeros((k, 7), dtype=np.int64)
    for r in pdw.itertuples():
        d_n[tix[r.actual], r.d] = r.n
    import ray

    lut = ray.put((types, pri_n, h_n, d_n))

    def classify(t: pa.Table) -> pa.Table:
        import polars as pl

        types_, pri_, h_, d_ = ray.get(lut)
        h = t.column("h").to_numpy()
        d = t.column("d").to_numpy()
        # scores: (rows, k) exact-rational doubles
        num = pri_[None, :] * (h_.T[h] + 1) * (d_.T[d] + 1)
        den = (pri_ + 24.0) * (pri_ + 7.0)
        score = num.astype(np.float64) / den[None, :]
        pred_ix = np.argmax(score, axis=1)  # first max == smallest type name
        pred = np.array(types_, dtype=object)[pred_ix]
        return (
            pl.from_arrow(pa.table({"actual": t.column("actual"), "pred": pa.array(pred.tolist())}))
            .group_by(["actual", "pred"])
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    out = (
        fds.map_batches(classify, batch_format="pyarrow")
        .groupby(["actual", "pred"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
        .sort_values(["actual", "pred"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


@q(
    "source_quality_wilson_ranking",
    sql="""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN n_chars >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n, pos,
             (CAST(pos AS DOUBLE) / n + 1.9208 / n
              - 1.96 * sqrt((CAST(pos AS DOUBLE) / n) * (1 - CAST(pos AS DOUBLE) / n) / n
                            + 0.9604 / (n * CAST(n AS DOUBLE))))
             / (1 + 3.8416 / n) AS lb
      FROM s
    )
    SELECT source, n, pos, round(lb, 8) AS wilson_lb
    FROM w ORDER BY round(lb, 8) DESC, source
    """,
)
def source_quality_wilson_ranking(sf_dir: str):
    """Ranking under uncertainty: sources ordered by the Wilson score lower
    bound (z=1.96) of their high-quality-document fraction — the
    small-sample-safe leaderboard (a 3/3 source does NOT outrank a 950/1000
    one). One count groupby; the interval math is a deterministic float
    expression over integer counts, identical on both sides."""
    ds = _t(sf_dir, "documents", ["source", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(pa.table({"source": t.column("source"), "nc": t.column("n_chars")}))
            .group_by("source")
            .agg(
                pl.len().cast(pl.Int64).alias("n"),
                (pl.col("nc") >= 1000).sum().cast(pl.Int64).alias("pos"),
            )
            .to_arrow()
        )

    out = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("pos", alias_name="pos"))
        .to_pandas()
    )
    n = out["n"].to_numpy().astype(np.float64)
    p = out["pos"].to_numpy().astype(np.float64) / n
    lb = (p + 1.9208 / n - 1.96 * np.sqrt(p * (1 - p) / n + 0.9604 / (n * n))) / (1 + 3.8416 / n)
    out["wilson_lb"] = np.round(lb, 8)
    out["n"] = out["n"].astype("int64")
    out["pos"] = out["pos"].astype("int64")
    return (
        out[["source", "n", "pos", "wilson_lb"]]
        .sort_values(["wilson_lb", "source"], ascending=[False, True])
        .reset_index(drop=True)
    )


@q("embedding_kmeans_clusters")
def embedding_kmeans_clusters(sf_dir: str):
    """Full distributed k-means (Lloyd's) over the embeddings table —
    per-iteration broadcast centroids + one (cluster, n, sum) partial row
    per cluster per block; assignments never leave the tasks. Rows-only
    (iterative, not SQL-expressible); convergence + reference-parity
    pinned in tests/test_bpe.py."""
    from perfect_bloomfilter_ray.stages.kmeans import kmeans_full

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, stats = kmeans_full(ds, "embedding", "vec_id", k=8, iters=6, seed=11)
    out = stats.to_pandas()
    out["inertia"] = out["inertia"].round(4)
    return out.sort_values("cluster").reset_index(drop=True)


@q(
    "doc_rank_fusion",
    sql="""
    WITH f AS (
      SELECT doc_id, n_chars,
             CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT) AS lw
      FROM documents
    ),
    l1 AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r1
           FROM f ORDER BY n_chars DESC, doc_id LIMIT 200),
    l2 AS (SELECT doc_id, row_number() OVER (ORDER BY lw DESC, doc_id) AS r2
           FROM f ORDER BY lw DESC, doc_id LIMIT 200),
    u AS (SELECT coalesce(l1.doc_id, l2.doc_id) AS doc_id, l1.r1, l2.r2
          FROM l1 FULL OUTER JOIN l2 ON l1.doc_id = l2.doc_id)
    SELECT doc_id, CAST(coalesce(r1, 0) AS BIGINT) AS r1,
           CAST(coalesce(r2, 0) AS BIGINT) AS r2,
           round(coalesce(1.0 / (60 + r1), 0) + coalesce(1.0 / (60 + r2), 0), 8) AS rrf
    FROM u
    ORDER BY round(coalesce(1.0 / (60 + r1), 0) + coalesce(1.0 / (60 + r2), 0), 8) DESC, doc_id
    LIMIT 25
    """,
)
def doc_rank_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack et al. 2009): fuse two top-200
    retrieval lists (docs by length, docs by long-word count) with
    score = Σ 1/(60+rank), rank 0 contribution for lists a doc missed —
    the standard multi-retriever result-merging step. Each list is an
    exact distributed tree-reduce top-k (per-block partial heads, one
    merge); the fusion runs on the 2×200-row union. Fully corpus-size
    independent."""
    from perfect_bloomfilter_ray.stages.topk import global_top_k

    ds = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def slim(t: pa.Table) -> pa.Table:
        import polars as pl

        lw = (
            pl.from_arrow(pa.table({"t": t.column("text")}))["t"]
            .str.count_matches(r"[a-z]{7,}")
            .cast(pl.Int64)
        )
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_chars": t.column("n_chars"), "lw": lw.to_arrow()}
        )

    # slim (id, 2 ints) projection materialized ONCE so both top-k trees
    # reuse it without re-running the regex scan; spillable, 24 B/row
    sl = ds.map_batches(slim, batch_format="pyarrow").materialize()
    l1 = (
        global_top_k(sl, "n_chars", 200, descending=True, tie_cols=["doc_id"])
        .to_pandas()
        .sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    l1["r1"] = np.arange(1, len(l1) + 1)
    l2 = (
        global_top_k(sl, "lw", 200, descending=True, tie_cols=["doc_id"])
        .to_pandas()
        .sort_values(["lw", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    l2["r2"] = np.arange(1, len(l2) + 1)
    u = l1[["doc_id", "r1"]].merge(l2[["doc_id", "r2"]], on="doc_id", how="outer")
    s1 = np.where(u["r1"].notna(), 1.0 / (60 + u["r1"].fillna(0)), 0.0)
    s2 = np.where(u["r2"].notna(), 1.0 / (60 + u["r2"].fillna(0)), 0.0)
    u["rrf"] = np.round(s1 + s2, 8)
    u["r1"] = u["r1"].fillna(0).astype("int64")
    u["r2"] = u["r2"].fillna(0).astype("int64")
    return (
        u.sort_values(["rrf", "doc_id"], ascending=[False, True])
        .head(25)[["doc_id", "r1", "r2", "rrf"]]
        .reset_index(drop=True)
    )


@q("shard_rebalance_report")
def shard_rebalance_report(sf_dir: str):
    """Cluster-resize movement report for the reference's jump-consistent-
    hash router (filter.rs:467-483 / Lamping & Veach 2014): route every
    distinct user to S=16 and S+1=17 shards, count keys that move. Jump
    hash's contract: movers relocate ONLY to the new shard (monotone
    resize) and the moved fraction ≈ 1/(S+1). One distinct pass + a
    vectorized double-routing map; per-shard partial counts merge in a
    tiny groupby. Rows-only (the router is not SQL-expressible); the
    monotonicity contract is asserted as output columns and pinned in
    tests/test_hashing.py."""
    from perfect_bloomfilter_ray.functions.hashing import hash64, jump_hash

    distinct = _t(sf_dir, "events", ["user_id"]).groupby("user_id").count()
    S = 16

    def route(t: pa.Table) -> pa.Table:
        h = hash64(t.column("user_id"), 0xBEEF)
        s_old = jump_hash(h, S)
        s_new = jump_hash(h, S + 1)
        moved = s_old != s_new
        return pa.table(
            {
                "n_keys": pa.array([len(h)], pa.int64()),
                "moved": pa.array([int(moved.sum())], pa.int64()),
                "moved_not_to_new": pa.array([int((moved & (s_new != S)).sum())], pa.int64()),
            }
        )

    p = distinct.map_batches(route, batch_format="pyarrow").to_pandas().sum()
    n, moved = int(p["n_keys"]), int(p["moved"])
    return pd.DataFrame(
        {
            "shards_before": [S],
            "shards_after": [S + 1],
            "n_keys": [n],
            "moved": [moved],
            "moved_not_to_new": [int(p["moved_not_to_new"])],  # contract: 0
            "moved_fraction": [round(moved / n, 6)],
            "ideal_fraction": [round(1.0 / (S + 1), 6)],
        }
    )


@q(
    "event_type_dow_chi2",
    sql="""
    WITH f AS (
      SELECT event_type AS t, CAST(extract(dow FROM ts) AS BIGINT) AS d FROM events
    ),
    o AS (SELECT t, d, CAST(count(*) AS BIGINT) AS o FROM f GROUP BY 1, 2),
    rm AS (SELECT t, CAST(count(*) AS BIGINT) AS rn FROM f GROUP BY 1),
    cm AS (SELECT d, CAST(count(*) AS BIGINT) AS cn FROM f GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
    cells AS (
      SELECT rm.t, cm.d, coalesce(o.o, 0) AS o,
             CAST(rm.rn AS DOUBLE) * cm.cn / tot.n AS e
      FROM rm CROSS JOIN cm CROSS JOIN tot
      LEFT JOIN o ON o.t = rm.t AND o.d = cm.d
    )
    SELECT CAST((SELECT count(*) FROM rm) - 1 AS BIGINT)
             * CAST((SELECT count(*) FROM cm) - 1 AS BIGINT) AS dof,
           round(sum((o - e) * (o - e) / e), 4) AS chi2
    FROM cells
    """,
)
def event_type_dow_chi2(sf_dir: str):
    """Chi-squared independence test (event type × day-of-week): the
    categorical-drift / seasonality detector. One contingency groupby
    (types × 7 tiny), margins derived from it, χ² on the driver from exact
    integer counts — both sides evaluate the identical expected-count
    formula."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def feats(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        return pa.table(
            {
                "t": t.column("event_type"),
                "d": pc.cast(pc.day_of_week(ts, count_from_zero=True, week_start=7), pa.int64()),
            }
        )

    o = (
        ds.map_batches(feats, batch_format="pyarrow")
        .groupby(["t", "d"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "o"})
    )
    piv = o.pivot_table(index="t", columns="d", values="o", fill_value=0, aggfunc="sum")
    obs = piv.to_numpy().astype(np.float64)
    rn = obs.sum(axis=1, keepdims=True)
    cn = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    e = rn * cn / n
    chi2 = float(((obs - e) ** 2 / e).sum())
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return pd.DataFrame({"dof": [dof], "chi2": [round(chi2, 4)]})


@q(
    "hourly_volume_autocorr",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    r AS (SELECT c, row_number() OVER (ORDER BY b) AS i FROM h),
    p AS (SELECT a.c AS x, b.c AS y FROM r a JOIN r b ON b.i = a.i + 1),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(sum(x*y) AS BIGINT) AS sxy
      FROM p
    )
    SELECT n AS n_pairs,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS lag1_corr
    FROM s
    """,
)
def hourly_volume_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of hourly event volume — the burstiness /
    periodicity signal. The corpus-sized step is one hour-bucket count
    groupby; the lag pairing and Pearson formula run on the tiny hourly
    series from exact integer sums."""
    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table({"b": pc.floor_temporal(pc.cast(t.column("ts"), pa.timestamp("us")), unit="hour")})

    h = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .count()
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    c = h["count()"].to_numpy().astype(np.int64)
    x, y = c[:-1], c[1:]
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy, sxy = int((x * x).sum()), int((y * y).sum()), int((x * y).sum())
    r = (float(n) * sxy - float(sx) * sy) / (
        np.sqrt(float(n) * sxx - float(sx) * sx) * np.sqrt(float(n) * syy - float(sy) * sy)
    )
    return pd.DataFrame({"n_pairs": [n], "lag1_corr": [round(r, 6)]})


@q(
    "bloom_incremental_ingest",
    sql="""
    WITH old AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 <> 0),
    new_slice AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0)
    SELECT CAST((SELECT count(DISTINCT text) FROM old) AS BIGINT) AS standing_texts,
           CAST(count(*) AS BIGINT) AS probed,
           CAST(sum(CASE WHEN text IN (SELECT text FROM old) THEN 1 ELSE 0 END) AS BIGINT)
               AS flagged_seen,
           CAST(sum(CASE WHEN text IN (SELECT text FROM old) THEN 0 ELSE 1 END) AS BIGINT)
               AS admitted_new
    FROM new_slice
    """,
)
def bloom_incremental_ingest(sf_dir: str):
    """The reference's continuous-service story, batch-native: a standing
    corpus builds the cascading Bloom filter ONCE and checkpoints it
    (pickle state, the WAL replacement); a later session LOADS the
    checkpoint and screens an incoming slice — seen texts are flagged,
    unseen admitted. The SQL oracle is the exact set semantics; it hashes
    identically because the cascade's FP bound (~3e-13/probe) makes an
    observed false flag a ~1e-8 event at this probe count — a mismatch
    here is a real conformance regression (cf. bloom_membership_roundtrip).
    Unlike the exact anti-join twin (incremental_ingest_new_docs), the
    standing side here is a FIXED-SIZE filter, not the corpus."""
    import ray

    from perfect_bloomfilter_ray.state.bloom import BloomCascade
    from perfect_bloomfilter_ray.stages.membership import build_filter

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def split(new_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            m = ids % 3 == 0
            return t.filter(pa.array(m if new_side else ~m))

        return fn

    old = docs.map_batches(split(False), batch_format="pyarrow")
    n_old = old.count()
    filt = build_filter(old, "text", expected_keys=max(1024, n_old))
    blob = filt.to_bytes()  # checkpoint: state crosses sessions as bytes
    loaded = BloomCascade.from_bytes(blob)
    ref = ray.put(loaded.to_bytes())

    def probe(t: pa.Table) -> pa.Table:
        f = BloomCascade.from_bytes(ray.get(ref))
        seen = f.contains_column(t.column("text"))
        return pa.table(
            {
                "probed": pa.array([len(t)], pa.int64()),
                "flagged_seen": pa.array([int(seen.sum())], pa.int64()),
            }
        )

    p = docs.map_batches(split(True), batch_format="pyarrow").map_batches(
        probe, batch_format="pyarrow"
    ).to_pandas().sum()
    # standing distinct count: per-batch distinct partials + pair groupby
    def tx(t: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(t.select(["text"])).unique().to_arrow()

    n_texts = old.map_batches(tx, batch_format="pyarrow").groupby("text").count().count()
    probed, seen = int(p["probed"]), int(p["flagged_seen"])
    return pd.DataFrame(
        {
            "standing_texts": [n_texts],
            "probed": [probed],
            "flagged_seen": [seen],
            "admitted_new": [probed - seen],
        }
    )


@q("mmr_diverse_topk")
def mmr_diverse_topk(sf_dir: str):
    """Diversity-aware retrieval: MMR-select 15 embeddings for a
    deterministic query vector (the label-0 centroid) — relevance traded
    against redundancy to already-picked results. k broadcast+scan rounds,
    one best-candidate row per block per round. Rows-only (greedy
    iterative); exact local-reference parity pinned in tests."""
    from perfect_bloomfilter_ray.stages.centroids import grouped_centroids
    from perfect_bloomfilter_ray.stages.mmr import mmr_select

    ds = _t(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
    cents = grouped_centroids(ds, "label", "embedding")
    q0 = cents[sorted(cents)[0]]
    return mmr_select(
        ds.select_columns(["vec_id", "embedding"]), "embedding", "vec_id", q0, k=15, lam=0.7
    ).to_pandas()


@q(
    "keyword_context_bigrams",
    sql="""
    WITH m AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+ hash [a-z0-9]+')) AS ctx
      FROM documents
    )
    SELECT split_part(ctx, ' ', 1) AS left_word, split_part(ctx, ' ', 3) AS right_word,
           CAST(count(*) AS BIGINT) AS n
    FROM m GROUP BY 1, 2
    ORDER BY n DESC, left_word, right_word LIMIT 20
    """,
)
def keyword_context_bigrams(sf_dir: str):
    """Keyword-in-context concordance mining: the words flanking 'hash'
    across the corpus, top-20 contexts — the collocation/terminology probe.
    Map-side per-batch context counts (non-overlapping leftmost regex —
    identical semantics in polars and the oracle's RE2), one tiny pair
    groupby, tree-reduce top-k."""
    from perfect_bloomfilter_ray.stages.topk import global_top_k

    ds = _t(sf_dir, "documents", ["text"])

    def ctx(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"text": t.column("text")}))
        return (
            df.with_columns(
                pl.col("text")
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+ hash [a-z0-9]+")
                .alias("ctx")
            )
            .explode("ctx")
            .drop_nulls("ctx")
            .with_columns(
                pl.col("ctx").str.split(" ").list.get(0).alias("left_word"),
                pl.col("ctx").str.split(" ").list.get(2).alias("right_word"),
            )
            .group_by(["left_word", "right_word"])
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    counts = (
        ds.map_batches(ctx, batch_format="pyarrow")
        .groupby(["left_word", "right_word"])
        .aggregate(Sum("pn", alias_name="n"))
    )
    out = (
        global_top_k(counts, "n", 20, descending=True, tie_cols=["left_word", "right_word"])
        .to_pandas()
        .sort_values(["n", "left_word", "right_word"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out[["left_word", "right_word", "n"]]


@q(
    "range_pruned_scan_revenue",
    sql="""
    WITH r AS (
      SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM lineitem, r WHERE l_orderkey BETWEEN r.lo AND r.hi
    """,
)
def range_pruned_scan_revenue(sf_dir: str):
    """Runtime filter pushdown INTO THE SCAN: a small aggregate derives the
    qualifying key range, which is pushed into ``read_parquet(filter=...)``
    as a pyarrow dataset expression — row groups outside [lo, hi] never
    leave storage (the zone-map/min-max pruning every lakehouse engine
    does). Two-phase plan: tiny range aggregate, then the pruned fact
    scan."""
    import pyarrow.dataset as pds
    import ray.data as rd

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def recent(t: pa.Table) -> pa.Table:
        m = pc.greater_equal(t.column("o_orderdate"), pa.scalar(pd.Timestamp("2001-01-01")))
        k = t.filter(m).column("o_orderkey")
        if len(k) == 0:
            return pa.table({"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())})
        return pa.table(
            {"lo": pa.array([pc.min(k).as_py()]), "hi": pa.array([pc.max(k).as_py()])}
        )

    rng = orders.map_batches(recent, batch_format="pyarrow").to_pandas()
    lo, hi = int(rng["lo"].min()), int(rng["hi"].max())
    expr = (pds.field("l_orderkey") >= lo) & (pds.field("l_orderkey") <= hi)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"], filter=expr
    )

    def part(t: pa.Table) -> pa.Table:
        # integer cents — a rounded float sum diverged at sf1.0 (suite policy)
        c = pc.cast(pc.floor(pc.add(pc.multiply(t.column("l_extendedprice"), 100.0), 0.5)), pa.int64())
        return pa.table(
            {
                "n": pa.array([len(t)], pa.int64()),
                "s": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
            }
        )

    p = li.map_batches(part, batch_format="pyarrow").to_pandas().sum()
    return pd.DataFrame({"n_rows": [int(p["n"])], "total_cents": [int(p["s"])]})


@q("logreg_purchase_model")
def logreg_purchase_model(sf_dir: str):
    """Distributed logistic regression: predict whether an event is a
    purchase from (hour-of-day, value) — the trained-quality-classifier
    shape. Full-batch GD: per-iteration broadcast weights + exact per-block
    gradient partials, deterministic sorted accumulation. Rows-only
    (iterative); local-reference parity pinned in tests."""
    from perfect_bloomfilter_ray.stages.logreg import logreg_fit

    ds = _t(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def feats(t: pa.Table):
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        h = pc.cast(pc.hour(ts), pa.int64()).to_numpy().astype(np.float64)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        return np.stack([h, v], axis=1)

    def label(t: pa.Table):
        return pc.equal(t.column("event_type"), pa.scalar("purchase")).to_numpy(zero_copy_only=False)

    fit = logreg_fit(ds, feats, label, n_features=2, iters=40, lr=0.5, tag_col="event_id")
    return pd.DataFrame(
        {
            "n": [fit["n"]],
            "w_hour": [round(float(fit["w"][0]), 6)],
            "w_value": [round(float(fit["w"][1]), 6)],
            "bias": [round(float(fit["w"][2]), 6)],
            "log_loss": [round(fit["loss"], 6)],
            "train_accuracy": [round(fit["accuracy"], 6)],
        }
    )


@q(
    "k_anonymity_report",
    sql="""
    WITH g AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS h,
             CAST(floor(value / 100) AS BIGINT) AS vband,
             CAST(count(*) AS BIGINT) AS grp
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(grp) AS BIGINT) AS min_group,
           CAST(sum(CASE WHEN grp < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_below_k,
           CAST(sum(CASE WHEN grp < 5 THEN grp ELSE 0 END) AS BIGINT) AS rows_below_k
    FROM g
    """,
)
def k_anonymity_report(sf_dir: str):
    """k-anonymity audit over the quasi-identifier tuple (event_type,
    hour, value band): how many equivalence classes fall below k=5, and
    how many rows they expose — the release-readiness check run before
    publishing event data. One contingency groupby; the audit reduces the
    tiny group-size table."""
    ds = _t(sf_dir, "events", ["event_type", "ts", "value"])

    def qi(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        vband = np.floor(t.column("value").to_numpy(zero_copy_only=False) / 100.0).astype(np.int64)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "h": pc.cast(pc.hour(ts), pa.int64()),
                "vband": pa.array(vband),
            }
        )

    g = (
        ds.map_batches(qi, batch_format="pyarrow")
        .groupby(["event_type", "h", "vband"])
        .count()
        .to_pandas()
    )
    grp = g["count()"].to_numpy().astype(np.int64)
    below = grp < 5
    return pd.DataFrame(
        {
            "n_groups": [len(grp)],
            "min_group": [int(grp.min())],
            "groups_below_k": [int(below.sum())],
            "rows_below_k": [int(grp[below].sum())],
        }
    )


@q(
    "user_churn_km_curve",
    sql="""
    WITH u AS (SELECT user_id, min(epoch_us(ts)) AS f, max(epoch_us(ts)) AS l
               FROM events GROUP BY 1),
    h AS (SELECT max(epoch_us(ts)) AS mx FROM events),
    d AS (
      SELECT (l - f) // 86400000000 AS dur,
             CASE WHEN (SELECT mx FROM h) - l > 86400000000 THEN 1 ELSE 0 END AS ev
      FROM u
    ),
    t AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS d_i, CAST(count(*) AS BIGINT) AS c_i
          FROM d GROUP BY dur),
    r AS (SELECT dur, d_i,
                 CAST(sum(c_i) OVER (ORDER BY dur DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS n_i
          FROM t),
    k AS (SELECT dur, d_i, n_i,
                 product(1 - CAST(d_i AS DOUBLE) / n_i)
                     OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS s
          FROM r)
    SELECT CAST(dur AS BIGINT) AS dur_days, d_i, n_i, round(s, 6) AS survival
    FROM k WHERE d_i > 0 ORDER BY dur_days
    """,
)
def user_churn_km_curve(sf_dir: str):
    """Kaplan-Meier survival curve for user retention: per-user observed
    lifetime (first→last event, floor days); users quiet for >1 day before
    the horizon are churn events, the rest censored. S(t) = Π(1 − d_i/n_i)
    over event durations. The corpus-sized step is ONE per-user min/max
    groupby; the KM table runs over the tiny distinct-duration series with
    the identical left-to-right product as the windowed-product oracle."""
    from ray.data.aggregate import Max, Min

    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def us(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
            }
        )

    tagged = ds.map_batches(us, batch_format="pyarrow")
    per_user = tagged.groupby("user_id").aggregate(
        Min("ts_us", alias_name="f"), Max("ts_us", alias_name="l")
    )
    horizon = int(tagged.max("ts_us"))
    DAY = 86_400_000_000

    def dur_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        f = t.column("f").to_numpy()
        l = t.column("l").to_numpy()
        dur = (l - f) // DAY
        ev = (horizon - l) > DAY
        return (
            pl.from_arrow(pa.table({"dur": pa.array(dur), "ev": pa.array(ev.astype(np.int64))}))
            .group_by("dur")
            .agg(pl.col("ev").sum().alias("d_i"), pl.len().cast(pl.Int64).alias("c_i"))
            .to_arrow()
        )

    t = (
        per_user.map_batches(dur_partial, batch_format="pyarrow")
        .groupby("dur")
        .aggregate(Sum("d_i", alias_name="d_i"), Sum("c_i", alias_name="c_i"))
        .to_pandas()
        .sort_values("dur")
        .reset_index(drop=True)
    )
    c = t["c_i"].to_numpy().astype(np.int64)
    d = t["d_i"].to_numpy().astype(np.int64)
    n_at_risk = c[::-1].cumsum()[::-1]
    s = np.cumprod(1.0 - d.astype(np.float64) / n_at_risk)
    out = pd.DataFrame(
        {
            "dur_days": t["dur"].astype("int64"),
            "d_i": d,
            "n_i": n_at_risk.astype("int64"),
            "survival": np.round(s, 6),
        }
    )
    return out[out["d_i"] > 0].reset_index(drop=True)


@q(
    "rfm_user_segments",
    sql="""
    WITH u AS (
      SELECT user_id,
             (SELECT max(epoch_us(ts)) FROM events) - max(epoch_us(ts)) AS r,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT quantile_disc(r, [0.25, 0.5, 0.75]) AS cr,
             quantile_disc(f, [0.25, 0.5, 0.75]) AS cf,
             quantile_disc(m, [0.25, 0.5, 0.75]) AS cm
      FROM u
    ),
    seg AS (
      SELECT CAST(1 + (r > cr[1])::INT + (r > cr[2])::INT + (r > cr[3])::INT AS BIGINT) AS r_bin,
             CAST(1 + (f > cf[1])::INT + (f > cf[2])::INT + (f > cf[3])::INT AS BIGINT) AS f_bin,
             CAST(1 + (m > cm[1])::INT + (m > cm[2])::INT + (m > cm[3])::INT AS BIGINT) AS m_bin
      FROM u, c
    )
    SELECT r_bin, f_bin, m_bin, CAST(count(*) AS BIGINT) AS n_users
    FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def rfm_user_segments(sf_dir: str):
    """RFM segmentation (recency / frequency / monetary quartiles): per-user
    aggregates in one groupby — monetary in integer cents so every input
    to the quartile cuts is exact across engines — then quartile-threshold
    binning against exact quantile_disc cuts and a tiny segment count. The
    marketing-segmentation staple with a bit-exact oracle."""
    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def per_user_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        cents = pa.array(np.round(t.column("value").to_numpy(zero_copy_only=False) * 100).astype(np.int64))
        df = pl.from_arrow(pa.table({"user_id": t.column("user_id"), "ts_us": ts_us, "cents": cents}))
        return (
            df.group_by("user_id")
            .agg(
                pl.col("ts_us").max().alias("mx"),
                pl.len().cast(pl.Int64).alias("f"),
                pl.col("cents").sum().alias("m"),
            )
            .to_arrow()
        )

    per_user = (
        _t(sf_dir, "events", ["user_id", "ts", "value"])
        .map_batches(per_user_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("mx", alias_name="mx"), Sum("f", alias_name="f"), Sum("m", alias_name="m"))
        .materialize()
    )
    horizon = int(per_user.max("mx"))

    def add_r(t: pa.Table) -> pa.Table:
        r = horizon - t.column("mx").to_numpy()
        return t.append_column("r", pa.array(r)).append_column("_g", pa.array(np.zeros(len(t), np.int8)))

    base = per_user.map_batches(add_r, batch_format="pyarrow").materialize()
    cuts = {}
    for col in ("r", "f", "m"):
        qt = exact_grouped_quantiles(
            base, "_g", col, [0.25, 0.5, 0.75], kind="disc", names=["c1", "c2", "c3"]
        ).to_pandas()
        cuts[col] = [float(qt.iloc[0][c]) for c in ("c1", "c2", "c3")]

    def seg(t: pa.Table) -> pa.Table:
        import polars as pl

        out = {}
        for col in ("r", "f", "m"):
            v = t.column(col).to_numpy().astype(np.float64)
            c1, c2, c3 = cuts[col]
            out[f"{col}_bin"] = (1 + (v > c1).astype(np.int64) + (v > c2) + (v > c3)).astype(np.int64)
        return (
            pl.from_arrow(pa.table({k: pa.array(v) for k, v in out.items()}))
            .group_by(["r_bin", "f_bin", "m_bin"])
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    out = (
        base.map_batches(seg, batch_format="pyarrow")
        .groupby(["r_bin", "f_bin", "m_bin"])
        .aggregate(Sum("pn", alias_name="n_users"))
        .to_pandas()
        .sort_values(["r_bin", "f_bin", "m_bin"])
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


@q(
    "view_to_purchase_latency",
    sql="""
    WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
               WHERE event_type = 'view' GROUP BY 1),
    p AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
          WHERE event_type = 'purchase' GROUP BY 1),
    lat AS (SELECT (p.t - v.t) // 1000000 AS lag_s FROM v JOIN p USING (user_id)
            WHERE p.t > v.t)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(quantile_disc(lag_s, 0.5) AS BIGINT) AS p50_s,
           CAST(quantile_disc(lag_s, 0.9) AS BIGINT) AS p90_s,
           CAST(quantile_disc(lag_s, 0.99) AS BIGINT) AS p99_s
    FROM lat
    """,
)
def view_to_purchase_latency(sf_dir: str):
    """Conversion-latency quantiles: first view → first purchase per user,
    exact p50/p90/p99 over the per-user lag. One conditional-min groupby
    (both firsts in a single pass), integer-second lags, exact
    quantile_disc — bit-identical to the oracle."""
    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles
    from ray.data.aggregate import Min

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])

    def firsts(t: pa.Table) -> pa.Table:
        import polars as pl

        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        df = pl.from_arrow(
            pa.table({"user_id": t.column("user_id"), "ts_us": ts_us, "et": t.column("event_type")})
        ).filter(pl.col("et").is_in(["view", "purchase"]))
        return (
            df.group_by("user_id")
            .agg(
                pl.col("ts_us").filter(pl.col("et") == "view").min().alias("v_t"),
                pl.col("ts_us").filter(pl.col("et") == "purchase").min().alias("p_t"),
            )
            .to_arrow()
        )

    per_user = (
        ds.map_batches(firsts, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("v_t", alias_name="v_t"), Min("p_t", alias_name="p_t"))
    )

    def lag(t: pa.Table) -> pa.Table:
        v = t.column("v_t").to_numpy(zero_copy_only=False)
        p = t.column("p_t").to_numpy(zero_copy_only=False)
        ok = ~(np.isnan(v) | np.isnan(p)) & (p > v)
        lag_s = ((p[ok] - v[ok]) // 1_000_000).astype(np.int64)
        return pa.table({"lag_s": pa.array(lag_s), "_g": pa.array(np.zeros(len(lag_s), np.int8))})

    lags = per_user.map_batches(lag, batch_format="pyarrow").materialize()
    n = lags.count()
    qt = exact_grouped_quantiles(
        lags, "_g", "lag_s", [0.5, 0.9, 0.99], kind="disc", names=["p50", "p90", "p99"]
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_users": [n],
            "p50_s": [int(qt.iloc[0]["p50"])],
            "p90_s": [int(qt.iloc[0]["p90"])],
            "p99_s": [int(qt.iloc[0]["p99"])],
        }
    )


@q("cdc_chunk_dedup_stats")
def cdc_chunk_dedup_stats(sf_dir: str):
    """Content-defined chunking dedup report (LBFS rolling-hash boundaries):
    how much of the corpus is redundant at the CHUNK level — the
    shift-resistant storage-dedup measure that fixed-size blocks cannot
    give (an insertion re-synchronizes boundaries). Per-batch chunk-hash
    partials, one distinct-chunk exchange. Rows-only (boundaries are not
    SQL-expressible); boundary determinism + shift resistance pinned in
    tests/test_bpe.py."""
    from perfect_bloomfilter_ray.stages.cdc import cdc_dedup_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = cdc_dedup_stats(ds, "text", "doc_id", window=16, mask_bits=7, min_len=32, max_len=1024).to_pandas()
    out["dedup_ratio"] = (out["bytes_distinct"] / out["bytes_total"]).round(6)
    return out


@q(
    "weighted_median_nchars",
    sql="""
    WITH f AS (
      SELECT CAST(n_chars AS BIGINT) AS v,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w
      FROM documents
    ),
    g AS (SELECT v, CAST(sum(w) AS BIGINT) AS w FROM f GROUP BY v),
    c AS (SELECT v, w, sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                 (SELECT sum(w) FROM g) AS tot
          FROM g)
    SELECT CAST(min(v) AS BIGINT) AS weighted_median,
           CAST(max(tot) AS BIGINT) AS total_weight
    FROM c WHERE cum * 2 >= tot
    """,
)
def weighted_median_nchars(sf_dir: str):
    """Exact WEIGHTED median (document length weighted by token count — the
    'median experienced by a token, not by a document' statistic). The
    value domain is bounded, so the exact answer comes from one
    (value → weight-sum) groupby; the cumulative scan runs over the tiny
    distinct-value table. Integer weights → bit-exact."""
    ds = _t(sf_dir, "documents", ["text", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        w = (
            pl.from_arrow(pa.table({"t": t.column("text")}))["t"]
            .str.count_matches(r"\S+")
            .cast(pl.Int64)
        )
        return (
            pl.from_arrow(pa.table({"v": t.column("n_chars"), "w": w.to_arrow()}))
            .group_by("v")
            .agg(pl.col("w").sum())
            .to_arrow()
        )

    g = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    cum = g["w"].cumsum()
    tot = int(g["w"].sum())
    med = int(g.loc[cum * 2 >= tot, "v"].iloc[0])
    return pd.DataFrame({"weighted_median": [med], "total_weight": [tot]})


@q(
    "token_cooccurrence_pmi",
    sql="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ),
    cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    v AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT 100),
    dt AS (SELECT DISTINCT doc_id, w FROM tok WHERE w IN (SELECT w FROM v)),
    nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS d FROM dt GROUP BY w),
    pairs AS (
      SELECT a.w AS wa, b.w AS wb, CAST(count(*) AS BIGINT) AS n_ab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2
    )
    SELECT wa, wb, n_ab,
           round(ln(CAST(n_ab AS DOUBLE) * nd.n / (da.d * CAST(db.d AS DOUBLE))), 6) AS pmi
    FROM pairs
    JOIN df da ON da.w = pairs.wa
    JOIN df db ON db.w = pairs.wb
    CROSS JOIN nd
    ORDER BY n_ab DESC, wa, wb LIMIT 20
    """,
)
def token_cooccurrence_pmi(sf_dir: str):
    """Token collocation mining over the top-100 vocabulary: doc-level
    co-occurrence counts via MATRIX PARTIALS — each batch reduces to one
    100×100 Xᵀ X partial (X = doc×token presence), merged by summation; no
    pair explosion ever leaves a task. PMI from the exact integer counts.
    The matrix-partial pattern is the scale shape for bounded-vocabulary
    co-occurrence at any corpus size."""
    import ray

    from perfect_bloomfilter_ray.stages.bpe import word_frequencies

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    wf = word_frequencies(docs, "text", top_words=100)
    vocab = wf.column("w").to_pylist()
    vix = {w: i for i, w in enumerate(vocab)}
    vref = ray.put(vix)

    def xtx(t: pa.Table) -> pa.Table:
        import polars as pl

        vmap = ray.get(vref)
        df = pl.from_arrow(pa.table({"doc_id": t.column("doc_id"), "text": t.column("text")}))
        pairs = (
            df.with_columns(
                pl.col("text").str.to_lowercase().str.extract_all(r"[a-z0-9]+").alias("w")
            )
            .drop("text")
            .explode("w")
            .filter(pl.col("w").is_in(list(vmap)))
            .unique()
        )
        did = pairs["doc_id"].to_numpy()
        wid = np.array([vmap[w] for w in pairs["w"].to_list()], dtype=np.int64)
        _, dix = np.unique(did, return_inverse=True)
        x = np.zeros((dix.max() + 1 if len(dix) else 0, len(vmap)), dtype=np.int64)
        if len(dix):
            x[dix, wid] = 1
        c = x.T @ x
        return pa.table(
            {
                "c": pa.array([c.astype(np.int64).tobytes()], pa.binary()),
                "nd": pa.array([int(x.shape[0])], pa.int64()),
            }
        )

    parts = docs.map_batches(xtx, batch_format="pyarrow").to_pandas()
    k = len(vocab)
    C = np.zeros((k, k), dtype=np.int64)
    for b in parts["c"]:
        C += np.frombuffer(b, dtype=np.int64).reshape(k, k)
    n_docs = docs.count()  # ALL docs (the oracle's denominator), not just vocab-hitting ones
    d = np.diag(C).copy()
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            if C[i, j] > 0:
                wa, wb = sorted((vocab[i], vocab[j]))
                pmi = float(np.log(float(C[i, j]) * n_docs / (d[i] * float(d[j]))))
                rows.append((wa, wb, int(C[i, j]), round(pmi, 6)))
    out = pd.DataFrame(rows, columns=["wa", "wb", "n_ab", "pmi"])
    return (
        out.sort_values(["n_ab", "wa", "wb"], ascending=[False, True, True])
        .head(20)
        .reset_index(drop=True)
    )


@q("bootstrap_mean_ci_value")
def bootstrap_mean_ci_value(sf_dir: str):
    """Poisson-bootstrap confidence interval for the mean event value —
    the map-reduce-native resampling trick (each row contributes an
    INDEPENDENT Poisson(1) weight per replicate, so all B resamples run in
    ONE streaming pass; no row ever needs to know the dataset size).
    Deterministic: weights come from splitmix64(row-hash ^ replicate) via
    inverse-CDF. Rows-only (seeded-RNG resampling is not SQL-expressible);
    coverage pinned in tests/test_bpe.py."""
    from perfect_bloomfilter_ray.functions.hashing import hash64, splitmix64

    B = 64
    # Poisson(1) inverse CDF table (k up to 8 covers 1-1e-9 of the mass)
    from math import exp, factorial

    pmf = [exp(-1.0) / factorial(k) for k in range(9)]
    cdf = np.cumsum(pmf)

    ds = _t(sf_dir, "events", ["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        h = hash64(t.column("event_id"), 0xB007)
        x = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        sw = np.empty(B, dtype=np.float64)
        swx = np.empty(B, dtype=np.float64)
        with np.errstate(over="ignore"):
            for b in range(B):
                u = splitmix64(h ^ np.uint64(0x9E3779B9 * (b + 1))).astype(np.float64) / 2**64
                w = np.searchsorted(cdf, u).astype(np.float64)
                sw[b] = w.sum()
                swx[b] = (w * x).sum()
        return pa.table(
            {
                "sw": pa.array([sw.tobytes()], pa.binary()),
                "swx": pa.array([swx.tobytes()], pa.binary()),
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sw = np.sum([np.frombuffer(b, np.float64) for b in parts["sw"]], axis=0)
    swx = np.sum([np.frombuffer(b, np.float64) for b in parts["swx"]], axis=0)
    reps = swx / np.maximum(sw, 1.0)
    mean = float(parts["sx"].sum() / parts["n"].sum())
    lo, hi = np.quantile(reps, [0.025, 0.975])
    return pd.DataFrame(
        {
            "n": [int(parts["n"].sum())],
            "mean": [round(mean, 6)],
            "ci_lo": [round(float(lo), 6)],
            "ci_hi": [round(float(hi), 6)],
            "replicates": [B],
        }
    )


@q("sketch_accuracy_report")
def sketch_accuracy_report(sf_dir: str):
    """One-table accuracy audit of the sketch tier against exact answers on
    the same column — the 'which sketch do I reach for' report: DDSketch /
    KLL / t-digest on value quantiles (p50, p99) and HLL / Theta on distinct
    users, each with its observed relative error. All sketches build in ONE
    shared scan (multi-sketch partials); exact twins use the engine's exact
    quantile and pair-distinct machinery. Rows-only by nature (estimates),
    with every per-sketch error bound separately pinned in pytest."""
    from perfect_bloomfilter_ray.stages.agg import multi_sketch_global
    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles
    from perfect_bloomfilter_ray.state.ddsketch import DDSketch
    from perfect_bloomfilter_ray.state.hll import HyperLogLog
    from perfect_bloomfilter_ray.state.kll import KLLSketch
    from perfect_bloomfilter_ray.state.req import REQSketch
    from perfect_bloomfilter_ray.state.tdigest import TDigest
    from perfect_bloomfilter_ray.state.theta import ThetaSketch

    ds = _t(sf_dir, "events", ["user_id", "value"]).materialize()
    sk = multi_sketch_global(
        ds,
        {
            "dd": ("value", lambda: DDSketch(0.01)),
            "kll": ("value", lambda: KLLSketch(256)),
            "td": ("value", lambda: TDigest(200)),
            "req": ("value", lambda: REQSketch(64)),
            "hll": ("user_id", lambda: HyperLogLog(14)),
            "theta": ("user_id", lambda: ThetaSketch(4096)),
        },
    )

    def add_g(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(len(t), np.int8)))

    gds = ds.map_batches(add_g, batch_format="pyarrow")
    qt = exact_grouped_quantiles(
        gds, "_g", "value", [0.5, 0.99, 0.999], kind="disc", names=["p50", "p99", "p999"]
    ).to_pandas()
    exact_p50, exact_p99 = float(qt.iloc[0]["p50"]), float(qt.iloc[0]["p99"])
    exact_p999 = float(qt.iloc[0]["p999"])

    def du(t: pa.Table) -> pa.Table:
        import polars as pl

        return pl.from_arrow(t.select(["user_id"])).unique().to_arrow()

    exact_users = float(gds.map_batches(du, batch_format="pyarrow").groupby("user_id").count().count())

    rows = []
    for metric, method, est, exact in (
        ("p50_value", "ddsketch", sk["dd"].quantile(0.5), exact_p50),
        ("p50_value", "kll", sk["kll"].quantile(0.5), exact_p50),
        ("p50_value", "tdigest", sk["td"].quantile(0.5), exact_p50),
        ("p99_value", "ddsketch", sk["dd"].quantile(0.99), exact_p99),
        ("p99_value", "kll", sk["kll"].quantile(0.99), exact_p99),
        ("p99_value", "tdigest", sk["td"].quantile(0.99), exact_p99),
        ("p99_value", "req", sk["req"].quantile(0.99), exact_p99),
        ("p999_value", "ddsketch", sk["dd"].quantile(0.999), exact_p999),
        ("p999_value", "kll", sk["kll"].quantile(0.999), exact_p999),
        ("p999_value", "req", sk["req"].quantile(0.999), exact_p999),
        ("distinct_users", "hll", sk["hll"].estimate(), exact_users),
        ("distinct_users", "theta", sk["theta"].estimate(), exact_users),
    ):
        rel = abs(float(est) - exact) / max(abs(exact), 1e-12)
        rows.append((metric, method, round(float(est), 4), round(exact, 4), round(rel, 6)))
    return pd.DataFrame(rows, columns=["metric", "method", "estimate", "exact", "rel_error"])


@q("minhash_calibration_report")
def minhash_calibration_report(sf_dir: str):
    """MinHash estimator calibration on real candidates: every LSH candidate
    pair's estimated Jaccard vs its EXACT n-gram Jaccard — mean absolute
    error, signed bias, fraction within ±0.1, and the precision of the
    est≥0.5 decision against exact≥0.5 truth. The 'can I trust the sketch
    threshold' tuning artifact (recall is a blocking-scheme property,
    measured separately by the LSH parameter tests). Deterministic."""
    from perfect_bloomfilter_ray.stages.dedup import minhash_lsh_pairs, ngram_jaccard

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    cand = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.3).to_pandas()
    if not len(cand):
        return pd.DataFrame(
            {"n_pairs": [0], "mae": [0.0], "bias": [0.0], "within_0_1": [1.0], "precision_at_05": [1.0]}
        )
    need = set(cand["id_a"]) | set(cand["id_b"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("doc_id"), value_set=pa.array(list(need))))

    texts = {r["doc_id"]: r["text"] for r in ds.map_batches(keep, batch_format="pyarrow").take_all()}
    exact = np.asarray(
        ngram_jaccard([texts[i] for i in cand["id_a"]], [texts[i] for i in cand["id_b"]], n_words=5)
    )
    est = cand["est_jaccard"].to_numpy()
    err = est - exact
    decided = est >= 0.5
    prec = float((exact[decided] >= 0.5).mean()) if decided.any() else 1.0
    return pd.DataFrame(
        {
            "n_pairs": [len(cand)],
            "mae": [round(float(np.abs(err).mean()), 6)],
            "bias": [round(float(err.mean()), 6)],
            "within_0_1": [round(float((np.abs(err) <= 0.1).mean()), 6)],
            "precision_at_05": [round(prec, 6)],
        }
    )


@q(
    "theta_daily_new_users",
    sql="""
    WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS d FROM events),
    f AS (SELECT user_id, min(date_trunc('day', ts)) AS d FROM events GROUP BY 1),
    n AS (SELECT d, count(*) AS c FROM f GROUP BY d)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           round(CAST(coalesce(n.c, 0) AS DOUBLE), 2) AS new_users_est
    FROM days LEFT JOIN n USING (d) ORDER BY day
    """,
)
def theta_daily_new_users(sf_dir: str):
    """Daily NEW-user estimation from per-day theta sketches: one grouped
    sketch build, then day_t's new users = |day_t \\ (day_0 ∪ … ∪ day_{t-1})|
    via the KMV set-difference — the sketch answer to 'how many users did we
    see for the first time today' WITHOUT a first-touch shuffle. The SQL
    oracle is a CONTRACT, not a recomputation: a KMV sketch whose retained
    set never overflows (distinct users ≤ k=65536 through sf1.0's 15k —
    k=4096 silently went approximate at sf1.0, caught by the 10x sweep) is
    EXACT — set ops included
    — so a hash mismatch here is a real sketch regression. At production
    cardinalities the same pipeline degrades gracefully to ±1/√k estimates.
    Day count is bounded, so the difference chain is driver-side tiny; the
    corpus-sized work is the one grouped build."""
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped
    from perfect_bloomfilter_ray.state.theta import ThetaSketch

    ds = _t(sf_dir, "events", ["ts", "user_id"])

    def day(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(pc.floor_temporal(t.column("ts"), unit="day"), pa.timestamp("us")), pa.int64())
        return pa.table({"d": d, "user_id": t.column("user_id")})

    per_day = sketch_grouped(
        ds.map_batches(day, batch_format="pyarrow"),
        key="d",
        col="user_id",
        factory=lambda: ThetaSketch(65536),
        name="sk",
    ).to_pandas()
    per_day = per_day.sort_values("d").reset_index(drop=True)
    sketches = [ThetaSketch.from_bytes(b) for b in per_day["sk"]]
    seen = None
    rows = []
    for d_us, sk in zip(per_day["d"], sketches):
        if seen is None:
            new_est = sk.estimate()
        else:
            new_est = sk.a_not_b_estimate(seen)
        rows.append((pd.to_datetime(d_us, unit="us").strftime("%Y-%m-%d"), round(float(new_est), 2)))
        seen = sk if seen is None else seen.merge(sk)
    return pd.DataFrame(rows, columns=["day", "new_users_est"])


@q("dd_quantile_rollup")
def dd_quantile_rollup(sf_dir: str):
    """THE mergeable-sketch selling point, as a pipeline: build per-HOUR
    DDSketches in one scan, then derive per-day p50/p99 by MERGING the
    hourly sketches — no second pass over the data, ever. (An OLAP cube of
    quantiles from one scan; the reference's frozen-layer design exists for
    exactly this mergeability.) Rows-only; the merge preserves the alpha
    contract because DDSketch merge is exact bucket addition — asserted
    against the exact per-day quantiles in tests/test_bpe.py."""
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped
    from perfect_bloomfilter_ray.state.ddsketch import DDSketch

    ds = _t(sf_dir, "events", ["ts", "value"])

    def hour(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.cast(pc.floor_temporal(t.column("ts"), unit="hour"), pa.timestamp("us")), pa.int64())
        return pa.table({"h": h, "value": t.column("value")})

    hourly = sketch_grouped(
        ds.map_batches(hour, batch_format="pyarrow"),
        key="h",
        col="value",
        factory=lambda: DDSketch(0.01),
        name="sk",
    ).to_pandas()
    DAY = 86_400_000_000
    hourly["day"] = (hourly["h"] // DAY) * DAY
    rows = []
    for day_us, grp in hourly.groupby("day"):
        merged = None
        for b in grp.sort_values("h")["sk"]:
            s = DDSketch.from_bytes(b)
            merged = s if merged is None else merged.merge(s)
        rows.append(
            (
                pd.to_datetime(day_us, unit="us").strftime("%Y-%m-%d"),
                len(grp),
                round(merged.quantile(0.5), 4),
                round(merged.quantile(0.99), 4),
            )
        )
    return pd.DataFrame(rows, columns=["day", "n_hours", "p50_est", "p99_est"]).sort_values("day").reset_index(drop=True)


@q("filter_bakeoff_report")
def filter_bakeoff_report(sf_dir: str):
    """Bloom cascade vs cuckoo filter on the same distinct-user key set:
    serialized bytes, bits per key, and observed FPR over 100k fresh probes
    — the capacity-planning table for choosing a membership structure
    (Bloom: smaller + add-only; cuckoo: deletable + bounded 2·b/2^16 FPR).
    Both build distributed from the same deduped Dataset; deterministic
    seeds make the observed FPRs rerun-stable. Rows-only by nature."""
    import ray

    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.stages.membership import build_filter
    from perfect_bloomfilter_ray.state.cuckoo import CuckooFilter

    distinct = (
        _t(sf_dir, "events", ["user_id"]).groupby("user_id").count().drop_columns(["count()"])
    ).materialize()
    n = distinct.count()
    bloom = build_filter(distinct, "user_id", expected_keys=max(1024, n))
    cuckoo = sketch_global(distinct, "user_id", lambda: CuckooFilter.for_capacity(max(1024, n)))
    fresh = pa.array(np.arange(50_000_000, 50_100_000))
    rows = []
    for name, f in (("bloom_cascade", bloom), ("cuckoo", cuckoo)):
        blob = f.to_bytes()
        fp = int(f.contains_column(fresh).sum())
        rows.append(
            (
                name,
                n,
                len(blob),
                round(len(blob) * 8.0 / max(n, 1), 2),
                100_000,
                fp,
                True if name == "cuckoo" else False,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["filter", "keys", "bytes", "bits_per_key", "fresh_probes", "false_positives", "supports_delete"],
    )


@q(
    "event_type_trigrams",
    sql="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
      FROM events
    )
    SELECT p2 AS s1, p1 AS s2, event_type AS s3, CAST(count(*) AS BIGINT) AS n
    FROM s WHERE p2 IS NOT NULL
    GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT 25
    """,
)
def event_type_trigrams(sf_dir: str):
    """Sequential-pattern mining one level up from the Markov transitions:
    the top event-type TRIGRAMS per user ordering — funnel-discovery input.
    Same keyed-window shape (coarse co-partition, one vectorized double
    shift over contiguous key runs), tiny triple groupby, tree-reduce
    top-k."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
    from perfect_bloomfilter_ray.stages.topk import global_top_k

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    nb = np.uint64(choose_num_blocks(ds))

    def tag(t: pa.Table) -> pa.Table:
        h = hash64(t.column("user_id"), 0x5E55)
        return t.append_column("_part", pa.array((h % nb).astype(np.int32)))

    def per_part(t: pa.Table) -> pa.Table:
        import polars as pl

        if len(t) == 0:
            return pa.table(
                {"s1": pa.array([], pa.string()), "s2": pa.array([], pa.string()),
                 "s3": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
            )
        df = (
            pl.from_arrow(t.select(["user_id", "ts", "event_id", "event_type"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                pl.col("event_type").shift(1).over("user_id").alias("p1"),
                pl.col("event_type").shift(2).over("user_id").alias("p2"),
            )
            .filter(pl.col("p2").is_not_null())
        )
        return (
            df.group_by(["p2", "p1", "event_type"])
            .len(name="pn")
            .rename({"p2": "s1", "p1": "s2", "event_type": "s3"})
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    counts = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby(["s1", "s2", "s3"])
        .aggregate(Sum("pn", alias_name="n"))
    )
    out = (
        global_top_k(counts, "n", 25, descending=True, tie_cols=["s1", "s2", "s3"])
        .to_pandas()
        .sort_values(["n", "s1", "s2", "s3"], ascending=[False, True, True, True])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out[["s1", "s2", "s3", "n"]]


@q(
    "view_purchase_crosscorr",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
      FROM events GROUP BY 1
    ),
    r AS (SELECT v, p, row_number() OVER (ORDER BY b) AS i FROM h),
    pr AS (SELECT a.v AS x, b.p AS y FROM r a JOIN r b ON b.i = a.i + 1),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(sum(x*y) AS BIGINT) AS sxy
      FROM pr
    )
    SELECT n AS n_pairs,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
               AS lag1_crosscorr
    FROM s
    """,
)
def view_purchase_crosscorr(sf_dir: str):
    """Lagged cross-correlation between two event streams: do view spikes
    this hour predict purchase volume next hour? One conditional hourly
    count groupby (both series in a single pass), Pearson over the lagged
    pairs from exact integer sums — the leading-indicator probe."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        import polars as pl

        b = pc.cast(pc.cast(pc.floor_temporal(t.column("ts"), unit="hour"), pa.timestamp("us")), pa.int64())
        df = pl.from_arrow(pa.table({"b": b, "et": t.column("event_type")}))
        return (
            df.group_by("b")
            .agg(
                (pl.col("et") == "view").sum().cast(pl.Int64).alias("v"),
                (pl.col("et") == "purchase").sum().cast(pl.Int64).alias("p"),
            )
            .to_arrow()
        )

    h = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("v", alias_name="v"), Sum("p", alias_name="p"))
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    x = h["v"].to_numpy().astype(np.int64)[:-1]
    y = h["p"].to_numpy().astype(np.int64)[1:]
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, syy, sxy = int((x * x).sum()), int((y * y).sum()), int((x * y).sum())
    r = (float(n) * sxy - float(sx) * sy) / (
        np.sqrt(float(n) * sxx - float(sx) * sx) * np.sqrt(float(n) * syy - float(sy) * sy)
    )
    return pd.DataFrame({"n_pairs": [n], "lag1_crosscorr": [round(r, 6)]})


@q(
    "cohort_ltv_curve",
    sql="""
    WITH e AS (
      SELECT user_id, date_trunc('week', ts) AS wk,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
    j AS (
      SELECT f.cohort,
             CAST(date_diff('week', f.cohort, e.wk) AS BIGINT) AS offset_w,
             e.cents
      FROM e JOIN f USING (user_id)
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort, offset_w,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM j GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def cohort_ltv_curve(sf_dir: str):
    """Cohort lifetime-value curve: revenue per (signup-cohort, week-offset)
    cell — the monetization twin of user_retention_cohorts, and the same
    single-exchange shape: (user, week, cents) partials co-partition by
    user, cohort resolves inside each block, only tiny per-partition cell
    sums leave. Integer cents → bit-exact."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    WEEK_US = 7 * 86400 * 1_000_000
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])
    nb = np.uint64(choose_num_blocks(ds))

    def wk(t: pa.Table) -> pa.Table:
        import polars as pl

        w = pc.cast(pc.cast(pc.floor_temporal(t.column("ts"), unit="week"), pa.timestamp("us")), pa.int64())
        cents = np.round(t.column("value").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        tbl = (
            pl.from_arrow(pa.table({"user_id": t.column("user_id"), "wk": w, "cents": pa.array(cents)}))
            .group_by(["user_id", "wk"])
            .agg(pl.col("cents").sum())
            .to_arrow()
        )
        h = hash64(tbl.column("user_id"), 0x5E55)
        return tbl.append_column("_part", pa.array((h % nb).astype(np.int32)))

    def per_part(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            pl.from_arrow(t.select(["user_id", "wk", "cents"]))
            .group_by(["user_id", "wk"])
            .agg(pl.col("cents").sum())
        )
        df = df.with_columns(pl.col("wk").min().over("user_id").alias("cohort_us"))
        df = df.with_columns(((pl.col("wk") - pl.col("cohort_us")) // WEEK_US).alias("offset_w"))
        return (
            df.group_by(["cohort_us", "offset_w"])
            .agg(pl.col("cents").sum().alias("pc"))
            .to_arrow()
        )

    out = (
        ds.map_batches(wk, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby(["cohort_us", "offset_w"])
        .aggregate(Sum("pc", alias_name="revenue_cents"))
        .to_pandas()
    )
    out["cohort"] = pd.to_datetime(out["cohort_us"], unit="us").dt.strftime("%Y-%m-%d")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["offset_w"] = out["offset_w"].astype("int64")
    return (
        out[["cohort", "offset_w", "revenue_cents"]]
        .sort_values(["cohort", "offset_w"])
        .reset_index(drop=True)
    )


@q(
    "timed_funnel_view_click_purchase",
    sql="""
    WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t
             AND epoch_us(e.ts) <= s1.t + 86400000000
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t
             AND epoch_us(e.ts) <= s2.t + 604800000000
           GROUP BY e.user_id)
    SELECT 0 AS stage_idx, 'view' AS stage, CAST((SELECT count(*) FROM s1) AS BIGINT) AS users
    UNION ALL
    SELECT 1, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 2, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
    ORDER BY stage_idx
    """,
)
def timed_funnel_view_click_purchase(sf_dir: str):
    """Time-constrained conversion funnel: view → click within 24h →
    purchase within 7d of the click. The deadline variant of
    user_funnel_view_click_purchase (same vectorized segment-min kernel,
    stages/windows.funnel_counts(max_gaps=), greedy earliest-pick stays
    exact under deadlines)."""
    from perfect_bloomfilter_ray.stages.windows import funnel_counts

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    HOUR = 3_600_000_000
    return funnel_counts(
        ds,
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        max_gaps=[24 * HOUR, 7 * 24 * HOUR],
    )


@q(
    "boolean_retrieval_hash_join",
    sql="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(lower(text), '\\bhash\\b')) AS BIGINT) AS tf_a,
             CAST(len(regexp_extract_all(lower(text), '\\bjoin\\b')) AS BIGINT) AS tf_b
      FROM documents
    )
    SELECT doc_id, tf_a, tf_b, tf_a + tf_b AS score
    FROM f WHERE tf_a > 0 AND tf_b > 0
    ORDER BY score DESC, doc_id LIMIT 25
    """,
)
def boolean_retrieval_hash_join(sf_dir: str):
    """Boolean AND retrieval ranked by combined term frequency — the search
    primitive over the same per-doc term counts that feed the inverted
    index (token_posting_lists): one vectorized tf pass, stream filter,
    tree-reduce top-k. No full sort, no posting-list materialization for a
    2-term conjunctive query."""
    from perfect_bloomfilter_ray.stages.topk import global_top_k

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def tf(t: pa.Table) -> pa.Table:
        import polars as pl

        txt = pl.from_arrow(pa.table({"t": t.column("text")}))["t"].str.to_lowercase()
        a = txt.str.count_matches(r"\bhash\b").cast(pl.Int64)
        b = txt.str.count_matches(r"\bjoin\b").cast(pl.Int64)
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "tf_a": a.to_arrow(),
                "tf_b": b.to_arrow(),
            }
        )
        keep = pc.and_(pc.greater(out.column("tf_a"), 0), pc.greater(out.column("tf_b"), 0))
        out = out.filter(keep)
        score = pc.add(out.column("tf_a"), out.column("tf_b"))
        return out.append_column("score", score)

    hits = ds.map_batches(tf, batch_format="pyarrow")
    out = (
        global_top_k(hits, "score", 25, descending=True, tie_cols=["doc_id"])
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    for c in ("tf_a", "tf_b", "score"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "tf_a", "tf_b", "score"]]


@q("user_behavior_segments")
def user_behavior_segments(sf_dir: str):
    """Behavioral segmentation: k-means over per-user event-type count
    vectors (log1p-scaled) — the 'persona clustering' step, showing the
    k-means stage is feature-agnostic (same kernel as the embedding
    clustering). One pivot groupby builds the feature vectors; per-cluster
    sizes + inertia come back from the shared Lloyd loop. Rows-only
    (iterative)."""
    from perfect_bloomfilter_ray.stages.kmeans import kmeans_full

    ds = _t(sf_dir, "events", ["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    def pivot(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"user_id": t.column("user_id"), "et": t.column("event_type")}))
        agg = df.group_by("user_id").agg(
            *[(pl.col("et") == ty).sum().cast(pl.Int64).alias(f"n_{ty}") for ty in types]
        )
        return agg.to_arrow()

    per_user = (
        ds.map_batches(pivot, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in types])
    )

    def vecs(t: pa.Table) -> pa.Table:
        m = np.stack(
            [t.column(f"n_{ty}").to_numpy(zero_copy_only=False).astype(np.float64) for ty in types],
            axis=1,
        )
        feat = np.log1p(m).astype(np.float32)
        return pa.table(
            {
                "vec_id": t.column("user_id"),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(feat.reshape(-1)), len(types)
                ),
            }
        )

    fds = per_user.map_batches(vecs, batch_format="pyarrow").materialize()
    _, stats = kmeans_full(fds, "embedding", "vec_id", k=5, iters=8, seed=19)
    out = stats.to_pandas()
    out["inertia"] = out["inertia"].round(4)
    return out.sort_values("cluster").reset_index(drop=True)


@q(
    "path_conversion_rates",
    sql="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
      FROM events
    )
    SELECT p2 AS s1, p1 AS s2,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchase,
           round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS conv_rate
    FROM s WHERE p2 IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def path_conversion_rates(sf_dir: str):
    """Path-prefix attribution: for every observed 2-step path (s1, s2),
    the probability the NEXT event is a purchase — the micro-conversion
    table behind journey optimization. Same double-shift keyed-window
    kernel as the trigram miner; conditional counts are exact integers."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    nb = np.uint64(choose_num_blocks(ds))

    def tag(t: pa.Table) -> pa.Table:
        h = hash64(t.column("user_id"), 0x5E55)
        return t.append_column("_part", pa.array((h % nb).astype(np.int32)))

    def per_part(t: pa.Table) -> pa.Table:
        import polars as pl

        if len(t) == 0:
            return pa.table(
                {"s1": pa.array([], pa.string()), "s2": pa.array([], pa.string()),
                 "pn": pa.array([], pa.int64()), "pp": pa.array([], pa.int64())}
            )
        df = (
            pl.from_arrow(t.select(["user_id", "ts", "event_id", "event_type"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                pl.col("event_type").shift(1).over("user_id").alias("p1"),
                pl.col("event_type").shift(2).over("user_id").alias("p2"),
            )
            .filter(pl.col("p2").is_not_null())
        )
        return (
            df.group_by(["p2", "p1"])
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                (pl.col("event_type") == "purchase").sum().cast(pl.Int64).alias("pp"),
            )
            .rename({"p2": "s1", "p1": "s2"})
            .to_arrow()
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby(["s1", "s2"])
        .aggregate(Sum("pn", alias_name="n_total"), Sum("pp", alias_name="n_purchase"))
        .to_pandas()
        .sort_values(["s1", "s2"])
        .reset_index(drop=True)
    )
    out["n_total"] = out["n_total"].astype("int64")
    out["n_purchase"] = out["n_purchase"].astype("int64")
    out["conv_rate"] = (out["n_purchase"].astype(float) / out["n_total"]).round(6)
    return out[["s1", "s2", "n_total", "n_purchase", "conv_rate"]]


@q(
    "char_entropy_per_lang",
    sql="""
    WITH ch AS (
      SELECT lang, unnest(regexp_extract_all(text, '.')) AS c FROM documents
    ),
    cnt AS (SELECT lang, c, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY 1)
    SELECT cnt.lang,
           CAST(max(tot.t) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS alphabet,
           round(-sum((CAST(n AS DOUBLE) / tot.t) * ln(CAST(n AS DOUBLE) / tot.t))
                 / ln(2), 6) AS entropy_bits
    FROM cnt JOIN tot USING (lang)
    GROUP BY cnt.lang ORDER BY cnt.lang
    """,
)
def char_entropy_per_lang(sf_dir: str):
    """Shannon character entropy per language — the compression lower bound
    (bits/char) and a corpus-quality fingerprint (gibberish and boilerplate
    both move it). Map-side per-batch character counts (vectorized polars
    explode), one tiny (lang, char) groupby, entropy from exact integer
    counts with the identical log expression as the oracle."""
    ds = _t(sf_dir, "documents", ["lang", "text"])

    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(pa.table({"lang": t.column("lang"), "text": t.column("text")}))
        return (
            df.with_columns(pl.col("text").str.extract_all(r".").alias("c"))
            .drop("text")
            .explode("c")
            .drop_nulls("c")
            .group_by(["lang", "c"])
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    cnt = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["lang", "c"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for lang, g in cnt.sort_values(["lang", "c"]).groupby("lang"):
        n = g["n"].to_numpy().astype(np.float64)  # char-sorted: rerun-stable sum order
        t = n.sum()
        p = n / t
        ent = float(-(p * np.log(p)).sum() / np.log(2))
        rows.append((lang, int(t), len(g), round(ent, 6)))
    return pd.DataFrame(rows, columns=["lang", "n_chars", "alphabet", "entropy_bits"]).sort_values("lang").reset_index(drop=True)


@q("bpe_fertility_report")
def bpe_fertility_report(sf_dir: str):
    """Tokenizer fertility: average tokens per word (occurrence-weighted)
    after applying the corpus-trained BPE merges — the tokenizer-quality
    number LLM teams track (baseline = chars+1 per word with no merges).
    Distributed train (bounded merge loop over map-side word counts) +
    broadcast-rank encode pass. Rows-only (iterative); encoder exactness
    pinned in tests/test_bpe.py."""
    from perfect_bloomfilter_ray.stages.bpe import fertility_report

    ds = _t(sf_dir, "documents", ["text"])
    rep = fertility_report(ds, "text", num_merges=200, top_words=20_000)
    return pd.DataFrame([rep])


@q(
    "referential_integrity_audit",
    sql="""
    SELECT 'orders.o_custkey->customer' AS fk_edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS child_rows,
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
               AS orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
    ORDER BY fk_edge
    """,
)
def referential_integrity_audit(sf_dir: str):
    """Foreign-key orphan audit across two FK edges — the ingest sanity
    check before any join-dependent pipeline runs. Each edge: the parent
    key set builds the cascading Bloom filter by tree-reduce and children
    probe it shuffle-free. A Bloom MISS is a true orphan with certainty
    (no false negatives), so the orphan count is exact up to filter false
    positives masking real orphans — ~3e-13/probe at the cascade bound,
    the same contract class as bloom_membership_roundtrip (an orphan-rich
    adversarial corpus should add the exact verify join from
    stages/decontam.decontaminate_bloom)."""
    import ray

    from perfect_bloomfilter_ray.stages.membership import build_filter
    from perfect_bloomfilter_ray.state.bloom import BloomCascade

    rows = []
    for edge, child, ckey, parent, pkey in (
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ):
        par = _t(sf_dir, parent, [pkey])
        n_par = par.count()
        filt = build_filter(par, pkey, expected_keys=max(1024, n_par))
        ref = ray.put(filt.to_bytes())

        def probe(t: pa.Table, _ref=ref, _ck=ckey) -> pa.Table:
            f = BloomCascade.from_bytes(ray.get(_ref))
            hit = f.contains_column(t.column(_ck))
            return pa.table(
                {
                    "n": pa.array([len(t)], pa.int64()),
                    # Bloom "not contained" is EXACT (no false negatives):
                    # misses are true orphans with certainty
                    "orphans": pa.array([int((~hit).sum())], pa.int64()),
                }
            )

        p = _t(sf_dir, child, [ckey]).map_batches(probe, batch_format="pyarrow").to_pandas().sum()
        rows.append((edge, int(p["n"]), int(p["orphans"])))
    return pd.DataFrame(rows, columns=["fk_edge", "child_rows", "orphans"]).sort_values("fk_edge").reset_index(drop=True)


@q(
    "session_features_stats",
    sql="""
    WITH s AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
      FROM events
    ),
    f AS (
      SELECT user_id, event_id, event_type, t,
             CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1 ELSE 0 END AS ns
      FROM s
    ),
    g AS (
      SELECT user_id, event_id, event_type, t,
             sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM f
    ),
    sess AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(t) - min(t) AS BIGINT) AS dur_us,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 AS converted
      FROM g GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           round(CAST(sum(n_events) AS DOUBLE) / count(*), 6) AS avg_events,
           CAST(sum(dur_us) // count(*) AS BIGINT) AS avg_dur_us,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conversion_rate,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS bounce_rate
    FROM sess
    """,
)
def session_features_stats(sf_dir: str):
    """Session-level product analytics from gap sessionization (30-min
    gap): sessions, average events and duration, conversion rate (any
    purchase in session) and bounce rate (single-event sessions). The
    engine side reuses the event-level sessionizer (stages/windows.
    sessionize(stats=False)) and reduces per-session rows with one
    co-partitioned pass; every ratio derives from exact integer sums (the
    avg duration is an integer floor-division, dodging the half-even
    rounding trap)."""
    from perfect_bloomfilter_ray.stages.windows import sessionize

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    ev = sessionize(ds, "user_id", "ts", gap="30min", stats=False)

    def per_sess_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        df = pl.from_arrow(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "sid": t.column("session_id"),
                    "t": ts_us,
                    "et": t.column("event_type"),
                }
            )
        )
        return (
            df.group_by(["user_id", "sid"])
            .agg(
                pl.len().cast(pl.Int64).alias("n_events"),
                pl.col("t").min().alias("tmin"),  # a session may span batches:
                pl.col("t").max().alias("tmax"),  # merge extents, not durations
                (pl.col("et") == "purchase").any().cast(pl.Int64).alias("converted"),
            )
            .to_arrow()
        )

    sess = (
        ev.map_batches(per_sess_partial, batch_format="pyarrow")
        .groupby(["user_id", "sid"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Min("tmin", alias_name="tmin"),
            Max("tmax", alias_name="tmax"),
            Max("converted", alias_name="converted"),
        )
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t.column("n_events").to_numpy()
        dur = t.column("tmax").to_numpy() - t.column("tmin").to_numpy()
        return pa.table(
            {
                "n_sessions": pa.array([len(t)], pa.int64()),
                "events": pa.array([int(n.sum())], pa.int64()),
                "dur": pa.array([int(dur.sum())], pa.int64()),
                "conv": pa.array([int(t.column("converted").to_numpy().sum())], pa.int64()),
                "bounce": pa.array([int((n == 1).sum())], pa.int64()),
            }
        )

    p = sess.map_batches(fold, batch_format="pyarrow").to_pandas().sum()
    ns = int(p["n_sessions"])
    return pd.DataFrame(
        {
            "n_sessions": [ns],
            "avg_events": [round(float(p["events"]) / ns, 6)],
            "avg_dur_us": [int(p["dur"]) // ns],
            "conversion_rate": [round(float(p["conv"]) / ns, 6)],
            "bounce_rate": [round(float(p["bounce"]) / ns, 6)],
        }
    )


@q(
    "value_seasonality_effects",
    sql="""
    WITH f AS (
      SELECT value,
             CAST(extract(dow FROM ts) AS BIGINT) AS dw,
             CAST(extract(hour FROM ts) AS BIGINT) AS hr
      FROM events
    ),
    g AS (SELECT sum(value) AS s, CAST(count(*) AS BIGINT) AS n FROM f),
    d AS (SELECT dw, sum(value) AS s, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
    h AS (SELECT hr, sum(value) AS s, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1)
    SELECT 'dow' AS dim, dw AS level, round(d.s / d.n - g.s / g.n, 4) AS effect
    FROM d, g
    UNION ALL
    SELECT 'hour', hr, round(h.s / h.n - g.s / g.n, 4) FROM h, g
    ORDER BY dim, level
    """,
)
def value_seasonality_effects(sf_dir: str):
    """Additive seasonality decomposition of event value: per-day-of-week
    and per-hour effects (level mean minus grand mean) — the two marginal
    profiles a forecasting pipeline detrends with. One (dow, hour)
    contingency pass yields both marginals AND the grand mean; identical
    mean-difference expression on both sides."""
    ds = _t(sf_dir, "events", ["ts", "value"])

    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        df = pl.from_arrow(
            pa.table(
                {
                    "dw": pc.cast(pc.day_of_week(ts, count_from_zero=True, week_start=7), pa.int64()),
                    "hr": pc.cast(pc.hour(ts), pa.int64()),
                    "v": t.column("value"),
                }
            )
        )
        return (
            df.group_by(["dw", "hr"])
            .agg(pl.col("v").sum().alias("s"), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
        )

    cells = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["dw", "hr"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["dw", "hr"])
        .reset_index(drop=True)
    )
    gs, gn = float(cells["s"].sum()), int(cells["n"].sum())
    grand = gs / gn
    rows = []
    for dim, col in (("dow", "dw"), ("hour", "hr")):
        m = cells.groupby(col).agg(s=("s", "sum"), n=("n", "sum")).reset_index().sort_values(col)
        for r in m.itertuples():
            rows.append((dim, int(getattr(r, col)), round(float(r.s) / r.n - grand, 4)))
    return pd.DataFrame(rows, columns=["dim", "level", "effect"]).sort_values(["dim", "level"]).reset_index(drop=True)


@q(
    "dup_rate_per_source",
    sql="""
    WITH f AS (
      SELECT source,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9_ \t\n]', '', 'g'),
                                 '[ \t\n]+', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT norm) AS BIGINT) AS n_distinct,
           round(1.0 - CAST(count(DISTINCT norm) AS DOUBLE) / count(*), 6) AS dup_rate
    FROM f GROUP BY source ORDER BY source
    """,
)
def dup_rate_per_source(sf_dir: str):
    """Duplicate rate per source on the normalized-text fingerprint — the
    'which feeds are recycling content' curation metric that decides
    per-source dedup budgets. Per-batch distinct (source, norm) partials,
    one pair-distinct exchange, tiny per-source counts."""
    from perfect_bloomfilter_ray.functions.text import normalize_text

    ds = _t(sf_dir, "documents", ["source", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(
                pa.table({"source": t.column("source"), "norm": normalize_text(t.column("text"))})
            )
            .unique()
            .to_arrow()
        )

    def totals(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(pa.table({"source": t.column("source")}))
            .group_by("source")
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    tot = (
        ds.map_batches(totals, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("pn", alias_name="n_docs"))
        .to_pandas()
    )
    dist_pairs = (
        ds.map_batches(pairs, batch_format="pyarrow").groupby(["source", "norm"]).count()
    )

    def dcount(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["source"]))
            .group_by("source")
            .len(name="pd")
            .with_columns(pl.col("pd").cast(pl.Int64))
            .to_arrow()
        )

    dist = (
        dist_pairs.map_batches(dcount, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("pd", alias_name="n_distinct"))
        .to_pandas()
    )
    out = tot.merge(dist, on="source").sort_values("source").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    out["dup_rate"] = (1.0 - out["n_distinct"].astype(float) / out["n_docs"]).round(6)
    return out[["source", "n_docs", "n_distinct", "dup_rate"]]


@q(
    "funnel_stage_latency",
    sql="""
    WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t GROUP BY e.user_id)
    SELECT 'view->click' AS transition,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(quantile_disc((s2.t - s1.t) // 1000000, 0.5) AS BIGINT) AS median_lag_s
    FROM s1 JOIN s2 USING (user_id)
    UNION ALL
    SELECT 'click->purchase', CAST(count(*) AS BIGINT),
           CAST(quantile_disc((s3.t - s2.t) // 1000000, 0.5) AS BIGINT)
    FROM s2 JOIN s3 USING (user_id)
    ORDER BY transition
    """,
)
def funnel_stage_latency(sf_dir: str):
    """Per-transition funnel latency: median seconds between the greedy
    funnel's stage events (earliest view → earliest later click → earliest
    later purchase). The same segment-min kernel as funnel_counts but
    emitting per-user stage TIMES; exact integer-second medians via the
    exact-quantile machinery."""
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type"])
    nb = np.uint64(choose_num_blocks(ds))
    stages = ["view", "click", "purchase"]

    def tag(t: pa.Table) -> pa.Table:
        h = hash64(t.column("user_id"), 0xF0E1)
        return t.append_column("_part", pa.array((h % nb).astype(np.int32)))

    def per_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"transition": pa.array([], pa.string()), "lag_s": pa.array([], pa.int64())}
            )
        k = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        ty = t.column("event_type").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k_s, ts_s, ty_s = k[order], ts[order], ty[order]
        new = np.ones(len(k_s), dtype=bool)
        new[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(new)
        seg = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(k_s))))
        INF = np.iinfo(np.int64).max
        prev = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)
        stage_times = []
        for s in stages:
            cand = np.where((ty_s == s) & (ts_s > prev[seg]), ts_s, INF)
            cur = np.minimum.reduceat(cand, starts)
            stage_times.append(cur)
            prev = cur
        trans, lags = [], []
        for i, name in enumerate(["view->click", "click->purchase"]):
            a, b = stage_times[i], stage_times[i + 1]
            ok = (a < INF) & (b < INF)
            lag = (b[ok] - a[ok]) // 1_000_000
            trans.extend([name] * int(ok.sum()))
            lags.extend(lag.tolist())
        return pa.table({"transition": pa.array(trans), "lag_s": pa.array(lags, pa.int64())})

    lags = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    ).materialize()
    qt = exact_grouped_quantiles(lags, "transition", "lag_s", [0.5], kind="disc", names=["median_lag_s"]).to_pandas()

    def cnt(t: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(t.select(["transition"]))
            .group_by("transition")
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
            .to_arrow()
        )

    n = (
        lags.map_batches(cnt, batch_format="pyarrow")
        .groupby("transition")
        .aggregate(Sum("pn", alias_name="n_users"))
        .to_pandas()
    )
    out = n.merge(qt, on="transition").sort_values("transition").reset_index(drop=True)
    out["n_users"] = out["n_users"].astype("int64")
    out["median_lag_s"] = out["median_lag_s"].astype("int64")
    return out[["transition", "n_users", "median_lag_s"]]


@q("bpe_vocab_merges")
def bpe_vocab_merges(sf_dir: str):
    """Distributed BPE tokenizer training (Sennrich et al. 2016): corpus word
    frequencies by map-side partial counts + one groupby exchange, then the
    greedy merge loop over the BOUNDED top-words table (the standard trainer
    architecture — driver state is O(top_words), corpus-size-independent).
    Rows-only (iterative, not SQL-expressible); exactness pinned in
    tests/test_bpe.py against a naive full-recount reference."""
    from perfect_bloomfilter_ray.stages.bpe import bpe_merge_table

    ds = _t(sf_dir, "documents", ["text"])
    return bpe_merge_table(ds, "text", num_merges=60, top_words=20_000).to_pandas()


@q(
    "bm25_doc_ranking",
    sql="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    n AS (SELECT count(*) AS n FROM documents),
    tot AS (SELECT count(*) AS t FROM toks),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    qt AS (SELECT unnest(['join', 'filter', 'vector', 'stream']) AS token),
    df AS (
      SELECT token, count(DISTINCT doc_id) AS df
      FROM toks JOIN qt USING (token) GROUP BY token
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM toks JOIN qt USING (token) GROUP BY doc_id, token
    ),
    sc AS (
      SELECT tf.doc_id,
             count(*) AS n_terms,
             sum(ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * 2.2
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl
                     / (tot.t / CAST(n.n AS DOUBLE))))) AS score
      FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
      CROSS JOIN n CROSS JOIN tot
      GROUP BY tf.doc_id
    )
    SELECT sc.doc_id, CAST(dl.dl AS BIGINT) AS dl,
           CAST(sc.n_terms AS BIGINT) AS n_terms,
           round(sc.score, 4) AS score
    FROM sc JOIN dl USING (doc_id) ORDER BY sc.doc_id
    """,
)
def bm25_doc_ranking(sf_dir: str):
    """Okapi BM25 retrieval scoring (stages/vocab.py bm25_query_stats /
    bm25_score): one constant-width corpus pass collects df per query term
    + total token count (the shuffle carries |terms|+1 rows per batch), the
    O(|terms|) stats ride the task closure, and scoring is a shuffle-free
    vectorized map — tokenize, filter to the query terms, per-doc tf via one
    bincount, Lucene-style idf. Emits every matching document keyed by
    doc_id so the oracle compare needs no float-ordered top-k boundary."""
    from perfect_bloomfilter_ray.stages.vocab import bm25_query_stats, bm25_score

    terms = ["join", "filter", "vector", "stream"]
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, no scan
    dfs, total_tokens = bm25_query_stats(docs, "text", terms)
    avgdl = total_tokens / float(n_docs)
    scored = bm25_score(docs, "text", terms, dfs, n_docs, avgdl)
    out = (
        scored.filter(expr="n_terms > 0")
        .select_columns(["doc_id", "dl", "n_terms", "score"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return _round(out, {"score": 4})


@q(
    "hourly_peak_concurrent_sessions",
    sql="""
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
      FROM events
    ),
    f AS (
      SELECT user_id, event_id, t,
             CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1 ELSE 0 END AS ns
      FROM s
    ),
    g AS (
      SELECT user_id, t,
             sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM f
    ),
    sess AS (SELECT user_id, sid, min(t) AS t0, max(t) AS t1 FROM g GROUP BY 1, 2),
    b AS (
      SELECT t0 AS t, 1 AS d FROM sess
      UNION ALL
      SELECT t1 AS t, -1 AS d FROM sess
    ),
    r AS (
      SELECT (t // 3600000000) * 3600000000 AS bucket_us,
             sum(d) OVER (ORDER BY t, d DESC ROWS UNBOUNDED PRECEDING) AS conc
      FROM b
    )
    SELECT bucket_us, CAST(count(*) AS BIGINT) AS n_bound,
           CAST(max(conc) AS BIGINT) AS peak
    FROM r GROUP BY bucket_us ORDER BY bucket_us
    """,
)
def hourly_peak_concurrent_sessions(sf_dir: str):
    """Peak concurrent 30-min-gap sessions per hour (stages/windows.
    peak_concurrency): gap sessions reduce to (start, end) extents via one
    co-partitioned exchange, each extent emits +1/-1 boundary rows, and the
    per-hour peak resolves with a segmented sweep — one hash exchange by
    hour bucket, a vectorized lexsort+cumsum per bucket, and an O(#hours)
    driver fold with a running carry. No global sort, no corpus-sized
    driver state. Closed intervals: opens order before closes at equal
    timestamps on both sides."""
    from perfect_bloomfilter_ray.stages.windows import peak_concurrency, sessionize

    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts"])
    ev = sessionize(ds, "user_id", "ts", gap="30min", stats=False)

    def per_sess_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        ts_us = pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64())
        df = pl.from_arrow(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "sid": t.column("session_id"),
                    "t": ts_us,
                }
            )
        )
        # a session may span batches: merge extents downstream
        return (
            df.group_by(["user_id", "sid"])
            .agg(pl.col("t").min().alias("t0"), pl.col("t").max().alias("t1"))
            .to_arrow()
        )

    sess = (
        ev.map_batches(per_sess_partial, batch_format="pyarrow")
        .groupby(["user_id", "sid"])
        .aggregate(Min("t0", alias_name="t0"), Max("t1", alias_name="t1"))
    )
    return peak_concurrency(sess, "t0", "t1")


@q(
    "ks_view_click_value",
    sql="""
    WITH v AS (
      SELECT value, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS h
      FROM events WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ),
    c AS (
      SELECT value,
             sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS c0,
             sum(h) AS c1
      FROM v GROUP BY value
    ),
    n AS (SELECT sum(c0) AS n0, sum(c1) AS n1 FROM c),
    r AS (
      SELECT sum(c0) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f0,
             sum(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS f1
      FROM c
    )
    SELECT CAST(n.n0 AS BIGINT) AS n0, CAST(n.n1 AS BIGINT) AS n1,
           CAST(max(abs(f0 * n.n1 - f1 * n.n0)) AS BIGINT) AS ks_num
    FROM r CROSS JOIN n GROUP BY n.n0, n.n1
    """,
)
def ks_view_click_value(sf_dir: str):
    """Distributed EXACT two-sample Kolmogorov-Smirnov test (stages/
    quantiles.ks_two_sample) between the view and click value
    distributions — the distribution-drift check behind A/B guardrails and
    data-freshness monitors. The global ordered ECDF scan is replaced by a
    distinct-value collapse + per-range-bucket segmented scan with an
    O(num_buckets) driver carry fold (same decomposition as windows.
    peak_concurrency); the statistic is the exact integer numerator
    ``max |cum0*n1 - cum1*n0|`` so the oracle hashes bit-identically
    (D = ks_num / (n0*n1))."""
    from perfect_bloomfilter_ray.stages.quantiles import ks_two_sample

    ds = _t(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'view' or event_type == 'click'"
    )

    def tag(t: pa.Table) -> pa.Table:
        h = pc.if_else(pc.equal(t.column("event_type"), "view"), 0, 1)
        return t.append_column("h", pc.cast(h, pa.int64()))

    res = ks_two_sample(ds.map_batches(tag, batch_format="pyarrow"), "value", "h")
    return pd.DataFrame([res])[["n0", "n1", "ks_num"]]


@q(
    "mw_view_click_value",
    sql="""
    WITH v AS (
      SELECT value, CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS h
      FROM events WHERE event_type IN ('view', 'click') AND value IS NOT NULL
    ),
    c AS (
      SELECT value,
             sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS c0,
             sum(h) AS c1
      FROM v GROUP BY value
    ),
    n AS (SELECT sum(c0) AS n0, sum(c1) AS n1 FROM c),
    r AS (
      SELECT c0, c1, c0 + c1 AS m,
             coalesce(sum(c0 + c1) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM c
    )
    SELECT CAST(n.n0 AS BIGINT) AS n0, CAST(n.n1 AS BIGINT) AS n1,
           CAST(sum(c1 * (2 * before + m + 1)) - n.n1 * (n.n1 + 1) AS BIGINT) AS two_u1,
           CAST(sum(m * (m * m - 1)) AS BIGINT) AS tie_sum
    FROM r CROSS JOIN n GROUP BY n.n0, n.n1
    """,
)
def mw_view_click_value(sf_dir: str):
    """Distributed EXACT Mann-Whitney U (Wilcoxon rank-sum) between the
    view and click value distributions (stages/quantiles.mannwhitney_u) —
    the nonparametric location-shift twin of ks_view_click_value, sharing
    the same distinct-value segmented scan (no global sort, O(buckets)
    driver carries). Midrank tie handling; the doubled statistic two_u1
    and the tie-correction term are exact integers, so the oracle hashes
    bit-identically. U1 = two_u1/2; the z-score derives downstream from
    tie_sum."""
    from perfect_bloomfilter_ray.stages.quantiles import mannwhitney_u

    ds = _t(sf_dir, "events", ["event_type", "value"]).filter(
        expr="event_type == 'view' or event_type == 'click'"
    )

    def tag(t: pa.Table) -> pa.Table:
        h = pc.if_else(pc.equal(t.column("event_type"), "view"), 0, 1)
        return t.append_column("h", pc.cast(h, pa.int64()))

    res = mannwhitney_u(ds.map_batches(tag, batch_format="pyarrow"), "value", "h")
    return pd.DataFrame([res])[["n0", "n1", "two_u1", "tie_sum"]]


@q(
    "embedding_cosine_histogram",
    sql="""
    WITH d AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[])) > 0
    ),
    p AS (
      SELECT list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               AS cos
      FROM d a JOIN d b ON b.vec_id = a.vec_id + 137
    )
    SELECT CAST(least(floor((cos + 1) / 0.1), 19) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1 ORDER BY 1
    """,
)
def embedding_cosine_histogram(sf_dir: str):
    """Similarity-calibration report: the distribution of pairwise cosine
    similarity over a deterministic O(n) pair sample (each vector paired
    with vec_id+137 — a fixed-stride self-join, NOT an O(n^2) all-pairs
    scan), binned into 20 fixed-width buckets. This is how a near-dup
    cosine threshold (stages/dedup.embedding near-dup, stages/mmr) gets
    picked from data. Scale shape: one co-partitioned hash self-join on
    the shifted id, shuffle-free float64 cosine + bincount partials, one
    20-row groupby. Zero-norm vectors are filtered on both sides."""
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def _pack(vecs: np.ndarray) -> pa.Array:
        # Ray's hash join rejects list<double> payloads — carry the vector
        # as fixed-size binary (contiguous, zero-copy repack on both ends)
        nb = vecs.shape[1] * 8
        return pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(nb), len(vecs), [None, pa.py_buffer(np.ascontiguousarray(vecs).tobytes())]
        )

    def _unpack(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        dim = arr.type.byte_width // 8
        a = np.frombuffer(arr.buffers()[1], np.float64, count=(arr.offset + len(arr)) * dim)
        return a.reshape(-1, dim)[arr.offset :]

    def prep(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "v": pa.array([], pa.binary(8))}
            )
        vecs = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        keep = (vecs * vecs).sum(axis=1) > 0
        ids = t.column("vec_id").to_numpy().astype(np.int64)[keep]
        return pa.table({"vec_id": pa.array(ids), "v": _pack(vecs[keep])})

    def shift(t: pa.Table) -> pa.Table:
        probe = t.column("vec_id").to_numpy().astype(np.int64) - 137
        return pa.table({"probe_id": pa.array(probe), "w": t.column("v")})

    from perfect_bloomfilter_ray.stages.partitioning import choose_join_partitions

    left = emb.map_batches(prep, batch_format="pyarrow")
    right = left.map_batches(shift, batch_format="pyarrow")
    joined = left.join(
        right,
        "inner",
        num_partitions=choose_join_partitions(),
        on=("vec_id",),
        right_on=("probe_id",),
    )

    def cos_bins(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"bin": pa.array([], pa.int64()), "pcnt": pa.array([], pa.int64())})
        a = _unpack(t.column("v"))
        b = _unpack(t.column("w"))
        cos = (a * b).sum(axis=1) / (
            np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
        )
        bins = np.minimum(np.floor((cos + 1) / 0.1), 19).astype(np.int64)
        cnt = np.bincount(bins, minlength=20)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz), "pcnt": pa.array(cnt[nz])})

    out = (
        joined.map_batches(cos_bins, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("pcnt", alias_name="n_pairs"))
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    return out


@q(
    "spearman_qty_price",
    sql="""
    WITH x AS (
      SELECT l_quantity AS xv, l_extendedprice AS yv FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ),
    cx AS (SELECT xv, count(*) AS m FROM x GROUP BY xv),
    rx AS (
      SELECT xv, 2 * coalesce(sum(m) OVER (ORDER BY xv
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + m + 1 AS trx
      FROM cx
    ),
    cy AS (SELECT yv, count(*) AS m FROM x GROUP BY yv),
    ry AS (
      SELECT yv, 2 * coalesce(sum(m) OVER (ORDER BY yv
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + m + 1 AS try_
      FROM cy
    ),
    j AS (SELECT trx, try_ FROM x JOIN rx USING (xv) JOIN ry USING (yv)),
    s AS (
      SELECT count(*) AS n, sum(trx) AS s1, sum(try_) AS s2,
             sum(trx * trx) AS s11, sum(try_ * try_) AS s22,
             sum(trx * try_) AS s12
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
           CAST(s11 AS BIGINT) AS s11, CAST(s22 AS BIGINT) AS s22,
           CAST(s12 AS BIGINT) AS s12,
           round((CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                           - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS rho
    FROM s
    """,
)
def spearman_qty_price(sf_dir: str):
    """Distributed EXACT Spearman rank correlation (midrank ties) between
    lineitem quantity and extended price (stages/quantiles.spearman_rho) —
    the rank-based robust twin of corr_qty_price_per_flag. Doubled
    midranks from two distinct-value segmented scans (O(buckets) driver
    carries) join back to rows by value — the rank tables stay distributed,
    no unbounded broadcast — then integer moment partials reduce once;
    rho is one fixed float expression over the exact int64 sums, mirrored
    term-for-term in the oracle."""
    from perfect_bloomfilter_ray.stages.quantiles import spearman_rho

    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    res = spearman_rho(ds, "l_quantity", "l_extendedprice")
    out = pd.DataFrame([res])[["n", "s1", "s2", "s11", "s22", "s12", "rho"]]
    return _round(out, {"rho": 6})


@q(
    "top_keyterms_per_doc",
    sql="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ),
    df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
      HAVING count(DISTINCT doc_id) >= 5
    ),
    n AS (SELECT count(*) AS n FROM documents),
    idf AS (SELECT token, (n.n * 1000000) // df.df AS idf_i FROM df CROSS JOIN n),
    st AS (
      SELECT doc_id, token, count(*) AS tf FROM toks
      WHERE doc_id % 97 = 0 GROUP BY doc_id, token
    ),
    sc AS (
      SELECT st.doc_id, st.token, st.tf, st.tf * idf.idf_i AS score
      FROM st JOIN idf USING (token)
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rnk
      FROM sc
    )
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token,
           CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score
    FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
    """,
)
def top_keyterms_per_doc(sf_dir: str):
    """Per-document keyword extraction (stages/vocab.top_keyterms): top-3
    terms by tf*idf over a deterministic ~1% doc slice; df/N cover the FULL
    corpus. The idf is the integer surrogate ``(N*1e6)//df``
    (stages/vocab.int_idf_broadcast) — rank-equivalent to ln(N/df) with
    zero cross-engine libm risk, so scores and the tie-broken top-k hash
    exactly. Shape: one vocabulary-sized df groupby, a 16 B/term broadcast,
    one shuffle-free scoring+topk pass (a doc never spans batches)."""
    from perfect_bloomfilter_ray.stages.vocab import (
        document_frequency,
        int_idf_broadcast,
        top_keyterms,
    )

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata, no scan
    dfreq = document_frequency(docs, "text", min_df=5)
    ref = int_idf_broadcast(dfreq, n_docs)

    def slice97(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        return t.filter(pa.array(ids % 97 == 0))

    sample = docs.map_batches(slice97, batch_format="pyarrow")
    out = (
        top_keyterms(sample, ref, "text", "doc_id", k=3)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
        .reset_index(drop=True)
    )
    return out


@q("req_value_tail_quantiles")
def req_value_tail_quantiles(sf_dir: str):
    """Tail quantiles (p90/p99/p999/max) of event value via the REQ sketch
    (state/req.py) — relative rank error, so the p999 answer stays accurate
    where a uniform-error sketch (KLL) needs k ∝ 1/(1-q). The max row is
    EXACT by construction (the top item is never compacted). Rows-only
    (estimate); the relative-error bound and merge associativity are pinned
    in tests/test_sketches.py, and sketch_accuracy_report carries the
    side-by-side exact comparison."""
    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.req import REQSketch

    ds = _t(sf_dir, "events", ["value"])
    s = sketch_global(ds, "value", lambda: REQSketch(64), name="req")
    qs = [0.9, 0.99, 0.999, 1.0]
    return pd.DataFrame({"q": qs, "value_quantile": [s.quantile(x) for x in qs]})


@q(
    "ks_value_drift_per_type",
    sql="""
    WITH v AS (
      SELECT event_type AS g, value FROM events WHERE value IS NOT NULL
    ),
    n AS (SELECT count(*) AS n FROM v),
    c AS (SELECT g, value, count(*) AS c FROM v GROUP BY g, value),
    ng AS (SELECT g, sum(c) AS ng FROM c GROUP BY g),
    d AS (SELECT DISTINCT value FROM v),
    gv AS (
      SELECT ng.g, d.value, coalesce(c.c, 0) AS c
      FROM ng CROSS JOIN d
      LEFT JOIN c ON c.g = ng.g AND c.value = d.value
    ),
    r AS (
      SELECT g, value,
             sum(c) OVER (PARTITION BY g ORDER BY value
                          ROWS UNBOUNDED PRECEDING) AS cg
      FROM gv
    ),
    tot AS (SELECT value, sum(c) AS ct FROM c GROUP BY value),
    rt AS (
      SELECT value,
             sum(ct) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS call
      FROM tot
    )
    SELECT r.g AS event_type, CAST(ng.ng AS BIGINT) AS n_g,
           CAST(max(abs(r.cg * (n.n - ng.ng) - (rt.call - r.cg) * ng.ng))
                AS BIGINT) AS ks_num
    FROM r JOIN rt USING (value) JOIN ng ON ng.g = r.g CROSS JOIN n
    GROUP BY r.g, ng.ng ORDER BY r.g
    """,
)
def ks_value_drift_per_type(sf_dir: str):
    """Segment drift matrix (stages/quantiles.ks_group_vs_rest): for every
    event type, the EXACT one-vs-rest two-sample KS statistic of its value
    distribution against all other events, in ONE corpus scan — the "which
    segment drifted" monitoring report. The per-bucket scan computes all G
    statistics from one cumulative count matrix with per-group carries
    (O(buckets x G) driver state); integer numerators
    (D_g = ks_num / (n_g * (n - n_g))) hash bit-identically."""
    from perfect_bloomfilter_ray.stages.quantiles import ks_group_vs_rest

    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = ks_group_vs_rest(ds, "value", "event_type")
    out = out.rename(columns={"group": "event_type"}).sort_values("event_type").reset_index(drop=True)
    out["n_g"] = out["n_g"].astype("int64")
    out["ks_num"] = out["ks_num"].astype("int64")
    return out


# Sibling query modules register into the same QUERIES/ORACLE_SQL dicts; the
# import must precede the reorder below. (Deliberate tail import: by this
# point every symbol tpch.py needs from this module exists.)
from perfect_bloomfilter_ray.pipelines import tpch as _tpch  # noqa: E402,F401
from perfect_bloomfilter_ray.pipelines import extras as _extras  # noqa: E402,F401
from perfect_bloomfilter_ray.pipelines import extras4 as _extras4  # noqa: E402,F401
from perfect_bloomfilter_ray.pipelines import extras5 as _extras5  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Registration order: the driver spends its correctness slots in this order,
# so surface SQL-oracle-backed queries (exact hash-verifiable) before
# rows-only sketch/LSH/stub entries — each group keeps its relative order.
# ---------------------------------------------------------------------------
_ordered = {n: QUERIES[n] for n in QUERIES if n in ORACLE_SQL}
_ordered.update({n: QUERIES[n] for n in QUERIES if n not in ORACLE_SQL})
QUERIES = _ordered
del _ordered
