"""Round-4 extras: inference-statistics, storage-layout and retrieval queries.

Registered into the same QUERIES/ORACLE_SQL dicts as pipelines/queries.py
(imported at its tail, before the SQL-first registration reorder).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from perfect_bloomfilter_ray.pipelines.queries import QUERIES, _t, q


@q(
    "cochran_armitage_purchase_trend",
    sql="""
    WITH b AS (
      SELECT CAST(extract(hour FROM ts) AS BIGINT) // 6 AS w,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r
      FROM events
    ),
    g AS (SELECT w, CAST(count(*) AS BIGINT) AS n_g, CAST(sum(r) AS BIGINT) AS r_g
          FROM b GROUP BY w),
    t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(r_g) AS BIGINT) AS r FROM g)
    SELECT t.n AS n, t.r AS r_tot,
           CAST(sum(w * (t.n * r_g - t.r * n_g)) AS BIGINT) AS t_num,
           CAST(t.n * sum(w * w * n_g) - sum(w * n_g) * sum(w * n_g) AS BIGINT)
               AS var_piece
    FROM g, t GROUP BY t.n, t.r
    """,
)
def cochran_armitage_purchase_trend(sf_dir: str):
    """Cochran-Armitage trend test (Cochran 1954, Armitage 1955): does the
    purchase rate trend monotonically across ordered dose groups (six-hour
    day quarters, w = hour//6)?  The statistic and its variance stay EXACT
    int64: T = Σ_g w·(N·r_g − R·n_g) and the dose spread
    V = N·Σw²n_g − (Σw·n_g)²; z = T / sqrt(R·(N−R)·V/N) is assembled
    clientside (the R(N−R)·V product needs 128 bits).  One tiny
    (dose → count, positives) groupby — the contingency shape every
    drift/χ² query in the suite shares."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def part(t: pa.Table) -> pa.Table:
        import polars as pl

        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        w = pc.divide(pc.hour(pc.cast(ts, pa.timestamp("us"))), 6)
        r = pc.cast(pc.equal(t.column("event_type"), "purchase"), pa.int64())
        return (
            pl.from_arrow(pa.table({"w": pc.cast(w, pa.int64()), "r": r}))
            .group_by("w")
            .agg(pl.len().cast(pl.Int64).alias("n_g"), pl.col("r").sum().alias("r_g"))
            .to_arrow()
        )

    g = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("n_g", alias_name="n_g"), Sum("r_g", alias_name="r_g"))
        .to_pandas()
        .sort_values("w")
    )
    w = g["w"].to_numpy().astype(np.int64)
    n_g = g["n_g"].to_numpy().astype(np.int64)
    r_g = g["r_g"].to_numpy().astype(np.int64)
    n, r = int(n_g.sum()), int(r_g.sum())
    t_num = int((w * (n * r_g - r * n_g)).sum())
    var_piece = int(n * (w * w * n_g).sum() - int((w * n_g).sum()) ** 2)
    return pd.DataFrame(
        {"n": [n], "r_tot": [r], "t_num": [t_num], "var_piece": [var_piece]}
    ).astype("int64")


@q(
    "brown_forsythe_value_by_type",
    sql="""
    WITH v AS (
      SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    med AS (SELECT g, quantile_disc(x, 0.5) AS m FROM v GROUP BY g),
    z AS (SELECT v.g, abs(v.x - med.m) AS z FROM v JOIN med USING (g))
    SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_g,
           CAST(sum(z) AS BIGINT) AS sz, CAST(sum(z * z) AS BIGINT) AS szz
    FROM z GROUP BY g ORDER BY event_type
    """,
)
def brown_forsythe_value_by_type(sf_dir: str):
    """Brown-Forsythe variance-homogeneity test (1974; the median-anchored
    Levene): per-group absolute deviations z = |x − median_g| over
    integer-cent values, reported as EXACT int64 sufficient statistics
    (n_g, Σz, Σz²).  W = ((N−k)/(k−1)) · Σn_g(z̄_g−z̄)² / Σ(z_ig−z̄_g)²
    is assembled clientside (pytest pins it against a brute-force
    computation).  Two passes: the suite's exact grouped disc-median
    (stages/quantiles.exact_grouped_quantiles) → broadcast LUT → one
    shuffle-free deviation scan with per-batch partial sums."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"]).filter(
        lambda r: r["value"] is not None
    )

    def cents(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "x": x})

    cx = ds.map_batches(cents, batch_format="pyarrow")
    med = exact_grouped_quantiles(cx, "event_type", "x", [0.5], kind="disc", names=["m"])
    lut = {
        r["event_type"]: int(r["m"]) for r in med.to_pandas().to_dict("records")
    }

    def dev(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        m = pl.col("event_type").replace_strict(lut, default=0, return_dtype=pl.Int64)
        z = (pl.col("x") - m).abs()
        return (
            df.with_columns(z.alias("z"))
            .group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n_g"),
                pl.col("z").sum().alias("sz"),
                (pl.col("z") * pl.col("z")).sum().alias("szz"),
            )
            .to_arrow()
        )

    out = (
        cx.map_batches(dev, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_g", alias_name="n_g"),
            Sum("sz", alias_name="sz"),
            Sum("szz", alias_name="szz"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    for c in ("n_g", "sz", "szz"):
        out[c] = out[c].astype("int64")
    return out


@q(
    "moods_median_value_by_type",
    sql="""
    WITH v AS (
      SELECT event_type AS g, CAST(floor(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    m AS (SELECT quantile_disc(x, 0.5) AS gm FROM v),
    c AS (SELECT g,
                 CAST(sum(CASE WHEN x > m.gm THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(sum(CASE WHEN x <= m.gm THEN 1 ELSE 0 END) AS BIGINT) AS b
          FROM v, m GROUP BY g),
    tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
                   CAST(sum(a + b) AS BIGINT) AS n FROM c)
    SELECT g AS event_type, a AS n_above, b AS n_le,
           pow(CAST(a AS DOUBLE) - CAST((a + b) * ta AS DOUBLE) / CAST(n AS DOUBLE), 2)
             / (CAST((a + b) * ta AS DOUBLE) / CAST(n AS DOUBLE))
         + pow(CAST(b AS DOUBLE) - CAST((a + b) * tb AS DOUBLE) / CAST(n AS DOUBLE), 2)
             / (CAST((a + b) * tb AS DOUBLE) / CAST(n AS DOUBLE)) AS chi2_part
    FROM c, tot ORDER BY event_type
    """,
)
def moods_median_value_by_type(sf_dir: str):
    """Mood's median test (1950): 2×k contingency of per-type value counts
    above vs at-or-below the GRAND median (exact disc median of integer
    cents), with each group's χ² contribution as one fixed float
    expression over the exact counts — identical IEEE tree both sides, so
    the report hashes bit-exactly.  One global exact-quantile reduce →
    scalar broadcast → one contingency scan (no row shuffle)."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"]).filter(
        lambda r: r["value"] is not None
    )

    def cents(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table(
            {"event_type": t.column("event_type"), "x": x, "_one": pa.nulls(len(t), pa.int8())}
        )

    cx = ds.map_batches(cents, batch_format="pyarrow")

    def const_key(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("_one"), "_one", pa.array([0] * len(t), pa.int8()))

    gm_ds = exact_grouped_quantiles(
        cx.map_batches(const_key, batch_format="pyarrow"), "_one", "x", [0.5],
        kind="disc", names=["gm"],
    )
    gm = int(gm_ds.to_pandas()["gm"].iloc[0])

    def contingency(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.group_by("event_type")
            .agg(
                (pl.col("x") > gm).sum().cast(pl.Int64).alias("a"),
                (pl.col("x") <= gm).sum().cast(pl.Int64).alias("b"),
            )
            .to_arrow()
        )

    c = (
        cx.map_batches(contingency, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    a = c["a"].to_numpy().astype(np.int64)
    b = c["b"].to_numpy().astype(np.int64)
    ta, tb = int(a.sum()), int(b.sum())
    n = ta + tb
    ea = ((a + b) * ta).astype(np.float64) / np.float64(n)
    eb = ((a + b) * tb).astype(np.float64) / np.float64(n)
    # DuckDB double x/0 yields NULL (not inf/nan) — mirror it: a degenerate
    # table (ta==0: grand median is the max, so no group has values above)
    # zeroes an expected count and the SQL chi2_part goes NULL row-wise.
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = (a.astype(np.float64) - ea) ** 2 / ea + (b.astype(np.float64) - eb) ** 2 / eb
    chi2 = np.where((ea == 0) | (eb == 0), np.nan, chi2)
    return pd.DataFrame(
        {
            "event_type": c["event_type"],
            "n_above": a,
            "n_le": b,
            "chi2_part": chi2,
        }
    )


@q(
    "cohens_kappa_langid",
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
    ),
    conf AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY lang, pred),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM conf),
    agr AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS agree FROM conf WHERE lang = pred),
    rm AS (SELECT lang AS lab, CAST(sum(n) AS BIGINT) AS r FROM conf GROUP BY lang),
    cm AS (SELECT pred AS lab, CAST(sum(n) AS BIGINT) AS c FROM conf GROUP BY pred),
    pe AS (SELECT CAST(coalesce(sum(rm.r * cm.c), 0) AS BIGINT) AS pe_num
           FROM rm JOIN cm USING (lab))
    SELECT tot.n AS n, agr.agree AS agree, pe.pe_num AS pe_num,
           CAST(tot.n * agr.agree - pe.pe_num AS DOUBLE)
             / CAST(tot.n * tot.n - pe.pe_num AS DOUBLE) AS kappa
    FROM tot, agr, pe
    """,
)
def cohens_kappa_langid(sf_dir: str):
    """Cohen's kappa (1960) between the declared ``lang`` column and the
    heuristic language-ID labeler — chance-corrected annotator agreement,
    the standard labeling-quality audit for weak labelers.  Built entirely
    from the lang_id confusion matrix the suite already verifies:
    κ = (N·agree − Σ_l row_l·col_l) / (N² − Σ_l row_l·col_l), every term
    exact int64 (N ≤ 2^31 keeps N² in range), κ itself ONE float division
    evaluated identically both sides.  One confusion groupby; the kappa
    fold touches only the k×k matrix."""
    from perfect_bloomfilter_ray.functions.text import lang_id

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def ident(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t.column("lang"), "pred": lang_id(t.column("text"))})

    conf = (
        ds.map_batches(ident, batch_format="pyarrow")
        .groupby(["lang", "pred"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    n = int(conf["n"].sum())
    agree = int(conf.loc[conf["lang"] == conf["pred"], "n"].sum())
    row = conf.groupby("lang")["n"].sum()
    col = conf.groupby("pred")["n"].sum()
    labs = row.index.intersection(col.index)
    pe_num = int((row.loc[labs].to_numpy().astype(np.int64)
                  * col.loc[labs].to_numpy().astype(np.int64)).sum())
    kappa = float(n * agree - pe_num) / float(n * n - pe_num)
    return pd.DataFrame(
        {"n": [n], "agree": [agree], "pe_num": [pe_num], "kappa": [kappa]}
    )


@q(
    "bitmap_semijoin_active_orders",
    sql="""
    WITH act AS (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 0)
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN act ON o_custkey = act.c_custkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def bitmap_semijoin_active_orders(sf_dir: str):
    """EXACT semi-join through the Roaring bitmap index
    (state/roaring.RoaringBitmap): the positive-balance customer keys build
    one compressed bitmap via the standard partial/tree-merge shuffle
    (stages/agg.sketch_global — the same shape as every sketch build), the
    merged bitmap broadcasts once, and the orders scan filters against it
    shuffle-free.  Same pipeline geometry as the Bloom semi-join family but
    with NO false-positive term — the bitmap is exact, so the revenue
    report needs no verify pass and hashes bit-identically."""
    import polars as pl
    import ray

    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.roaring import RoaringBitmap

    cust = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        lambda r: r["c_acctbal"] > 0
    )
    bm = sketch_global(cust, "c_custkey", RoaringBitmap, name="bm")
    ref = ray.put(bm.to_bytes())

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])

    def semi(t: pa.Table) -> pa.Table:
        b = RoaringBitmap.from_bytes(ray.get(ref))
        keep = b.contains(t.column("o_custkey"))
        t = t.filter(pa.array(keep))
        cents = pc.cast(pc.floor(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
        return (
            pl.from_arrow(pa.table({"o_orderstatus": t.column("o_orderstatus"), "c": cents}))
            .group_by("o_orderstatus")
            .agg(pl.len().cast(pl.Int64).alias("n_orders"), pl.col("c").sum().alias("revenue_cents"))
            .to_arrow()
        )

    out = (
        orders.map_batches(semi, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


@q(
    "bitmap_user_type_intersections",
    sql="""
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_both
    FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2 ORDER BY type_a, type_b
    """,
)
def bitmap_user_type_intersections(sf_dir: str):
    """Exact audience-overlap matrix from per-type Roaring bitmaps: each
    event type's distinct user set becomes one compressed bitmap
    (stages/agg.sketch_grouped two-phase partial/merge tree), and every
    pairwise intersection cardinality is an exact chunked AND-popcount on
    the driver (k bitmaps, k·(k−1)/2 container intersections — never a row
    self-join).  The exact twin of the theta-sketch overlap family: same
    build shape, zero estimation error."""
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped
    from perfect_bloomfilter_ray.state.roaring import RoaringBitmap

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    per_type = sketch_grouped(ds, "event_type", "user_id", RoaringBitmap, name="bm").to_pandas()
    bms = {
        r["event_type"]: RoaringBitmap.from_bytes(r["bm"])
        for r in per_type.to_dict("records")
    }
    rows = []
    types = sorted(bms)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            n = bms[ta].and_cardinality(bms[tb])
            if n:
                rows.append({"type_a": ta, "type_b": tb, "n_both": n})
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_both"])
    out["n_both"] = out["n_both"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


@q(
    "fuse_membership_roundtrip",
    # CONTRACT oracle (bloom/xor roundtrip convention): a binary fuse filter
    # admits no false negatives by construction, so members == inserted and
    # fn == 0 are exact constants; the ~1/256 FP rate and the <=Xor8 size
    # are pytest-verified (not constants).
    sql="""
    SELECT CAST(count(*) AS BIGINT) AS inserted,
           CAST(count(*) AS BIGINT) AS members,
           CAST(0 AS BIGINT) AS false_negatives
    FROM orders
    """,
)
def fuse_membership_roundtrip(sf_dir: str):
    """Sharded BinaryFuse8 static-filter roundtrip (state/fuse.py — Graf &
    Lemire 2022, the successor of the Xor8 already in the suite at ~1.125
    vs 1.23 cells/key with segment-local probes): hash the order-key
    space, route keys to hash shards, build one immutable fuse filter per
    shard inside its own map_groups task, broadcast the per-shard cell
    arrays ONCE (~1.13 bytes/key total), and probe every key distributedly
    — 0 false negatives is the construction contract.  Same build-once
    trade vs the Bloom cascade and the same jump-hash-style shard
    geometry as xor_membership_roundtrip."""
    import ray

    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
    from perfect_bloomfilter_ray.state.fuse import BinaryFuse8

    ds = _t(sf_dir, "orders", ["o_orderkey"]).materialize()
    n_total = ds.count()
    nsh = choose_num_blocks(ds)

    def hsh(t: pa.Table) -> pa.Table:
        h = hash64(t.column("o_orderkey"), 0xF53E)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "sh": pa.array((h % np.uint64(nsh)).astype(np.int32)),
            }
        )

    hashed = ds.map_batches(hsh, batch_format="pyarrow").materialize()

    def build(t: pa.Table) -> pa.Table:
        sh = int(t.column("sh")[0].as_py())
        f = BinaryFuse8(t.column("h").to_numpy(zero_copy_only=False).view(np.uint64))
        seed, seg_len, scl, n, cells = f.to_state()
        return pa.table(
            {
                "sh": pa.array([sh], pa.int32()),
                "seed": pa.array([seed], pa.int64()),
                "seg_len": pa.array([seg_len], pa.int64()),
                "scl": pa.array([scl], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "cells": pa.array([cells], pa.binary()),
            }
        )

    shards = hashed.groupby("sh").map_groups(build, batch_format="pyarrow").to_pandas()
    states = {
        int(r["sh"]): (int(r["seed"]), int(r["seg_len"]), int(r["scl"]), int(r["n"]), r["cells"])
        for _, r in shards.iterrows()
    }
    ref = ray.put(states)

    def probe(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        h = t.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        sh = t.column("sh").to_numpy(zero_copy_only=False)
        m = 0
        for s in np.unique(sh):
            f = BinaryFuse8.from_state(st[int(s)])
            m += int(f.contains(h[sh == s]).sum())
        return pa.table({"m": pa.array([m], pa.int64())})

    members = int(hashed.map_batches(probe, batch_format="pyarrow").sum("m"))
    return pd.DataFrame(
        {
            "inserted": [n_total],
            "members": [members],
            "false_negatives": [n_total - members],
        }
    )


@q(
    "bucketed_join_order_customer_revenue",
    sql="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def bucketed_join_order_customer_revenue(sf_dir: str):
    """Shuffle-free join through the hash-bucketed storage layout
    (stages/bucketed.py — the Hive/Spark bucketed-table pattern): both
    sides are written once as one Parquet file per hash bucket of the
    join key, then the join runs ONE task per bucket reading exactly two
    co-partitioned files — at query time there is no hash exchange at
    all; the all-to-all was paid at write time and amortizes over every
    later join on the key.  Writes are atomic and per-bucket resumable
    (reruns skip finished buckets).  Revenue stays integer cents so the
    report hashes bit-exactly against the plain-join oracle."""
    import os
    import tempfile

    import polars as pl

    from perfect_bloomfilter_ray.stages.bucketed import bucketed_join, write_bucketed
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def o_prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
        return pa.table({"custkey": t.column("o_custkey"), "cents": cents})

    def c_prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"custkey": t.column("c_custkey"), "c_mktsegment": t.column("c_mktsegment")}
        )

    # scratch dir keyed by the INPUT FILES' stat signature: a regenerated
    # corpus at the same path gets a fresh layout instead of a stale resume
    from perfect_bloomfilter_ray.stages.adaptive import _stat_signature

    sig = _stat_signature(
        [os.path.join(sf_dir, "orders.parquet"), os.path.join(sf_dir, "customer.parquet")]
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "pbf_bucketed",
        f"{os.path.basename(os.path.normpath(sf_dir))}-{sig[:12]}",
    )
    po, pc_dir = os.path.join(base, "orders"), os.path.join(base, "customer")
    o_ds = orders.map_batches(o_prep, batch_format="pyarrow")
    c_ds = cust.map_batches(c_prep, batch_format="pyarrow")
    nb = choose_num_blocks(orders)
    for ds_, path in ((o_ds, po), (c_ds, pc_dir)):
        try:
            write_bucketed(ds_, "custkey", path, nb)
        except ValueError:  # stale layout from a run with different width
            write_bucketed(ds_, "custkey", path, nb, overwrite=True)

    joined = bucketed_join(po, pc_dir, "custkey", how="inner")

    def agg(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        return (
            pl.from_arrow(t)
            .group_by("c_mktsegment")
            .agg(
                pl.len().cast(pl.Int64).alias("n_orders"),
                pl.col("cents").sum().alias("revenue_cents"),
            )
            .to_arrow()
        )

    out = (
        joined.map_batches(agg, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


@q(
    "hourly_volume_acf",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mm AS (SELECT CAST(min(epoch_us(b)) // 3600000000 AS BIGINT) AS h0,
                  CAST(max(epoch_us(b)) // 3600000000 AS BIGINT) AS h1 FROM h),
    spine AS (SELECT unnest(generate_series(mm.h0, mm.h1)) AS hb FROM mm),
    d AS (SELECT spine.hb, coalesce(hh.c, 0) AS c
          FROM spine
          LEFT JOIN (SELECT CAST(epoch_us(b) // 3600000000 AS BIGINT) AS hb, c FROM h) hh
            ON hh.hb = spine.hb),
    l AS (SELECT CAST(g AS BIGINT) AS lag FROM generate_series(1, 12) AS t(g)),
    p AS (SELECT l.lag, a.c AS x, b.c AS y
          FROM l CROSS JOIN d a JOIN d b ON b.hb = a.hb + l.lag),
    s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
                 CAST(sum(x*y) AS BIGINT) AS sxy
          FROM p GROUP BY lag)
    SELECT lag, n AS n_pairs, sx, sy, sxx, syy, sxy,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS acf
    FROM s ORDER BY lag
    """,
)
def hourly_volume_acf(sf_dir: str):
    """Autocorrelation function to lag 12 over the DENSE zero-filled hourly
    volume series — the periodicity spectrum generalizing the suite's
    lag-1 autocorr (a diurnal corpus shows the ACF ringing at its cycle).
    All lag moments are exact int64 over the calendar spine (missing hours
    count 0, so both sides pair identical series); each r is the one fixed
    Pearson expression rounded to 6.  Corpus-sized work is ONE hour-bucket
    groupby; the 12-lag fold runs on the bounded hourly series (the
    calendar-bounded driver contract shared by the changepoint/forecast
    family)."""
    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": pc.floor_temporal(pc.cast(t.column("ts"), pa.timestamp("us")), unit="hour")}
        )

    h = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .count()
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    hb = (
        h["b"].astype("datetime64[us]").astype("int64").to_numpy() // 3_600_000_000
    ).astype(np.int64)
    dense = np.zeros(int(hb[-1] - hb[0]) + 1, dtype=np.int64)
    dense[hb - hb[0]] = h["count()"].to_numpy().astype(np.int64)
    rows = []
    for lag in range(1, 13):
        x, y = dense[:-lag], dense[lag:]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy, sxy = int((x * x).sum()), int((y * y).sum()), int((x * y).sum())
        r = (float(n) * sxy - float(sx) * sy) / (
            np.sqrt(float(n) * sxx - float(sx) * sx)
            * np.sqrt(float(n) * syy - float(sy) * sy)
        )
        rows.append(
            {"lag": lag, "n_pairs": n, "sx": sx, "sy": sy, "sxx": sxx,
             "syy": syy, "sxy": sxy, "acf": round(r, 6)}
        )
    out = pd.DataFrame(rows)
    for c in ("lag", "n_pairs", "sx", "sy", "sxx", "syy", "sxy"):
        out[c] = out[c].astype("int64")
    return out


@q(
    "sax_hourly_motifs",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mm AS (SELECT CAST(min(epoch_us(b)) // 3600000000 AS BIGINT) AS h0,
                  CAST(max(epoch_us(b)) // 3600000000 AS BIGINT) AS h1 FROM h),
    spine AS (SELECT unnest(generate_series(mm.h0, mm.h1)) AS hb FROM mm),
    d AS (SELECT spine.hb, coalesce(hh.c, 0) AS c
          FROM spine
          LEFT JOIN (SELECT CAST(epoch_us(b) // 3600000000 AS BIGINT) AS hb, c FROM h) hh
            ON hh.hb = spine.hb),
    qs AS (SELECT quantile_disc(c, 0.25) AS q1, quantile_disc(c, 0.5) AS q2,
                  quantile_disc(c, 0.75) AS q3 FROM d),
    sym AS (SELECT hb,
                   CASE WHEN c <= qs.q1 THEN 0 WHEN c <= qs.q2 THEN 1
                        WHEN c <= qs.q3 THEN 2 ELSE 3 END AS s
            FROM d, qs),
    w AS (SELECT s AS s1,
                 lead(s, 1) OVER (ORDER BY hb) AS s2,
                 lead(s, 2) OVER (ORDER BY hb) AS s3
          FROM sym),
    m AS (SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n_occ
          FROM w WHERE s3 IS NOT NULL GROUP BY 1, 2, 3)
    SELECT CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
           CAST(s3 AS BIGINT) AS s3, n_occ
    FROM m WHERE n_occ >= 2 ORDER BY n_occ DESC, s1, s2, s3 LIMIT 20
    """,
)
def sax_hourly_motifs(sf_dir: str):
    """SAX motif discovery (Lin, Keogh, Lonardi & Chiu 2003 symbolic
    aggregate approximation): the dense hourly volume series is
    discretized into a 4-symbol alphabet at its EXACT disc quartiles (data
    values, engine-portable — not the Gaussian breakpoints, which would
    hash-drift), and repeated length-3 words are the motifs.  All counts
    int64; ties broken by word.  One hour groupby; the symbolization and
    word count fold over the bounded calendar series."""
    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": pc.floor_temporal(pc.cast(t.column("ts"), pa.timestamp("us")), unit="hour")}
        )

    h = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .count()
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    hb = (
        h["b"].astype("datetime64[us]").astype("int64").to_numpy() // 3_600_000_000
    ).astype(np.int64)
    dense = np.zeros(int(hb[-1] - hb[0]) + 1, dtype=np.int64)
    dense[hb - hb[0]] = h["count()"].to_numpy().astype(np.int64)
    srt = np.sort(dense)
    cuts = [srt[max(int(np.ceil(q * len(srt))) - 1, 0)] for q in (0.25, 0.5, 0.75)]
    sym = np.searchsorted(np.array(cuts), dense, side="left")
    words = np.stack([sym[:-2], sym[1:-1], sym[2:]], axis=1)
    uniq, cnt = np.unique(words, axis=0, return_counts=True)
    keep = cnt >= 2
    out = pd.DataFrame(
        {"s1": uniq[keep, 0], "s2": uniq[keep, 1], "s3": uniq[keep, 2], "n_occ": cnt[keep]}
    )
    out = out.sort_values(
        ["n_occ", "s1", "s2", "s3"], ascending=[False, True, True, True]
    ).head(20).reset_index(drop=True)
    return out.astype("int64")


@q(
    "dirichlet_ql_doc_search",
    sql="""
    WITH toks AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                  FROM documents),
    f AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
                 CAST(len(list_filter(tk, x -> x = 'hash')) AS BIGINT) AS tf_hash,
                 CAST(len(list_filter(tk, x -> x = 'join')) AS BIGINT) AS tf_join,
                 CAST(len(list_filter(tk, x -> x = 'scan')) AS BIGINT) AS tf_scan
          FROM toks),
    st AS (SELECT CAST(sum(dl) AS BIGINT) AS clen,
                  CAST(sum(tf_hash) AS BIGINT) AS cf1,
                  CAST(sum(tf_join) AS BIGINT) AS cf2,
                  CAST(sum(tf_scan) AS BIGINT) AS cf3
           FROM f)
    SELECT doc_id, dl, tf_hash, tf_join, tf_scan,
        ln((CAST(tf_hash AS DOUBLE)
            + 2000.0 * (CAST(st.cf1 AS DOUBLE) / CAST(st.clen AS DOUBLE)))
           / (CAST(dl AS DOUBLE) + 2000.0))
      + ln((CAST(tf_join AS DOUBLE)
            + 2000.0 * (CAST(st.cf2 AS DOUBLE) / CAST(st.clen AS DOUBLE)))
           / (CAST(dl AS DOUBLE) + 2000.0))
      + ln((CAST(tf_scan AS DOUBLE)
            + 2000.0 * (CAST(st.cf3 AS DOUBLE) / CAST(st.clen AS DOUBLE)))
           / (CAST(dl AS DOUBLE) + 2000.0)) AS ql_score
    FROM f, st
    WHERE tf_hash + tf_join + tf_scan > 0
    ORDER BY doc_id
    """,
)
def dirichlet_ql_doc_search(sf_dir: str):
    """Query-likelihood retrieval with Dirichlet-prior smoothing (Zhai &
    Lafferty SIGIR 2001, μ=2000) — the language-modeling counterpart of
    the suite's BM25: score(d) = Σ_q ln((tf + μ·cf_q/|C|)/(dl + μ)).
    Same constant-width stats pass as bm25_doc_search (per-doc tf/dl in
    one tokenize scan, corpus cf/|C| as four BIGINTs broadcast back),
    shuffle-free scoring, identical IEEE expression tree both sides so
    the raw doubles hash bit-exactly."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    terms = ["hash", "join", "scan"]

    def tf(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        toks = pl.col("text").fill_null("").str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        cols = [toks.list.len().cast(pl.Int64).alias("dl")]
        for w in terms:
            cols.append(
                toks.list.eval(pl.element().filter(pl.element() == w))
                .list.len()
                .cast(pl.Int64)
                .alias(f"tf_{w}")
            )
        return df.select("doc_id", *cols).to_arrow()

    f = ds.map_batches(tf, batch_format="pyarrow").materialize()
    tot = f.aggregate(
        Sum("dl", alias_name="clen"),
        *[Sum(f"tf_{w}", alias_name=f"cf_{w}") for w in terms],
    )
    clen = float(tot["clen"])
    cf = {w: float(tot[f"cf_{w}"]) for w in terms}
    mu = 2000.0

    def score(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        any_tf = sum(pl.col(f"tf_{w}") for w in terms) > 0
        df = df.filter(any_tf)
        if df.height == 0:
            return df.with_columns(pl.lit(0.0).alias("ql_score")).to_arrow()
        dl = df["dl"].to_numpy().astype(np.float64)
        s = np.zeros(len(df), dtype=np.float64)
        for w in terms:
            tfv = df[f"tf_{w}"].to_numpy().astype(np.float64)
            arg = (tfv + mu * (cf[w] / clen)) / (dl + mu)
            # math.log, not np.log: numpy's SIMD log drifts 1 ulp from the
            # system libm DuckDB calls; this loop runs over MATCHED docs
            # only (the filtered slice), not the corpus
            s = s + np.array([math.log(v) for v in arg], dtype=np.float64)
        return df.with_columns(pl.Series("ql_score", s)).to_arrow()

    out = f.map_batches(score, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return out[["doc_id", "dl", "tf_hash", "tf_join", "tf_scan", "ql_score"]]


@q(
    "interval_overlap_user_type_windows",
    sql="""
    WITH l AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             CAST(min(epoch_us(ts)) AS BIGINT) AS ls,
             CAST(max(epoch_us(ts)) AS BIGINT) AS le
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, date_trunc('hour', ts) AS hh,
             CAST(min(epoch_us(ts)) AS BIGINT) AS rs,
             CAST(max(epoch_us(ts)) AS BIGINT) AS re
      FROM events GROUP BY 1, 2
    )
    SELECT r.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT l.user_id) AS BIGINT) AS n_users
    FROM l JOIN r ON l.ls <= r.re AND r.rs <= l.le
    GROUP BY r.event_type ORDER BY r.event_type
    """,
)
def interval_overlap_user_type_windows(sf_dir: str):
    """Pure interval-overlap join with NO equi-key
    (stages/intervaljoin.interval_overlap_join): per-(user, day) activity
    spans × per-(type, hour) activity spans, all pairs whose time
    intervals intersect — the chunk-replicated plan (day-width time
    chunks, intervals copied to each touched chunk, pair emitted ONLY by
    the chunk holding max(l.start, r.start), so no dedup shuffle).  The
    oracle is DuckDB's IEJoin over the same inequality predicate; counts
    are exact ints."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.intervaljoin import interval_overlap_join

    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])

    day_us = 86_400_000_000

    # BOTH interval sets derive from the same events scan, so their extent
    # partials are emitted from ONE pass as a tagged union (side 0 = user-day
    # spans with event_type null, side 1 = type-hour spans with user_id
    # null — the NULL-key grouping contract) and reduced in ONE shuffle;
    # the two-scans-two-shuffles version measured 4.6 s of the query's 7.3 s
    def both_spans(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        us = pc.cast(ts, pa.int64())
        day = pc.cast(pc.floor_temporal(ts, unit="day"), pa.int64())
        hour = pc.cast(pc.floor_temporal(ts, unit="hour"), pa.int64())
        df = pl.from_arrow(
            pa.table(
                {
                    "user_id": t.column("user_id"),
                    "event_type": t.column("event_type"),
                    "_day": day,
                    "_hour": hour,
                    "_us": us,
                }
            )
        )
        l = (
            df.group_by(["user_id", "_day"])
            .agg(pl.col("_us").min().alias("ps"), pl.col("_us").max().alias("pe"))
            .select(
                pl.lit(0, dtype=pl.Int8).alias("_side"),
                "user_id",
                pl.lit("", dtype=pl.Utf8).alias("event_type"),  # sentinel, not
                # null: null group keys do not merge across blocks
                pl.col("_day").alias("_b"),
                "ps",
                "pe",
            )
        )
        r = (
            df.group_by(["event_type", "_hour"])
            .agg(pl.col("_us").min().alias("ps"), pl.col("_us").max().alias("pe"))
            .select(
                pl.lit(1, dtype=pl.Int8).alias("_side"),
                pl.lit(-1, dtype=pl.Int64).alias("user_id"),  # sentinel
                "event_type",
                pl.col("_hour").alias("_b"),
                "ps",
                "pe",
            )
        )
        return pl.concat([l, r]).to_arrow()

    from ray.data.aggregate import Max, Min

    extents = (
        ds.map_batches(both_spans, batch_format="pyarrow")
        .groupby(["_side", "user_id", "event_type", "_b"])
        .aggregate(Min("ps", alias_name="s"), Max("pe", alias_name="e"))
        .materialize()
    )
    left = (
        extents.filter(expr="_side == 0")
        .drop_columns(["_side", "event_type", "_b"])
        .rename_columns({"s": "ls", "e": "le"})
    )
    right = (
        extents.filter(expr="_side == 1")
        .drop_columns(["_side", "user_id", "_b"])
        .rename_columns({"s": "rs", "e": "re"})
    )
    pairs = interval_overlap_join(
        left, right, "ls", "le", "rs", "re",
        l_cols=["user_id"], r_cols=["event_type"], chunk_us=day_us,
    )

    def agg(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.group_by(["event_type", "user_id"])
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .to_arrow()
        )

    per_user = (
        pairs.map_batches(agg, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    out = (
        per_user.groupby("event_type")
        .agg(n_pairs=("c", "sum"), n_users=("user_id", "nunique"))
        .reset_index()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


@q(
    "sstemmer_vocab_top20",
    sql="""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
    ),
    st AS (
      SELECT w,
             CASE
               WHEN w LIKE '%ies' AND NOT (w LIKE '%eies' OR w LIKE '%aies')
                 THEN substr(w, 1, length(w) - 3) || 'y'
               WHEN w LIKE '%es' AND NOT (w LIKE '%aes' OR w LIKE '%ees' OR w LIKE '%oes')
                 THEN substr(w, 1, length(w) - 1)
               WHEN w LIKE '%s' AND NOT (w LIKE '%us' OR w LIKE '%ss')
                 THEN substr(w, 1, length(w) - 1)
               ELSE w
             END AS stem
      FROM tok
    )
    SELECT stem, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS n_forms
    FROM st GROUP BY stem ORDER BY n_tokens DESC, stem LIMIT 20
    """,
)
def sstemmer_vocab_top20(sf_dir: str):
    """Harman S-stemmer (1991 'How effective is suffixing?'): the
    three-rule plural conflator (ies→y unless -eies/-aies; -es→-e unless
    -aes/-ees/-oes; -s→ unless -us/-ss) — deliberately rule-exact so the
    SQL CASE ladder is the bitwise oracle (a Porter stemmer cannot be
    oracle-checked).  Distributed shape: map-side partial word counts →
    ONE bounded-vocab groupby; stemming and the stem-level fold
    (n_tokens, distinct surface forms) run on the distinct-word table,
    never on rows.  Top-20 with deterministic ties."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["text"])

    def wc(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.select(
                pl.col("text").fill_null("").str.to_lowercase().str.extract_all(r"[a-z]+").alias("w")
            )
            .explode("w")
            .drop_nulls("w")
            .group_by("w")
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .to_arrow()
        )

    vocab = (
        ds.map_batches(wc, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    w = vocab["w"]
    stem = w.copy()
    ies = w.str.endswith("ies") & ~(w.str.endswith("eies") | w.str.endswith("aies"))
    es = (
        ~ies
        & w.str.endswith("es")
        & ~(w.str.endswith("aes") | w.str.endswith("ees") | w.str.endswith("oes"))
    )
    s = (
        ~ies & ~es
        & w.str.endswith("s")
        & ~(w.str.endswith("us") | w.str.endswith("ss"))
    )
    stem[ies] = w[ies].str.slice(0, -3) + "y"
    stem[es] = w[es].str.slice(0, -1)
    stem[s] = w[s].str.slice(0, -1)
    vocab["stem"] = stem
    out = (
        vocab.groupby("stem")
        .agg(n_tokens=("c", "sum"), n_forms=("w", "nunique"))
        .reset_index()
        .sort_values(["n_tokens", "stem"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_forms"] = out["n_forms"].astype("int64")
    return out


@q("dtw_type_profile_distances")
def dtw_type_profile_distances(sf_dir: str):
    """Dynamic-time-warping distance between the 24-hour-of-day activity
    profiles of every event-type pair (Sakoe-Chiba 1978, full window,
    |x−y| cost over EXACT integer hourly counts — the alignment-tolerant
    companion of the suite's temporal-shape cosine, which DTW beats when
    one type's cycle is phase-shifted).  The corpus-sized step is one
    (type, hour-of-day) contingency groupby; the 24×24 integer DP runs
    per pair on the k² driver grid.  rows-only by design (a DP recurrence
    has no SQL twin); pytest pins the exact costs against an independent
    brute-force DP and the metric's identity/symmetry properties."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def feats(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        return pa.table(
            {"t": t.column("event_type"), "h": pc.cast(pc.hour(ts), pa.int64())}
        )

    cnt = (
        ds.map_batches(feats, batch_format="pyarrow")
        .groupby(["t", "h"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "c"})
    )
    prof = {
        t: np.zeros(24, dtype=np.int64) for t in cnt["t"].unique()
    }
    for _, r in cnt.iterrows():
        prof[r["t"]][int(r["h"])] = int(r["c"])
    types = sorted(prof)
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            rows.append(
                {"type_a": ta, "type_b": tb, "dtw_cost": dtw_int(prof[ta], prof[tb])}
            )
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "dtw_cost"])
    out["dtw_cost"] = out["dtw_cost"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def dtw_int(x: np.ndarray, y: np.ndarray) -> int:
    """Exact integer DTW with |x−y| cost, full window — vectorized over
    anti-diagonals is unnecessary at profile length 24; the loop is over
    the bounded grid, never over corpus rows."""
    n, m = len(x), len(y)
    INF = np.iinfo(np.int64).max // 4
    d = np.full((n + 1, m + 1), INF, dtype=np.int64)
    d[0, 0] = 0
    for i in range(1, n + 1):
        cost = np.abs(x[i - 1] - y).astype(np.int64)
        for j in range(1, m + 1):
            d[i, j] = cost[j - 1] + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return int(d[n, m])


@q(
    "event_type_loo_target_encoding",
    sql="""
    WITH v AS (
      SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_id,
           CAST(sum(x) OVER (PARTITION BY event_type) - x AS BIGINT) AS loo_num,
           CAST(count(*) OVER (PARTITION BY event_type) - 1 AS BIGINT) AS loo_den
    FROM v ORDER BY event_id
    """,
)
def event_type_loo_target_encoding(sf_dir: str):
    """Leave-one-out target encoding of the categorical event type against
    integer-cent value (the leakage-free supervised-ML categorical
    encoder: each row's code excludes its own target).  Emitted as the
    exact RATIONAL (Σx_g − x_i, n_g − 1) so the report hashes bit-exactly
    — the division is the consumer's choice.  Grouped (n, Σ) reduce →
    broadcast LUT → one shuffle-free scan; never a per-key window sort."""
    import polars as pl

    ds = _t(sf_dir, "events", ["event_id", "event_type", "value"]).filter(
        lambda r: r["value"] is not None
    )

    def cents(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        return pa.table(
            {"event_id": t.column("event_id"), "event_type": t.column("event_type"), "x": x}
        )

    cx = ds.map_batches(cents, batch_format="pyarrow")

    def part(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .group_by("event_type")
            .agg(pl.len().cast(pl.Int64).alias("n"), pl.col("x").sum().alias("sx"))
            .to_arrow()
        )

    g = (
        cx.map_batches(part, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"))
        .to_pandas()
    )
    n_lut = dict(zip(g["event_type"], g["n"].astype(int)))
    sx_lut = dict(zip(g["event_type"], g["sx"].astype(int)))

    def encode(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return df.select(
            "event_id",
            (
                pl.col("event_type").replace_strict(sx_lut, return_dtype=pl.Int64)
                - pl.col("x")
            ).alias("loo_num"),
            (
                pl.col("event_type").replace_strict(n_lut, return_dtype=pl.Int64) - 1
            ).alias("loo_den"),
        ).to_arrow()

    return cx.map_batches(encode, batch_format="pyarrow").sort("event_id")


@q(
    "seasonal_outlier_hours",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    s AS (SELECT b, c, CAST(dayofweek(b) AS BIGINT) AS dow,
                 CAST(extract(hour FROM b) AS BIGINT) AS hod
          FROM h),
    med AS (SELECT dow, hod, quantile_disc(c, 0.5) AS m FROM s GROUP BY 1, 2),
    dev AS (SELECT s.b, s.c, s.dow, s.hod, med.m, abs(s.c - med.m) AS ad
            FROM s JOIN med USING (dow, hod)),
    mad AS (SELECT dow, hod, quantile_disc(ad, 0.5) AS mad FROM dev GROUP BY 1, 2)
    SELECT dev.b AS hour_bucket, dev.c AS n_events, dev.m AS stratum_median,
           mad.mad AS stratum_mad
    FROM dev JOIN mad USING (dow, hod)
    WHERE dev.ad > 3 * mad.mad
    ORDER BY hour_bucket
    """,
)
def seasonal_outlier_hours(sf_dir: str):
    """Seasonal-stratified robust outlier hours (the S-H-ESD/robust-zscore
    monitoring shape applied per (day-of-week, hour-of-day) stratum, so a
    Saturday-3am lull is judged against other Saturday-3ams): an hour is
    flagged when |count − stratum median| > 3 × stratum MAD, every term an
    EXACT disc-quantile of integer counts — no float anywhere, so the
    report hashes bit-identically.  One hour groupby; stratum medians and
    the flag fold run on the bounded 7×24 calendar grid."""
    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": pc.floor_temporal(pc.cast(t.column("ts"), pa.timestamp("us")), unit="hour")}
        )

    h = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .count()
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    hb = (
        h["b"].astype("datetime64[us]").astype("int64").to_numpy() // 3_600_000_000
    ).astype(np.int64)
    c = h["count()"].to_numpy().astype(np.int64)
    dow = ((hb // 24) + 4) % 7  # epoch day 0 = Thursday = DuckDB dayofweek 4
    hod = hb % 24

    def disc_median(v: np.ndarray) -> int:
        srt = np.sort(v)
        return int(srt[max(int(np.ceil(0.5 * len(srt))) - 1, 0)])

    rows = []
    for d in range(7):
        for hh in range(24):
            m = (dow == d) & (hod == hh)
            if not m.any():
                continue
            med = disc_median(c[m])
            ad = np.abs(c[m] - med)
            mad = disc_median(ad)
            flag = ad > 3 * mad
            for b_us, cv, adv in zip(
                h["b"].to_numpy()[m][flag], c[m][flag], ad[flag]
            ):
                rows.append(
                    {"hour_bucket": b_us, "n_events": int(cv),
                     "stratum_median": med, "stratum_mad": mad}
                )
    out = pd.DataFrame(
        rows, columns=["hour_bucket", "n_events", "stratum_median", "stratum_mad"]
    )
    if len(out):
        out = out.sort_values("hour_bucket").reset_index(drop=True)
    for col in ("n_events", "stratum_median", "stratum_mad"):
        out[col] = out[col].astype("int64")
    return out


@q(
    "sentence_stats_per_lang",
    sql="""
    WITH f AS (
      SELECT lang,
             CAST(len(list_filter(regexp_extract_all(text, '[^.!?]+'),
                                  x -> trim(x) <> '')) AS BIGINT) AS n_sent,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sent) AS BIGINT) AS n_sentences,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM f GROUP BY lang ORDER BY lang
    """,
)
def sentence_stats_per_lang(sf_dir: str):
    """Rule-based sentence segmentation census per language: sentences are
    the non-whitespace segments between [.!?] terminator runs (the
    pre-tokenizer sentence splitter of the CCNet/Gopher lineage), tokens
    the \\S+ runs.  Both definitions are regex-identical across engines,
    so the per-lang totals are exact ints; mean tokens/sentence is the
    consumer's division of two reported BIGINTs.  One vectorized polars
    string pass + a k-group fold."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def feats(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        txt = pl.col("text").fill_null("")
        n_sent = (
            txt.str.extract_all(r"[^.!?]+")
            .list.eval(pl.element().filter(pl.element().str.strip_chars() != ""))
            .list.len()
            .cast(pl.Int64)
        )
        n_tok = txt.str.extract_all(r"\S+").list.len().cast(pl.Int64)
        return (
            df.select("lang", n_sent.alias("n_sent"), n_tok.alias("n_tok"))
            .group_by("lang")
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("n_sent").sum().alias("n_sentences"),
                pl.col("n_tok").sum().alias("n_tokens"),
            )
            .to_arrow()
        )

    out = (
        ds.map_batches(feats, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_sentences", alias_name="n_sentences"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "n_sentences", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out


@q("documents_profile_sketched")
def documents_profile_sketched(sf_dir: str):
    """Sketched table profile — the 100-TB-shaped twin of the exact
    documents_profile: per-column distinct-count estimates from ONE
    streaming pass building an HLL per column (stages/agg.
    multi_sketch_global partial/merge tree), where the exact profile
    needs a value shuffle per column.  rows-only by design (estimates);
    pytest pins every column's estimate inside the ±1.04/√m HLL bound
    against the exact NDV and checks the exact row/null counts carried
    in-row."""
    from perfect_bloomfilter_ray.stages.agg import multi_sketch_global
    from perfect_bloomfilter_ray.state.hll import HyperLogLog

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    ds = _t(sf_dir, "documents", cols)

    sketches = multi_sketch_global(
        ds, {c: (c, lambda: HyperLogLog(12)) for c in cols}
    )

    def null_partials(t: pa.Table) -> pa.Table:
        out = {"n": pa.array([len(t)], pa.int64())}
        for c in cols:
            out[f"null_{c}"] = pa.array([t.column(c).null_count], pa.int64())
        return pa.table(out)

    nulls = ds.map_batches(null_partials, batch_format="pyarrow").to_pandas().sum()
    n = int(nulls["n"])
    rows = [
        {
            "column": c,
            "n_rows": n,
            "n_nulls": int(nulls[f"null_{c}"]),
            "ndv_est": int(round(sketches[c].estimate())),
        }
        for c in cols
    ]
    return pd.DataFrame(rows, columns=["column", "n_rows", "n_nulls", "ndv_est"])


def _hilbert_oracle_sql(bits: int = 16) -> str:
    """Unrolled vectorless twin of stages/partitioning.hilbert_key2: one
    CTE per level carrying (x, y, d) through the rotate-and-accumulate
    walk — the oracle spells out every CASE the numpy level performs."""
    parts = [
        "WITH t0 AS (SELECT event_id, user_id & 65535 AS x,",
        "  CAST(floor(value) AS BIGINT) & 65535 AS y, CAST(0 AS BIGINT) AS d",
        "  FROM events)",
    ]
    lvl = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        p, c = lvl, lvl + 1
        parts.append(
            f""",t{c} AS (
  SELECT event_id,
    CASE WHEN (y & {s}) = 0
         THEN (CASE WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END)
         ELSE x END AS x,
    CASE WHEN (y & {s}) = 0
         THEN (CASE WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END)
         ELSE y END AS y,
    d + {s * s} * xor(3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                      (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)) AS d
  FROM t{p})"""
        )
        lvl = c
    parts.append(f"SELECT event_id, d AS hkey FROM t{lvl} ORDER BY event_id")
    return "\n".join(parts)


@q("event_hilbert_keys", sql=_hilbert_oracle_sql(16))
def event_hilbert_keys(sf_dir: str):
    """Hilbert-curve clustering keys (stages/partitioning.hilbert_key2)
    over (user_id, floor(value)) — the locality upgrade of the z-order
    keys already in the suite: consecutive Hilbert keys are ALWAYS
    spatially adjacent (Morton order jumps diagonally at power-of-two
    boundaries), so range-partitioned files get tighter per-file min/max
    on both columns for the same write-time cost.  The SQL oracle unrolls
    all 16 rotate-and-accumulate levels; pytest additionally pins the
    bijection + unit-step curve properties and measures the locality win
    over z-order."""
    from perfect_bloomfilter_ray.stages.partitioning import hilbert_key2

    ds = _t(sf_dir, "events", ["event_id", "user_id", "value"])

    def hk(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.floor(t.column("value").to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {"event_id": t.column("event_id"), "hkey": pa.array(hilbert_key2(u, v, 16))}
        )

    return ds.map_batches(hk, batch_format="pyarrow").sort("event_id")


@q(
    "iblt_snapshot_reconciliation",
    sql="""
    WITH a AS (SELECT o_orderkey AS k FROM orders),
    b AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 <> 0
          UNION ALL
          SELECT o_orderkey + 100000000 FROM orders WHERE o_orderkey % 101 = 0),
    rem AS (SELECT k FROM a EXCEPT SELECT k FROM b),
    ad AS (SELECT k FROM b EXCEPT SELECT k FROM a)
    SELECT CAST((SELECT count(*) FROM rem) AS BIGINT) AS n_removed,
           CAST((SELECT coalesce(sum(k), 0) FROM rem) AS BIGINT) AS sum_removed,
           CAST((SELECT count(*) FROM ad) AS BIGINT) AS n_added,
           CAST((SELECT coalesce(sum(k), 0) FROM ad) AS BIGINT) AS sum_added,
           CAST(1 AS BIGINT) AS decode_ok
    """,
)
def iblt_snapshot_reconciliation(sf_dir: str):
    """EXACT snapshot reconciliation through invertible Bloom lookup
    tables (state/iblt.py — Eppstein et al. SIGCOMM'11 "What's the
    Difference?"): two order-key snapshots (the second with a
    deterministic slice of keys removed and a synthetic slice added)
    each build ONE small IBLT via the standard partial/tree-merge sketch
    shuffle; subtracting the tables cellwise leaves a structure that
    depends only on the symmetric difference, and the peeling decode
    recovers the EXACT differing keys — the two snapshots reconcile by
    exchanging kilobytes, never by shuffling either table.  Table size
    scales as n/8 (6× headroom over the ~n/49 difference); the decode_ok
    flag is part of the hashed contract — a silent partial decode would
    fail the oracle."""
    import ray

    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.iblt import IBLT

    orders = _t(sf_dir, "orders", ["o_orderkey"]).materialize()
    n = orders.count()
    m = max(4096, n // 8)

    def snap_b(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        kept = k[k % 97 != 0]
        added = k[k % 101 == 0] + 100_000_000
        return pa.table({"k": pa.array(np.concatenate([kept, added]))})

    a = sketch_global(orders, "o_orderkey", lambda: IBLT(m), name="a")
    b_ds = orders.map_batches(snap_b, batch_format="pyarrow")
    b = sketch_global(b_ds, "k", lambda: IBLT(m), name="b")
    removed, added, ok = a.subtract(b).decode()
    return pd.DataFrame(
        {
            "n_removed": [len(removed)],
            "sum_removed": [int(removed.sum())],
            "n_added": [len(added)],
            "sum_added": [int(added.sum())],
            "decode_ok": [int(ok)],
        }
    ).astype("int64")


@q("cms_cu_heavy_hitter_users")
def cms_cu_heavy_hitter_users(sf_dir: str):
    """Heavy-hitter estimates from the conservative-update count-min
    (state/cms.ConservativeCMS — Estan & Varghese 2002): same probe set
    as the plain-CMS heavy-hitter query, with the plain-CMS and EXACT
    counts riding in-row so the tightening is visible per key.  rows-only
    by design (estimates); pytest pins the sandwich exact ≤ CU ≤ CMS
    pointwise.  Build shape identical to every sketch: partial tables per
    block merged cellwise (merging forfeits some CU tightness — the
    docstring contract — but never the upper bound)."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.agg import sketch_global
    from perfect_bloomfilter_ray.state.cms import ConservativeCMS, CountMinSketch

    ds = _t(sf_dir, "events", ["user_id"]).materialize()
    cu = sketch_global(ds, "user_id", lambda: ConservativeCMS(eps=1e-3, delta=1e-3))
    cms = sketch_global(ds, "user_id", lambda: CountMinSketch(eps=1e-3, delta=1e-3))
    exact = (
        ds.groupby("user_id")
        .count()
        .to_pandas()
        .rename(columns={"count()": "exact"})
        .sort_values(["exact", "user_id"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    keys = pa.array(exact["user_id"].to_numpy())
    exact["est_cu"] = cu.estimate_column(keys).astype(np.int64)
    exact["est_cms"] = cms.estimate_column(keys).astype(np.int64)
    exact["exact"] = exact["exact"].astype("int64")
    return exact[["user_id", "exact", "est_cu", "est_cms"]]


def _jl_sign(i: int, j: int) -> int:
    return 1 if (i * 31 + j * 17) % 2 == 0 else -1


def _jl_oracle_sql(in_dim: int = 64, out_dim: int = 4) -> str:
    cols = []
    for j in range(out_dim):
        terms = []
        for i in range(in_dim):
            s = "+" if _jl_sign(i, j) == 1 else "-"
            terms.append(f"{s} CAST(embedding[{i + 1}] AS DOUBLE)")
        expr = " ".join(terms).lstrip("+ ").strip()
        first_sign = "-" if _jl_sign(0, j) == -1 else ""
        terms2 = []
        for i in range(in_dim):
            sgn = _jl_sign(i, j)
            t = f"CAST(embedding[{i + 1}] AS DOUBLE)"
            if i == 0:
                terms2.append(t if sgn == 1 else f"(0.0 - {t})")
            else:
                terms2.append(("+ " if sgn == 1 else "- ") + t)
        cols.append("(" + " ".join(terms2) + f") AS p{j}")
    return (
        "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings ORDER BY vec_id"
    )


@q("jl_projected_embeddings", sql=_jl_oracle_sql(64, 4))
def jl_projected_embeddings(sf_dir: str):
    """Johnson-Lindenstrauss random projection of the embedding column
    (Achlioptas 2003 database-friendly ±1 variant): 64-dim vectors ×
    a DETERMINISTIC Rademacher sign matrix s_ij = ±1 from (31i+17j) mod 2
    → 4-dim sketch vectors.  The engine accumulates the signed terms in
    the SAME left-to-right order as the unrolled SQL expression, so the
    raw doubles hash bit-exactly.  Shuffle-free map over batches; the
    projection matrix is compile-time constant (nothing broadcast).
    pytest pins the JL property on real pairs (norm distortion bounded)."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def proj(t: pa.Table) -> pa.Table:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        # flatten() honors list-array slice offsets (.values would not)
        mat = np.asarray(
            emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(len(t), -1)
        cols = {"vec_id": t.column("vec_id")}
        for j in range(4):
            # 0.0 - x (not x * -1.0): keeps the zero sign identical to SQL
            s = mat[:, 0].copy() if _jl_sign(0, j) == 1 else 0.0 - mat[:, 0]
            for i in range(1, mat.shape[1]):
                sgn = _jl_sign(i, j)
                s = s + mat[:, i] if sgn == 1 else s - mat[:, i]
            cols[f"p{j}"] = pa.array(s)
        return pa.table(cols)

    return ds.map_batches(proj, batch_format="pyarrow").sort("vec_id")


@q(
    "hill_tail_index_value",
    sql="""
    WITH v AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL AND value > 0
        AND CAST(floor(value * 100) AS BIGINT) > 0
    ),
    r AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rnk FROM v),
    kx AS (SELECT x AS xk FROM r WHERE rnk = 101)
    SELECT rnk AS rank, x AS cents,
           ln(CAST(x AS DOUBLE) / CAST(kx.xk AS DOUBLE)) AS ln_ratio
    FROM r, kx WHERE rnk <= 100 ORDER BY rnk
    """,
)
def hill_tail_index_value(sf_dir: str):
    """Hill estimator inputs for the value distribution's tail index (Hill
    1975): the top-100 order statistics over integer cents with each
    ln(x_(i)/x_(k)) as ONE per-row libm log of an exact integer ratio —
    α̂ = k / Σ ln_ratio assembles clientside (pytest pins it and the
    heavier-tail-⇒-smaller-α direction).  Distributed shape: per-block
    partial top-101 + driver merge (the global_top_k pattern) — never a
    global sort; the log fold touches 100 rows."""
    from perfect_bloomfilter_ray.stages.topk import global_top_k

    ds = _t(sf_dir, "events", ["value"]).filter(
        lambda r: r["value"] is not None and r["value"] > 0
    )

    def cents(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())
        t2 = pa.table({"x": x})
        return t2.filter(pc.greater(t2.column("x"), 0))

    top = global_top_k(
        ds.map_batches(cents, batch_format="pyarrow"), "x", k=101, descending=True
    ).to_pandas()
    empty = pd.DataFrame(
        {"rank": pd.Series([], dtype="int64"), "cents": pd.Series([], dtype="int64"),
         "ln_ratio": pd.Series([], dtype="float64")}
    )
    if len(top) < 101:
        # mirrors the oracle: the rnk=101 CTE is empty, so zero rows
        return empty
    x = np.sort(top["x"].to_numpy().astype(np.int64))[::-1]
    xk = int(x[100])
    rows = []
    for i in range(100):
        rows.append(
            {
                "rank": i + 1,
                "cents": int(x[i]),
                "ln_ratio": math.log(float(x[i]) / float(xk)),
            }
        )
    return pd.DataFrame(rows, columns=["rank", "cents", "ln_ratio"]).astype(
        {"rank": "int64", "cents": "int64"}
    )


@q("voptimal_histogram_value")
def voptimal_histogram_value(sf_dir: str):
    """V-optimal histogram synopsis (Jagadish et al. VLDB'98): the 8-bucket
    piecewise-constant summary of the value distribution minimizing total
    within-bucket SSE — the principled upgrade of the suite's equi-width /
    equi-depth histograms and the partner of its Haar synopsis.  The
    corpus-sized step is ONE fixed-width 1024-bin count/sum/sumsq
    reduction (per-block bincount partials, no row shuffle); the O(bins²·B)
    DP runs on the driver's bounded prefix sums with deterministic
    smallest-boundary ties.  rows-only by design (a DP argmin has no SQL
    twin); pytest pins the DP against an independent brute force and the
    SSE-monotone-in-B property."""
    from ray.data.aggregate import Max, Min

    ds = _t(sf_dir, "events", ["value"]).filter(lambda r: r["value"] is not None)

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"x": pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64())}
        )

    cx = ds.map_batches(cents, batch_format="pyarrow").materialize()
    mm = cx.aggregate(Min("x"), Max("x"))
    lo, hi = int(mm["min(x)"]), int(mm["max(x)"])
    bins = 1024
    width = max(1, (hi - lo + bins) // bins)

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum((x - lo) // width, bins - 1)
        n = np.bincount(b, minlength=bins).astype(np.int64)
        sx = np.bincount(b, weights=x.astype(np.float64), minlength=bins).astype(np.int64)
        sxx_f = np.bincount(b, weights=(x * x).astype(np.float64), minlength=bins)
        return pa.table(
            {
                "bin": pa.array(np.arange(bins, dtype=np.int64)),
                "n": pa.array(n),
                "sx": pa.array(sx),
                "sxx": pa.array(sxx_f),  # float64 carries ints < 2^53 exactly
            }
        )

    agg = (
        cx.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sxx", alias_name="sxx")
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy().astype(np.int64)
    sx = agg["sx"].to_numpy().astype(np.float64)
    sxx = agg["sxx"].to_numpy().astype(np.float64)
    segs = voptimal_segments(n, sx, sxx, n_buckets=8)
    rows = [
        {
            "seg_id": i,
            "lo_bucket": int(a),
            "hi_bucket": int(b),
            "n": int(n[a : b + 1].sum()),
            "sx": int(sx[a : b + 1].sum()),
        }
        for i, (a, b) in enumerate(segs)
    ]
    return pd.DataFrame(rows, columns=["seg_id", "lo_bucket", "hi_bucket", "n", "sx"]).astype(
        "int64"
    )


def voptimal_segments(n, sx, sxx, n_buckets: int):
    """Exact DP over prefix sums: minimal-SSE partition of the bin index
    range into ``n_buckets`` contiguous segments; ties broken toward the
    SMALLEST boundary (deterministic).  O(bins² · n_buckets)."""
    bins = len(n)
    pn = np.concatenate([[0], np.cumsum(n)]).astype(np.float64)
    px = np.concatenate([[0.0], np.cumsum(sx)])
    pxx = np.concatenate([[0.0], np.cumsum(sxx)])

    def sse(a, b):  # bins a..b inclusive
        cnt = pn[b + 1] - pn[a]
        if cnt == 0:
            return 0.0
        s = px[b + 1] - px[a]
        return (pxx[b + 1] - pxx[a]) - s * s / cnt

    INF = float("inf")
    cost = np.full((n_buckets + 1, bins + 1), INF)
    back = np.zeros((n_buckets + 1, bins + 1), dtype=np.int64)
    cost[0, 0] = 0.0
    for k in range(1, n_buckets + 1):
        for b in range(k, bins + 1):
            # vectorized over all split points a: SSE(a, b-1) from prefixes
            a = np.arange(k - 1, b)
            cnt = pn[b] - pn[a]
            s = px[b] - px[a]
            seg = (pxx[b] - pxx[a]) - np.where(cnt > 0, s * s / np.maximum(cnt, 1), 0.0)
            c = cost[k - 1, a] + seg
            i = int(np.argmin(c))  # first min == smallest boundary (deterministic)
            cost[k, b] = c[i]
            back[k, b] = a[i]
    bounds = []
    b = bins
    for k in range(n_buckets, 0, -1):
        a = int(back[k, b])
        bounds.append((a, b - 1))
        b = a
    return list(reversed(bounds))


@q("user_max_nonoverlap_activity")
def user_max_nonoverlap_activity(sf_dir: str):
    """Weighted interval scheduling per user (the classic p(i)+DP over
    intervals sorted by end time): each user's candidate intervals are
    their per-(event-type, day) activity spans (which OVERLAP across
    types), weighted by event count; the DP picks the max-weight
    non-overlapping subset.  This is the suite's one PER-KEY DP — it runs
    INSIDE a hash-co-partitioned map_groups (every user's DP is
    independent; the sequential recurrence never crosses a partition),
    where every other DP here is a bounded driver fold.  Exact integer
    weights; rows-only by design (no SQL twin for the recurrence); pytest
    pins per-user optima against a brute-force subset search."""
    import polars as pl

    ds = _t(sf_dir, "events", ["user_id", "event_type", "ts"])

    def spans(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        d = pc.floor_temporal(ts, unit="day")
        us = pc.cast(ts, pa.int64())
        return (
            pl.from_arrow(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "event_type": t.column("event_type"),
                        "d": d,
                        "us": us,
                    }
                )
            )
            .group_by(["user_id", "event_type", "d"])
            .agg(
                pl.col("us").min().alias("s"),
                pl.col("us").max().alias("e"),
                pl.len().cast(pl.Int64).alias("w"),
            )
            .to_arrow()
        )

    from ray.data.aggregate import Max, Min

    ivs = (
        ds.map_batches(spans, batch_format="pyarrow")
        .groupby(["user_id", "event_type", "d"])
        .aggregate(
            Min("s", alias_name="s"), Max("e", alias_name="e"), Sum("w", alias_name="w")
        )
    )

    def dp_group(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "e", "s"])
        out_u, out_best, out_n = [], [], []
        for (u,), g in df.group_by(["user_id"], maintain_order=True):
            s = g["s"].to_numpy()
            e = g["e"].to_numpy()
            w = g["w"].to_numpy().astype(np.int64)
            n = len(s)
            # p(i): rightmost interval ending strictly before s[i]
            p = np.searchsorted(e, s, side="left")
            best = np.zeros(n + 1, dtype=np.int64)
            take = np.zeros(n + 1, dtype=bool)
            for i in range(1, n + 1):
                with_i = w[i - 1] + best[p[i - 1]]
                if with_i > best[i - 1]:
                    best[i] = with_i
                    take[i] = True
                else:
                    best[i] = best[i - 1]
            # count chosen intervals by backtracking
            cnt, i = 0, n
            while i > 0:
                if take[i]:
                    cnt += 1
                    i = int(p[i - 1])
                else:
                    i -= 1
            out_u.append(u)
            out_best.append(int(best[n]))
            out_n.append(cnt)
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "best_weight": pa.array(out_best, pa.int64()),
                "n_chosen": pa.array(out_n, pa.int64()),
            }
        )

    # COARSE partition by hash(user) so one task runs the DP for MANY users
    # (dp_group already iterates users inside the batch) — per-user
    # map_groups would schedule one tiny task per key
    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    nb = choose_num_blocks(ivs)

    def route(t: pa.Table) -> pa.Table:
        h = hash64(t.column("user_id"), 0xD9) % np.uint64(nb)
        return t.append_column("_part", pa.array(h.astype(np.int32)))

    out = (
        ivs.map_batches(route, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(
            lambda t: dp_group(t.drop_columns(["_part"])), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype("int64")


@q("huffman_code_lengths_per_lang")
def huffman_code_lengths_per_lang(sf_dir: str):
    """Optimal prefix-code length per language (Huffman 1952 over the
    exact [a-z0-9 ] character frequencies): the achievable-compression
    companion of the suite's Shannon char entropy and zlib ratio —
    L_huff is the tightest integer-bit code, with H ≤ L < H+1 pinned in
    pytest.  Deterministic tree: ties merge by (weight, min symbol id) so
    reruns and engines agree.  One bounded-alphabet char-count groupby;
    the tree build is 37 symbols on the driver.  rows-only by design
    (greedy tree has no SQL twin); exact integer weighted code lengths."""
    import heapq

    import polars as pl

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def counts(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.select(
                "lang",
                pl.col("text").fill_null("").str.to_lowercase()
                .str.extract_all(r"[a-z0-9 ]").alias("ch"),
            )
            .explode("ch")
            .drop_nulls("ch")
            .group_by(["lang", "ch"])
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .to_arrow()
        )

    freq = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["lang", "ch"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    rows = []
    for lang, g in freq.groupby("lang"):
        syms = list(zip(g["c"].astype(int), g["ch"]))
        total = sum(c for c, _ in syms)
        if len(syms) == 1:
            wl = total  # single-symbol code: 1 bit by convention
        else:
            # deterministic heap: (weight, tie_id); code lengths via merge depth
            heap = [(c, i, {ch: 0}) for i, (c, ch) in enumerate(sorted(syms, key=lambda t: t[1]))]
            heapq.heapify(heap)
            nxt = len(heap)
            while len(heap) > 1:
                c1, _, d1 = heapq.heappop(heap)
                c2, _, d2 = heapq.heappop(heap)
                merged = {k: v + 1 for k, v in d1.items()}
                merged.update({k: v + 1 for k, v in d2.items()})
                heapq.heappush(heap, (c1 + c2, nxt, merged))
                nxt += 1
            depths = heap[0][2]
            cmap = dict(zip(g["ch"], g["c"].astype(int)))
            wl = sum(cmap[ch] * d for ch, d in depths.items())
        rows.append({"lang": lang, "n_chars": total, "weighted_code_bits": wl})
    out = pd.DataFrame(rows, columns=["lang", "n_chars", "weighted_code_bits"])
    out = out.sort_values("lang").reset_index(drop=True)
    out["n_chars"] = out["n_chars"].astype("int64")
    out["weighted_code_bits"] = out["weighted_code_bits"].astype("int64")
    return out


@q("markov_removal_attribution")
def markov_removal_attribution(sf_dir: str):
    """Markov-chain data-driven attribution (Anderl et al. 2014): channel
    credit = its REMOVAL EFFECT, 1 − P(conversion with the channel's state
    deleted), on the first-order journey chain START → events →
    {purchase=conversion, END=null}.  Transition counts come from the
    suite's distributed transition_counts pass (one keyed shuffle);
    absorption probabilities solve the (I−Q)x = r linear system on the
    label-cardinality state space — k×k driver algebra, like every
    bounded finish here.  Credits are normalized removal effects; exact
    transition counts ride in-row so the report is reproducible.
    rows-only by design (matrix inverse has no SQL twin); pytest pins the
    absorption solve against brute-force chain enumeration on a toy chain
    and checks removal-effect sanity on the real one."""
    from perfect_bloomfilter_ray.stages.windows import transition_counts

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
    tc = transition_counts(ds, "user_id", "ts", "event_type", tie_cols=["event_id"])
    tdf = tc.to_pandas()

    # journey chain: START -> each user's exact first event (struct-min over
    # (ts, event_id) — per-batch partial mins re-reduced per user), END
    # absorbing for chain ends
    import polars as pl

    def first_exact(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.group_by("user_id")
            .agg(pl.struct(["ts", "event_id", "event_type"]).min().alias("m"))
            .unnest("m")
            .to_arrow()
        )

    fx = (
        ds.map_batches(first_exact, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(first_exact, batch_format="pyarrow")
        .to_pandas()
    )
    first_counts = (
        fx.groupby("event_type").size().rename("c").reset_index().rename(columns={"event_type": "s"})
    )

    states = sorted(set(tdf["state_from"]) | set(tdf["state_to"]) | set(first_counts["s"]))
    conv = "purchase"
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    # counts matrix + end absorption
    C = np.zeros((k, k), dtype=np.float64)
    for _, r in tdf.iterrows():
        C[idx[r["state_from"]], idx[r["state_to"]]] += r["n"]
    ends = np.zeros(k)  # chains ending at state s (no outgoing)
    outs = C.sum(axis=1)
    # per-state totals: occurrences as "from" + chain-end occurrences; chain
    # ends = (occurrences as to or first) - occurrences as from
    firsts_v = np.zeros(k)
    for _, r in first_counts.iterrows():
        firsts_v[idx[r["s"]]] += r["c"]
    ins = C.sum(axis=0) + firsts_v
    ends = np.maximum(ins - outs, 0.0)

    def absorption(drop: str | None) -> float:
        # P(hit conv before END) from START, with `drop` state removed
        keep = [s for s in states if s != conv and (drop is None or s != drop)]
        kidx = {s: i for i, s in enumerate(keep)}
        n = len(keep)
        Q = np.zeros((n, n))
        r = np.zeros(n)
        start_mass = 0.0
        p_start = np.zeros(n)
        for s in keep:
            i = kidx[s]
            tot = outs[idx[s]] + ends[idx[s]]
            if tot == 0:
                continue
            for t2 in states:
                c = C[idx[s], idx[t2]]
                if c == 0:
                    continue
                if t2 == conv:
                    r[i] += c / tot
                elif drop is not None and t2 == drop:
                    continue  # removed channel: journeys through it die
                else:
                    Q[i, kidx[t2]] += c / tot
        x = np.linalg.solve(np.eye(n) - Q, r)
        tot_first = firsts_v.sum()
        p = 0.0
        for s in states:
            f = firsts_v[idx[s]]
            if f == 0:
                continue
            if s == conv:
                p += f / tot_first
            elif drop is not None and s == drop:
                continue
            else:
                p += (f / tot_first) * x[kidx[s]]
        return p

    base = absorption(None)
    rows = []
    for s in states:
        if s == conv:
            continue
        re_ = 1.0 - (absorption(s) / base if base > 0 else 0.0)
        rows.append({"channel": s, "removal_effect": re_})
    out = pd.DataFrame(rows, columns=["channel", "removal_effect"])
    tot = out["removal_effect"].clip(lower=0).sum()
    out["credit"] = out["removal_effect"].clip(lower=0) / tot if tot > 0 else 0.0
    out["base_conversion"] = base
    return out.sort_values("channel").reset_index(drop=True)


@q("embedding_coreset_kmeans")
def embedding_coreset_kmeans(sf_dir: str):
    """Lightweight coreset k-means (Bachem, Lucic & Krause KDD'18): a
    SUBLINEAR clustering path — importance q_i = ½/n + ½·d(x_i, μ)²/Σd²
    from two cheap passes (mean, then distances), a DETERMINISTIC
    hash-residue importance sample with weights 1/(m·q_i), and weighted
    Lloyd on the ~m-point coreset.  At 100 TB the full-Lloyd path
    (embedding_kmeans_clusters) pays k×iters corpus passes; the coreset
    pays 2 passes + driver-side clustering, with the (1+ε) cost guarantee
    of the paper.  rows-only by design (sampling + iteration); pytest
    pins that coreset centroids cost ≤ 2× the full-data k-means cost on
    the real embeddings."""
    import ray

    from perfect_bloomfilter_ray.functions.hashing import hash64

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    m_target = 256
    k = 8

    def mat_of(t: pa.Table) -> np.ndarray:
        emb = t.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        return np.asarray(
            emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(len(t), -1)

    def sum_partial(t: pa.Table) -> pa.Table:
        m = mat_of(t)
        return pa.table(
            {
                "n": pa.array([len(m)], pa.int64()),
                "s": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
            }
        )

    parts = ds.map_batches(sum_partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    dim = len(np.frombuffer(parts["s"].iloc[0], dtype=np.float64))
    mu = np.zeros(dim)
    for b in parts["s"]:
        mu += np.frombuffer(b, dtype=np.float64)
    mu /= n
    mu_ref = ray.put(mu)

    def d2_partial(t: pa.Table) -> pa.Table:
        m = mat_of(t)
        d2 = ((m - ray.get(mu_ref)) ** 2).sum(axis=1)
        return pa.table({"sd2": pa.array([float(d2.sum())], pa.float64())})

    sum_d2 = float(ds.map_batches(d2_partial, batch_format="pyarrow").to_pandas()["sd2"].sum())

    def sample(t: pa.Table) -> pa.Table:
        m = mat_of(t)
        d2 = ((m - ray.get(mu_ref)) ** 2).sum(axis=1)
        q = 0.5 / n + 0.5 * d2 / sum_d2
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        u = hash64(t.column("vec_id"), 0xC0E5).astype(np.float64) / float(2**64)
        keep = u < np.minimum(m_target * q, 1.0)
        w = 1.0 / np.minimum(m_target * q, 1.0)
        return pa.table(
            {
                "vec_id": pa.array(ids[keep]),
                "w": pa.array(w[keep]),
                "vec": pa.array([row.tobytes() for row in m[keep]], pa.binary()),
            }
        )

    core = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    vecs = np.stack([np.frombuffer(b, dtype=np.float64) for b in core["vec"]])
    w = core["w"].to_numpy()
    # weighted Lloyd, deterministic farthest-first init from the weighted mean
    c = [vecs[np.argmax(((vecs - vecs.mean(axis=0)) ** 2).sum(axis=1))]]
    for _ in range(k - 1):
        d2c = np.min(
            np.stack([((vecs - cc) ** 2).sum(axis=1) for cc in c]), axis=0
        )
        c.append(vecs[np.argmax(d2c * w)])
    cent = np.stack(c)
    for _ in range(15):
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            mask = a == j
            if mask.any():
                cent[j] = np.average(vecs[mask], axis=0, weights=w[mask])
    d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    rows = []
    for j in range(k):
        mask = a == j
        rows.append(
            {
                "cluster": j,
                "coreset_points": int(mask.sum()),
                "weight_sum": float(w[mask].sum()),
                "inertia_w": float((d[mask, j] * w[mask]).sum()),
            }
        )
    out = pd.DataFrame(rows, columns=["cluster", "coreset_points", "weight_sum", "inertia_w"])
    out.attrs["centroids"] = cent
    return out


@q(
    "vocab_js_drift_halves",
    sql="""
    WITH tok AS (
      SELECT doc_id % 2 AS half,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ),
    c AS (SELECT w,
                 CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM tok GROUP BY w),
    top AS (SELECT * FROM c ORDER BY c1 + c2 DESC, w LIMIT 1000),
    tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t1, CAST(sum(c2) AS BIGINT) AS t2 FROM top)
    SELECT w AS token, c1, c2,
           0.5 * ((CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 1000 AS DOUBLE))
                  * ln((CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 1000 AS DOUBLE))
                       / (0.5 * ((CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 1000 AS DOUBLE))
                                 + (CAST(c2 + 1 AS DOUBLE) / CAST(t2 + 1000 AS DOUBLE))))))
         + 0.5 * ((CAST(c2 + 1 AS DOUBLE) / CAST(t2 + 1000 AS DOUBLE))
                  * ln((CAST(c2 + 1 AS DOUBLE) / CAST(t2 + 1000 AS DOUBLE))
                       / (0.5 * ((CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 1000 AS DOUBLE))
                                 + (CAST(c2 + 1 AS DOUBLE) / CAST(t2 + 1000 AS DOUBLE))))))
           AS js_part
    FROM top, tot ORDER BY token
    """,
)
def vocab_js_drift_halves(sf_dir: str):
    """Vocabulary-level Jensen-Shannon drift between the two doc-id-parity
    corpus halves — the token-distribution twin of the suite's
    type-mix JS drift and the standard "did my crawl's language shift"
    monitor.  Per-token contributions over the deterministic top-1000
    (add-one smoothed, exact int counts; each js_part ONE fixed IEEE
    expression with per-row libm logs) so nothing depends on summation
    order — JS(total) is the consumer's sum.  One token-count groupby +
    partial-top-k; the drift fold touches 1000 rows."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wc(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return (
            df.select(
                (pl.col("doc_id") % 2).alias("half"),
                pl.col("text").fill_null("").str.to_lowercase()
                .str.extract_all(r"[a-z0-9]+").alias("w"),
            )
            .explode("w")
            .drop_nulls("w")
            .group_by(["half", "w"])
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .to_arrow()
        )

    counts = (
        ds.map_batches(wc, batch_format="pyarrow")
        .groupby(["half", "w"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    piv = counts.pivot_table(index="w", columns="half", values="c", fill_value=0, aggfunc="sum")
    c1 = piv.get(0, pd.Series(0, index=piv.index)).astype(np.int64)
    c2 = piv.get(1, pd.Series(0, index=piv.index)).astype(np.int64)
    tot = (c1 + c2)
    top = (
        pd.DataFrame({"token": piv.index, "c1": c1.to_numpy(), "c2": c2.to_numpy(), "t": tot.to_numpy()})
        .sort_values(["t", "token"], ascending=[False, True])
        .head(1000)
        .reset_index(drop=True)
    )
    t1, t2 = int(top["c1"].sum()), int(top["c2"].sum())
    rows = []
    for _, r in top.iterrows():
        p = float(int(r["c1"]) + 1) / float(t1 + 1000)
        q_ = float(int(r["c2"]) + 1) / float(t2 + 1000)
        m_ = 0.5 * (p + q_)
        js = 0.5 * (p * math.log(p / m_)) + 0.5 * (q_ * math.log(q_ / m_))
        rows.append({"token": r["token"], "c1": int(r["c1"]), "c2": int(r["c2"]), "js_part": js})
    out = pd.DataFrame(rows, columns=["token", "c1", "c2", "js_part"])
    out["c1"] = out["c1"].astype("int64")
    out["c2"] = out["c2"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)


@q(
    "adaptive_join_order_revenue",
    sql="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def adaptive_join_order_revenue(sf_dir: str):
    """The adaptive join planner end-to-end (stages/adaptive.adaptive_join
    — the Spark-AQE-shaped broadcast / skew / hash dispatch decided from
    cheap statistics, not a fixed plan): orders ⋈ positive-balance
    customers, strategy chosen at run time (broadcast here — the dimension
    side is small; the SAME call dispatches to the skew or hash legs as
    inputs grow, pytest exercises all three).  Result rows are identical
    across strategies, which is exactly what the SQL oracle certifies."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.adaptive import adaptive_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        lambda r: r["c_acctbal"] > 0
    )
    joined, strategy = adaptive_join(orders, cust, on="o_custkey", right_on="c_custkey")
    assert strategy in ("broadcast", "skew", "hash")

    def agg(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
        return (
            pl.from_arrow(
                pa.table({"o_orderpriority": t.column("o_orderpriority"), "c": cents})
            )
            .group_by("o_orderpriority")
            .agg(pl.len().cast(pl.Int64).alias("n_orders"), pl.col("c").sum().alias("revenue_cents"))
            .to_arrow()
        )

    out = (
        joined.map_batches(agg, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


@q("bounded_load_shard_report")
def bounded_load_shard_report(sf_dir: str):
    """Consistent hashing with bounded loads (Mirrokni-Thorup-Zadimoghaddam
    2018; functions/hashing.bounded_load_assign): the user-key VOCABULARY
    is assigned to 16 shards at load factor 1.25 — per-shard capacity is
    a GUARANTEE (ceil(1.25·n/m)), the fix for the hot shard plain
    jump-hash grows under adversarial key sets, while only the overflow
    slice moves off its home shard.  Shard planning runs over distinct
    keys (one distributed distinct), the same bounded-small-side contract
    as every code-book broadcast here — CH-BL assigns KEYS to servers;
    rows then route by their key's shard.  Report: per-shard key counts,
    the cap, and how many keys probed away from home; multiset-
    deterministic (ascending-hash priority).  rows-only by design (the
    probe loop has no SQL twin); capacity bound and determinism pinned in
    pytest."""
    import math as _math

    from perfect_bloomfilter_ray.functions.hashing import (
        bounded_load_assign,
        hash64,
        jump_hash,
    )

    ds = _t(sf_dir, "events", ["user_id"])
    distinct = ds.groupby("user_id").count().drop_columns(["count()"])

    def hashes(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(hash64(t.column("user_id"), 0xB10C).view(np.int64))})

    h = (
        distinct.map_batches(hashes, batch_format="pyarrow")
        .to_pandas()["h"]
        .to_numpy()
        .view(np.uint64)
    )
    m, lf = 16, 1.25
    a = bounded_load_assign(h, m, lf)
    home = jump_hash(h, m)
    cap = int(_math.ceil(lf * len(h) / m))
    load = np.bincount(a, minlength=m)
    moved = int((a != home).sum())
    out = pd.DataFrame(
        {
            "shard": np.arange(m, dtype=np.int64),
            "n_keys": load.astype(np.int64),
            "cap": np.int64(cap),
            "moved_total": np.int64(moved),
        }
    )
    return out.astype("int64")


@q(
    "late_event_census",
    sql="""
    WITH w AS (
      SELECT event_id, event_type, epoch_us(ts) AS us,
             ((event_id & 2147483647) * 1103515245 + 12345) % 2147483648 AS arr,
             max(epoch_us(ts)) OVER (
               ORDER BY ((event_id & 2147483647) * 1103515245 + 12345) % 2147483648, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS wm
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_late,
           CAST(max(wm - us) AS BIGINT) AS max_lateness_us
    FROM w WHERE wm - us > 3600000000
    GROUP BY event_type ORDER BY event_type
    """,
)
def late_event_census(sf_dir: str):
    """Streaming late-data audit in batch form: the WATERMARK is the
    exclusive running max of event time over ARRIVAL order (the at-rest
    table is time-sorted, so arrival is modeled by a deterministic LCG
    scramble of event_id both engines compute identically — the standard
    way to exercise watermark semantics on sorted data; the suite's
    ordered_running_max segmented scan, no global sort), and
    an event is LATE when it arrives more than 1 h behind it — exactly
    the allowed-lateness drop rule of a streaming engine, made auditable
    over the at-rest table.  Counts and max lateness are exact int64 µs."""
    import polars as pl

    from perfect_bloomfilter_ray.stages.windows import ordered_running_max

    ds = _t(sf_dir, "events", ["event_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # mask to 31 bits BEFORE the multiply: the product then fits int64
        # in both engines (numpy would wrap silently, DuckDB would raise)
        arr = ((eid & 2147483647) * 1103515245 + 12345) % 2147483648
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "arr": pa.array(arr),
                "event_type": t.column("event_type"),
                "us": pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
            }
        )

    wm = ordered_running_max(
        ds.map_batches(prep, batch_format="pyarrow"),
        "arr", "event_id", "us", out_col="wm",
    )

    def late(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        df = df.filter((pl.col("wm") - pl.col("us")) > 3_600_000_000)
        return (
            df.group_by("event_type")
            .agg(
                pl.len().cast(pl.Int64).alias("n_late"),
                (pl.col("wm") - pl.col("us")).max().alias("max_lateness_us"),
            )
            .to_arrow()
        )

    from ray.data.aggregate import Max

    out = (
        wm.map_batches(late, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_late", alias_name="n_late"),
            Max("max_lateness_us", alias_name="max_lateness_us"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_late"] = out["n_late"].astype("int64")
    out["max_lateness_us"] = out["max_lateness_us"].astype("int64")
    return out


@q(
    "crlite_customers_with_orders",
    sql="""
    WITH act AS (SELECT DISTINCT o_custkey AS k FROM orders)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS acctbal_cents
    FROM customer JOIN act ON c_custkey = act.k
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def crlite_customers_with_orders(sf_dir: str):
    """EXACT membership through a CRLite cascade (state/crlite.py —
    Larisch et al. S&P'17, the construction Mozilla ships for certificate
    revocation): customers-with-orders is encoded as a Bloom-filter
    cascade whose error is driven to ZERO inside the known customer-key
    universe (~15 bits/member here, independent of the 64-bit key space —
    where a Roaring bitmap over hash-scattered keys degenerates to
    array-container cost).  The cascade broadcasts once and the customer
    scan marks membership shuffle-free; the SQL oracle is the plain exact
    semi-join — any cascade error would hash-fail.  The thematic closer
    of the reference's own cascade: theirs grows layers to BOUND the FPR
    under inserts, CRLite's closes the loop to zero for a frozen
    snapshot."""
    import polars as pl
    import ray

    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.state.crlite import CRLiteCascade

    orders = _t(sf_dir, "orders", ["o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]).materialize()

    def keys(col):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"h": pa.array(hash64(t.column(col), 0xC217).view(np.int64))})

        return fn

    mem = np.unique(
        orders.map_batches(keys("o_custkey"), batch_format="pyarrow")
        .to_pandas()["h"].to_numpy()
    ).view(np.uint64)
    uni = np.unique(
        cust.map_batches(keys("c_custkey"), batch_format="pyarrow")
        .to_pandas()["h"].to_numpy()
    ).view(np.uint64)
    # member hashes outside the universe would violate the CRLite contract;
    # orders reference existing customers by FK so this is the clean subset
    mem = np.intersect1d(mem, uni)
    casc = CRLiteCascade(mem, uni)
    ref = ray.put(casc.to_bytes())

    def mark(t: pa.Table) -> pa.Table:
        c = CRLiteCascade.from_bytes(ray.get(ref))
        h = hash64(t.column("c_custkey"), 0xC217)
        keep = c.contains(h)
        t = t.filter(pa.array(keep))
        cents = pc.cast(pc.floor(pc.multiply(t.column("c_acctbal"), 100.0)), pa.int64())
        return (
            pl.from_arrow(pa.table({"c_mktsegment": t.column("c_mktsegment"), "c": cents}))
            .group_by("c_mktsegment")
            .agg(pl.len().cast(pl.Int64).alias("n_customers"), pl.col("c").sum().alias("acctbal_cents"))
            .to_arrow()
        )

    out = (
        cust.map_batches(mark, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    out["n_customers"] = out["n_customers"].astype("int64")
    out["acctbal_cents"] = out["acctbal_cents"].astype("int64")
    return out


@q(
    "boilerplate_line_filter_stats",
    sql="""
    WITH ln AS (
      SELECT lang, unnest(string_split(text, chr(10))) AS line FROM documents
    ),
    f AS (
      SELECT lang, line,
             CAST(length(line) AS BIGINT) AS nc,
             CAST(len(regexp_extract_all(line, '[a-zA-Z]')) AS BIGINT) AS na,
             CAST(len(regexp_extract_all(line, '\\S+')) AS BIGINT) AS nw
      FROM ln WHERE trim(line) <> ''
    ),
    cls AS (
      SELECT lang, nc,
             CASE WHEN nw >= 5 AND na * 2 >= nc THEN 1 ELSE 0 END AS keep
      FROM f
    )
    SELECT lang,
           CAST(sum(keep) AS BIGINT) AS kept_lines,
           CAST(sum(1 - keep) AS BIGINT) AS dropped_lines,
           CAST(sum(CASE WHEN keep = 1 THEN nc ELSE 0 END) AS BIGINT) AS kept_chars
    FROM cls GROUP BY lang ORDER BY lang
    """,
)
def boilerplate_line_filter_stats(sf_dir: str):
    """Line-level boilerplate filtering (the jusText/Readability-lite
    text-density rule: a content line has ≥5 words AND ≥50% alphabetic
    characters; nav/footer/menu fragments fail both) — the extraction-side
    quality gate every web corpus runs between HTML→text and tokenizing.
    Rules are regex/arithmetic-identical across engines, so the per-lang
    keep/drop census is exact ints.  One vectorized line-explode pass +
    k-group fold; the filter itself composes with curate.py's chain."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["lang", "text"])

    def stats(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        lines = (
            df.select("lang", pl.col("text").fill_null("").str.split("\n").alias("line"))
            .explode("line")
            .filter(pl.col("line").str.strip_chars(" ") != "")  # DuckDB trim()
            # strips SPACES only; a tab/CR-only line must count as dropped
        )
        nc = pl.col("line").str.len_chars().cast(pl.Int64)  # length() = chars
        na = pl.col("line").str.count_matches(r"[a-zA-Z]").cast(pl.Int64)
        nw = pl.col("line").str.count_matches(r"\S+").cast(pl.Int64)
        keep = ((nw >= 5) & (na * 2 >= nc)).cast(pl.Int64)
        return (
            lines.select("lang", nc.alias("nc"), keep.alias("keep"))
            .group_by("lang")
            .agg(
                pl.col("keep").sum().alias("kept_lines"),
                (1 - pl.col("keep")).sum().alias("dropped_lines"),
                (pl.col("nc") * pl.col("keep")).sum().alias("kept_chars"),
            )
            .to_arrow()
        )

    out = (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("kept_lines", alias_name="kept_lines"),
            Sum("dropped_lines", alias_name="dropped_lines"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("kept_lines", "dropped_lines", "kept_chars"):
        out[c] = out[c].astype("int64")
    return out


@q(
    "mojibake_census",
    sql="""
    WITH f AS (
      SELECT source,
             CASE WHEN regexp_matches(text, 'Ã[¡-¿]|â€|Â[ -¿]|ï¿½') THEN 1 ELSE 0 END AS bad
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(bad) AS BIGINT) AS n_mojibake
    FROM f GROUP BY source ORDER BY source
    """,
)
def mojibake_census(sf_dir: str):
    """Encoding-damage (mojibake) census per source: documents matching
    the classic UTF-8-decoded-as-Latin-1 artifacts (Ã©-family, â€œ smart
    quotes, Â+space, the U+FFFD replacement char) — the crawl-hygiene
    signal for double-encoded or mislabeled pages, per-source so a bad
    upstream feed is attributable.  One identical RE2-portable regex on
    both engines; exact ints."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["source", "text"])

    def flag(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        bad = (
            pl.col("text").fill_null("")
            .str.contains(r"Ã[¡-¿]|â€|Â[ -¿]|ï¿½")
            .cast(pl.Int64)
        )
        return (
            df.select("source", bad.alias("bad"))
            .group_by("source")
            .agg(pl.len().cast(pl.Int64).alias("n_docs"), pl.col("bad").sum().alias("n_mojibake"))
            .to_arrow()
        )

    out = (
        ds.map_batches(flag, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_mojibake", alias_name="n_mojibake"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_mojibake"] = out["n_mojibake"].astype("int64")
    return out


@q("plindex_orderkey_report")
def plindex_orderkey_report(sf_dir: str):
    """Piecewise-linear learned index over the sorted order-key space
    (state/plindex.py — the PGM/RMI-lite shrinking-cone fit, no ML
    runtime): a few float triples per segment replace a full offsets
    array, with the ε rank-error bound ENFORCED at build and lookups
    exact (predict + ≤2ε window probe, binary-search fallback between
    segments).  Report: key count, segment count, index bytes vs raw key
    bytes, and an exact-lookup audit over present + absent probes — all
    deterministic ints.  Cluster shape: fit per sorted shard beside the
    zone-map sidecar (the data-skipping-index pattern); this query fits
    the single-shard demo driver-side.  rows-only by design (an iterative
    geometric fit has no SQL twin); invariants pinned in pytest."""
    from perfect_bloomfilter_ray.state.plindex import PLIndex

    orders = _t(sf_dir, "orders", ["o_orderkey"])
    keys = np.sort(
        orders.to_pandas()["o_orderkey"].to_numpy().astype(np.int64)
    )
    eps = 32
    ix = PLIndex(keys, eps=eps)
    rng_probe = keys[:: max(1, len(keys) // 1000)]
    absent = rng_probe + 1  # orderkeys are sparse; +1 mostly absent
    got_p = ix.lookup(rng_probe, keys)
    got_a = ix.lookup(absent, keys)
    exact = int(
        (got_p == np.searchsorted(keys, rng_probe)).sum()
        + (got_a == np.searchsorted(keys, absent)).sum()
    )
    return pd.DataFrame(
        {
            "n_keys": [len(keys)],
            "n_segments": [ix.n_segments],
            "eps": [eps],
            "index_bytes": [ix.nbytes],
            "raw_key_bytes": [keys.nbytes],
            "probes": [len(rng_probe) + len(absent)],
            "exact_lookups": [exact],
        }
    ).astype("int64")


@q(
    "word_burstiness_top200",
    sql="""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    ),
    c AS (SELECT w, doc_id, count(*) AS k FROM tok GROUP BY 1, 2),
    agg AS (SELECT w, CAST(count(*) AS BIGINT) AS df,
                   CAST(sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS df2
            FROM c GROUP BY w)
    SELECT w AS token, df, df2 FROM agg ORDER BY df DESC, w LIMIT 200
    """,
)
def word_burstiness_top200(sf_dir: str):
    """Word burstiness census (Church & Gale 1995 "Poisson mixtures"): for
    the top-200 words by document frequency, how often a word RECURS in a
    document that mentions it at all — df2/df is the adaptive-LM /
    topicality signal (function words ~Poisson, content words bursty),
    reported as the exact integer rational.  Documents are row-atomic, so
    per-(doc, word) counts complete inside each batch and ONE
    vocabulary-sized partial shuffle finishes the census."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        per_doc = (
            df.select(
                "doc_id",
                pl.col("text").fill_null("").str.to_lowercase()
                .str.extract_all(r"[a-z]+").alias("w"),
            )
            .explode("w")
            .drop_nulls("w")
            .group_by(["doc_id", "w"])
            .len(name="k")
        )
        return (
            per_doc.group_by("w")
            .agg(
                pl.len().cast(pl.Int64).alias("df"),
                (pl.col("k") >= 2).sum().cast(pl.Int64).alias("df2"),
            )
            .to_arrow()
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("df", alias_name="df"), Sum("df2", alias_name="df2"))
        .to_pandas()
        .sort_values(["df", "w"], ascending=[False, True])
        .head(200)
        .reset_index(drop=True)
        .rename(columns={"w": "token"})
    )
    agg["df"] = agg["df"].astype("int64")
    agg["df2"] = agg["df2"].astype("int64")
    return agg


@q(
    "merkle_bucket_diff",
    sql="""
    WITH a AS (SELECT o_orderkey AS k FROM orders),
    b AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 <> 0
          UNION ALL
          SELECT o_orderkey + 100000000 FROM orders WHERE o_orderkey % 101 = 0),
    ha AS (SELECT k % 64 AS bucket,
                  CAST(sum((k % 2147483647) * 1000003 % 2147483647) % 2147483647 AS BIGINT) AS fp,
                  CAST(count(*) AS BIGINT) AS n
           FROM a GROUP BY 1),
    hb AS (SELECT k % 64 AS bucket,
                  CAST(sum((k % 2147483647) * 1000003 % 2147483647) % 2147483647 AS BIGINT) AS fp,
                  CAST(count(*) AS BIGINT) AS n
           FROM b GROUP BY 1)
    SELECT coalesce(ha.bucket, hb.bucket) AS bucket,
           coalesce(ha.n, 0) AS n_a, coalesce(hb.n, 0) AS n_b
    FROM ha FULL OUTER JOIN hb ON ha.bucket = hb.bucket
    WHERE ha.fp IS DISTINCT FROM hb.fp OR ha.n IS DISTINCT FROM hb.n
    ORDER BY bucket
    """,
)
def merkle_bucket_diff(sf_dir: str):
    """Merkle-style diff LOCALIZATION between two table snapshots: each
    snapshot folds into 64 per-bucket order-independent multiset
    fingerprints (the suite's modular polynomial row hash — one int per
    bucket leaves each task), and comparing the two fingerprint vectors
    pinpoints WHICH key-range buckets changed without shuffling either
    table — the tree level above the full-table fingerprint, and the
    partner of the IBLT: Merkle narrows the diff to buckets, the IBLT
    then recovers the exact keys inside them.  Deterministic exact ints;
    the changed-bucket set is certified by the oracle's per-bucket
    fingerprint comparison."""
    import polars as pl

    # the suite's ONE row-fingerprint scheme — shared with the full-table
    # fingerprint this diff is "the tree level above"
    from perfect_bloomfilter_ray.pipelines.extras import _FP_A as FP_A, _FP_M as FP_M

    orders = _t(sf_dir, "orders", ["o_orderkey"])

    def parts(side_b: bool):
        def fn(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
            if side_b:
                kept = k[k % 97 != 0]
                added = k[k % 101 == 0] + 100_000_000
                k = np.concatenate([kept, added])
            df = pl.DataFrame({"k": k})
            return (
                df.with_columns(
                    (pl.col("k") % 64).alias("bucket"),
                    ((pl.col("k") % FP_M) * FP_A % FP_M).alias("h"),
                )
                .group_by("bucket")
                .agg(pl.col("h").sum().alias("hs"), pl.len().cast(pl.Int64).alias("pn"))
                .with_columns(pl.col("hs") % FP_M)
                .to_arrow()
            )

        return fn

    def fold(side_b: bool) -> pd.DataFrame:
        out = (
            orders.map_batches(parts(side_b), batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("hs", alias_name="hs"), Sum("pn", alias_name="n"))
            .to_pandas()
        )
        out["fp"] = (out["hs"] % FP_M).astype("int64")
        return out[["bucket", "fp", "n"]]

    a, b = fold(False), fold(True)
    m = a.merge(b, on="bucket", how="outer", suffixes=("_a", "_b"))
    m["n_a"] = m["n_a"].fillna(0).astype("int64")
    m["n_b"] = m["n_b"].fillna(0).astype("int64")
    changed = m[(m["fp_a"] != m["fp_b"]) | (m["n_a"] != m["n_b"])]
    out = changed[["bucket", "n_a", "n_b"]].sort_values("bucket").reset_index(drop=True)
    out["bucket"] = out["bucket"].astype("int64")
    return out


@q("hash_avalanche_audit")
def hash_avalanche_audit(sf_dir: str):
    """Hash-quality audit of the library's own seeded hash64 family — the
    statistical foundation under EVERY sketch bound here (HLL/CMS/theta
    accuracy all assume near-uniform bits): per-bit popcounts over the
    order-key stream (each of the 64 output bits should flip ~n/2 times)
    and the max absolute bias in parts-per-million.  Deterministic exact
    ints from one map-side bit-matrix partial per batch (a 64-int row
    leaves each task).  rows-only by design (splitmix has no SQL twin);
    pytest pins every bit inside the 6σ binomial envelope and
    cross-checks a brute-force popcount."""
    from perfect_bloomfilter_ray.functions.hashing import hash64

    ds = _t(sf_dir, "orders", ["o_orderkey"])

    def bit_partials(t: pa.Table) -> pa.Table:
        h = hash64(t.column("o_orderkey"), 0xA0D1)
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        counts = bits.sum(axis=0).astype(np.int64)  # 64 per-bit popcounts
        return pa.table(
            {
                "bit": pa.array(np.arange(64, dtype=np.int64)),
                "ones": pa.array(counts),
                "n": pa.array(np.full(64, len(h), dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(bit_partials, batch_format="pyarrow")
        .groupby("bit")
        .aggregate(Sum("ones", alias_name="ones"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bit")
        .reset_index(drop=True)
    )
    n = int(agg["n"].iloc[0])
    bias_ppm = ((agg["ones"] - n / 2.0).abs() / n * 1_000_000).astype(np.int64)
    out = pd.DataFrame(
        {
            "bit": agg["bit"].astype("int64"),
            "ones": agg["ones"].astype("int64"),
            "n": np.int64(n),
            "bias_ppm": bias_ppm,
        }
    )
    return out


@q(
    "inclusion_dependency_discovery",
    sql="""
    WITH vals AS (
      SELECT DISTINCT 1 AS col, c_custkey AS v FROM customer
      UNION ALL SELECT DISTINCT 2, o_custkey FROM orders
      UNION ALL SELECT DISTINCT 4, o_orderkey FROM orders
      UNION ALL SELECT DISTINCT 8, l_orderkey FROM lineitem
      UNION ALL SELECT DISTINCT 16, user_id FROM events
    ),
    m AS (SELECT v, CAST(sum(col) AS BIGINT) AS mask FROM vals GROUP BY v),
    c AS (SELECT mask, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY mask),
    cols(bit, name) AS (VALUES (1, 'c_custkey'), (2, 'o_custkey'),
                               (4, 'o_orderkey'), (8, 'l_orderkey'), (16, 'user_id')),
    pairs AS (SELECT a.bit AS ab, a.name AS lhs, b.bit AS bb, b.name AS rhs
              FROM cols a CROSS JOIN cols b WHERE a.bit <> b.bit)
    SELECT lhs, rhs,
           CAST((SELECT coalesce(sum(n), 0) FROM c WHERE (mask & ab) > 0) AS BIGINT)
               AS n_lhs,
           CAST((SELECT coalesce(sum(n), 0) FROM c
                 WHERE (mask & ab) > 0 AND (mask & bb) = 0) AS BIGINT) AS violations
    FROM pairs ORDER BY lhs, rhs
    """,
)
def inclusion_dependency_discovery(sf_dir: str):
    """Inclusion-dependency (foreign-key candidate) discovery across five
    key columns (Papenbrock et al.'s IND profiling task, the FD family's
    completion): ALL 20 ordered containment checks lhs ⊆ rhs from ONE
    value shuffle — every distinct (column, value) folds to a per-value
    COLUMN BITMASK, the bitmask histogram (≤ 2^5 rows) broadcasts, and
    violations(A ⊄ B) = Σ n[mask] with bit A set, bit B clear.  20 exact
    anti-join counts for the price of one exchange; 0 violations ⇒ a
    discovered IND (o_custkey ⊆ c_custkey is the schema's real FK)."""
    import polars as pl

    specs = [
        ("customer", "c_custkey", 1),
        ("orders", "o_custkey", 2),
        ("orders", "o_orderkey", 4),
        ("lineitem", "l_orderkey", 8),
        ("events", "user_id", 16),
    ]
    parts = []
    for table, col, bit in specs:
        ds = _t(sf_dir, table, [col])

        def mk(bit=bit, col=col):
            def fn(t: pa.Table) -> pa.Table:
                v = np.unique(t.column(col).to_numpy(zero_copy_only=False).astype(np.int64))
                return pa.table(
                    {"v": pa.array(v), "colbit": pa.array(np.full(len(v), bit, np.int64))}
                )

            return fn

        parts.append(ds.map_batches(mk(), batch_format="pyarrow"))
    union = parts[0]
    for p_ in parts[1:]:
        union = union.union(p_)
    # ONE all-to-all: per-value bitmask via the idempotent BitOr aggregate
    # (cross-batch duplicate (v, colbit) rows OR to a no-op — no dedupe
    # exchange needed), then the ≤2^5-row mask histogram folds map-side.
    from perfect_bloomfilter_ray.stages.agg import BitOrAgg

    masked = union.groupby("v").aggregate(BitOrAgg("colbit", name="mask"))

    def hist_part(t: pa.Table) -> pa.Table:
        m = t.column("mask").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(m, minlength=32)
        nz = np.flatnonzero(cnt)
        return pa.table({"mask": pa.array(nz.astype(np.int64)), "n": pa.array(cnt[nz].astype(np.int64))})

    hp = masked.map_batches(hist_part, batch_format="pyarrow").to_pandas()
    mask_hist = hp.groupby("mask", as_index=False)["n"].sum()
    masks = mask_hist["mask"].to_numpy().astype(np.int64)
    ns = mask_hist["n"].to_numpy().astype(np.int64)
    names = {1: "c_custkey", 2: "o_custkey", 4: "o_orderkey", 8: "l_orderkey", 16: "user_id"}
    rows = []
    for ab, lhs in names.items():
        for bb, rhs in names.items():
            if ab == bb:
                continue
            n_lhs = int(ns[(masks & ab) > 0].sum())
            viol = int(ns[((masks & ab) > 0) & ((masks & bb) == 0)].sum())
            rows.append({"lhs": lhs, "rhs": rhs, "n_lhs": n_lhs, "violations": viol})
    out = pd.DataFrame(rows).sort_values(["lhs", "rhs"]).reset_index(drop=True)
    out["n_lhs"] = out["n_lhs"].astype("int64")
    out["violations"] = out["violations"].astype("int64")
    return out


@q(
    "mph_static_dictionary_lookup",
    sql="""
    WITH d AS (SELECT DISTINCT user_id FROM events)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(count(*) AS BIGINT) AS n_distinct_slots,
           CAST(0 AS BIGINT) AS collisions,
           CAST(sum(user_id) AS BIGINT) AS dict_value_checksum
    FROM d
    """,
)
def mph_static_dictionary_lookup(sf_dir: str):
    """Minimal perfect hash as a collision-free static dictionary
    (state/mph.py — BBHash, Limasset et al. 2017, ~3.3 bits/key, NO
    stored keys): the distinct user-key set builds the MPH, a parallel
    value array stores each key's payload at its unique slot, and a
    distributed probe pass reads every key's value back through one
    broadcast of the tiny bitmaps.  The CONTRACT oracle encodes the
    perfect-hash laws: slots are a bijection onto [0, n) (n distinct
    slots, 0 collisions) and the dictionary returns every payload
    (checksum of values read back == checksum of keys, since value :=
    key here).  The literal endpoint of the reference's name: the
    cascade makes membership near-perfect, the MPH over the same keys
    is perfect."""
    import ray

    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.state.mph import MinimalPerfectHash

    ds = _t(sf_dir, "events", ["user_id"])
    distinct = (
        ds.groupby("user_id").count().drop_columns(["count()"]).materialize()
    )
    keys_df = distinct.to_pandas()
    uid = keys_df["user_id"].to_numpy().astype(np.int64)
    h = hash64(pa.array(uid), 0x3F17)
    mph = MinimalPerfectHash(h)
    slots = mph.lookup(h)
    n = len(uid)
    n_slots = len(np.unique(slots))
    table = np.empty(n, dtype=np.int64)
    table[slots] = uid  # value := the key itself (checksum-verifiable)
    ref = ray.put((mph.to_bytes(), table))

    def probe(t: pa.Table) -> pa.Table:
        mb, tab = ray.get(ref)
        m = MinimalPerfectHash.from_bytes(mb)
        hh = hash64(t.column("user_id"), 0x3F17)
        got = tab[m.lookup(hh)]
        return pa.table({"s": pa.array([int(got.sum())], pa.int64())})

    checksum = int(
        distinct.map_batches(probe, batch_format="pyarrow").sum("s")
    )
    return pd.DataFrame(
        {
            "n_keys": [n],
            "n_distinct_slots": [n_slots],
            "collisions": [n - n_slots],
            "dict_value_checksum": [checksum],
        }
    ).astype("int64")


@q(
    "eliasfano_orderkey_roundtrip",
    sql="""
    WITH d AS (SELECT DISTINCT o_orderkey AS k FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(k) AS BIGINT) AS access_checksum,
           CAST(sum(CASE WHEN k % 5 = 0 THEN k ELSE 0 END) AS BIGINT)
               AS member_probe_checksum
    FROM d
    """,
)
def eliasfano_orderkey_roundtrip(sf_dir: str):
    """Elias-Fano quasi-succinct encoding of the sorted order-key set
    (state/eliasfano.py — Vigna WSDM'13, the posting-list representation
    of modern search engines): n keys in ~(2 + log₂(u/n)) bits each with
    O(1) random access and successor queries, NO decompression.  The
    contract oracle certifies exactness: the checksum of every access(i)
    equals the checksum of the real keys, and membership probes over the
    k%5==0 slice return exactly those keys.  The EXACT sibling of the
    hashed Golomb set — same bit-budget ballpark, but real keys, order
    statistics and range scans survive."""
    from perfect_bloomfilter_ray.state.eliasfano import EliasFano

    orders = _t(sf_dir, "orders", ["o_orderkey"])
    keys = np.unique(orders.to_pandas()["o_orderkey"].to_numpy().astype(np.int64))
    ef = EliasFano(keys)
    acc = ef.access(np.arange(ef.n))
    probe = keys[keys % 5 == 0]
    hits = ef.contains(probe)
    member_checksum = int(probe[hits].sum())
    return pd.DataFrame(
        {
            "n_keys": [ef.n],
            "access_checksum": [int(acc.sum())],
            "member_probe_checksum": [member_checksum],
        }
    ).astype("int64")


@q(
    "curation_waterfall",
    sql="""
    WITH f AS (
      SELECT source,
             CASE WHEN length(text) BETWEEN 200 AND 20000 THEN 1 ELSE 0 END AS p_len,
             CASE WHEN NOT regexp_matches(text, 'Ã[¡-¿]|â€|Â[ -¿]|ï¿½')
                  THEN 1 ELSE 0 END AS p_moji,
             CASE WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of|to|is|in|a|for)\\b'))
                       * 20 >= len(regexp_extract_all(text, '\\S+'))
                  THEN 1 ELSE 0 END AS p_stop
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p_len) AS BIGINT) AS pass_length,
           CAST(sum(p_len * p_moji) AS BIGINT) AS pass_encoding,
           CAST(sum(p_len * p_moji * p_stop) AS BIGINT) AS pass_all
    FROM f GROUP BY source ORDER BY source
    """,
)
def curation_waterfall(sf_dir: str):
    """Curation WATERFALL census per source — the funnel view every corpus
    report leads with: how many documents survive each successive gate
    (length band → encoding-damage screen → stopword-density floor, the
    Gopher/C4 ordering).  Each gate is the same regex/arithmetic
    expression on both engines, gates compose by multiplication, and the
    per-source attrition is exact ints — the pipeline-level summary tying
    the suite's individual quality filters together."""
    import polars as pl

    ds = _t(sf_dir, "documents", ["source", "text"])

    def gates(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        txt = pl.col("text").fill_null("")
        p_len = txt.str.len_chars().is_between(200, 20000).cast(pl.Int64)
        p_moji = (~txt.str.contains(r"Ã[¡-¿]|â€|Â[ -¿]|ï¿½")).cast(pl.Int64)
        n_stop = txt.str.to_lowercase().str.count_matches(
            r"\b(the|and|of|to|is|in|a|for)\b"
        ).cast(pl.Int64)
        n_tok = txt.str.count_matches(r"\S+").cast(pl.Int64)
        p_stop = (n_stop * 20 >= n_tok).cast(pl.Int64)
        return (
            df.select(
                "source",
                p_len.alias("p_len"),
                (p_len * p_moji).alias("p_enc"),
                (p_len * p_moji * p_stop).alias("p_all"),
            )
            .group_by("source")
            .agg(
                pl.len().cast(pl.Int64).alias("n_docs"),
                pl.col("p_len").sum().alias("pass_length"),
                pl.col("p_enc").sum().alias("pass_encoding"),
                pl.col("p_all").sum().alias("pass_all"),
            )
            .to_arrow()
        )

    out = (
        ds.map_batches(gates, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("pass_length", alias_name="pass_length"),
            Sum("pass_encoding", alias_name="pass_encoding"),
            Sum("pass_all", alias_name="pass_all"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    for c in ("n_docs", "pass_length", "pass_encoding", "pass_all"):
        out[c] = out[c].astype("int64")
    return out


@q(
    "partial_corr_qty_price_given_discount",
    sql="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(floor(l_discount * 100) AS BIGINT) AS z
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(z) AS BIGINT) AS sz,
             CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
             CAST(sum(z*z) AS BIGINT) AS szz,
             CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*z) AS BIGINT) AS sxz,
             CAST(sum(y*z) AS BIGINT) AS syz
      FROM v
    )
    SELECT n, sx, sy, sz, sxy, sxz, syz,
           round(
             ((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
              / (sqrt(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                 * sqrt(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy))
              - ((CAST(n AS DOUBLE)*sxz - CAST(sx AS DOUBLE)*sz)
                 / (sqrt(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                    * sqrt(CAST(n AS DOUBLE)*szz - CAST(sz AS DOUBLE)*sz)))
                * ((CAST(n AS DOUBLE)*syz - CAST(sy AS DOUBLE)*sz)
                   / (sqrt(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)
                      * sqrt(CAST(n AS DOUBLE)*szz - CAST(sz AS DOUBLE)*sz))))
             / (sqrt(1.0 - pow((CAST(n AS DOUBLE)*sxz - CAST(sx AS DOUBLE)*sz)
                   / (sqrt(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
                      * sqrt(CAST(n AS DOUBLE)*szz - CAST(sz AS DOUBLE)*sz)), 2))
                * sqrt(1.0 - pow((CAST(n AS DOUBLE)*syz - CAST(sy AS DOUBLE)*sz)
                   / (sqrt(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)
                      * sqrt(CAST(n AS DOUBLE)*szz - CAST(sz AS DOUBLE)*sz)), 2)))
           , 6) AS partial_r
    FROM s
    """,
)
def partial_corr_qty_price_given_discount(sf_dir: str):
    """First-order PARTIAL correlation r_xy·z (quantity vs price
    controlling for discount): the confounder-adjusted association every
    observational readout needs, r_xy·z = (r_xy − r_xz·r_yz) /
    √(1−r_xz²)√(1−r_yz²), assembled from EXACT int64 three-column moment
    sums (quantity integer, price/discount fixed-point cents) in one
    corpus pass — the 3-variable extension of the suite's grouped
    Pearson.  Same expression tree both sides, round(6) absorbing
    division-chain ulps."""
    import polars as pl

    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pa.Table:
        x = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.floor(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        z = np.floor(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        vals = {
            "n": len(x), "sx": x.sum(), "sy": y.sum(), "sz": z.sum(),
            "sxx": (x * x).sum(), "syy": (y * y).sum(), "szz": (z * z).sum(),
            "sxy": (x * y).sum(), "sxz": (x * z).sum(), "syz": (y * z).sum(),
        }
        return pa.table({k: pa.array([int(v)], pa.int64()) for k, v in vals.items()})

    p = ds.map_batches(part, batch_format="pyarrow").to_pandas().sum()
    n = float(p["n"])
    def r(sab, sa, sb, saa, sbb):
        return (n * sab - float(sa) * sb) / (
            np.sqrt(n * saa - float(sa) * sa) * np.sqrt(n * sbb - float(sb) * sb)
        )
    r_xy = r(p["sxy"], p["sx"], p["sy"], p["sxx"], p["syy"])
    r_xz = r(p["sxz"], p["sx"], p["sz"], p["sxx"], p["szz"])
    r_yz = r(p["syz"], p["sy"], p["sz"], p["syy"], p["szz"])
    pr = (r_xy - r_xz * r_yz) / (np.sqrt(1.0 - r_xz**2) * np.sqrt(1.0 - r_yz**2))
    return pd.DataFrame(
        {
            "n": [int(p["n"])], "sx": [int(p["sx"])], "sy": [int(p["sy"])],
            "sz": [int(p["sz"])], "sxy": [int(p["sxy"])], "sxz": [int(p["sxz"])],
            "syz": [int(p["syz"])], "partial_r": [round(float(pr), 6)],
        }
    ).astype({c: "int64" for c in ("n", "sx", "sy", "sz", "sxy", "sxz", "syz")})


@q("hourly_volume_pacf")
def hourly_volume_pacf(sf_dir: str):
    """Partial autocorrelation function to lag 12 (Durbin-Levinson
    recursion over the SAME dense-spine ACF the suite already
    oracle-verifies) — the Box-Jenkins companion of hourly_volume_acf:
    ACF tails identify MA order, PACF cutoffs identify AR order.  The
    corpus work is the one hour groupby the ACF query pays; the 12-step
    recursion is driver arithmetic on verified exact moments.  rows-only
    by design (a recursion has no SQL twin); pytest pins the recursion
    against an independent Levinson implementation and the lag-1 identity
    pacf(1) == acf(1)."""
    acf_rows = hourly_volume_acf(sf_dir)
    # rebuild autocorrelations about the SERIES mean (standard definition)
    # from the dense series the ACF query derives its moments from
    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": pc.floor_temporal(pc.cast(t.column("ts"), pa.timestamp("us")), unit="hour")}
        )

    h = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .count()
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    hb = (
        h["b"].astype("datetime64[us]").astype("int64").to_numpy() // 3_600_000_000
    ).astype(np.int64)
    dense = np.zeros(int(hb[-1] - hb[0]) + 1, dtype=np.int64)
    dense[hb - hb[0]] = h["count()"].to_numpy().astype(np.int64)
    x = dense.astype(np.float64)
    x = x - x.mean()
    denom = float((x * x).sum())
    rho = np.array([float((x[:-k] * x[k:]).sum()) / denom for k in range(1, 13)])
    pacf = durbin_levinson_pacf(rho)
    out = pd.DataFrame(
        {"lag": np.arange(1, 13, dtype=np.int64), "pacf": np.round(pacf, 6)}
    )
    out["lag"] = out["lag"].astype("int64")
    return out


def durbin_levinson_pacf(rho: np.ndarray) -> np.ndarray:
    """phi_kk from autocorrelations rho[0]=ρ(1).. — the classic recursion."""
    m = len(rho)
    pacf = np.zeros(m)
    phi_prev = np.zeros(m)
    for k in range(1, m + 1):
        if k == 1:
            phi_kk = rho[0]
        else:
            num = rho[k - 1] - float((phi_prev[: k - 1] * rho[k - 2 :: -1][: k - 1]).sum())
            den = 1.0 - float((phi_prev[: k - 1] * rho[: k - 1]).sum())
            phi_kk = num / den
        phi_new = phi_prev.copy()
        phi_new[k - 1] = phi_kk
        for j in range(k - 1):
            phi_new[j] = phi_prev[j] - phi_kk * phi_prev[k - 2 - j]
        phi_prev = phi_new
        pacf[k - 1] = phi_kk
    return pacf


@q("median_polish_seasonality")
def median_polish_seasonality(sf_dir: str):
    """Tukey median polish of the 7×24 (day-of-week × hour-of-day) volume
    grid (Tukey 1977 EDA): robust additive decomposition count ≈ overall
    + row effect + column effect, iterated disc-median sweeps — the
    outlier-resistant twin of the suite's additive seasonality-effects
    query (means move with one bot burst; medians do not).  Counts are
    exact ints and every sweep subtracts an exact disc median, so effects
    stay INTEGERS and the run is deterministic (4 fixed sweeps).  One
    contingency groupby; the polish is 7×24 driver arithmetic.  rows-only
    by design (iterative sweeps have no SQL twin); pytest pins the
    decomposition identity and the residual-size reduction."""
    ds = _t(sf_dir, "events", ["ts"])

    def feats(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        return pa.table(
            {
                "dow": pc.cast(
                    pc.day_of_week(ts, count_from_zero=True, week_start=7), pa.int64()
                ),
                "hod": pc.cast(pc.hour(ts), pa.int64()),
            }
        )

    cnt = (
        ds.map_batches(feats, batch_format="pyarrow")
        .groupby(["dow", "hod"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "c"})
    )
    grid = np.zeros((7, 24), dtype=np.int64)
    for _, r in cnt.iterrows():
        grid[int(r["dow"]), int(r["hod"])] = int(r["c"])
    resid, overall, row_eff, col_eff = median_polish_int(grid, sweeps=4)
    rows = [
        {"component": "overall", "index": 0, "effect": int(overall)},
    ]
    for d in range(7):
        rows.append({"component": "dow", "index": d, "effect": int(row_eff[d])})
    for hh in range(24):
        rows.append({"component": "hod", "index": hh, "effect": int(col_eff[hh])})
    rows.append(
        {"component": "resid_abs_sum", "index": 0, "effect": int(np.abs(resid).sum())}
    )
    out = pd.DataFrame(rows, columns=["component", "index", "effect"])
    out["index"] = out["index"].astype("int64")
    out["effect"] = out["effect"].astype("int64")
    return out


def median_polish_int(grid: np.ndarray, sweeps: int = 4):
    """Integer median polish: alternate row/column disc-median sweeps;
    returns (residuals, overall, row_effects, col_effects) with the exact
    identity grid == overall + row[:,None] + col[None,:] + residuals."""

    def dmed(a: np.ndarray, axis: int) -> np.ndarray:
        s = np.sort(a, axis=axis)
        idx = np.maximum(np.ceil(0.5 * a.shape[axis]).astype(int) - 1, 0)
        return np.take(s, idx, axis=axis)

    resid = grid.astype(np.int64).copy()
    overall = np.int64(0)
    row = np.zeros(grid.shape[0], dtype=np.int64)
    col = np.zeros(grid.shape[1], dtype=np.int64)
    for _ in range(sweeps):
        rm = dmed(resid, 1)
        resid -= rm[:, None]
        row += rm
        cm_of_row = dmed(row[None, :], 1)[0]
        row -= cm_of_row
        overall += cm_of_row
        cm = dmed(resid, 0)
        resid -= cm[None, :]
        col += cm
        rm_of_col = dmed(col[None, :], 1)[0]
        col -= rm_of_col
        overall += rm_of_col
    return resid, overall, row, col


@q(
    "grubbs_hourly_outlier",
    sql="""
    WITH h AS (
      SELECT date_trunc('hour', ts) AS b, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sx,
                 CAST(sum(c * c) AS BIGINT) AS sxx,
                 CAST(max(c) AS BIGINT) AS cmax, CAST(min(c) AS BIGINT) AS cmin
          FROM h)
    SELECT n, sx, sxx, cmax, cmin,
           round(greatest(CAST(cmax AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE),
                          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - CAST(cmin AS DOUBLE))
                 / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0)), 6) AS g_stat
    FROM s
    """,
)
def grubbs_hourly_outlier(sf_dir: str):
    """Grubbs' max-studentized-deviation test on hourly volume (Grubbs
    1950): G = max(|c_max − mean|, |mean − c_min|)/s — the classic single-
    outlier screen, the parametric sibling of the suite's MAD-based
    seasonal outlier monitor.  All sufficient statistics exact int64 from
    one hour groupby; G one fixed expression rounded to 6."""
    import polars as pl

    ds = _t(sf_dir, "events", ["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {"b": pc.floor_temporal(pc.cast(t.column("ts"), pa.timestamp("us")), unit="hour")}
        )

    h = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .count()
        .to_pandas()["count()"]
        .to_numpy()
        .astype(np.int64)
    )
    n = len(h)
    sx, sxx = int(h.sum()), int((h * h).sum())
    cmax, cmin = int(h.max()), int(h.min())
    mean = float(sx) / float(n)
    sd = np.sqrt((float(sxx) - float(sx) * sx / float(n)) / (float(n) - 1.0))
    # DuckDB double x/0 -> NULL (-> NaN in pandas); mirror for a perfectly
    # flat hourly series instead of raising/inf-diverging.
    g = round(max(float(cmax) - mean, mean - float(cmin)) / sd, 6) if sd != 0.0 else np.nan
    return pd.DataFrame(
        {"n": [n], "sx": [sx], "sxx": [sxx], "cmax": [cmax], "cmin": [cmin],
         "g_stat": np.array([g], dtype=np.float64)}
    ).astype({c: "int64" for c in ("n", "sx", "sxx", "cmax", "cmin")})


@q(
    "page_trend_test_periods",
    sql="""
    WITH b AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(extract(hour FROM ts) AS BIGINT) // 6 AS p,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT d, p,
             CAST(2 * rank() OVER (PARTITION BY d ORDER BY c)
                  + count(*) OVER (PARTITION BY d, c) - 1 AS BIGINT) AS r2
      FROM b
    )
    SELECT p AS period, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(r2) AS BIGINT) AS r2_sum
    FROM r GROUP BY p ORDER BY p
    """,
)
def page_trend_test_periods(sf_dir: str):
    """Page's test for ordered alternatives (Page 1963): within every DAY
    the four six-hour periods are midranked by volume, and L = Σ_p p·R_p
    detects a monotone across-period trend that repeated days cannot fake
    — the ordinal companion of the suite's Cochran-Armitage (binary dose)
    and Friedman-style designs.  Midranks ride DOUBLED (2R = 2·rank_min +
    ties − 1) so every reported number is exact int64; L assembles
    clientside.  One (day, period) contingency groupby; the rank fold
    runs on the bounded days×4 grid."""
    import polars as pl

    ds = _t(sf_dir, "events", ["ts"])

    def feats(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        return pa.table(
            {
                "d": pc.cast(pc.floor_temporal(ts, unit="day"), pa.int64()),
                "p": pc.cast(pc.divide(pc.hour(ts), 6), pa.int64()),
            }
        )

    cnt = (
        ds.map_batches(feats, batch_format="pyarrow")
        .groupby(["d", "p"])
        .count()
        .to_pandas()
        .rename(columns={"count()": "c"})
    )
    rows = {}
    for d, g in cnt.groupby("d"):
        c = g["c"].to_numpy().astype(np.int64)
        p_ = g["p"].to_numpy().astype(np.int64)
        order = np.argsort(c, kind="stable")
        # doubled midranks with ties: 2*rank_min + ties - 1 per value
        sorted_c = c[order]
        r2 = np.empty(len(c), dtype=np.int64)
        i = 0
        while i < len(sorted_c):
            j = i
            while j < len(sorted_c) and sorted_c[j] == sorted_c[i]:
                j += 1
            r2[order[i:j]] = 2 * (i + 1) + (j - i) - 1
            i = j
        for pp, rr in zip(p_, r2):
            n, s = rows.get(int(pp), (0, 0))
            rows[int(pp)] = (n + 1, s + int(rr))
    out = pd.DataFrame(
        [{"period": p_, "n_days": n, "r2_sum": s} for p_, (n, s) in sorted(rows.items())],
        columns=["period", "n_days", "r2_sum"],
    )
    return out.astype("int64")


@q(
    "quartile_dispersion_per_type",
    sql="""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(quantile_disc(x, 0.25) AS BIGINT) AS q1,
           CAST(quantile_disc(x, 0.75) AS BIGINT) AS q3,
           round((CAST(quantile_disc(x, 0.75) AS DOUBLE) - CAST(quantile_disc(x, 0.25) AS DOUBLE))
                 / NULLIF(CAST(quantile_disc(x, 0.75) AS DOUBLE) + CAST(quantile_disc(x, 0.25) AS DOUBLE), 0.0), 6)
               AS cqv
    FROM v GROUP BY event_type ORDER BY event_type
    """,
)
def quartile_dispersion_per_type(sf_dir: str):
    """Coefficient of quartile variation per type — the scale-free ROBUST
    dispersion measure (Q3−Q1)/(Q3+Q1) (Bonett 2006): where CV collapses
    under heavy tails and zscore spread needs finite variance, the CQV is
    rank-based and outlier-immune.  Quartiles are the suite's exact disc
    quantiles over integer cents, so q1/q3 are exact ints and the ratio
    ONE fixed expression rounded to 6."""
    from perfect_bloomfilter_ray.stages.quantiles import exact_grouped_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"]).filter(
        lambda r: r["value"] is not None
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": pc.cast(pc.floor(pc.multiply(t.column("value"), 100.0)), pa.int64()),
            }
        )

    cx = ds.map_batches(cents, batch_format="pyarrow")
    q = exact_grouped_quantiles(
        cx, "event_type", "x", [0.25, 0.75], kind="disc", names=["q1", "q3"]
    ).to_pandas().sort_values("event_type").reset_index(drop=True)
    q["q1"] = q["q1"].astype("int64")
    q["q3"] = q["q3"].astype("int64")
    # NULLIF-mirrored zero guard: a type whose cent-quartiles sum to 0 (all
    # |values| < 0.01, or symmetric negatives) yields NULL in both engines
    # instead of a ZeroDivisionError here vs inf there.
    q["cqv"] = [
        round((float(a3) - float(a1)) / (float(a3) + float(a1)), 6) if a1 + a3 != 0 else None
        for a1, a3 in zip(q["q1"], q["q3"])
    ]
    return q[["event_type", "q1", "q3", "cqv"]]
