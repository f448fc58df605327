"""Classic decision-support queries (TPC-H shapes Q2..Q22, adapted).

The driver's star schema is a reduced TPC-H (no partsupp table, no
commit/receipt dates, no shipmode), so each query keeps the *join/agg
pattern* of its TPC-H namesake while substituting available predicates:

- EXISTS / NOT EXISTS decorrelation  -> broadcast exact semi/anti joins
  (``stages/joins.broadcast_semi_join``) over the streaming fact table.
- Correlated scalar subqueries (Q11/Q17/Q22) -> a first aggregate pass
  whose result broadcasts as an Arrow LUT into a vectorized filter;
  boundary comparisons are restated in INTEGER arithmetic (quantities are
  integer-valued, balances are cent-exact) so the Ray side and the DuckDB
  oracle agree bitwise — never ``x < 0.2 * avg`` on floats.
- One big-big hash join per query at most (lineitem x orders on the order
  key, ``Dataset.join`` with CPU-derived partition count); every
  dimension (part 2k, supplier 100, nation 25, region 5, customer) rides
  as a broadcast lookup, mirroring ``q5_local_supplier_volume``.

Money sums are float64 rounded to 2 decimals on BOTH sides (house
convention, safe at these magnitudes); shares/ratios round to 6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

from perfect_bloomfilter_ray.pipelines.queries import ORACLE_SQL, QUERIES, _round, _t, q
from perfect_bloomfilter_ray.stages.joins import (
    broadcast_lookup_join,
    broadcast_semi_join,
)
from perfect_bloomfilter_ray.stages.partitioning import choose_join_partitions


def _rev_lineitem(sf_dir: str, extra: list[str] | None = None):
    """lineitem projected to (l_orderkey, extras..., rev) with
    rev = l_extendedprice * (1 - l_discount) computed batch-side."""
    cols = ["l_orderkey", "l_extendedprice", "l_discount"] + (extra or [])
    ds = _t(sf_dir, "lineitem", cols)

    def revenue(t: pa.Table) -> pa.Table:
        r = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        t = t.drop_columns(["l_extendedprice", "l_discount"])
        return t.append_column("rev", r)

    return ds.map_batches(revenue, batch_format="pyarrow")


def _between(col: pa.ChunkedArray, lo, hi) -> pa.ChunkedArray:
    """half-open [lo, hi) predicate."""
    return pc.and_(pc.greater_equal(col, pa.scalar(lo)), pc.less(col, pa.scalar(hi)))


@q(
    "q4_priority_exists",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_priority_exists(sf_dir: str):
    """TPC-H Q4 shape: EXISTS decorrelated into a semi join. The inner
    predicate is lineitem-only (returnflag, standing in for the missing
    commit/receipt dates), so the distinct qualifying order keys stream out
    of a batch-local unique and probe the date-windowed orders as an exact
    broadcast key set — no shuffle, no join materialization."""
    lo, hi = pd.Timestamp("1996-07-01"), pd.Timestamp("1996-10-01")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda t: t.filter(_between(t.column("o_orderdate"), lo, hi)).drop_columns(["o_orderdate"]),
        batch_format="pyarrow",
    )
    returned = _t(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        lambda t: pa.table(
            {"l_orderkey": pc.unique(t.filter(pc.equal(t.column("l_returnflag"), pa.scalar("R"))).column("l_orderkey"))}
        ),
        batch_format="pyarrow",
    )
    out = (
        broadcast_semi_join(orders, returned, on="o_orderkey", right_on="l_orderkey")
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return out


@q(
    "q6_forecast_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6: pure filter-and-sum, the canonical predicate-pushdown probe.
    One streaming scan, no shuffle; the discount band compares the stored
    float64 values directly (same literals both sides, no arithmetic)."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    ds = _t(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def flt(t: pa.Table) -> pa.Table:
        m = _between(t.column("l_shipdate"), lo, hi)
        m = pc.and_(m, pc.greater_equal(t.column("l_discount"), pa.scalar(0.05)))
        m = pc.and_(m, pc.less_equal(t.column("l_discount"), pa.scalar(0.07)))
        m = pc.and_(m, pc.less(t.column("l_quantity"), pa.scalar(24.0)))
        t = t.filter(m)
        return pa.table({"x": pc.multiply(t.column("l_extendedprice"), t.column("l_discount"))})

    total = ds.map_batches(flt, batch_format="pyarrow").sum("x")
    return pd.DataFrame({"revenue": [round(float(total), 2)]})


@q(
    "q7_volume_shipping",
    sql="""
    SELECT supp_nation, cust_nation, l_year, round(sum(rev), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7: bilateral trade volume between two nations per year. One
    big-big hash join (lineitem x orders); supplier/customer/nation resolve
    as broadcast lookups; the symmetric nation-pair predicate is a
    vectorized OR filter after both lookups."""
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(_between(t.column("l_shipdate"), lo, hi))
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        yr = pc.cast(pc.year(t.column("l_shipdate")), pa.int64())
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "l_suppkey": t.column("l_suppkey"), "l_year": yr, "rev": rev}
        )

    li = li.map_batches(prep, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = li.join(orders, "inner", num_partitions=choose_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))
    j = broadcast_lookup_join(joined, _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]), on="l_suppkey", right_on="s_suppkey")
    j = broadcast_lookup_join(j, _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), on="o_custkey", right_on="c_custkey")
    nation = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n1 = pa.table({"n_nationkey": nation["n_nationkey"], "supp_nation": nation["n_name"]})
    n2 = pa.table({"n_nationkey": nation["n_nationkey"], "cust_nation": nation["n_name"]})
    j = broadcast_lookup_join(j, n1, on="s_nationkey", right_on="n_nationkey")
    j = broadcast_lookup_join(j, n2, on="c_nationkey", right_on="n_nationkey")

    def pair(t: pa.Table) -> pa.Table:
        a = pc.and_(pc.equal(t.column("supp_nation"), pa.scalar("NATION_3")), pc.equal(t.column("cust_nation"), pa.scalar("NATION_8")))
        b = pc.and_(pc.equal(t.column("supp_nation"), pa.scalar("NATION_8")), pc.equal(t.column("cust_nation"), pa.scalar("NATION_3")))
        return t.filter(pc.or_(a, b))

    out = (
        j.map_batches(pair, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    return _round(out, {"revenue": 2})


@q(
    "q8_market_share",
    sql="""
    SELECT o_year, round(sum(CASE WHEN nation = 'NATION_3' THEN rev ELSE 0 END)
                          / sum(rev), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS rev,
             n1.n_name AS nation
      FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN part      ON l_partkey  = p_partkey
      JOIN supplier  ON l_suppkey  = s_suppkey
      JOIN customer  ON o_custkey  = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region    ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(sf_dir: str):
    """TPC-H Q8: a nation's share of regional market revenue per year.
    The part-type filter broadcasts as an exact key set BEFORE the big-big
    join (build-side reduction); the share is a conditional-sum / sum ratio
    grouped by order year."""
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    part_keys = _t(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({"p_partkey": t.filter(pc.equal(t.column("p_type"), pa.scalar("STANDARD"))).column("p_partkey")}),
        batch_format="pyarrow",
    )
    li = _rev_lineitem(sf_dir, extra=["l_partkey", "l_suppkey"])
    li = broadcast_semi_join(li, part_keys, on="l_partkey", right_on="p_partkey")

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: (lambda f: pa.table(
            {"o_orderkey": f.column("o_orderkey"), "o_custkey": f.column("o_custkey"),
             "o_year": pc.cast(pc.year(f.column("o_orderdate")), pa.int64())}
        ))(t.filter(_between(t.column("o_orderdate"), lo, hi))),
        batch_format="pyarrow",
    )
    joined = li.join(orders, "inner", num_partitions=choose_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))
    j = broadcast_lookup_join(joined, _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]), on="l_suppkey", right_on="s_suppkey")
    j = broadcast_lookup_join(j, _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), on="o_custkey", right_on="c_custkey")
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    n_supp = pa.table({"n_nationkey": nat["n_nationkey"], "nation": nat["n_name"]})
    asia_keys = pa.table({"n_nationkey": nat.loc[nat["r_name"] == "ASIA", "n_nationkey"]})
    j = broadcast_semi_join(j, asia_keys, on="c_nationkey", right_on="n_nationkey")
    j = broadcast_lookup_join(j, n_supp, on="s_nationkey", right_on="n_nationkey")

    def split(t: pa.Table) -> pa.Table:
        is_n = pc.equal(t.column("nation"), pa.scalar("NATION_3"))
        nrev = pc.if_else(is_n, t.column("rev"), pa.scalar(0.0))
        return pa.table({"o_year": t.column("o_year"), "nrev": nrev, "rev": t.column("rev")})

    out = (
        j.map_batches(split, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("nrev", alias_name="nrev"), Sum("rev", alias_name="trev"))
        .to_pandas()
        .sort_values("o_year")
        .reset_index(drop=True)
    )
    out["mkt_share"] = (out["nrev"] / out["trev"]).round(6)
    return out[["o_year", "mkt_share"]]


@q(
    "q12_priority_by_linestatus",
    sql="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_priority_by_linestatus(sf_dir: str):
    """TPC-H Q12 shape (shipmode -> linestatus): CASE-bucketed counts after
    the big-big join. The priority flag is resolved batch-side into 0/1
    integers so the aggregate is two exact Sums in one pass."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"]).map_batches(
        lambda t: t.filter(_between(t.column("l_shipdate"), lo, hi)).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
    )
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, "inner", num_partitions=choose_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))

    def flags(t: pa.Table) -> pa.Table:
        hi_m = pc.is_in(t.column("o_orderpriority"), value_set=pa.array(["1-URGENT", "2-HIGH"]))
        one = pc.cast(hi_m, pa.int64())
        return pa.table(
            {"l_linestatus": t.column("l_linestatus"), "high": one, "low": pc.subtract(pa.scalar(1, pa.int64()), one)}
        )

    out = (
        joined.map_batches(flags, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(Sum("high", alias_name="high_line_count"), Sum("low", alias_name="low_line_count"))
        .to_pandas()
        .sort_values("l_linestatus")
        .reset_index(drop=True)
    )
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out


@q(
    "q13_customer_order_distribution",
    sql="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(sf_dir: str):
    """TPC-H Q13: distribution of per-customer order counts INCLUDING the
    zero bucket. Orders pre-aggregate to (custkey, n); customers left-join
    that LUT (broadcast), null -> 0, then a tiny second groupby over the
    count values."""
    counts = (
        _t(sf_dir, "orders", ["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )
    cust = _t(sf_dir, "customer", ["c_custkey"])
    j = broadcast_lookup_join(cust, counts, on="c_custkey", right_on="o_custkey", how="left")

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({"c_count": pc.coalesce(pc.cast(t.column("c_count"), pa.int64()), pa.scalar(0, pa.int64()))})

    out = (
        j.map_batches(fill, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .to_pandas()
        .sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )
    out["c_count"] = out["c_count"].astype("int64")
    return out


@q(
    "q14_promo_revenue_share",
    sql="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_share(sf_dir: str):
    """TPC-H Q14: promotion revenue percentage for one month. The part type
    resolves as a broadcast lookup (2k-row dimension); the month of lineitem
    streams through one conditional-sum pass — no shuffle at all."""
    lo, hi = pd.Timestamp("1997-03-01"), pd.Timestamp("1997-04-01")
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: t.filter(_between(t.column("l_shipdate"), lo, hi)).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
    )
    j = broadcast_lookup_join(li, _t(sf_dir, "part", ["p_partkey", "p_type"]), on="l_partkey", right_on="p_partkey")

    def split(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        promo = pc.if_else(pc.equal(t.column("p_type"), pa.scalar("PROMO")), rev, pa.scalar(0.0))
        return pa.table({"promo": promo, "rev": rev})

    agg = j.map_batches(split, batch_format="pyarrow").aggregate(Sum("promo"), Sum("rev"))
    pct = round(100.0 * agg["sum(promo)"] / agg["sum(rev)"], 6)
    return pd.DataFrame({"promo_revenue_pct": [pct]})


@q(
    "q18_large_volume_orders",
    sql="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING sum(l_quantity) > 300
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def q18_large_volume_orders(sf_dir: str):
    """TPC-H Q18: large-volume orders. Per-order quantity sums are exact
    (quantities are integer-valued, so float64 partial sums commute); the
    HAVING filter shrinks the result to a handful of keys that then resolve
    order/customer attributes via broadcast lookups — the expensive side is
    one groupby over lineitem, never a three-way materialized join."""
    big = (
        _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"))
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("sum_qty"), pa.scalar(300.0))),
            batch_format="pyarrow",
        )
    )
    j = broadcast_lookup_join(
        big, _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]), on="l_orderkey", right_on="o_orderkey"
    )
    out = j.to_pandas()
    out["sum_qty"] = out["sum_qty"].astype("int64")
    out = out.rename(columns={"o_custkey": "c_custkey", "l_orderkey": "o_orderkey"})
    out = _round(out, {"o_totalprice": 2})
    out = out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).reset_index(drop=True)
    return out[["c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]]


@q(
    "q2_min_unit_price_supplier",
    sql="""
    WITH f AS (SELECT p_partkey, p_name FROM part WHERE p_size = 10 AND p_type = 'STANDARD'),
    m AS (SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS mp
          FROM lineitem JOIN f ON l_partkey = p_partkey GROUP BY l_partkey, l_suppkey),
    r AS (SELECT *, row_number() OVER (PARTITION BY l_partkey ORDER BY mp, l_suppkey) AS rn FROM m)
    SELECT p_partkey, p_name, s_suppkey, s_name, mp AS min_unit_price
    FROM r JOIN f ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey
    WHERE rn = 1 ORDER BY p_partkey
    """,
)
def q2_min_unit_price_supplier(sf_dir: str):
    """TPC-H Q2 shape (no partsupp table, so "supply cost" = observed unit
    price l_extendedprice / l_quantity): for each part in a size/type slice,
    the supplier offering the minimum unit price, ties broken by suppkey.
    The correlated min decorrelates into one distributed (part, supplier) Min
    aggregate; the per-part argmin runs on that dimension-sized result. Unit
    prices are single IEEE divisions (bit-identical across engines), so the
    float min/tie compare is exact — and the output keeps the raw division
    bits (no rounding: round(x, 4) of a division can land on a half-point
    where numpy rounds half-even and DuckDB half-away)."""
    part = _t(sf_dir, "part", ["p_partkey", "p_name", "p_size", "p_type"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t.column("p_size"), pa.scalar(10)), pc.equal(t.column("p_type"), pa.scalar("STANDARD")))
        ).drop_columns(["p_size", "p_type"]),
        batch_format="pyarrow",
    )
    part_tbl = part.to_pandas()
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])
    li = broadcast_semi_join(li, pa.table({"p_partkey": part_tbl["p_partkey"]}), on="l_partkey", right_on="p_partkey")

    def unit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "up": pc.divide(t.column("l_extendedprice"), t.column("l_quantity")),
            }
        )

    m = (
        li.map_batches(unit, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Min("up", alias_name="mp"))
        .to_pandas()
    )
    m = m.sort_values(["l_partkey", "mp", "l_suppkey"]).groupby("l_partkey", as_index=False).first()
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = m.merge(part_tbl, left_on="l_partkey", right_on="p_partkey").merge(
        supp, left_on="l_suppkey", right_on="s_suppkey"
    )
    out["min_unit_price"] = out["mp"]
    return out[["p_partkey", "p_name", "s_suppkey", "s_name", "min_unit_price"]].sort_values("p_partkey").reset_index(drop=True)


@q(
    "q9_product_type_profit",
    sql="""
    SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               - 80 * CAST(round(p_retailprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) / 10000.0 AS sum_profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey  = p_partkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY supp_nation, o_year ORDER BY supp_nation, o_year
    """,
)
def q9_product_type_profit(sf_dir: str):
    """TPC-H Q9 shape (supplycost := 0.8 x retail price): profit per supplier
    nation per order year for one product family. The part filter+price ride
    the broadcast lookup BEFORE the single big-big join, shrinking its build
    side ~15x; supplier->nation is a second broadcast lookup. Profit is
    accumulated in integer MICRO-CENTS (prices cent-exact, discounts whole
    percents, quantities integers) — a round-2 float sum here proved FLAKY:
    one of the 175 groups sits at a .005 boundary that flips with Ray's
    block scheduling order. The output is one exact int->double division."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"])
    part = _t(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).map_batches(
        lambda t: t.filter(pc.match_substring(t.column("p_name"), "widget")).drop_columns(["p_name"]),
        batch_format="pyarrow",
    )
    j = broadcast_lookup_join(li, part, on="l_partkey", right_on="p_partkey")

    def amount(t: pa.Table) -> pa.Table:
        i64 = pa.int64()
        cents = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))), i64)
        keep = pc.subtract(
            pa.scalar(100, i64), pc.cast(pc.round(pc.multiply(t.column("l_discount"), pa.scalar(100.0))), i64)
        )
        rcents = pc.cast(pc.round(pc.multiply(t.column("p_retailprice"), pa.scalar(100.0))), i64)
        qty = pc.cast(t.column("l_quantity"), i64)
        mc = pc.subtract(pc.multiply(cents, keep), pc.multiply(pc.multiply(pa.scalar(80, i64), rcents), qty))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "l_suppkey": t.column("l_suppkey"), "amount_mc": mc})

    j = j.map_batches(amount, batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t.column("o_orderkey"), "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    j = j.join(orders, "inner", num_partitions=choose_join_partitions(), on=("l_orderkey",), right_on=("o_orderkey",))
    j = broadcast_lookup_join(j, _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]), on="l_suppkey", right_on="s_suppkey")
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas().rename(columns={"n_name": "supp_nation"})
    j = broadcast_lookup_join(j, pa.Table.from_pandas(nat), on="s_nationkey", right_on="n_nationkey")
    out = (
        j.groupby(["supp_nation", "o_year"])
        .aggregate(Sum("amount_mc", alias_name="mc"))
        .to_pandas()
        .sort_values(["supp_nation", "o_year"])
        .reset_index(drop=True)
    )
    out["sum_profit"] = out["mc"] / 10000.0
    return out[["supp_nation", "o_year", "sum_profit"]]


@q(
    "q11_part_revenue_share",
    sql="""
    WITH pr AS (SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS mc
                FROM lineitem GROUP BY l_partkey),
    t AS (SELECT sum(mc) AS tot, count(*) AS cnt FROM pr)
    SELECT l_partkey, mc / 10000.0 AS part_revenue
    FROM pr, t WHERE mc * cnt * 10 > tot * 13
    ORDER BY part_revenue DESC, l_partkey
    """,
)
def q11_part_revenue_share(sf_dir: str):
    """TPC-H Q11 shape: parts whose revenue exceeds 1.3x the average part
    revenue (HAVING against a scalar subquery; the multiplier form is
    scale-free, unlike TPC-H's literal fraction). One distributed per-part
    Sum; the global total folds from that part-cardinality result on the
    driver — never a second corpus scan. Revenue is accumulated in integer
    MICRO-CENTS (cent-exact prices x whole-percent discounts) so both the
    threshold (mc*cnt*10 > tot*13) and the output value (one exact int->
    double division) are bitwise-reproducible regardless of summation
    order — float partial sums would drift at the 20k-part scale."""
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def microcents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        keep = pc.subtract(pa.scalar(100, pa.int64()), pc.cast(pc.round(pc.multiply(t.column("l_discount"), pa.scalar(100.0))), pa.int64()))
        return pa.table({"l_partkey": t.column("l_partkey"), "mc": pc.multiply(cents, keep)})

    pr = (
        li.map_batches(microcents, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("mc", alias_name="mc"))
        .to_pandas()
    )
    tot, cnt = int(pr["mc"].sum()), len(pr)
    # mc*cnt*10 > tot*13 restated as mc*10 > floor(tot*13/cnt): same integer
    # predicate (strict > is preserved through the floor), but the per-row
    # multiply stays within int64 at any corpus scale while tot*13 folds in
    # Python bigints on the driver.
    thr = (tot * 13) // cnt
    out = pr[pr["mc"].to_numpy() * 10 > thr].copy()
    out["part_revenue"] = out["mc"] / 10000.0
    out = out[["l_partkey", "part_revenue"]].sort_values(["part_revenue", "l_partkey"], ascending=[False, True])
    return out.reset_index(drop=True)


@q(
    "q15_top_supplier",
    sql="""
    WITH r AS (SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
               FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
               GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM r JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM r)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(sf_dir: str):
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue. The view
    materializes as one supplier-cardinality aggregate; the max-equality
    compares ROUNDED revenue on both sides, making the float tie exact."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-04-01")
    li = _t(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: (lambda f: pa.table(
            {"l_suppkey": f.column("l_suppkey"),
             "rev": pc.multiply(f.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), f.column("l_discount")))}
        ))(t.filter(_between(t.column("l_shipdate"), lo, hi))),
        batch_format="pyarrow",
    )
    r = li.groupby("l_suppkey").aggregate(Sum("rev", alias_name="total_revenue")).to_pandas()
    r["total_revenue"] = r["total_revenue"].round(2)
    best = r[r["total_revenue"] == r["total_revenue"].max()]
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    return out[["s_suppkey", "s_name", "total_revenue"]].sort_values("s_suppkey").reset_index(drop=True)


@q(
    "q16_brand_size_supplier_counts",
    sql="""
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY p_brand, p_size ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_brand_size_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct supplier counts per (brand, size) slice.
    COUNT(DISTINCT) decomposes into a distinct-triple groupby (map-side
    dedup inside each batch first) followed by a tiny pair-count — the
    standard two-phase exact distinct at scale."""
    part = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.invert(pc.equal(t.column("p_brand"), pa.scalar("Brand#1"))),
                pc.is_in(t.column("p_size"), value_set=pa.array([1, 5, 10, 15, 20, 25])),
            )
        ),
        batch_format="pyarrow",
    )
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    j = broadcast_lookup_join(li, part, on="l_partkey", right_on="p_partkey")

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.select(["p_brand", "p_size", "l_suppkey"]).group_by(["p_brand", "p_size", "l_suppkey"]).aggregate([])

    triples = j.map_batches(local_distinct, batch_format="pyarrow").groupby(["p_brand", "p_size", "l_suppkey"]).aggregate(Count(alias_name="_n"))
    out = (
        triples.groupby(["p_brand", "p_size"])
        .aggregate(Count(alias_name="supplier_cnt"))
        .to_pandas()
        .sort_values(["supplier_cnt", "p_brand", "p_size"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out


@q(
    "q17_small_quantity_revenue",
    sql="""
    WITH a AS (SELECT l_partkey, count(*) AS cnt, sum(l_quantity) AS sq
               FROM lineitem GROUP BY l_partkey)
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON l_partkey = p_partkey JOIN a USING (l_partkey)
    WHERE p_brand = 'Brand#13' AND l_quantity * 5 * cnt < sq
    """,
)
def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17: revenue lost to small-quantity orders. The correlated
    "quantity < 0.2 * avg(quantity per part)" subquery decorrelates into a
    per-part (count, sum) pass broadcast as an Arrow LUT — and the boundary
    is restated in INTEGER arithmetic (qty * 5 * cnt < sum_qty; quantities
    are integer-valued) so both engines agree bitwise at the threshold."""
    import ray

    a = (
        _t(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .groupby("l_partkey")
        .aggregate(Count(alias_name="cnt"), Sum("l_quantity", alias_name="sq"))
        .to_pandas()
    )
    lut = pa.table({"l_partkey": a["l_partkey"], "cnt": a["cnt"].astype("float64"), "sq": a["sq"]})
    brand_keys = _t(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda t: pa.table({"p_partkey": t.filter(pc.equal(t.column("p_brand"), pa.scalar("Brand#13"))).column("p_partkey")}),
        batch_format="pyarrow",
    )
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    li = broadcast_semi_join(li, brand_keys, on="l_partkey", right_on="p_partkey")
    lut_ref = ray.put(lut)

    def flt(t: pa.Table) -> pa.Table:
        s: pa.Table = ray.get(lut_ref)
        idx = pc.index_in(t.column("l_partkey"), value_set=s.column("l_partkey"))
        cnt = pc.take(s.column("cnt"), idx)
        sq = pc.take(s.column("sq"), idx)
        lhs = pc.multiply(pc.multiply(t.column("l_quantity"), pa.scalar(5.0)), cnt)
        return pa.table({"x": t.filter(pc.less(lhs, sq)).column("l_extendedprice")})

    total = li.map_batches(flt, batch_format="pyarrow").sum("x")
    return pd.DataFrame({"avg_yearly": [round(float(total) / 7.0, 2)]})


@q(
    "q19_disjunctive_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1  AND l_quantity <= 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19: disjunctive multi-table predicate. The three brand clauses
    evaluate as one vectorized OR after the part broadcast lookup — no
    per-clause scans, no shuffle."""
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    j = broadcast_lookup_join(li, _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]), on="l_partkey", right_on="p_partkey")

    def clause(t: pa.Table, brand: str, smax: int, qlo: float, qhi: float):
        return pc.and_(
            pc.and_(pc.equal(t.column("p_brand"), pa.scalar(brand)), pc.less_equal(t.column("p_size"), pa.scalar(smax))),
            pc.and_(
                pc.greater_equal(t.column("l_quantity"), pa.scalar(qlo)),
                pc.less_equal(t.column("l_quantity"), pa.scalar(qhi)),
            ),
        )

    def flt(t: pa.Table) -> pa.Table:
        m = pc.or_(
            pc.or_(clause(t, "Brand#3", 15, 1.0, 11.0), clause(t, "Brand#13", 25, 10.0, 20.0)),
            clause(t, "Brand#23", 35, 20.0, 30.0),
        )
        f = t.filter(pc.and_(m, pc.greater_equal(t.column("p_size"), pa.scalar(1))))
        return pa.table({"x": pc.multiply(f.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), f.column("l_discount")))})

    total = j.map_batches(flt, batch_format="pyarrow").sum("x")
    return pd.DataFrame({"revenue": [round(float(total), 2)]})


@q(
    "q20_promo_heavy_suppliers",
    sql="""
    SELECT s_suppkey, s_name, n_name, CAST(sum(l_quantity) AS BIGINT) AS promo_qty
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY s_suppkey, s_name, n_name
    HAVING sum(l_quantity) > 400 ORDER BY s_suppkey
    """,
)
def q20_promo_heavy_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers who moved a large volume of one product
    family in a year. The part-type filter is an exact broadcast key set
    before the scan-side groupby; quantity sums are integer-valued so the
    HAVING boundary is exact."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    promo_keys = _t(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({"p_partkey": t.filter(pc.equal(t.column("p_type"), pa.scalar("PROMO"))).column("p_partkey")}),
        batch_format="pyarrow",
    )
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity"]).map_batches(
        lambda t: t.filter(_between(t.column("l_shipdate"), lo, hi)).drop_columns(["l_shipdate"]),
        batch_format="pyarrow",
    )
    li = broadcast_semi_join(li, promo_keys, on="l_partkey", right_on="p_partkey")
    agg = li.groupby("l_suppkey").aggregate(Sum("l_quantity", alias_name="promo_qty")).to_pandas()
    agg = agg[agg["promo_qty"] > 400.0].copy()
    agg["promo_qty"] = agg["promo_qty"].astype("int64")
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(supp, left_on="l_suppkey", right_on="s_suppkey").merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    return out[["s_suppkey", "s_name", "n_name", "promo_qty"]].sort_values("s_suppkey").reset_index(drop=True)


@q(
    "q21_sole_returned_supplier",
    sql="""
    WITH f AS (SELECT l_orderkey, l_suppkey,
                      max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               WHERE o_orderstatus = 'F' GROUP BY l_orderkey, l_suppkey),
    o AS (SELECT l_orderkey, count(*) AS n_supp, sum(has_r) AS n_r FROM f GROUP BY l_orderkey)
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM f JOIN o USING (l_orderkey) JOIN supplier ON l_suppkey = s_suppkey
    WHERE has_r = 1 AND n_supp > 1 AND n_r = 1
    GROUP BY s_suppkey, s_name ORDER BY numwait DESC, s_suppkey
    """,
)
def q21_sole_returned_supplier(sf_dir: str):
    """TPC-H Q21 shape (EXISTS + NOT EXISTS over sibling lineitems): for
    finished orders, count per supplier the orders where it is the ONLY
    supplier with a returned line among several suppliers. Both correlated
    quantifiers decorrelate into per-order logic — and since every
    quantifier is scoped to ONE order, the whole query needs exactly ONE
    order-keyed exchange: lineitems and F-order keys route together
    (tagged union on hash(orderkey)), each partition resolves the status
    filter, the per-order distinct/counts and the sole-R test locally in
    polars, and only (suppkey, partial count) rows leave — the previous
    join + 2 groupbys + join plan (5 shuffles, 23.5 s at sf0.1/32cpu)
    collapses to 1 exchange + a 100-row supplier groupby."""
    import polars as pl

    from perfect_bloomfilter_ray.functions.hashing import hash64
    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
    nb = choose_num_blocks(li)

    def route_li(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).select(
            pl.col("l_orderkey").alias("ok"),
            pl.col("l_suppkey").alias("sk"),
            (pl.col("l_returnflag") == "R").cast(pl.Int64).alias("has_r"),
        )
        h = hash64(df["ok"], 0x21F1)
        return df.with_columns(pl.Series("_part", (h % np.uint64(nb)).astype(np.int32))).to_arrow()

    def route_forders(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t.column("o_orderstatus"), pa.scalar("F")))
        df = pl.DataFrame(
            {"ok": pl.from_arrow(f.column("o_orderkey"))}
        ).with_columns(pl.lit(None, pl.Int64).alias("sk"), pl.lit(None, pl.Int64).alias("has_r"))
        h = hash64(df["ok"], 0x21F1)
        return df.with_columns(pl.Series("_part", (h % np.uint64(nb)).astype(np.int32))).to_arrow()

    def solve_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        fkeys = df.filter(pl.col("sk").is_null()).select("ok")
        rows = df.filter(pl.col("sk").is_not_null()).join(fkeys, on="ok", how="semi")
        per = rows.group_by(["ok", "sk"]).agg(pl.col("has_r").max().alias("has_r"))
        per_order = per.group_by("ok").agg(pl.len().alias("n_supp"), pl.col("has_r").sum().alias("n_r"))
        good = per_order.filter((pl.col("n_supp") > 1) & (pl.col("n_r") == 1)).select("ok")
        hits = (
            per.filter(pl.col("has_r") == 1)
            .join(good, on="ok", how="semi")
            .group_by("sk")
            .len(name="pn")
            .with_columns(pl.col("pn").cast(pl.Int64))
        )
        return hits.to_arrow()

    tagged = li.map_batches(route_li, batch_format="pyarrow").union(
        _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(route_forders, batch_format="pyarrow")
    )
    agg = (
        tagged.groupby("_part")
        .map_groups(solve_block, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Sum("pn", alias_name="numwait"))
        .to_pandas()
    )
    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    out = agg.merge(supp, left_on="sk", right_on="s_suppkey")
    out["numwait"] = out["numwait"].astype("int64")
    return out[["s_suppkey", "s_name", "numwait"]].sort_values(["numwait", "s_suppkey"], ascending=[False, True]).reset_index(drop=True)


@q(
    "q22_lapsed_rich_customers",
    sql="""
    WITH pos AS (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_cents, count(*) AS n
                 FROM customer WHERE c_acctbal > 0.0),
    oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 2) AS totacctbal
    FROM customer LEFT JOIN oc ON c_custkey = o_custkey, pos
    WHERE coalesce(n_orders, 0) < 8
      AND CAST(round(c_acctbal * 100) AS BIGINT) * n > sum_cents
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q22_lapsed_rich_customers(sf_dir: str):
    """TPC-H Q22 shape: customers with above-average positive balance and
    little order activity (< 8 orders stands in for the missing "no orders
    in 7 years" predicate — this corpus has no idle customers). The
    average-balance scalar subquery is restated in integer CENTS
    (cents * n > sum_cents) so the threshold is bitwise-exact; the order
    count resolves as a broadcast left lookup of the per-customer aggregate."""
    counts = _t(sf_dir, "orders", ["o_custkey"]).groupby("o_custkey").aggregate(Count(alias_name="n_orders"))
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    j = broadcast_lookup_join(cust, counts, on="c_custkey", right_on="o_custkey", how="left")

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"), pa.scalar(100.0))), pa.int64())
        n = pc.coalesce(pc.cast(t.column("n_orders"), pa.int64()), pa.scalar(0, pa.int64()))
        return pa.table({"c_nationkey": t.column("c_nationkey"), "cents": cents, "n_orders": n})

    base = j.map_batches(to_cents, batch_format="pyarrow")
    pos = base.map_batches(
        lambda t: pa.table({"c": t.filter(pc.greater(t.column("cents"), pa.scalar(0, pa.int64()))).column("cents")}),
        batch_format="pyarrow",
    ).aggregate(Sum("c"), Count(alias_name="n"))
    sum_cents, n_pos = int(pos["sum(c)"]), int(pos["n"])

    def flt(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.less(t.column("n_orders"), pa.scalar(8, pa.int64())),
            pc.greater(pc.multiply(t.column("cents"), pa.scalar(n_pos, pa.int64())), pa.scalar(sum_cents, pa.int64())),
        )
        return t.filter(m)

    out = (
        base.map_batches(flt, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Count(alias_name="numcust"), Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = (out["cents"] / 100.0).round(2)
    return out[["c_nationkey", "numcust", "totacctbal"]]
