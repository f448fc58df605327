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
