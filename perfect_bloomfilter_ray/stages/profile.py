"""Table profiling — per-column stats in two streaming passes.

The data-engineering staple before any pipeline touches a new table: for
each profiled column, row/null counts, numeric min/max, and the EXACT
distinct count. Shapes:

- **counts/min/max**: one `map_batches` pass emits a (column, n, n_null,
  min, max) row per column per block — a few rows per block regardless of
  data size — reduced by a tiny groupby. The table is scanned once, no
  shuffle of data rows.
- **exact distinct**: values dedup inside each batch first, then only the
  surviving (column, value) pairs shuffle, routed by a hash but UNIQUED on
  the real value inside each coarse partition (collision-safe, same
  contract as dedup.exact_dedup). Numeric and string values travel in two
  typed columns of one slim stream, so all profiled columns share a single
  shuffle. SQL ``count(DISTINCT col)`` semantics: nulls excluded.

Sketch twin: state/hll.py gives the approximate distinct at a fraction of
the shuffle; this module is the exact oracle-checkable variant (same
relationship as quantiles.py ↔ state/kll.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

from perfect_bloomfilter_ray.functions.hashing import hash64
from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks


def profile_table(
    ds: Dataset,
    num_cols: list[str],
    str_cols: list[str] | None = None,
    num_blocks: int | None = None,
) -> pd.DataFrame:
    """Per-column profile: ``(col_name, n, n_null, n_distinct, min_num,
    max_num)``; ``min_num``/``max_num`` are float64 (NaN→null for string
    columns). Returns a small pandas frame (one row per profiled column)."""
    str_cols = list(str_cols or [])
    all_cols = [*num_cols, *str_cols]
    nb = choose_num_blocks(ds, num_blocks)

    def stat_partials(t: pa.Table) -> pa.Table:
        names, ns, nulls, mns, mxs = [], [], [], [], []
        for c in all_cols:
            col = t.column(c)
            names.append(c)
            nulls.append(col.null_count)
            ns.append(len(col) - col.null_count)
            if c in num_cols and len(col) > col.null_count:
                mns.append(float(pc.min(col).as_py()))
                mxs.append(float(pc.max(col).as_py()))
            else:
                mns.append(None)
                mxs.append(None)
        return pa.table(
            {
                "col_name": pa.array(names),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_num": pa.array(mns, pa.float64()),
                "max_num": pa.array(mxs, pa.float64()),
            }
        )

    stats = (
        ds.map_batches(stat_partials, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_num", alias_name="min_num"),
            Max("max_num", alias_name="max_num"),
        )
        .to_pandas()
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        parts = []
        for c in all_cols:
            u = pc.unique(pc.drop_null(t.column(c)))
            if len(u) == 0:
                continue
            if c in num_cols:
                vnum = pc.cast(u, pa.float64())
                vstr = pa.nulls(len(u), pa.string())
                key = hash64(vnum, 0xC0DE)
            else:
                vnum = pa.nulls(len(u), pa.float64())
                vstr = u if pa.types.is_string(u.type) else pc.cast(u, pa.string())
                key = hash64(vstr, 0xC0DE)
            part = (key % np.uint64(nb)).astype(np.int32)
            parts.append(
                pa.table(
                    {
                        "col_name": pa.array([c] * len(u)),
                        "vnum": vnum,
                        "vstr": vstr,
                        "_part": pa.array(part),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "col_name": pa.array([], pa.string()),
                    "vnum": pa.array([], pa.float64()),
                    "vstr": pa.array([], pa.string()),
                    "_part": pa.array([], pa.int32()),
                }
            )
        return pa.concat_tables(parts)

    def count_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"])).unique()
        out = df.group_by("col_name").len(name="part_distinct")
        return out.with_columns(pl.col("part_distinct").cast(pl.Int64)).to_arrow()

    distinct = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(count_block, batch_format="pyarrow")
        .groupby("col_name")
        .aggregate(Sum("part_distinct", alias_name="n_distinct"))
        .to_pandas()
    )
    out = stats.merge(distinct, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out["n"] = out["n"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    return (
        out[["col_name", "n", "n_null", "n_distinct", "min_num", "max_num"]]
        .sort_values("col_name")
        .reset_index(drop=True)
    )
