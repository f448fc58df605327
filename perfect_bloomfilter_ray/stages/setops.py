"""Distinct set operations between Datasets: INTERSECT / EXCEPT.

SQL ``INTERSECT`` / ``EXCEPT`` (both DISTINCT): rows of ``a`` that do /
don't appear in ``b``, deduplicated. Ray Data has ``union`` but no set
difference/intersection; this is the missing pair.

Shape: each side is projected to the compared columns, deduped batch-side
(so the exchange carries each distinct row of a batch once), tagged with a
source bit, and routed by a row hash (the hash only ROUTES — equality inside
each partition is on the real values, so hash collisions are harmless, the
same contract as dedup.exact_dedup). One vectorized polars group-by per
coarse partition keeps rows by the min/max source tag. Two scans total
(one per side), one slim shuffle, output is globally distinct.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

__all__ = ["intersect_distinct", "except_distinct", "union_by_name"]


def _tagged(ds: Dataset, cols: list[str], src: int, nb: int) -> Dataset:
    def tag(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(cols)).unique()
        part = (df.hash_rows(seed=0x5E70) % nb).cast(pl.Int32)
        out = df.with_columns(
            pl.lit(src, pl.Int8).alias("_src"), part.alias("_part")
        )
        return out.to_arrow()

    return ds.map_batches(tag, batch_format="pyarrow")


def _setop(a: Dataset, b: Dataset, cols: list[str], keep: str) -> Dataset:
    nb = choose_num_blocks(a, None)

    def per_part(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        g = df.group_by(cols).agg(
            pl.col("_src").min().alias("_mn"), pl.col("_src").max().alias("_mx")
        )
        if keep == "both":
            g = g.filter((pl.col("_mn") == 0) & (pl.col("_mx") == 1))
        else:  # "a_only"
            g = g.filter(pl.col("_mx") == 0)
        return g.drop(["_mn", "_mx"]).to_arrow()

    return (
        _tagged(a, cols, 0, nb)
        .union(_tagged(b, cols, 1, nb))
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )


def intersect_distinct(a: Dataset, b: Dataset, cols: list[str]) -> Dataset:
    """SQL ``a INTERSECT b`` over ``cols`` (distinct rows present in both)."""
    return _setop(a, b, cols, "both")


def except_distinct(a: Dataset, b: Dataset, cols: list[str]) -> Dataset:
    """SQL ``a EXCEPT b`` over ``cols`` (distinct rows of a absent from b)."""
    return _setop(a, b, cols, "a_only")


def union_by_name(a: Dataset, b: Dataset) -> Dataset:
    """UNION ALL BY NAME — schema-evolution-tolerant concatenation.

    Ray's ``Dataset.union`` requires identical schemas; real ingest unions
    snapshots whose schemas drifted (a column added, one retired). This pads
    each side with typed nulls for the other side's missing columns and
    aligns column order, all inside ``map_batches`` (no shuffle, no
    materialization) — DuckDB's ``UNION ALL BY NAME`` semantics. A column
    present in both sides with conflicting Arrow types raises (silent casts
    corrupt at scale; evolve explicitly upstream).
    """
    sa, sb = a.schema(), b.schema()
    fa = {n: t for n, t in zip(sa.names, sa.types)}
    fb = {n: t for n, t in zip(sb.names, sb.types)}
    for n in set(fa) & set(fb):
        if fa[n] != fb[n]:
            raise ValueError(f"union_by_name type conflict on {n!r}: {fa[n]} vs {fb[n]}")
    names = list(sa.names) + [n for n in sb.names if n not in fa]
    types = {**fb, **fa}

    def pad(t: pa.Table) -> pa.Table:
        cols = {}
        for n in names:
            if n in t.column_names:
                cols[n] = t.column(n)
            else:
                cols[n] = pa.nulls(len(t), types[n])
        return pa.table(cols)

    return a.map_batches(pad, batch_format="pyarrow").union(
        b.map_batches(pad, batch_format="pyarrow")
    )
