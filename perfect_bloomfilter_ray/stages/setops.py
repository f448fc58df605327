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

__all__ = ["intersect_distinct", "except_distinct"]


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
