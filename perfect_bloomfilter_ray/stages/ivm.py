"""Incrementally-maintained grouped aggregate view over a partitioned table.

The materialized-view refresh problem: a standing hash-partitioned table
(``mergetable.write_hash_partitioned``) receives CDC batches
(``mergetable.merge_into_partitioned``), and a grouped aggregate over it
must stay current WITHOUT rescanning the table. Because count/sum partials
are associative and commutative (the same algebra as every sketch in this
library), the view keeps ONE partial-aggregate file per table partition:
a refresh recomputes partials only for the partitions the CDC batch
touched and re-folds the (groups x partitions)-sized partial set — refresh
cost is proportional to the CHANGE, not the table.

At 10^5 partitions x 10^12 rows, a 1k-row CDC batch touches <= 1k
partitions: the refresh reads ~1k partition files + 10^5 tiny partial
files, never the other ~10^5 data files. Partials publish atomically
(tmp + os.replace) next to the table, so a crashed refresh resumes by
rerunning it (idempotent: partials are pure functions of their partition
file).

Invariant (pytest-enforced): the folded view is bitwise-equal in the
integer measures to a full recompute after any sequence of CDC batches.
Float measures would be equal up to addition order — the view stores
integer-exact counts and integer micro-unit sums for exactly this reason.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_AGG_PREFIX = "agg-"


def _agg_path(view_dir: str, i: int) -> str:
    return os.path.join(view_dir, f"{_AGG_PREFIX}{i:05d}.parquet")


def _partial_of(path: str, group_col: str, measure_col: str, scale: int) -> pa.Table:
    import polars as pl

    t = pq.read_table(path, columns=[group_col, measure_col])
    df = pl.from_arrow(t)
    g = (
        df.with_columns((pl.col(measure_col) * scale).round(0).cast(pl.Int64).alias("_m"))
        .group_by(group_col)
        .agg(pl.len().cast(pl.Int64).alias("cnt"), pl.col("_m").sum().alias("msum"))
    )
    return g.to_arrow()


def build_view(
    table_root: str,
    view_dir: str,
    group_col: str,
    measure_col: str,
    scale: int = 100,
) -> pd.DataFrame:
    """Initial materialization: one partial file per table partition, then
    fold. ``scale`` converts the float measure to exact integer units
    (default cents)."""
    import ray.data as rd

    os.makedirs(view_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(table_root) if f.endswith(".parquet"))

    def one(batch: pa.Table) -> pa.Table:
        done = []
        for i in batch.column("part").to_pylist():
            p = os.path.join(table_root, files[int(i)])
            partial = _partial_of(p, group_col, measure_col, scale)
            tmp = _agg_path(view_dir, int(i)) + ".tmp"
            pq.write_table(partial, tmp)
            os.replace(tmp, _agg_path(view_dir, int(i)))
            done.append(int(i))
        return pa.table({"part": pa.array(done, pa.int64())})

    rd.from_items([{"part": i} for i in range(len(files))]).map_batches(
        one, batch_size=1, batch_format="pyarrow"
    ).materialize()
    return fold_view(view_dir, group_col)


def refresh_view(
    table_root: str,
    view_dir: str,
    group_col: str,
    measure_col: str,
    touched_parts: list[int],
    scale: int = 100,
) -> pd.DataFrame:
    """Incremental refresh after a CDC merge: recompute partials ONLY for
    ``touched_parts`` (the merge manifest's ``touched_parts``), then fold."""
    import ray.data as rd

    files = sorted(f for f in os.listdir(table_root) if f.endswith(".parquet"))
    if touched_parts:

        def one(batch: pa.Table) -> pa.Table:
            done = []
            for i in batch.column("part").to_pylist():
                p = os.path.join(table_root, files[int(i)])
                partial = _partial_of(p, group_col, measure_col, scale)
                tmp = _agg_path(view_dir, int(i)) + ".tmp"
                pq.write_table(partial, tmp)
                os.replace(tmp, _agg_path(view_dir, int(i)))
                done.append(int(i))
            return pa.table({"part": pa.array(done, pa.int64())})

        rd.from_items([{"part": int(i)} for i in sorted(set(touched_parts))]).map_batches(
            one, batch_size=1, batch_format="pyarrow"
        ).materialize()
    return fold_view(view_dir, group_col)


def fold_view(view_dir: str, group_col: str) -> pd.DataFrame:
    """Fold all partial files to the final (group, n, msum) view — a Ray Data
    read + groupby over group-cardinality rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    paths = sorted(
        os.path.join(view_dir, f) for f in os.listdir(view_dir) if f.startswith(_AGG_PREFIX) and f.endswith(".parquet")
    )
    out = (
        rd.read_parquet(paths)
        .groupby(group_col)
        .aggregate(Sum("cnt", alias_name="n"), Sum("msum", alias_name="msum"))
        .to_pandas()
        .sort_values(group_col)
        .reset_index(drop=True)
    )
    out = out[out["n"] > 0].reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    out["msum"] = out["msum"].astype("int64")
    return out
