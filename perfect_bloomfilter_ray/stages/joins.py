"""Broadcast-lookup joins — the small-side join pattern for 100 TB pipelines.

``Dataset.join`` (Ray-native hash join) shuffles BOTH sides; for a dimension
table of a few thousand rows joined against a 10^12-row fact table that is
the wrong shape. Here the small side is materialized once, shipped to the
object store once (``ray.put``), and every map task resolves it zero-copy and
probes it vectorized (``pyarrow.compute.index_in`` + ``take``) — no shuffle
of the big side at all, preserving streaming execution.

Semi/anti membership variants with sub-bloom-size key sets should also use
this; for key sets too large to broadcast exactly, use
``stages.membership.bloom_semi_join`` (compact sketch broadcast) instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _small_side_table(small: Dataset | pa.Table, columns: list[str] | None = None) -> pa.Table:
    if isinstance(small, pa.Table):
        t = small
    else:
        t = pa.concat_tables(
            [pa.Table.from_pydict(b) if isinstance(b, dict) else b for b in small.iter_batches(batch_format="pyarrow")]
        )
    return t.select(columns) if columns else t


def broadcast_lookup_join(
    big: Dataset,
    small: Dataset | pa.Table,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    small_columns: list[str] | None = None,
) -> Dataset:
    """Join ``big`` (streaming) against a broadcast ``small`` side.

    ``how``: "inner" (drop unmatched) or "left" (keep, null-fill). The small
    side's key column must be unique (dimension-table semantics; duplicated
    keys raise). Output columns: big's columns + small's non-key columns.
    """
    import ray

    right_on = right_on or on
    t_small = _small_side_table(small, small_columns)
    if pc.count_distinct(t_small.column(right_on)).as_py() != len(t_small):
        raise ValueError(f"broadcast join small side has duplicate keys in {right_on!r}")
    payload_cols = [c for c in t_small.column_names if c != right_on]
    small_ref = ray.put(t_small)

    def probe(t: pa.Table) -> pa.Table:
        s: pa.Table = ray.get(small_ref)  # zero-copy plasma resolve, once per task
        idx = pc.index_in(t.column(on), value_set=s.column(right_on))
        if how == "inner":
            keep = pc.is_valid(idx)
            t = t.filter(keep)
            idx = idx.filter(keep)
        for c in payload_cols:
            t = t.append_column(c, pc.take(s.column(c), idx))
        return t

    return big.map_batches(probe, batch_format="pyarrow")


def broadcast_semi_join(
    big: Dataset,
    small: Dataset | pa.Table,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
) -> Dataset:
    """Exact semi/anti join against a broadcast key set (no shuffle).

    For key sets small enough to ship exactly. The approximate counterpart
    (arbitrarily large build side, compact broadcast) is
    ``membership.bloom_semi_join``.
    """
    import ray

    right_on = right_on or on
    t_small = _small_side_table(small, [right_on])
    keys = t_small.column(right_on)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys_ref = ray.put(pc.unique(keys))

    def probe(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pc.is_in(t.column(on), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return t.filter(mask)

    return big.map_batches(probe, batch_format="pyarrow")
