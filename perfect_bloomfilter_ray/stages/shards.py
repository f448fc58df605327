"""Training-shard packing: assign documents to fixed-budget output shards.

The last step of a training-data pipeline: documents are packed greedily
into shards of ~``budget`` cost units (tokens / chars / bytes) so each
downstream trainer file is near-uniform. Global greedy packing is inherently
sequential, so the scalable formulation is hierarchical:

- hash-partition documents into ``P`` coarse partitions (``part_col``) —
  each partition is one task, sized by stages/partitioning.choose_num_blocks;
- within a partition, order deterministically (``order_col``, ties by
  ``id_col``) and take an exclusive running sum of cost: the shard sequence
  number is ``cum // budget``. One vectorized cumsum per partition — no
  per-document loop, no global sort, no driver state.

A shard is identified by ``(part, seq)``; writers map that pair to one
output file, which is also the resume unit (skip finished (part, seq) pairs
on restart). Documents never move across partitions, so re-running any
partition reproduces its exact shard assignment — lineage is the pair
itself.

The deterministic order key makes the assignment engine-portable: the SQL
oracle (`packed_shard_stats`) reproduces it with a window running-sum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def pack_shards(
    ds: Dataset,
    cost_col: str,
    budget: int,
    part_col: str,
    order_col: str,
    id_col: str,
    seq_col: str = "shard_seq",
) -> Dataset:
    """Append the within-partition shard sequence number (``cum // budget``).

    ``part_col`` / ``order_col`` are caller-computed (typically 64-bit
    hashes of the document id) so the caller controls portability of the
    assignment; cost must be a non-negative integer column.
    """

    def per_part(t: pa.Table) -> pa.Table:
        okey = t.column(order_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cost = t.column(cost_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, okey))
        cum = np.zeros(len(cost), np.int64)
        np.cumsum(cost[order][:-1], out=cum[1:] if len(cost) else cum[:0])
        seq = cum // np.int64(budget)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return t.append_column(seq_col, pa.array(seq[inv]))

    return ds.groupby(part_col).map_groups(per_part, batch_format="pyarrow")
