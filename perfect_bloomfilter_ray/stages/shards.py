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


def deterministic_shuffle(
    ds: Dataset,
    id_col: str,
    mult: int = 2654435761,
    mod: int = 1_000_000_007,
    key_col: str = "shuffle_key",
) -> Dataset:
    """Deterministic global training-order shuffle: sort by the
    multiplicative-hash residue of ``id_col``.

    Training runs need a corpus-wide pseudo-random document order that is
    (a) reproducible across engines and re-runs and (b) resumable —
    `random_shuffle(seed=...)` satisfies neither across engine versions.
    The residue ``((id % mod) * (mult % mod)) % mod`` is computed in uint64
    modular arithmetic (explicitly reduced so it cannot wrap — the id range
    is unbounded), emitted as int64 (< mod, always positive), and the sort
    is Ray's range-partitioned distributed sort — the honest all-to-all at
    100 TB, pipelined block-wise rather than materialized.

    SQL-portable: ``ORDER BY (id % 1000000007) * (2654435761 % 1000000007)
    % 1000000007, id`` (BIGINT-safe: the product is < 2^63).
    """
    u_mod = np.uint64(mod)
    u_mult = np.uint64(mult % mod)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        r = ((ids % u_mod) * u_mult) % u_mod
        return t.append_column(key_col, pa.array(r.view(np.int64)))

    return ds.map_batches(add_key, batch_format="pyarrow").sort([key_col, id_col])


def write_jsonl_shards(
    ds: Dataset,
    out_dir: str,
    part_col: str = "part",
    seq_col: str = "shard_seq",
    order_cols: list[str] | None = None,
) -> dict:
    """Write one JSONL file per ``(part, seq)`` training shard — the trainer-
    facing sink for pack_shards output. Returns (and persists) a manifest.

    Layout/resume contract (same as checkpoint.resumable_etl, at shard
    granularity): file ``part-PPPPP-seq-SSSSS.jsonl``, written to a temp
    name and published with an atomic rename; a re-run SKIPS every (part,
    seq) whose file already exists, so a failed 100-TB export loses at most
    the shards in flight. Each shard is written by the task that owns its
    group — the driver never sees record data, only the one-row-per-shard
    manifest.

    ``order_cols`` fixes the record order inside each file (pass the pack
    ordering columns to make files byte-reproducible across runs).
    """
    import json
    import os

    import polars as pl

    os.makedirs(out_dir, exist_ok=True)

    def write_group(t: pa.Table) -> pa.Table:
        part = t.column(part_col)[0].as_py()
        seq = t.column(seq_col)[0].as_py()
        name = f"part-{part:05d}-seq-{seq:05d}.jsonl"
        path = os.path.join(out_dir, name)
        rows = len(t)
        if os.path.exists(path):
            return pa.table(
                {"part": pa.array([part], pa.int64()), "seq": pa.array([seq], pa.int64()),
                 "rows": pa.array([rows], pa.int64()), "path": pa.array([path]),
                 "resumed": pa.array([True])}
            )
        df = pl.from_arrow(t.drop_columns([part_col, seq_col]))
        if order_cols:
            df = df.sort(order_cols)
        tmp = path + ".tmp"
        df.write_ndjson(tmp)
        os.replace(tmp, path)
        return pa.table(
            {"part": pa.array([part], pa.int64()), "seq": pa.array([seq], pa.int64()),
             "rows": pa.array([rows], pa.int64()), "path": pa.array([path]),
             "resumed": pa.array([False])}
        )

    shard_rows = (
        ds.groupby([part_col, seq_col])
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["part", "seq"])
        .reset_index(drop=True)
    )
    manifest = {
        "out_dir": out_dir,
        "num_shards": int(len(shard_rows)),
        "num_resumed": int(shard_rows["resumed"].sum()),
        "num_written": int((~shard_rows["resumed"]).sum()),
        "total_rows": int(shard_rows["rows"].sum()),
        "shards": shard_rows.to_dict("records"),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest
