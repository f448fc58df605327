"""CDC MERGE INTO a hash-partitioned Parquet table (upsert + delete apply).

The change-data-capture maintenance job every warehouse runs: apply a batch
of upserts and deletes to a standing table, rewriting ONLY the partitions
the batch touches. Complements ``checkpoint.delete_keys_from_partitioned``
(delete-only, probe-every-file) with the keyed-layout fast path: the table
is laid out by ``hash64(key) % n`` (``write_hash_partitioned``), so a change
routes straight to its one partition file — at 10^5 partitions a 1k-row CDC
batch touches at most 1k files and reads nothing else.

Merge semantics per key (standard MERGE): delete wins over upsert in the
same batch; an upsert replaces the existing row or inserts a new one; rows
of untouched keys are preserved byte-for-byte (untouched FILES are not even
opened). Duplicate upserts for one key keep the LAST occurrence in the
changes table. Rewrites publish atomically (tmp + ``os.replace``); the
per-partition work runs as a Ray Data pipeline over the touched partition
list. The changes batch is broadcast via ``ray.put`` — bounded by the CDC
batch contract (an unbounded backfill should use the co-partitioned join
path instead, cf. stages/dedup.incremental_new_rows).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.functions.hashing import hash64

_PART_SEED = 0x9A37


def _part_of(col, n: int) -> np.ndarray:
    return (hash64(col, _PART_SEED) % np.uint64(n)).astype(np.int64)


def _part_path(root: str, i: int) -> str:
    return os.path.join(root, f"part-{i:05d}.parquet")


def write_hash_partitioned(ds, root: str, key_col: str, num_partitions: int) -> dict:
    """Lay a Dataset out as ``part-{i}.parquet`` files keyed by
    ``hash64(key) % num_partitions`` — the layout ``merge_into_partitioned``
    requires. One co-partitioning exchange, one file per partition."""
    import pyarrow.parquet as pq

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(_part_of(t.column(key_col), num_partitions)))

    os.makedirs(root, exist_ok=True)

    def write_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"part": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())})
        i = int(t.column("_part")[0].as_py())
        tmp = _part_path(root, i) + ".tmp"
        pq.write_table(t.drop_columns(["_part"]), tmp)
        os.replace(tmp, _part_path(root, i))
        return pa.table({"part": pa.array([i], pa.int64()), "rows": pa.array([len(t)], pa.int64())})

    stats = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    # partitions with no rows still need a (schema-preserving) file so the
    # directory reads uniformly and later merges can insert into them
    schema = pq.read_schema(_part_path(root, int(stats["part"].iloc[0])))
    for i in range(num_partitions):
        if not os.path.exists(_part_path(root, i)):
            pq.write_table(schema.empty_table(), _part_path(root, i))
    return {"partitions": num_partitions, "rows": int(stats["rows"].sum())}


def merge_into_partitioned(
    root: str,
    key_col: str,
    upserts: pa.Table | None = None,
    delete_keys=None,
) -> dict:
    """Apply one CDC batch. Returns a manifest with partitions touched and
    row deltas."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    files = sorted(f for f in os.listdir(root) if f.endswith(".parquet"))
    n = len(files)
    if n == 0:
        raise ValueError(f"no part-*.parquet files under {root}")

    if upserts is not None and len(upserts):
        # last occurrence per key wins (CDC batches are ordered)
        k = upserts.column(key_col)
        idx = pa.table({"k": k, "i": pa.array(np.arange(len(upserts)))})
        import polars as pl

        last = pl.from_arrow(idx).group_by("k").agg(pl.col("i").max()).to_arrow()
        upserts = upserts.take(pa.array(np.sort(last.column("i").to_numpy())))
    dels = None
    if delete_keys is not None:
        dels = pa.array(sorted(set(delete_keys))) if not isinstance(delete_keys, pa.Array) else pc.unique(delete_keys)
    if dels is not None and len(dels) and upserts is not None and len(upserts):
        # MERGE rule: a delete beats an upsert of the same key in one batch
        keep = pc.invert(pc.fill_null(pc.is_in(upserts.column(key_col), value_set=dels), False))
        upserts = upserts.filter(keep)

    touched: set[int] = set()
    if upserts is not None and len(upserts):
        touched |= set(_part_of(upserts.column(key_col), n).tolist())
    if dels is not None and len(dels):
        touched |= set(_part_of(dels, n).tolist())
    if not touched:
        return {"partitions_touched": 0, "touched_parts": [], "rows_upserted": 0, "rows_deleted": 0}

    up_ref = ray.put(upserts)
    del_ref = ray.put(dels)

    def apply_part(batch: pa.Table) -> pa.Table:
        ups = ray.get(up_ref)
        dls = ray.get(del_ref)
        out = {"part": [], "upserted": [], "deleted": []}
        for i in batch.column("part").to_pylist():
            path = _part_path(root, int(i))
            t = pq.read_table(path)
            drop_keys = []
            my_ups = None
            if ups is not None and len(ups):
                m = _part_of(ups.column(key_col), n) == i
                my_ups = ups.filter(pa.array(m))
                drop_keys.append(my_ups.column(key_col))
            n_del = 0
            if dls is not None and len(dls):
                mdel = pa.array(_part_of(dls, n) == i)
                my_dels = dls.filter(mdel)
                if len(my_dels):
                    hit = pc.fill_null(pc.is_in(t.column(key_col), value_set=my_dels), False)
                    n_del = int(pc.sum(hit).as_py() or 0)
                    drop_keys.append(my_dels)
            if drop_keys:
                allk = pa.concat_arrays([pa.array(x.to_pylist(), type=t.schema.field(key_col).type) for x in drop_keys])
                keep = pc.invert(pc.fill_null(pc.is_in(t.column(key_col), value_set=allk), False))
                t = t.filter(keep)
            if my_ups is not None and len(my_ups):
                t = pa.concat_tables([t, my_ups.select(t.schema.names).cast(t.schema)])
            tmp = path + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, path)
            out["part"].append(int(i))
            out["upserted"].append(int(len(my_ups)) if my_ups is not None else 0)
            out["deleted"].append(n_del)
        return pa.table(
            {
                "part": pa.array(out["part"], pa.int64()),
                "upserted": pa.array(out["upserted"], pa.int64()),
                "deleted": pa.array(out["deleted"], pa.int64()),
            }
        )

    stats = (
        rd.from_items([{"part": i} for i in sorted(touched)])
        .map_batches(apply_part, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    return {
        "partitions_touched": len(stats),
        "touched_parts": sorted(int(i) for i in stats["part"]),
        "rows_upserted": int(stats["upserted"].sum()),
        "rows_deleted": int(stats["deleted"].sum()),
    }
