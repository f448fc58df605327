"""Hash-bucketed Parquet layout + shuffle-free bucket-local joins.

The storage-side answer to "pick ONE partitioning key and reuse it across
stages" (the Hive/Spark bucketed-table pattern, and the reference's
jump-hash shard routing applied to files instead of workers,
config.rs:38-45 / filter.rs shard geometry): a table written with
``write_bucketed(key, num_buckets)`` lands as one Parquet file per hash
bucket plus a tiny ``_buckets.json`` manifest.  Two tables bucketed the
SAME way are co-partitioned BY CONSTRUCTION, so ``bucketed_join`` runs one
task per bucket that reads exactly two files and joins them locally — at
query time there is NO shuffle, no hash exchange, no driver-side
materialization; the all-to-all cost was paid once at write time and is
amortized over every subsequent join on that key.

Scale shape: bucket count is chosen at write time (rule of thumb:
total_bytes / target_bucket_bytes, independent of the reader's
parallelism); each join task's memory is one bucket pair.  Writes are
atomic (tmp + rename) and resumable per bucket — a rerun skips buckets
whose file already exists, the same contract as the JSONL shard sink
(stages/shards.py).  Skewed keys concentrate in one bucket, exactly like
any hash layout; the skew_join stage remains the escape hatch.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from perfect_bloomfilter_ray.functions.hashing import hash64

_SEED = 0xB0C4


def write_bucketed(
    ds: Dataset, key: str, path: str, num_buckets: int, overwrite: bool = False
) -> int:
    """Write ``ds`` as ``path/bucket=NNNNN.parquet`` hash-bucketed by ``key``.

    Returns the bucket count.  Rows with a null key are dropped (a join
    would drop them anyway).  Resumable: existing bucket files are kept
    unless ``overwrite``.
    """
    os.makedirs(path, exist_ok=True)
    meta_path = os.path.join(path, "_buckets.json")
    if os.path.exists(meta_path) and not overwrite:
        old = json.load(open(meta_path))
        if old["num_buckets"] != num_buckets or old["key"] != key:
            raise ValueError(
                f"existing layout at {path} is ({old['key']}, {old['num_buckets']}); "
                f"requested ({key}, {num_buckets}) — use overwrite=True"
            )
    if overwrite:
        # clear EVERY old bucket file first: a rewrite that no longer
        # populates some bucket would otherwise leave the stale file in
        # place and bucketed_join would silently include its rows
        for f in os.listdir(path):
            if f.startswith("bucket=") and f.endswith(".parquet"):
                os.remove(os.path.join(path, f))

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(t.column(key).is_valid())
        b = (hash64(t.column(key), _SEED) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    def write_one(t: pa.Table) -> pa.Table:
        b = int(t.column("_bucket")[0].as_py())
        out = os.path.join(path, f"bucket={b:05d}.parquet")
        if overwrite or not os.path.exists(out):
            tmp = out + ".tmp"
            pq.write_table(t.drop_columns(["_bucket"]), tmp)
            os.replace(tmp, out)  # atomic publish
        return pa.table({"bucket": pa.array([b], pa.int32())})

    written = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(write_one, batch_format="pyarrow")
        .count()
    )
    with open(meta_path + ".tmp", "w") as f:
        json.dump({"key": key, "num_buckets": num_buckets, "written": written}, f)
    os.replace(meta_path + ".tmp", meta_path)
    return num_buckets


def bucketed_join(
    path_a: str,
    path_b: str,
    key: str,
    how: str = "inner",
    suffix: str = "_r",
) -> Dataset:
    """Join two SAME-KEY, SAME-COUNT bucketed layouts with zero shuffle.

    One task per bucket id: read the two bucket files, join locally
    (polars hash join on the bucket pair), emit.  Raises if the layouts
    are not co-bucketed — the whole point is that the exchange already
    happened at write time.
    """
    ma = json.load(open(os.path.join(path_a, "_buckets.json")))
    mb = json.load(open(os.path.join(path_b, "_buckets.json")))
    if ma["num_buckets"] != mb["num_buckets"]:
        raise ValueError(
            f"bucket counts differ: {ma['num_buckets']} vs {mb['num_buckets']}"
        )
    if ma["key"] != key or mb["key"] != key:
        # the join probes one column name in BOTH bucket files; rename the
        # key to a common name at write time (the round's query does)
        raise ValueError(
            f"both layouts must be bucketed by {key!r}; "
            f"found {ma['key']!r} and {mb['key']!r}"
        )
    nb = ma["num_buckets"]
    import polars as pl

    def _first_file(path: str) -> str:
        for b in range(nb):
            f = os.path.join(path, f"bucket={b:05d}.parquet")
            if os.path.exists(f):
                return f
        raise FileNotFoundError(f"no bucket files under {path}")

    # the empty-bucket output schema, derived once on the driver from one
    # zero-row join (so tasks with missing files emit schema-stable blocks)
    sa = pq.read_schema(_first_file(path_a))
    sb = pq.read_schema(_first_file(path_b))
    empty = (
        pl.from_arrow(sa.empty_table())
        .join(
            pl.from_arrow(sb.empty_table()),
            on=key,
            how="inner" if how == "inner" else "left",
            suffix=suffix,
        )
        .to_arrow()
    )

    def join_bucket(batch: dict) -> pa.Table:
        out = []
        for b in batch["bucket"]:
            fa = os.path.join(path_a, f"bucket={int(b):05d}.parquet")
            fb = os.path.join(path_b, f"bucket={int(b):05d}.parquet")
            a_exists, b_exists = os.path.exists(fa), os.path.exists(fb)
            if not a_exists or (not b_exists and how == "inner"):
                continue
            ta = pl.from_arrow(pq.read_table(fa))
            if not b_exists:
                out.append(
                    pl.concat([pl.from_arrow(empty), ta], how="diagonal").to_arrow()
                )
                continue
            tb = pl.from_arrow(pq.read_table(fb))
            j = ta.join(tb, on=key, how="inner" if how == "inner" else "left", suffix=suffix)
            out.append(j.select(empty.column_names).to_arrow())
        if not out:
            return empty
        return pa.concat_tables(out, promote_options="default")

    return ray.data.from_items([{"bucket": b} for b in range(nb)]).map_batches(
        join_bucket, batch_format="numpy", batch_size=1
    )
