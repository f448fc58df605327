"""Checkpointed, resumable sketch builds with per-partition lineage + metrics.

Replaces the reference's WAL (filter.rs:347-371 drain / 490-524 rebuild) with
the batch-native equivalent (SURVEY §2.1 op #12, §4.2): the input partition IS
the durable key log, so a checkpoint is just the partial sketch of one input
partition, written atomically (tmp + rename) and named by
``(dataset_fingerprint, stage, partition_id)``. A manifest JSON accumulates
lineage (input file, rows, bytes) and metrics (wall seconds) per partition.
On resume, finished partitions load from disk and only the rest recompute —
re-merging is safe because every sketch merge is associative/commutative.

This stage uses raw ``@ray.remote`` tasks deliberately: per-partition durable
side outputs + skip-if-done scheduling is the one semantics Dataset.aggregate
cannot express (its partials are transient). Partition granularity = one
input Parquet file (at 100 TB: one file ≈ one block-sized shard; pass a
fragment list instead to subdivide).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

import pyarrow as pa
import ray

from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


def _fingerprint(files: list[str]) -> str:
    import hashlib

    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


@ray.remote
def _build_partition(
    file: str, col: str, factory_bytes: bytes, part_path: str, columns: list[str] | None
) -> dict:
    import pyarrow.parquet as pq
    from ray import cloudpickle

    t0 = time.time()
    factory = cloudpickle.loads(factory_bytes)
    sketch = factory()
    pf = pq.ParquetFile(file)
    rows = 0
    for batch in pf.iter_batches(batch_size=64 * 1024, columns=columns or [col]):
        c = batch.column(col)
        if c.null_count:
            c = c.drop_null()
        sketch.update_column(c)
        rows += len(batch)
    tmp = part_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(dumps_sketch(sketch))
    os.replace(tmp, part_path)  # atomic publish
    return {
        "file": file,
        "rows": rows,
        "bytes": os.path.getsize(file),
        "seconds": round(time.time() - t0, 3),
        "resumed": False,
    }


def checkpointed_build(
    input_files: list[str],
    col: str,
    factory: Callable[[], Any],
    ckpt_dir: str,
    stage: str = "sketch",
) -> tuple[Any, dict]:
    """Build factory() over ``col`` of all files, resumable per partition.

    Returns (merged_sketch, manifest). Re-running after a partial failure
    skips every partition whose checkpoint file already exists and produces a
    byte-identical final sketch (tested in tests/test_checkpoint.py).
    """
    from ray import cloudpickle

    os.makedirs(ckpt_dir, exist_ok=True)
    fp = _fingerprint(input_files)
    factory_bytes = cloudpickle.dumps(factory)  # lambdas/closures must survive


    part_paths = [os.path.join(ckpt_dir, f"{fp}_{stage}_part-{i:05d}.sketch") for i in range(len(input_files))]
    pending, done = [], []
    for i, (f, p) in enumerate(zip(input_files, part_paths)):
        (done if os.path.exists(p) else pending).append(i)

    futures = {
        i: _build_partition.remote(input_files[i], col, factory_bytes, part_paths[i], None)
        for i in pending
    }
    entries: dict[int, dict] = {}
    for i in done:
        entries[i] = {
            "file": input_files[i],
            "rows": None,
            "bytes": os.path.getsize(input_files[i]),
            "seconds": 0.0,
            "resumed": True,
        }
    for i, fut in futures.items():
        entries[i] = ray.get(fut)

    merged = None
    for p in part_paths:
        with open(p, "rb") as fh:
            s = loads_sketch(fh.read())
        merged = s if merged is None else merged.merge(s)

    manifest = {
        "fingerprint": fp,
        "stage": stage,
        "column": col,
        "partitions": [
            {"partition_id": i, "checkpoint": part_paths[i], **entries[i]} for i in range(len(input_files))
        ],
        "num_resumed": len(done),
        "num_built": len(pending),
    }
    with open(os.path.join(ckpt_dir, f"{fp}_{stage}_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return merged, manifest


def resumable_etl(
    input_files: list[str],
    out_dir: str,
    transform: Callable[[Any], Any],
    shard_files: int = 8,
    columns: list[str] | None = None,
) -> dict:
    """Resumable Dataset→Parquet ETL: per-input-shard output directories.

    Groups ``input_files`` into shards of ``shard_files`` files; each shard
    runs ``transform(read_parquet(shard))`` as its own streaming Ray Data
    pipeline writing ``out_dir/shard-NNNNN/``, published atomically via a
    ``_SUCCESS`` marker carrying lineage (input files, rows) + metrics (wall
    seconds). A re-run skips every shard whose marker exists — a failed 100 TB
    job loses at most one shard of work, and the output layout (one directory
    per input shard) is exactly the prompt's resumable-output contract.

    Shards run sequentially on the driver; each is internally parallel
    (size ``shard_files`` to keep every core busy per shard). Returns the
    manifest (also written to ``out_dir/manifest.json``).
    """
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    shards = [input_files[i : i + shard_files] for i in range(0, len(input_files), shard_files)]
    entries = []
    n_resumed = n_built = 0
    for si, files in enumerate(shards):
        shard_dir = os.path.join(out_dir, f"shard-{si:05d}")
        marker = os.path.join(shard_dir, "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as fh:
                entries.append(json.load(fh) | {"resumed": True})
            n_resumed += 1
            continue
        t0 = time.time()
        ds = rd.read_parquet(files, columns=columns)
        out = transform(ds)
        # clear any partial output from a crashed attempt, then write + publish
        import shutil

        shutil.rmtree(shard_dir, ignore_errors=True)
        out.write_parquet(shard_dir)
        entry = {
            "shard_id": si,
            "inputs": files,
            "output": shard_dir,
            "seconds": round(time.time() - t0, 3),
        }
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, marker)
        entries.append(entry | {"resumed": False})
        n_built += 1
    manifest = {
        "fingerprint": _fingerprint(input_files),
        "num_shards": len(shards),
        "num_resumed": n_resumed,
        "num_built": n_built,
        "shards": entries,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def _list_parquet_files(root: str) -> list[str]:
    files = []
    for r, _d, names in os.walk(root):
        files.extend(os.path.join(r, n) for n in sorted(names) if n.endswith(".parquet"))
    return files


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_rows_per_file: int = 1 << 20,
    columns: list[str] | None = None,
) -> dict:
    """Small-file compaction: read every ``*.parquet`` under ``in_dir``
    (recursively — partitioned layouts included) and rewrite as
    ``ceil(rows / target_rows_per_file)`` right-sized files.

    The small-files problem is the standard failure mode of per-shard
    resumable writes at scale (10^5 tasks × small outputs → metadata-bound
    reads); compaction is the fix, run as its own resumable job. The
    repartition is the non-shuffling split/coalesce (no all-to-all — row
    order within blocks is preserved, global order is not guaranteed, same
    as any parquet directory). Published atomically via a ``_SUCCESS``
    manifest; re-runs with an existing marker are skipped.
    """
    import ray.data as rd

    # in-place compaction would rmtree the INPUT before the lazy read runs —
    # unrecoverable data loss; require a non-overlapping output directory
    a, b = os.path.abspath(in_dir), os.path.abspath(out_dir)
    if a == b or os.path.commonpath([a, b]) in (a, b):
        raise ValueError("compact_parquet requires a non-overlapping out_dir (write to a sibling, then swap)")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as fh:
            return json.load(fh) | {"resumed": True}
    files = _list_parquet_files(in_dir)
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    ds = rd.read_parquet(files, columns=columns)
    total = ds.count()
    n_out = max(1, -(-total // target_rows_per_file))
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    ds.repartition(n_out).write_parquet(out_dir)
    manifest = {
        "in_files": len(files),
        "out_files": len(_list_parquet_files(out_dir)),  # actual, not requested
        "rows": int(total),
        "seconds": round(time.time() - t0, 3),
    }
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, marker)  # atomic publish, same as resumable_etl
    return manifest


def delete_keys_from_partitioned(
    root: str,
    key_col: str,
    keys,
    batch_size: int = 1,
) -> dict:
    """Surgical key deletion across a partitioned Parquet output tree (the
    right-to-be-forgotten / retract-bad-ingest maintenance job): every
    ``*.parquet`` file under ``root`` is probed by reading ONLY its key
    column against the broadcast delete set; files with no hit are left
    byte-identical (no rewrite, no mtime churn — at 10^5 files the probe is
    a column-pruned metadata-speed scan and the rewrite cost is proportional
    to CONTAMINATED files only). Hit files are rewritten atomically
    (tmp + ``os.replace``); a file deleted down to zero rows keeps its
    schema (empty table) so directory readers stay valid.

    The per-file work runs as a Ray Data pipeline over the file list
    (one file per task), so deletion parallelizes like any other stage.
    Returns a manifest: files probed / rewritten, rows deleted.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    import pyarrow.compute as _pc

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    keys_arr = _pc.unique(keys) if isinstance(keys, pa.Array) else pa.array(sorted(set(keys)))
    key_ref = ray.put(keys_arr)
    files = _list_parquet_files(root)
    if not files:
        return {"files": 0, "rewritten": 0, "rows_deleted": 0}

    def process(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks = ray.get(key_ref)
        out = {"path": [], "rewritten": [], "deleted": []}
        for path in batch.column("path").to_pylist():
            kcol = pq.read_table(path, columns=[key_col]).column(key_col)
            hit = pc.is_in(kcol, value_set=ks)
            n_hit = pc.sum(pc.fill_null(hit, False)).as_py() or 0
            if n_hit:
                t = pq.read_table(path)
                keep = pc.invert(pc.fill_null(pc.is_in(t.column(key_col), value_set=ks), False))
                tmp = path + ".tmp"
                pq.write_table(t.filter(keep), tmp)
                os.replace(tmp, path)
            out["path"].append(path)
            out["rewritten"].append(bool(n_hit))
            out["deleted"].append(int(n_hit))
        return pa.table(
            {
                "path": pa.array(out["path"]),
                "rewritten": pa.array(out["rewritten"]),
                "deleted": pa.array(out["deleted"], pa.int64()),
            }
        )

    stats = (
        rd.from_items([{"path": p} for p in files])
        .map_batches(process, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()
    )
    return {
        "files": len(stats),
        "rewritten": int(stats["rewritten"].sum()),
        "rows_deleted": int(stats["deleted"].sum()),
    }
