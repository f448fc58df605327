"""Arrow IPC (Feather v2) source/sink: record-batch-parallel reads,
per-block writes.

Ray Data 2.49 has no IPC file reader; this source builds the scan from
metadata exactly like sources/orc.py: the driver lists files and their
record-batch counts (footer-only reads), then every (file, batch) pair
becomes one read item — a directory of IPC shards fans out across the
cluster with no task reading more than ``batches_per_task`` batches.
Files are MEMORY-MAPPED in the read task, so ``columns=`` pruning is
physical: untouched column buffers never page in (IPC's zero-copy layout
is the point of the format — same bytes on disk and in memory).

The sink mirrors write_orc_shards: one IPC file per block written inside
the task, content-hash shard names, atomic tmp+rename publish.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def _list_ipc_files(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "*.arrow"))))
        else:
            files.append(p)
    return files


def read_ipc(
    paths: str | list[str],
    columns: list[str] | None = None,
    batches_per_task: int = 1,
):
    """IPC files/directories → Dataset, one read task per
    ``batches_per_task`` record batches. Driver touches only footers; batch
    bytes are memory-mapped inside tasks and ``columns`` selects buffers
    zero-copy before any page is materialized."""
    import ray.data as rd

    files = _list_ipc_files(paths)
    items = []
    for f in files:
        with pa.memory_map(f, "r") as mm:
            n = pa.ipc.open_file(mm).num_record_batches
        for i in range(n):
            items.append({"path": f, "batch": i})
    if not items:
        raise FileNotFoundError(f"no IPC record batches under {paths!r}")
    meta = rd.from_items(
        items, override_num_blocks=max(1, len(items) // max(1, batches_per_task))
    )

    def read_task(t: pa.Table) -> pa.Table:
        tables = []
        for path, bi in zip(
            t.column("path").to_pylist(), t.column("batch").to_pylist()
        ):
            with pa.memory_map(path, "r") as mm:
                rb = pa.ipc.open_file(mm).get_batch(bi)
                tbl = pa.Table.from_batches([rb])
                if columns is not None:
                    tbl = tbl.select(columns)
                # combine_chunks materializes the selected buffers before the
                # memory map closes
                tables.append(tbl.combine_chunks())
        return pa.concat_tables(tables, promote_options="default")

    return meta.map_batches(read_task, batch_format="pyarrow")


def write_ipc_shards(ds, out_dir: str, prefix: str = "part") -> list[str]:
    """Dataset → one IPC (Feather v2) file per block, written inside the
    tasks; the driver only sees the path manifest. Content-hash shard names
    + atomic tmp+rename, so a rerun over the same block layout overwrites
    deterministically. Returns the written paths."""
    import zlib

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        first = ",".join(str(t.column(c)[0].as_py()) for c in t.column_names[:3])
        tag = zlib.crc32(f"{first}:{len(t)}".encode()) & 0xFFFFFFFF
        path = os.path.join(out_dir, f"{prefix}-{tag:08x}.arrow")
        tmp = f"{path}.tmp{os.getpid()}"
        with pa.OSFile(tmp, "wb") as sink:
            with pa.ipc.new_file(sink, t.schema) as writer:
                writer.write_table(t)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "n": pa.array([len(t)], pa.int64())}
        )

    manifest = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return sorted(manifest["path"].tolist())
