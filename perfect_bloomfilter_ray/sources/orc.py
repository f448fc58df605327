"""ORC source/sink: stripe-parallel reads, per-block writes.

Ray Data 2.49 has no native ORC reader; this source builds the scan from
metadata the same way the parquet reader does: the driver lists files and
their stripe counts (O(#files) footer reads — no row bytes), then every
(file, stripe) pair becomes one read item. Stripes are ORC's natural split
unit, so a large directory fans out across the cluster with no task
reading more than one stripe, and ``columns=`` prunes inside
``ORCFile.read_stripe`` — only requested columns leave storage.

Reference parity note: the reference engine consumes key streams from flat
files (README.md:9-16); this source gives the same pipelines a columnar
container with real split geometry.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa


def _list_orc_files(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(sorted(glob.glob(os.path.join(p, "*.orc"))))
        else:
            files.append(p)
    return files


def read_orc(
    paths: str | list[str],
    columns: list[str] | None = None,
    stripes_per_task: int = 1,
):
    """ORC files/directories → Dataset, one read task per ``stripes_per_task``
    stripes. The driver touches only footers; stripe bytes are read inside
    tasks. ``columns`` prunes at the stripe read."""
    import pyarrow.orc as orc
    import ray.data as rd

    files = _list_orc_files(paths)
    items = []
    for f in files:
        for i in range(orc.ORCFile(f).nstripes):
            items.append({"path": f, "stripe": i})
    if not items:
        raise FileNotFoundError(f"no ORC stripes under {paths!r}")
    meta = rd.from_items(
        items, override_num_blocks=max(1, len(items) // max(1, stripes_per_task))
    )

    def read_task(t: pa.Table) -> pa.Table:
        tables = []
        for path, stripe in zip(
            t.column("path").to_pylist(), t.column("stripe").to_pylist()
        ):
            f = orc.ORCFile(path)
            batch = f.read_stripe(stripe, columns=columns)
            tables.append(pa.Table.from_batches([batch]))
        return pa.concat_tables(tables, promote_options="default")

    return meta.map_batches(read_task, batch_format="pyarrow")


def write_orc_shards(ds, out_dir: str, prefix: str = "part") -> list[str]:
    """Dataset → one ORC file per block, written INSIDE the tasks (the
    driver only sees the path manifest). Shard names derive from the
    block's content hash of its first row — a rerun over the same block
    layout overwrites the same names via atomic tmp+rename (the JSONL
    shard-sink publish convention). Returns the written paths."""
    import zlib

    import pyarrow.orc as orc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        first = ",".join(str(t.column(c)[0].as_py()) for c in t.column_names[:3])
        tag = zlib.crc32(f"{first}:{len(t)}".encode()) & 0xFFFFFFFF
        path = os.path.join(out_dir, f"{prefix}-{tag:08x}.orc")
        tmp = f"{path}.tmp{os.getpid()}"
        orc.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([path]), "n": pa.array([len(t)], pa.int64())}
        )

    manifest = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return sorted(manifest["path"].tolist())
