"""Per-file Bloom data-skipping index (bloom zone maps).

A partitioned Parquet table gets a sidecar index: one capacity-planned
``BloomCascade`` per data file over a chosen key column, plus min/max zone
bounds. Point lookups consult the index and read ONLY the files whose bloom
(and range) may contain a probed key — at 100 TB this turns a full-table
scan into a handful of file reads, the trick Parquet column bloom filters /
Iceberg puffin sidecars play, built here from the repo's own cascade
(state/bloom.py) so the index shards inherit the §2.2 FPR bound: expected
false file reads per probe ≈ num_files × per-cascade FPR (~3e-13 at the
Medium accuracy default, i.e. effectively zero).

Reference provenance: this is the reference filter's raison d'être
(``tests/sync_test.rs:49-66`` — check-before-touching-storage) applied at
the storage layer; routing/growth semantics per ``filter.rs:373-389``.

Scale notes:
- The build runs as one Ray Data task per file (the natural unit for
  file-level indexes; parallelism = #files, which is ≫ cores at 100 TB).
  Each task reads ONLY the key column of its file.
- The manifest is O(#files × bloom bytes); blooms are capacity-planned to
  the file's key count (bits/key ≤ 2×threshold), so a 128 MB data file with
  1M keys carries a ~4 MB sidecar — small enough to broadcast via
  ``ray.put`` to probe stages.
- The probe itself is driver-side over the manifest (tiny), and the pruned
  read is a normal streaming ``read_parquet`` over the surviving files.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from perfect_bloomfilter_ray.config import BloomConfig
from perfect_bloomfilter_ray.state.bloom import BloomCascade


def build_bloom_skip_index(
    files: list[str],
    key_col: str,
    index_dir: str,
    config: BloomConfig | None = None,
) -> dict:
    """Build the sidecar index: one bloom + zone bounds per data file.

    Returns the manifest (also persisted to ``index_dir``): per file the
    serialized cascade, row count, min/max of the key column, and build
    metrics — the same lineage shape as ``stages/checkpoint.py`` manifests.
    """
    import ray.data as rd

    def index_one(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        import pyarrow.parquet as pq

        out: dict[str, list] = {"path": [], "n_rows": [], "vmin": [], "vmax": [], "bloom": [], "seconds": []}
        for path in batch["path"]:
            t0 = time.time()
            col = pq.read_table(path, columns=[key_col]).column(key_col).combine_chunks()
            cascade = BloomCascade.for_capacity(max(len(col), 1), config)
            cascade.update_column(col)
            mm = pc.min_max(col).as_py()
            out["path"].append(path)
            out["n_rows"].append(len(col))
            out["vmin"].append(json.dumps(mm["min"], default=str))
            out["vmax"].append(json.dumps(mm["max"], default=str))
            out["bloom"].append(cascade.to_bytes())
            out["seconds"].append(round(time.time() - t0, 4))
        return {k: np.asarray(v, dtype=object) for k, v in out.items()}

    rows = (
        rd.from_items([{"path": p} for p in sorted(files)])
        .map_batches(index_one, batch_size=1, batch_format="numpy")
        .take_all()
    )
    manifest = {
        "key_col": key_col,
        # take_all() order is not guaranteed under the streaming executor
        # (preserve_order is off for throughput) — canonicalize by path
        "files": [
            {
                "path": r["path"],
                "n_rows": int(r["n_rows"]),
                "vmin": json.loads(r["vmin"]),
                "vmax": json.loads(r["vmax"]),
                "bloom": r["bloom"],
                "seconds": float(r["seconds"]),
            }
            for r in sorted(rows, key=lambda r: r["path"])
        ],
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "bloom_index.pkl.tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(manifest, fh)
    os.replace(tmp, os.path.join(index_dir, "bloom_index.pkl"))
    with open(os.path.join(index_dir, "bloom_index.meta.json"), "w") as fh:
        json.dump(
            {
                "key_col": key_col,
                "num_files": len(manifest["files"]),
                "total_rows": sum(f["n_rows"] for f in manifest["files"]),
                "index_bytes": sum(len(f["bloom"]) for f in manifest["files"]),
            },
            fh,
            indent=1,
        )
    return manifest


def load_bloom_skip_index(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "bloom_index.pkl"), "rb") as fh:
        return pickle.load(fh)


def prune_files(manifest: dict, keys: list) -> tuple[list[str], dict]:
    """Return the files that may contain ANY of ``keys``, plus prune stats.

    A file survives iff at least one probed key passes BOTH its zone range
    and its bloom. Zone check only applies to orderable keys (numeric /
    string); the bloom check is authoritative either way (no false
    negatives by construction).
    """
    key_arr = pa.array(keys)
    survivors, checked = [], 0
    for f in manifest["files"]:
        checked += 1
        cand = np.ones(len(keys), dtype=bool)
        vmin, vmax = f["vmin"], f["vmax"]
        if vmin is not None and vmax is not None:
            try:
                cand &= np.array([vmin <= k <= vmax for k in keys], dtype=bool)
            except TypeError:
                pass
        if not cand.any():
            continue
        cascade = BloomCascade.from_bytes(f["bloom"])
        hits = cascade.contains_column(key_arr.take(np.nonzero(cand)[0]))
        if hits.any():
            survivors.append(f["path"])
    stats = {
        "files_total": checked,
        "files_read": len(survivors),
        "files_pruned": checked - len(survivors),
    }
    return survivors, stats


def pruned_point_lookup(
    manifest: dict,
    keys: list,
    columns: list[str] | None = None,
) -> tuple[Any, dict]:
    """Index-pruned exact point lookup: read only surviving files, then
    apply the exact ``IN`` filter (the bloom may over-admit at FPR, never
    under-admit). Returns ``(Dataset, prune_stats)``."""
    import ray.data as rd

    key_col = manifest["key_col"]
    survivors, stats = prune_files(manifest, keys)
    if not survivors:
        empty = pa.table({c: pa.array([]) for c in (columns or [key_col])})
        return rd.from_arrow(empty), stats

    key_set = pa.array(keys)

    def exact(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column(key_col), value_set=key_set))

    ds = rd.read_parquet(survivors, columns=columns).map_batches(exact, batch_format="pyarrow")
    return ds, stats


def prune_files_range(manifest: dict, lo, hi) -> tuple[list[str], dict]:
    """Zone-map pruning for a range predicate: a file survives iff its
    [vmin, vmax] zone overlaps [lo, hi]. The bloom cannot help a range —
    this is the min/max half of the sidecar doing the work."""
    survivors, checked = [], 0
    for f in manifest["files"]:
        checked += 1
        vmin, vmax = f["vmin"], f["vmax"]
        if vmin is not None and vmax is not None:
            try:
                if vmax < lo or vmin > hi:
                    continue
            except TypeError:
                pass
        survivors.append(f["path"])
    return survivors, {
        "files_total": checked,
        "files_read": len(survivors),
        "files_pruned": checked - len(survivors),
    }


def pruned_range_scan(
    manifest: dict,
    lo,
    hi,
    columns: list[str] | None = None,
) -> tuple[Any, dict]:
    """Index-pruned exact range scan: read only files whose zone overlaps
    [lo, hi], then apply the exact BETWEEN filter (zones over-admit at
    file granularity, never under-admit). Returns ``(Dataset, stats)``."""
    import ray.data as rd

    key_col = manifest["key_col"]
    survivors, stats = prune_files_range(manifest, lo, hi)
    if not survivors:
        empty = pa.table({c: pa.array([]) for c in (columns or [key_col])})
        return rd.from_arrow(empty), stats

    def exact(t: pa.Table) -> pa.Table:
        k = t.column(key_col)
        return t.filter(
            pc.and_(pc.greater_equal(k, pa.scalar(lo)), pc.less_equal(k, pa.scalar(hi)))
        )

    ds = rd.read_parquet(survivors, columns=columns).map_batches(exact, batch_format="pyarrow")
    return ds, stats
