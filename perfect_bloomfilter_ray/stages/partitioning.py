"""Dynamic coarse-partition sizing for keyed shuffle operators.

The keyed window/dedup/top-k operators hash keys into ``num_blocks`` coarse
partitions and run ONE vectorized pass per partition (see windows.py module
docstring). The correctness of that shape is partition-count-independent —
every key's rows land in exactly one partition for any ``num_blocks`` — but
the "one partition fits one task" memory assumption is not: a static 64 at
100× the data means partitions of corpus/64.

``choose_num_blocks`` derives the count at call time, without executing the
dataset:

- floor = max(min_blocks, per_cpu × cluster CPUs) — scales parallelism with
  the cluster (a 256-node × 32-CPU cluster gets ≥32k partitions);
- refined upward from source-file bytes when the dataset exposes
  ``input_files()`` on local paths (Parquet metadata, no execution), aiming
  at ``target_part_bytes`` per partition; compressed-file bytes understate
  in-memory Arrow, so the target is deliberately conservative.

Callers always accept an explicit ``num_blocks=`` override; pass one when the
shuffled rows are much slimmer than the source rows (id+hash-only shuffles).
"""

from __future__ import annotations

import os

from ray.data import Dataset


def choose_num_blocks(
    ds: Dataset | None = None,
    num_blocks: int | None = None,
    min_blocks: int = 64,
    per_cpu: int = 4,
    target_part_bytes: int = 128 << 20,
    max_blocks: int = 65536,
) -> int:
    """Partition count for a coarse hash-partition shuffle (see module doc)."""
    if num_blocks is not None:
        return num_blocks
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - ray not importable
        cpus = 0
    n = max(min_blocks, per_cpu * cpus)
    if ds is not None:
        try:
            files = ds.input_files()
            size = sum(os.path.getsize(f) for f in files if f and os.path.exists(f))
            if size:
                n = max(n, -(-size // target_part_bytes))
        except Exception:
            pass
    return min(n, max_blocks)
