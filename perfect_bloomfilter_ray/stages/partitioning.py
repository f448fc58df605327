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


def choose_join_partitions(min_partitions: int = 8, per_cpus: int = 4) -> int:
    """Partition count for a ``Dataset.join`` exchange: scale with the
    cluster instead of a static constant, but coarsely — each partition
    costs an aggregator actor spin-up, so one-partition-per-CPU overshoots
    (measured 2x slower on a 32-CPU single node for a runtime-filtered
    right side). One partition per ``per_cpus`` CPUs, floor ``min_partitions``."""
    try:
        import ray

        if ray.is_initialized():
            return max(min_partitions, int(ray.cluster_resources().get("CPU", 0)) // per_cpus)
    except Exception:  # pragma: no cover - ray not importable
        pass
    return min_partitions


def _part1by1(x: "np.ndarray") -> "np.ndarray":
    """Spread each of the low 32 bits of x to the even bit positions
    (classic Morton-code magic-mask expansion, fully vectorized)."""
    import numpy as np

    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def zorder_key2(a, b, bits: int = 16) -> "np.ndarray":
    """Interleaved Z-order (Morton) key of two non-negative integer columns,
    ``bits`` low bits each → a single int64 clustering key whose sort order
    keeps rows close in BOTH dimensions close on disk. The write-time
    clustering trick behind multi-column range pruning (Delta/Iceberg
    OPTIMIZE ZORDER): sort or range-partition by this key before writing and
    a reader filtering on either column touches a fraction of the files.

    Bit k of ``a`` lands at position 2k, bit k of ``b`` at 2k+1 — matching
    the SQL oracle's explicit shift-and-add formulation. Values are masked
    to ``bits`` low bits (caller buckets/clamps first).
    """
    import numpy as np

    if not 1 <= bits <= 31:
        # 2×32 interleaved bits would set bit 63 and wrap the int64 key
        # negative, destroying the sort-order locality the key exists for
        raise ValueError(f"zorder_key2 supports 1..31 bits per column, got {bits}")
    mask = np.uint64((1 << bits) - 1)
    a = np.asarray(a).astype(np.uint64) & mask
    b = np.asarray(b).astype(np.uint64) & mask
    return (_part1by1(a) | (_part1by1(b) << np.uint64(1))).astype(np.int64)


def hilbert_key2(a, b, bits: int = 16) -> "np.ndarray":
    """Hilbert-curve clustering key of two non-negative integer columns,
    ``bits`` low bits each → one int64 key (the locality upgrade over
    :func:`zorder_key2`: on the Hilbert curve EVERY consecutive key pair
    is spatially adjacent, where Morton order takes long diagonal jumps at
    power-of-two boundaries — measurably tighter file min/max ranges for
    the same multi-column pruning trick).

    Vectorized xy→d transform (the standard rotate-and-accumulate walk,
    cf. Hamilton's compact Hilbert indices): the loop is over ``bits``
    LEVELS, every level a few numpy ops over all rows — never per row.
    Values are masked to ``bits`` low bits, like zorder_key2.
    """
    import numpy as np

    if not 1 <= bits <= 31:
        raise ValueError(f"hilbert_key2 supports 1..31 bits per column, got {bits}")
    mask = np.int64((1 << bits) - 1)
    x = (np.asarray(a).astype(np.int64) & mask).copy()
    y = (np.asarray(b).astype(np.int64) & mask).copy()
    d = np.zeros(len(x), dtype=np.int64)
    for i in range(bits - 1, -1, -1):
        s = np.int64(1 << i)
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant so the curve enters/exits correctly
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
    return d
