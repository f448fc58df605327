"""Distributed 2-D skyline (Pareto frontier) — Börzsönyi et al., ICDE 2001.

Non-dominated rows under (maximize x, maximize y): row p is dominated iff
some q has q.x >= p.x and q.y >= p.y with at least one strict. The classic
distributed shape: a block-local skyline pass shrinks every block to its own
frontier (the global skyline is provably a subset of the union of local
skylines — dominance is transitive and witnesses survive locally), then ONE
final task recomputes the exact skyline over the tiny union. No shuffle, no
sort of the full data; wall-clock is one streaming pass.

Tie semantics match SQL ``NOT EXISTS`` dominance: rows equal on BOTH dims
dominate neither each other nor themselves — exact duplicates all stay.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _local_skyline(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    if len(t) == 0:
        return t
    x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
    y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((-y, -x))  # x desc, then y desc
    xs, ys = x[order], y[order]
    n = len(xs)
    grp_first = np.zeros(n, dtype=bool)
    grp_first[0] = True
    grp_first[1:] = xs[1:] != xs[:-1]
    gid = np.cumsum(grp_first) - 1
    # y max within each equal-x group = first row of the group (y desc)
    gmax_y = ys[np.flatnonzero(grp_first)]
    # best y among STRICTLY greater x = prefix max of previous groups
    prev_best = np.concatenate([[-np.inf], np.maximum.accumulate(gmax_y)[:-1]])
    keep_sorted = (ys == gmax_y[gid]) & (ys > prev_best[gid])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return t.filter(pa.array(keep))


def skyline_2d(ds: Dataset, x_col: str, y_col: str) -> pa.Table:
    """Exact global skyline. The union of local skylines is O(frontier ×
    blocks) — tiny by construction — so the final merge is one driver-side
    recompute over it. Returns the frontier as one Arrow table."""
    local = ds.map_batches(lambda t: _local_skyline(t, x_col, y_col), batch_format="pyarrow")
    parts = list(local.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not parts:
        return _local_skyline(pa.table({x_col: pa.array([], pa.float64()), y_col: pa.array([], pa.float64())}), x_col, y_col)
    return _local_skyline(pa.concat_tables(parts), x_col, y_col)
