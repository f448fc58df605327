"""Generic interval-overlap join — no equi-key, chunk-replicated, emit-once.

The missing sibling of the equi-key band joins in stages/joins.py (as-of,
temporal band, range): join two interval tables on the pure overlap
predicate ``l.start <= r.end AND r.start <= l.end`` with NO shared key to
co-partition on.  The classic distributed plan (DeWitt's partitioned band
join; the same shape Spark/DuckDB lower to an IEJoin when single-node):

1. chunk the TIME AXIS into fixed ``chunk_us`` ranges;
2. replicate every interval to each chunk it touches (replication factor
   = span/chunk + 1 — pick the chunk width at or above the typical span
   so it stays ~2);
3. join inside each chunk only;
4. emit each overlapping pair EXACTLY ONCE with the canonical-chunk rule:
   a pair is emitted by the chunk containing ``max(l.start, r.start)``
   (the overlap's first instant), which both copies can compute locally —
   no global dedup shuffle.

Inside a chunk the candidate sets are occupancy-bounded by construction
(that is the contract: chunk width bounds how many intervals coexist), so
the pair test is a dense vectorized product in left-blocks — no per-row
Python.  Skewed chunks (every interval alive at once) degrade to the
documented occupancy bound; sub-chunking the hot range is the escape
hatch, exactly like salting a hot groupby key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_L_BLOCK = 1024  # lefts per dense sub-product: bounds task memory


def _expand_chunks(
    t: pa.Table, start: str, end: str, chunk_us: int, side: int, keep: list[str]
) -> pa.Table:
    s = t.column(start).to_numpy(zero_copy_only=False).astype(np.int64)
    e = t.column(end).to_numpy(zero_copy_only=False).astype(np.int64)
    c0, c1 = s // chunk_us, e // chunk_us
    reps = (c1 - c0 + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(s)), reps)
    off = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps
    )
    cols = {
        "_chunk": pa.array(c0[idx] + off),
        "_side": pa.array(np.full(len(idx), side, dtype=np.int8)),
        "_s": pa.array(s[idx]),
        "_e": pa.array(e[idx]),
    }
    for c in keep:
        cols[c] = t.column(c).take(pa.array(idx))
    return pa.table(cols)


def interval_overlap_join(
    left: Dataset,
    right: Dataset,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    l_cols: list[str],
    r_cols: list[str],
    chunk_us: int,
) -> Dataset:
    """All (left, right) pairs whose [start, end] intervals overlap
    (inclusive endpoints, integer microseconds).  Output columns:
    ``l_cols + r_cols`` (names must not collide).  See module docstring
    for the chunk-replication plan and its occupancy contract."""
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"column name collision across sides: {sorted(overlap)}")

    # typed null padding (tagged-union shape): derive each side's column
    # types once from the Dataset schemas so padded blocks concat cleanly
    r_sch = right.schema()
    l_sch = left.schema()
    r_types = dict(zip(r_sch.names, r_sch.types))
    l_types = dict(zip(l_sch.names, l_sch.types))

    def _pad(out: pa.Table, names: list[str], types: dict) -> pa.Table:
        for c in names:
            out = out.append_column(c, pa.nulls(len(out), types[c]))
        return out

    def expand_left(t: pa.Table) -> pa.Table:
        return _pad(_expand_chunks(t, l_start, l_end, chunk_us, 0, l_cols), r_cols, r_types)

    def expand_right(t: pa.Table) -> pa.Table:
        out = _expand_chunks(t, r_start, r_end, chunk_us, 1, r_cols)
        out = _pad(out, l_cols, l_types)
        return out.select(["_chunk", "_side", "_s", "_e", *l_cols, *r_cols])

    tagged = left.map_batches(expand_left, batch_format="pyarrow").union(
        right.map_batches(expand_right, batch_format="pyarrow")
    )

    out_fields = [(c, l_types[c]) for c in l_cols] + [(c, r_types[c]) for c in r_cols]

    def join_chunk(t: pa.Table) -> pa.Table:
        chunk = int(t.column("_chunk")[0].as_py())
        side = t.column("_side").to_numpy(zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        if not lmask.any() or not rmask.any():
            return pa.table({c: pa.array([], type=ty) for c, ty in out_fields})
        ls = t.column("_s").to_numpy(zero_copy_only=False)[lmask]
        le = t.column("_e").to_numpy(zero_copy_only=False)[lmask]
        rs = t.column("_s").to_numpy(zero_copy_only=False)[rmask]
        re_ = t.column("_e").to_numpy(zero_copy_only=False)[rmask]
        li_all, ri_all = [], []
        for b0 in range(0, len(ls), _L_BLOCK):
            b1 = min(b0 + _L_BLOCK, len(ls))
            L_s, L_e = ls[b0:b1, None], le[b0:b1, None]
            ov = (L_s <= re_[None, :]) & (rs[None, :] <= L_e)
            # emit-once rule: only the chunk holding the overlap's first
            # instant max(l.s, r.s) emits this pair
            canon = (np.maximum(L_s, rs[None, :]) // np.int64(chunk_us)) == np.int64(chunk)
            li, ri = np.nonzero(ov & canon)
            li_all.append(li + b0)
            ri_all.append(ri)
        li = np.concatenate(li_all) if li_all else np.empty(0, np.int64)
        ri = np.concatenate(ri_all) if ri_all else np.empty(0, np.int64)
        lidx = np.flatnonzero(lmask)[li]
        ridx = np.flatnonzero(rmask)[ri]
        cols = {}
        for c in l_cols:
            cols[c] = t.column(c).take(pa.array(lidx))
        for c in r_cols:
            cols[c] = t.column(c).take(pa.array(ridx))
        return pa.table(cols)

    return tagged.groupby("_chunk").map_groups(join_chunk, batch_format="pyarrow")
