"""Sequential-pattern support mining (length-3 subsequences with gaps).

Counts, for every ordered type triple (a, b, c), how many keys (users)
contain it as a SUBSEQUENCE of their event-time-ordered type sequence —
the support table of PrefixSpan-style sequential pattern mining (Pei et
al. 2001) restricted to length 3, which is the form A/B-test and funnel
teams actually consume ("view … click … purchase in order, gaps allowed").
Contiguous n-gram counts (the existing trigram query) answer a different
question; subsequence support is gap-tolerant.

Vectorized via SEGMENTED BITMASK SCANS — no per-event Python:
with T ≤ 7 distinct types, a key's progress folds into three bitmask
layers per event position j (ts, id)-ordered within the key:

  seen_before[j]   : T-bit mask of types at positions < j
                     (segmented exclusive OR-scan of 1 << t)
  pairs_before[j]  : T²-bit mask of ordered pairs completed before j
                     (segmented exclusive OR-scan of seen_before << T·t)
  triples[key]     : T³-bit mask (≤343 bits, 6 uint64 lanes) — segmented
                     total OR of pairs_before shifted by T²·t

Each exclusive OR-scan runs as log₂(n) vectorized doubling passes (the
classic Hillis-Steele scan with a same-key guard), so a partition of any
size costs O(n log n) bitwise-ops with zero Python per row. One hash
exchange on the key co-locates each key's history; per-pattern support is
a popcount fold over per-key masks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
from perfect_bloomfilter_ray.stages.windows import _add_part, _ts_i64

_U64 = np.uint64


def _segmented_or_scan_exclusive_simple(x: np.ndarray, key: np.ndarray) -> np.ndarray:
    """Exclusive segmented OR-scan over contiguous equal-``key`` runs:
    Hillis-Steele doubling with a 'distance to run start' guard —
    log2(n) fully vectorized passes, no per-row Python."""
    n = len(x)
    if n == 0:
        return np.zeros_like(x)
    start_flag = np.ones(n, dtype=bool)
    start_flag[1:] = key[1:] != key[:-1]
    run_start = np.maximum.accumulate(np.where(start_flag, np.arange(n), -1))
    vals = np.zeros_like(x)
    vals[1:] = x[:-1]
    vals[start_flag] = 0
    acc = vals.copy()
    shift = 1
    while shift < n:
        idx = np.arange(n)
        ok = idx - shift >= run_start
        contrib = np.zeros_like(x)
        contrib[shift:] = acc[:-shift]
        acc = np.where(ok, acc | contrib, acc)
        shift <<= 1
    return acc


def subsequence_triple_support(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    num_blocks: int | None = None,
):
    """Support counts for every ordered type triple occurring as a
    subsequence (gaps allowed) of some key's sequence. Returns a pandas
    frame (type_a, type_b, type_c, n_keys) sorted, with n_keys > 0 rows
    only. Type cardinality T is asserted ≤ 7 (T³ ≤ 343 bits of per-key
    state — the bounded-domain contract, same as the pivot queries)."""
    import pandas as pd

    types = sorted(
        x for x in ds.select_columns([type_col]).unique(type_col) if x is not None
    )
    T = len(types)
    if T == 0:
        return pd.DataFrame({"type_a": [], "type_b": [], "type_c": [], "n_keys": []})
    assert T <= 7, f"type cardinality {T} exceeds the bitmask budget"
    lanes = (T * T * T + 63) // 64

    def per_part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({f"l{k}": pa.array([], pa.uint64()) for k in range(lanes)})
        keys = t.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kc = pc.index_in(keys, value_set=pc.unique(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        tv = t.column(type_col)
        if isinstance(tv, pa.ChunkedArray):
            tv = tv.combine_chunks()
        tc = pc.index_in(tv, value_set=pa.array(types, type=tv.type)).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column(ts_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, ts, kc))
        kc_s, tc_s = kc[order], tc[order]
        n = len(order)

        seen_contrib = (_U64(1) << tc_s.astype(_U64))
        seen_before = _segmented_or_scan_exclusive_simple(seen_contrib, kc_s)
        pair_contrib = seen_before << (_U64(T) * tc_s.astype(_U64))  # T^2 <= 49 bits
        pairs_before = _segmented_or_scan_exclusive_simple(pair_contrib, kc_s)
        # triple contribution: pairs_before (T^2 bits) shifted by T^2*t —
        # up to T^3 = 343 bits; expand into uint64 lanes
        shift_bits = (T * T) * tc_s  # 0 .. T^2*(T-1)
        lane_of = shift_bits // 64
        off = (shift_bits % 64).astype(_U64)
        tri = np.zeros((n, lanes), dtype=_U64)
        rows = np.arange(n)
        tri[rows, lane_of] |= pairs_before << off
        spill = lane_of + 1 < lanes
        # bits that cross the lane boundary
        has_off = off > 0
        sp = spill & has_off
        tri[rows[sp], lane_of[sp] + 1] |= pairs_before[sp] >> (_U64(64) - off[sp])

        # per-key total OR of triple contributions
        starts = np.ones(n, dtype=bool)
        starts[1:] = kc_s[1:] != kc_s[:-1]
        seg_id = np.cumsum(starts) - 1
        nk = int(seg_id[-1]) + 1
        out = np.zeros((nk, lanes), dtype=_U64)
        for k in range(lanes):
            np.bitwise_or.at(out[:, k], seg_id, tri[:, k])
        return pa.table({f"l{k}": pa.array(out[:, k]) for k in range(lanes)})

    masks = (
        _add_part(ds, key_col, choose_num_blocks(ds, num_blocks))
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )

    # popcount fold: per batch, per pattern bit, count keys with the bit set
    def popfold(t: pa.Table) -> pa.Table:
        counts = np.zeros(T * T * T, dtype=np.int64)
        for k in range(lanes):
            col = t.column(f"l{k}")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = np.ascontiguousarray(col.to_numpy(zero_copy_only=False))
            bits = np.unpackbits(col.view(np.uint8).reshape(len(col), 8), axis=1, bitorder="little")
            lo, hi = 64 * k, min(64 * (k + 1), T * T * T)
            counts[lo:hi] += bits[:, : hi - lo].sum(axis=0, dtype=np.int64)
        return pa.table({"pat": pa.array(np.arange(T * T * T)), "c": pa.array(counts)})

    from ray.data.aggregate import Sum

    agg = (
        masks.map_batches(popfold, batch_format="pyarrow")
        .groupby("pat")
        .aggregate(Sum("c", alias_name="n_keys"))
        .to_pandas()
    )
    agg = agg[agg["n_keys"] > 0].copy()
    pat = agg["pat"].to_numpy().astype(int)
    # bit layout: contribution = pairs_before << T^2*c where pair bit was
    # seen_before << T*b with seen bit a → bit index = a + T*b + T^2*c
    agg["type_a"] = [types[p % T] for p in pat]
    agg["type_b"] = [types[(p // T) % T] for p in pat]
    agg["type_c"] = [types[p // (T * T)] for p in pat]
    agg["n_keys"] = agg["n_keys"].astype("int64")
    return (
        agg[["type_a", "type_b", "type_c", "n_keys"]]
        .sort_values(["type_a", "type_b", "type_c"])
        .reset_index(drop=True)
    )
