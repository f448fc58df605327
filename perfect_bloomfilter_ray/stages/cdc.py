"""Content-defined chunking (Rabin-style rolling hash) + chunk-level dedup.

The backup/dedup-system primitive (LBFS, Muthitacharoen et al. 2001) that
fixed-size chunking cannot replicate: chunk boundaries are set where a
rolling hash of the last ``window`` bytes hits a mask condition, so an
insertion near the start of a document only changes the chunks around the
edit — every later boundary re-synchronizes (shift resistance). Chunk-hash
sets then dedup storage across near-identical documents.

Vectorized per batch: the polynomial rolling hash uses uint64 wraparound
prefix sums — ``S_i = Σ b_k·p^(i-k)`` via one cumsum of ``b_k·p^(N-k)``
(mod 2^64), window hash ``S_i − S_{i−w}·p^w`` — no per-byte Python. The
same prefix trick powers the whole-chunk fingerprints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier (invertible mod 2^64)


def _window_hashes(data: np.ndarray, window: int) -> np.ndarray:
    """Polynomial rolling hash of every ``window``-byte span, fully
    vectorized: with inverse-scale prefix sums ``T_i = Σ b_k·inv^k`` the
    span hash ``H_i = (T_i − T_{i−w})·p^i`` depends on the window bytes
    ONLY (the position scale cancels exactly in mod-2^64 arithmetic)."""
    n = len(data)
    with np.errstate(over="ignore"):
        inv = np.uint64(pow(int(_P), -1, 1 << 64))
        inv_pows = np.empty(n, dtype=np.uint64)
        inv_pows[0] = np.uint64(1)
        if n > 1:
            np.multiply.accumulate(np.full(n - 1, inv, dtype=np.uint64), out=inv_pows[1:])
        p_pows = np.empty(n, dtype=np.uint64)
        p_pows[0] = np.uint64(1)
        if n > 1:
            np.multiply.accumulate(np.full(n - 1, _P, dtype=np.uint64), out=p_pows[1:])
        t = np.cumsum(data.astype(np.uint64) * inv_pows, dtype=np.uint64)
        h = t[window - 1 :].copy()
        h[1:] -= t[: n - window]
        h *= p_pows[window - 1 :]
    return h


def _chunk_bounds(data: np.ndarray, window: int, mask_bits: int, min_len: int, max_len: int) -> np.ndarray:
    """Boundary END indices (exclusive) for one byte array."""
    n = len(data)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n < window:
        return np.array([n], dtype=np.int64)
    from perfect_bloomfilter_ray.functions.hashing import splitmix64

    norm = splitmix64(_window_hashes(data, window))
    mask = np.uint64((1 << mask_bits) - 1)
    is_cut = (norm & mask) == 0
    ends = []
    start = 0
    cut_pos = np.flatnonzero(is_cut) + window  # boundary after position
    ci = 0
    while start < n:
        lo = start + min_len
        hi = min(start + max_len, n)
        while ci < len(cut_pos) and cut_pos[ci] < lo:
            ci += 1
        if ci < len(cut_pos) and cut_pos[ci] <= hi:
            ends.append(int(cut_pos[ci]))
            start = int(cut_pos[ci])
            ci += 1
        else:
            ends.append(hi)
            start = hi
    return np.array(ends, dtype=np.int64)


def chunk_hashes(data: bytes, window: int = 16, mask_bits: int = 9, min_len: int = 64, max_len: int = 4096) -> list[tuple[int, int]]:
    """[(chunk_hash, chunk_len)] for one document body."""
    from perfect_bloomfilter_ray.functions.hashing import splitmix64

    arr = np.frombuffer(data, dtype=np.uint8)
    ends = _chunk_bounds(arr, window, mask_bits, min_len, max_len)
    out = []
    start = 0
    for e in ends:
        piece = arr[start:e]
        with np.errstate(over="ignore"):
            h = np.uint64(1469598103934665603)
            # vectorized polynomial fold of the chunk
            pw = np.empty(len(piece), dtype=np.uint64)
            pw[0] = np.uint64(1)
            if len(piece) > 1:
                np.multiply.accumulate(np.full(len(piece) - 1, _P, dtype=np.uint64), out=pw[1:])
            h = np.uint64(h + (piece.astype(np.uint64) * pw).sum(dtype=np.uint64))
        out.append((int(splitmix64(np.array([h]))[0]), int(e - start)))
        start = int(e)
    return out


def cdc_dedup_stats(ds: Dataset, text_col: str, id_col: str, **kw) -> "pa.Table":
    """Corpus-level chunk dedup report: distinct (chunk-hash) exchange over
    per-batch partials; returns totals + dedup ratio."""
    from ray.data.aggregate import Sum

    def per_batch(t: pa.Table) -> pa.Table:
        import polars as pl

        texts = t.column(text_col).to_pylist()
        hs, ls = [], []
        for s in texts:  # per-DOC loop; the per-doc hashing is vectorized
            for h, ln in chunk_hashes(s.encode("utf-8"), **kw):
                hs.append(int(np.uint64(h).astype(np.int64)))
                ls.append(ln)
        return (
            pl.from_arrow(pa.table({"h": pa.array(hs, pa.int64()), "ln": pa.array(ls, pa.int64())}))
            .group_by("h")
            .agg(pl.len().cast(pl.Int64).alias("pn"), pl.col("ln").first().alias("ln"))
            .to_arrow()
        )

    per_chunk = (
        ds.select_columns([text_col])
        .map_batches(per_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("pn", alias_name="n"), Sum("ln", alias_name="ln_sum"))
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy()
        ln_sum = t.column("ln_sum").to_numpy()
        ln1 = (ln_sum / np.maximum(n, 1)).astype(np.int64)  # first len == all (same hash)
        return pa.table(
            {
                "chunks_total": pa.array([int(n.sum())], pa.int64()),
                "chunks_distinct": pa.array([len(n)], pa.int64()),
                "bytes_total": pa.array([int((ln1 * n).sum())], pa.int64()),
                "bytes_distinct": pa.array([int(ln1.sum())], pa.int64()),
            }
        )

    p = per_chunk.map_batches(fold, batch_format="pyarrow").to_pandas().sum()
    return pa.table(
        {
            "chunks_total": pa.array([int(p["chunks_total"])], pa.int64()),
            "chunks_distinct": pa.array([int(p["chunks_distinct"])], pa.int64()),
            "bytes_total": pa.array([int(p["bytes_total"])], pa.int64()),
            "bytes_distinct": pa.array([int(p["bytes_distinct"])], pa.int64()),
        }
    )
