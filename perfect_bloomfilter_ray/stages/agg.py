"""Sketch UDAF adapters — MergeableSketch → Ray Data aggregation.

Two build paths, both shuffle-minimal:

- ``sketch_global(ds, col, factory)`` — ``Dataset.aggregate(SketchAgg)``:
  Ray computes one partial sketch per block (``aggregate_block``) and
  tree-merges them (``combine``). No row shuffle at all — only small pickled
  sketches move.

- ``sketch_grouped(ds, key, col, factory)`` — the explicit two-phase
  hash-partitioned groupby-merge shuffle tree (SURVEY §2.3 "shuffle /
  partitioning ops"): phase 1 collapses each batch to ONE partial sketch per key
  inside ``map_batches`` (so the subsequent shuffle moves |keys|×|batches|
  tiny partials instead of every row — this per-batch pre-aggregation is also
  the skew mitigation: a key with 99% of rows still contributes exactly one
  partial per batch); phase 2 ``groupby(key).aggregate(SketchMergeAgg)``
  merges partials. An optional ``salt`` adds an intermediate
  ``(key, salt)`` merge level for the case of very few distinct keys ×
  very many partials, so no single reducer merges them all (jump-hash salted,
  then unsalted re-merge — valid because every sketch merge is
  associative/commutative).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import polars as pl
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
from perfect_bloomfilter_ray.state.base import dumps_sketch, loads_sketch


class SketchAgg(AggregateFnV2):
    """Aggregate a column into one mergeable sketch (global or per group).

    The accumulator type is **serialized sketch bytes** (``dumps_sketch``), not
    the sketch object: Ray stores partial accumulators inside Arrow blocks
    between the map and reduce stages of an aggregation, and a raw Python
    object there takes a raised-and-caught ArrowConversionError + pickle
    fallback per block. Bytes are a first-class Arrow type — no fallback, and
    no extra cost since the object would be pickled at block boundaries anyway.

    ``finalize_fn`` maps the final sketch to the output cell value (default:
    the sketch's own ``to_bytes`` — pass e.g. ``lambda s: s.estimate()`` for HLL).
    """

    def __init__(
        self,
        factory: Callable[[], Any],
        on: str,
        name: str | None = None,
        finalize_fn: Callable[[Any], Any] | None = None,
    ):
        self._factory = factory
        self._finalize_fn = finalize_fn
        super().__init__(
            name or f"sketch({on})",
            zero_factory=lambda: dumps_sketch(factory()),
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block: Block) -> bytes:
        t = BlockAccessor.for_block(block).to_arrow()
        col = t.column(self.get_target_column())
        if col.null_count:
            col = col.drop_null()
        s = self._factory()
        s.update_column(col)
        return dumps_sketch(s)

    def combine(self, current: bytes, new: bytes) -> bytes:
        return dumps_sketch(loads_sketch(current).merge(loads_sketch(new)))

    def finalize(self, acc: bytes) -> Any:
        s = loads_sketch(acc)
        return self._finalize_fn(s) if self._finalize_fn is not None else s.to_bytes()


class SketchMergeAgg(AggregateFnV2):
    """Merge a column of serialized partial sketches (phase 2 of the tree)."""

    def __init__(
        self,
        factory: Callable[[], Any],
        on: str = "partial",
        name: str = "sketch",
        finalize_fn: Callable[[Any], Any] | None = None,
        serialized_output: bool = False,
    ):
        self._factory = factory
        self._finalize_fn = finalize_fn
        self._serialized_output = serialized_output
        super().__init__(
            name, zero_factory=lambda: dumps_sketch(factory()), on=on, ignore_nulls=True
        )

    def aggregate_block(self, block: Block) -> bytes:
        t = BlockAccessor.for_block(block).to_arrow()
        s = self._factory()
        for raw in t.column(self.get_target_column()):
            b = raw.as_py()
            if b is not None:
                s.merge(loads_sketch(b))
        return dumps_sketch(s)

    def combine(self, current: bytes, new: bytes) -> bytes:
        return dumps_sketch(loads_sketch(current).merge(loads_sketch(new)))

    def finalize(self, acc: bytes) -> Any:
        if self._serialized_output:
            return acc
        s = loads_sketch(acc)
        return self._finalize_fn(s) if self._finalize_fn is not None else s.to_bytes()


class BitOrAgg(AggregateFnV2):
    """Bitwise-OR aggregate over an int64 flag column — the set-union of
    bit flags per group in ONE shuffle (vs the groupby-dedupe + Sum
    two-exchange equivalent). Exactly associative/commutative/idempotent,
    so Ray's pairwise combine tree needs no dedupe stage at all: OR-ing a
    duplicate contribution is a no-op, which is the whole point (profiling
    flows tag each value with a column bit possibly many times)."""

    def __init__(self, on: str, name: str | None = None):
        super().__init__(
            name or f"bit_or({on})", zero_factory=lambda: 0, on=on, ignore_nulls=True
        )

    def aggregate_block(self, block: Block) -> int:
        t = BlockAccessor.for_block(block).to_arrow()
        col = t.column(self.get_target_column())
        if col.null_count:
            col = col.drop_null()
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return int(np.bitwise_or.reduce(v)) if len(v) else 0

    def combine(self, current: int, new: int) -> int:
        return int(current) | int(new)

    def finalize(self, acc: int) -> int:
        return int(acc)


def multi_sketch_global(
    ds: Dataset,
    specs: dict[str, tuple[str, Callable[[], Any]]],
    batch_size: int = 8192,
    fanin: int = 64,
    tree_levels: int = 2,
) -> dict[str, Any]:
    """Build several global sketches in ONE streaming pass over the Dataset.

    ``specs`` maps output name -> (column, factory). Emits one row of
    serialized partials per input batch via ``map_batches`` (the input is
    visited exactly once, heavy columns never leave the map task), then
    reduces through ``tree_levels`` map_batches merge levels of ``fanin``
    rows each (B partials -> B/fanin^levels) before a final driver merge.

    This deliberately bypasses ``Dataset.aggregate``: Ray's hash-shuffle
    aggregation re-serializes the (potentially ~MB-sized) accumulator on
    every pairwise combine, which measured ~10x slower for BloomCascade
    partials than this explicit partial/merge tree. At 10^12-row scale the
    two merge levels bound any single task's fan-in to ``fanin`` and the
    driver's to B/fanin^levels.
    """
    names = list(specs)

    def partials(t: pa.Table) -> pa.Table:
        out = {}
        for name in names:
            col_name, factory = specs[name]
            col = t.column(col_name)
            if col.null_count:
                col = col.drop_null()
            s = factory()
            s.update_column(col)
            out[name] = pa.array([dumps_sketch(s)], pa.binary())
        return pa.table(out)

    def merge_rows(t: pa.Table) -> pa.Table:
        out = {}
        for name in names:
            _, factory = specs[name]
            s = factory()
            for raw in t.column(name):
                b = raw.as_py()
                if b is not None:
                    s.merge(loads_sketch(b))
            out[name] = pa.array([dumps_sketch(s)], pa.binary())
        return pa.table(out)

    pds = ds.map_batches(partials, batch_format="pyarrow", batch_size=batch_size)
    for _ in range(tree_levels):
        pds = pds.map_batches(merge_rows, batch_format="pyarrow", batch_size=fanin)

    results: dict[str, Any] = {name: specs[name][1]() for name in names}
    for row in pds.take_all():
        for name in names:
            if row[name] is not None:
                results[name].merge(loads_sketch(row[name]))
    return results


def sketch_global(ds: Dataset, col: str, factory: Callable[[], Any], name: str = "sketch") -> Any:
    """Build one sketch over a whole Dataset column. Returns the sketch object."""
    return multi_sketch_global(ds, {name: (col, factory)})[name]


def _partials_fn(key: str, col: str, factory: Callable[[], Any]):
    """Phase-1 batch fn: one serialized partial sketch per distinct key in batch."""
    import polars as pl

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({key: t.column(key), col: t.column(col)}))
        keys_out: list = []
        parts_out: list = []
        # python loop over *distinct keys per batch* (small), values vectorized
        for kv, g in df.group_by(key):
            s = factory()
            s.update_column(g[col].to_arrow())
            keys_out.append(kv[0])
            parts_out.append(dumps_sketch(s))
        kt = t.schema.field(key).type
        return pa.table({key: pa.array(keys_out, type=kt), "partial": pa.array(parts_out, pa.binary())})

    return partials


def sketch_grouped(
    ds: Dataset,
    key: str,
    col: str,
    factory: Callable[[], Any],
    name: str = "sketch",
    finalize_fn: Callable[[Any], Any] | None = None,
    batch_size: int = 64 * 1024,
    salt: int | None = None,
) -> Dataset:
    """Per-key sketches via the two-phase partial/merge shuffle tree.

    Output columns: ``[key, name]`` where ``name`` holds ``finalize_fn(sketch)``
    (default: serialized sketch bytes).
    """
    partial_ds = ds.map_batches(
        _partials_fn(key, col, factory), batch_format="pyarrow", batch_size=batch_size
    )
    if salt and salt > 1:
        # intermediate salted merge level: bounds any single reducer's fan-in
        from perfect_bloomfilter_ray.functions.hashing import hash64, jump_hash

        def add_salt(t: pa.Table) -> pa.Table:
            h = hash64(t.column("partial"), 0x5A17) ^ np.arange(len(t), dtype=np.uint64)
            return t.append_column("_salt", pa.array(jump_hash(h, salt), pa.int32()))

        salted = partial_ds.map_batches(add_salt, batch_format="pyarrow")
        level1 = salted.groupby([key, "_salt"]).aggregate(
            SketchMergeAgg(factory, on="partial", name="partial", serialized_output=True)
        )
        partial_ds = level1.drop_columns(["_salt"])
    return partial_ds.groupby(key).aggregate(
        SketchMergeAgg(factory, on="partial", name=name, finalize_fn=finalize_fn)
    )


# ---------------------------------------------------------- corr / covariance

def grouped_corr(
    ds: Dataset,
    key: str,
    x_col: str,
    y_col: str,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key Pearson correlation + sample covariance of two numeric
    columns — exact two-column sufficient statistics, numerically stable.

    Naive Σx²/Σxy sums cancel catastrophically at 100-TB magnitudes, so the
    partials are CENTERED per block (n, mean_x, mean_y, M2x, M2y, Cxy —
    the parallel-variance formulation of Chan et al. 1983) and merged with
    the weighted one-level combine: ``M2 = Σ M2_i + Σ n_i·(mean_i − mean)²``
    (exact for any partition of the rows, vectorized over keys with
    reduceat). Rows where either column is null are excluded (SQL corr /
    covar_samp semantics).

    Output per key: ``n`` (int64), ``covar_samp`` (= Cxy / (n−1)), ``corr``
    (= Cxy / √(M2x·M2y)); null when n < 2 or a variance is 0. Shape: one
    map_batches partial pass (a few rows per key per block), one slim
    shuffle of partials, one vectorized merge per coarse partition.
    """
    from perfect_bloomfilter_ray.functions.hashing import hash64

    nb = choose_num_blocks(ds, num_blocks)

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, x_col, y_col])).drop_nulls([x_col, y_col])
        if len(df) == 0:
            return pa.table(
                {
                    key: pa.array([], t.schema.field(key).type),
                    "pn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.float64()),
                    "my": pa.array([], pa.float64()),
                    "m2x": pa.array([], pa.float64()),
                    "m2y": pa.array([], pa.float64()),
                    "cxy": pa.array([], pa.float64()),
                }
            )
        df = df.sort(key)
        keys_np = df[key].to_numpy()
        x = df[x_col].to_numpy().astype(np.float64)
        y = df[y_col].to_numpy().astype(np.float64)
        change = np.zeros(len(df), dtype=bool)
        change[0] = True
        change[1:] = keys_np[1:] != keys_np[:-1]
        starts = np.flatnonzero(change)
        n_g = np.diff(np.append(starts, len(df)))
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        mx, my = sx / n_g, sy / n_g
        dx = x - np.repeat(mx, n_g)
        dy = y - np.repeat(my, n_g)
        m2x = np.add.reduceat(dx * dx, starts)
        m2y = np.add.reduceat(dy * dy, starts)
        cxy = np.add.reduceat(dx * dy, starts)
        kt = df[key].to_arrow()
        return pa.table(
            {
                key: kt.take(pa.array(starts, pa.int64())),
                "pn": pa.array(n_g, pa.int64()),
                "mx": pa.array(mx),
                "my": pa.array(my),
                "m2x": pa.array(m2x),
                "m2y": pa.array(m2y),
                "cxy": pa.array(cxy),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        h = hash64(t.column(key), 0xC0FF)
        return t.append_column("_part", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def merge_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"])).sort(key)
        keys_np = df[key].to_numpy()
        change = np.zeros(len(df), dtype=bool)
        change[0] = True
        change[1:] = keys_np[1:] != keys_np[:-1]
        starts = np.flatnonzero(change)
        pn = df["pn"].to_numpy().astype(np.float64)
        n = np.add.reduceat(pn, starts)
        mx = np.add.reduceat(pn * df["mx"].to_numpy(), starts) / n
        my = np.add.reduceat(pn * df["my"].to_numpy(), starts) / n
        ex = df["mx"].to_numpy() - np.repeat(mx, np.diff(np.append(starts, len(df))))
        ey = df["my"].to_numpy() - np.repeat(my, np.diff(np.append(starts, len(df))))
        m2x = np.add.reduceat(df["m2x"].to_numpy() + pn * ex * ex, starts)
        m2y = np.add.reduceat(df["m2y"].to_numpy() + pn * ey * ey, starts)
        cxy = np.add.reduceat(df["cxy"].to_numpy() + pn * ex * ey, starts)
        n_i = n.astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            covar = np.where(n_i > 1, cxy / np.maximum(n - 1.0, 1.0), np.nan)
            denom = np.sqrt(m2x * m2y)
            corr = np.where((n_i > 1) & (denom > 0), cxy / np.where(denom > 0, denom, 1.0), np.nan)
        kt = df[key].to_arrow()
        return pa.table(
            {
                key: kt.take(pa.array(starts, pa.int64())),
                "n": pa.array(n_i),
                "covar_samp": pa.array(covar),
                "corr": pa.array(corr),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(merge_block, batch_format="pyarrow")
    )


def grouped_mean_std(
    ds: Dataset,
    key: str,
    col: str,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key count / mean / sample stddev — same centered-moment partials
    and Chan-style weighted merge as :func:`grouped_corr`, one column.
    Output per key: ``n`` (int64), ``mean``, ``std`` (ddof=1; null when
    n < 2). Nulls in ``col`` are excluded (SQL avg/stddev_samp)."""
    from perfect_bloomfilter_ray.functions.hashing import hash64

    nb = choose_num_blocks(ds, num_blocks)

    def partials(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, col])).drop_nulls([col])
        if len(df) == 0:
            return pa.table(
                {
                    key: pa.array([], t.schema.field(key).type),
                    "pn": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.float64()),
                    "m2x": pa.array([], pa.float64()),
                }
            )
        df = df.sort(key)
        keys_np = df[key].to_numpy()
        x = df[col].to_numpy().astype(np.float64)
        change = np.zeros(len(df), dtype=bool)
        change[0] = True
        change[1:] = keys_np[1:] != keys_np[:-1]
        starts = np.flatnonzero(change)
        n_g = np.diff(np.append(starts, len(df)))
        mx = np.add.reduceat(x, starts) / n_g
        dx = x - np.repeat(mx, n_g)
        m2x = np.add.reduceat(dx * dx, starts)
        kt = df[key].to_arrow()
        return pa.table(
            {
                key: kt.take(pa.array(starts, pa.int64())),
                "pn": pa.array(n_g, pa.int64()),
                "mx": pa.array(mx),
                "m2x": pa.array(m2x),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        h = hash64(t.column(key), 0xC0FF)
        return t.append_column("_part", pa.array((h % np.uint64(nb)).astype(np.int32)))

    def merge_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"])).sort(key)
        keys_np = df[key].to_numpy()
        change = np.zeros(len(df), dtype=bool)
        change[0] = True
        change[1:] = keys_np[1:] != keys_np[:-1]
        starts = np.flatnonzero(change)
        pn = df["pn"].to_numpy().astype(np.float64)
        n = np.add.reduceat(pn, starts)
        mx = np.add.reduceat(pn * df["mx"].to_numpy(), starts) / n
        ex = df["mx"].to_numpy() - np.repeat(mx, np.diff(np.append(starts, len(df))))
        m2x = np.add.reduceat(df["m2x"].to_numpy() + pn * ex * ex, starts)
        n_i = n.astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            std = np.where(n_i > 1, np.sqrt(m2x / np.maximum(n - 1.0, 1.0)), np.nan)
        kt = df[key].to_arrow()
        return pa.table(
            {
                key: kt.take(pa.array(starts, pa.int64())),
                "n": pa.array(n_i),
                "mean": pa.array(mx),
                "std": pa.array(std),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(merge_block, batch_format="pyarrow")
    )


def zscore_normalize(
    ds: Dataset,
    key: str,
    col: str,
    out_col: str = "z",
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key z-score normalization: ``z = (x − mean_key) / std_key``
    (sample stddev), the feature-scaling step before training.

    Two streaming passes: (1) :func:`grouped_mean_std` reduces the table to
    one stats row per key — keys are bounded (categories / shards / langs),
    so the stats table is broadcast ONCE via ``ray.put`` and every map task
    reads it zero-copy; (2) one ``map_batches`` pass applies the affine
    transform. No shuffle of data rows at any point. Rows whose key has
    n < 2 or zero variance get null ``z`` (SQL division by a null/0 stddev).
    For unbounded key domains (per-user at 100 TB), route both sides by
    ``hash(key) % nb`` and apply per partition instead of broadcasting.
    """
    import ray

    stats = grouped_mean_std(ds, key, col, num_blocks=num_blocks).to_pandas()
    keys = stats[key].to_numpy()
    order = np.argsort(keys)
    lut_ref = ray.put(
        (keys[order], stats["mean"].to_numpy()[order], stats["std"].to_numpy()[order])
    )

    def apply(t: pa.Table) -> pa.Table:
        k_sorted, mean_a, std_a = ray.get(lut_ref)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(k_sorted, kv)
        idx = np.clip(idx, 0, len(k_sorted) - 1)
        hit = k_sorted[idx] == kv
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (x - mean_a[idx]) / std_a[idx]
        z = np.where(hit & (std_a[idx] > 0), z, np.nan)
        return t.append_column(out_col, pa.array(z))

    return ds.map_batches(apply, batch_format="pyarrow")


def grouped_ols(ds: Dataset, key: str, x_col: str, y_col: str) -> "Dataset":
    """Grouped simple linear regression (slope / intercept / r²) from raw
    power sums — per-batch polars partials (n, Σx, Σy, Σxy, Σx², Σy²) then
    one tiny groupby-Sum, so the corpus is scanned once and only 6 doubles
    per (batch, key) move. The caller is responsible for centering/scaling
    ``x`` to a sane magnitude (raw epoch-µs squared overflows float64's
    exact-integer range; hours-since-origin is the convention the
    `value_trend_per_type` oracle uses on both sides).

    Returns a Dataset of (key, n, sx, sy, sxy, sxx, syy) partial sums —
    finalize with :func:`ols_finalize` (kept separate so callers can also
    derive correlation/forecast bands from the same sums).
    """

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key, x_col, y_col]))
        x, y = pl.col(x_col), pl.col(y_col)
        out = df.group_by(key).agg(
            pl.len().alias("n"),
            x.sum().alias("sx"),
            y.sum().alias("sy"),
            (x * y).sum().alias("sxy"),
            (x * x).sum().alias("sxx"),
            (y * y).sum().alias("syy"),
        )
        return out.to_arrow()

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
    )


def ols_finalize(sums: "pd.DataFrame", ndigits: int | None = 6) -> "pd.DataFrame":
    """(n, sx, sy, sxy, sxx, syy) → slope / intercept / r² per group.

    Explicit normal-equation formula — the SQL oracle computes the SAME
    expression from the same sums, so only float summation order differs.
    Degenerate groups (zero x-variance or y-variance) yield NaN, matching
    SQL division semantics under `round`.
    """
    import pandas as pd

    n = sums["n"].to_numpy(dtype=np.float64)
    sx, sy = sums["sx"].to_numpy(), sums["sy"].to_numpy()
    sxy, sxx, syy = sums["sxy"].to_numpy(), sums["sxx"].to_numpy(), sums["syy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        cov_n = n * sxy - sx * sy
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        slope = cov_n / var_x
        intercept = (sy - slope * sx) / n
        r2 = (cov_n * cov_n) / (var_x * var_y)
    out = pd.DataFrame(
        {
            "n": sums["n"].astype("int64"),
            "slope": slope,
            "intercept": intercept,
            "r2": r2,
        }
    )
    if ndigits is not None:
        for c in ("slope", "intercept", "r2"):
            out[c] = out[c].round(ndigits)
    return out


def jackknife_ols(ds: Dataset, fold_col: str, x_col: str, y_col: str) -> "pd.DataFrame":
    """Leave-one-fold-out OLS stability report (the delete-d jackknife /
    k-fold cross-fit): for every fold, the slope/intercept of the line fit
    on ALL OTHER folds. One corpus scan builds per-fold INTEGER sufficient
    statistics (n, Σx, Σy, Σx², Σxy — inputs must already be integer-valued
    int64, e.g. cents); the leave-out fit for fold f is just global−fold on
    each sum, so k fits cost one pass. Arbitrary-precision Python ints do
    the normal-equation cross products (n·Σxy overflows int64 at corpus
    scale; the SQL oracle mirrors with HUGEINT casts), and each coefficient
    is ONE exact-int ratio → double, bit-stable under the exact-hash gate.

    Returns a pandas frame (fold, train_n, slope, intercept) sorted by fold
    — fold-cardinality-bounded, so driver-side finalize is free.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([fold_col, x_col, y_col]))
        x, y = pl.col(x_col), pl.col(y_col)
        return (
            df.group_by(fold_col)
            .agg(
                pl.len().cast(pl.Int64).alias("pn"),
                x.sum().alias("sx"),
                y.sum().alias("sy"),
                (x * x).sum().alias("sxx"),
                (x * y).sum().alias("sxy"),
            )
            .to_arrow()
        )

    sums = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(fold_col)
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
        .sort_values(fold_col)
        .reset_index(drop=True)
    )
    tot = {c: int(sums[c].sum()) for c in ("n", "sx", "sy", "sxx", "sxy")}
    rows = []
    for _, r in sums.iterrows():
        n = tot["n"] - int(r["n"])
        sx, sy = tot["sx"] - int(r["sx"]), tot["sy"] - int(r["sy"])
        sxx, sxy = tot["sxx"] - int(r["sxx"]), tot["sxy"] - int(r["sxy"])
        den = n * sxx - sx * sx
        slope = float(n * sxy - sx * sy) / float(den) if den != 0 else float("nan")
        intercept = float(sy * sxx - sx * sxy) / float(den) if den != 0 else float("nan")
        rows.append(
            {"fold": r[fold_col], "train_n": n, "slope": slope, "intercept": intercept}
        )
    out = pd.DataFrame(rows)
    out["train_n"] = out["train_n"].astype("int64")
    return out


def minmax_normalize(
    ds: Dataset,
    key: str,
    col: str,
    out_col: str = "scaled",
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key min-max scaling: ``(x − min_key) / (max_key − min_key)`` —
    the bounded-range [0, 1] companion of :func:`zscore_normalize`, same
    two-pass shape: one grouped min/max reduce (bounded key domain →
    broadcast LUT via ``ray.put``), one shuffle-free ``map_batches`` apply.
    Keys with max == min (or a single row) get null. The division is one
    raw IEEE op over data values, so results hash bit-exactly against the
    SQL window oracle."""
    import ray
    from ray.data.aggregate import Max, Min

    stats = (
        ds.groupby(key)
        .aggregate(Min(col, alias_name="mn"), Max(col, alias_name="mx"))
        .to_pandas()
    )
    keys = stats[key].to_numpy()
    order = np.argsort(keys)
    lut_ref = ray.put(
        (keys[order], stats["mn"].to_numpy()[order], stats["mx"].to_numpy()[order])
    )

    def apply(t: pa.Table) -> pa.Table:
        k_sorted, mn, mx = ray.get(lut_ref)
        kv = t.column(key)
        if isinstance(kv, pa.ChunkedArray):
            kv = kv.combine_chunks()
        idx = np.searchsorted(k_sorted, kv.to_numpy(zero_copy_only=False))
        idx = np.clip(idx, 0, len(k_sorted) - 1)
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        span = mx[idx] - mn[idx]
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = (x - mn[idx]) / span
        bad = ~np.isfinite(scaled)
        return t.append_column(out_col, pa.array(scaled, mask=bad))

    return ds.map_batches(apply, batch_format="pyarrow")
