"""Exact grouped quantiles and quantile-based trimming (outlier clipping).

The sketch quantiles (state/kll.py, state/tdigest.py) are the 100-TB default:
mergeable partials, one narrow shuffle, bounded error. This module is their
EXACT counterpart for when downstream needs bit-reproducible cut points (e.g.
winsorizing a reward-model feature, trimming per-language length outliers
before packing training shards):

1. ``exact_grouped_quantiles`` — coarse hash-partition by the group keys
   (every group's rows land in exactly one partition), then ONE vectorized
   pass per partition: a single polars multi-key sort + numpy segment math
   picks all requested quantiles for all groups at once. No per-group Python
   calls (the map_groups-per-key trap, see topk.py), no global sort. The
   partition-per-task memory assumption is the same as windows.py and is
   sized by ``choose_num_blocks``.
2. ``quantile_trim`` — computes per-group [lo, hi] **discrete** quantile
   bounds (actual data values, so engine-portable: DuckDB ``quantile_disc``
   picks the identical element), collects that small one-row-per-group table
   to the driver (post-aggregation altitude, same contract as broadcast
   joins) and filters the stream with one broadcast polars join per batch.

Quantile conventions, verified against DuckDB 1.x:

- ``kind="disc"``: index ``ceil(q*n) - 1`` into the sorted group values ==
  DuckDB ``quantile_disc`` — an element of the multiset, exact float
  equality across engines.
- ``kind="cont"``: linear interpolation at position ``(n-1)*q`` == DuckDB
  ``quantile_cont`` / numpy default up to float addition order — round
  before hash-comparing.

NULL values in ``value_col`` are dropped first (SQL aggregate semantics);
a group whose values are ALL null is absent from the output (SQL would
return NULL — document mismatch, not hit by the test tables).

Reference parity: the reference engine (/root/reference/src/filter.rs) has
no aggregate surface; this is part of the [RULE] analytics inventory
(SURVEY.md §2.3 "Grouped quantile sketches" — exact twin).
"""

from __future__ import annotations

import math

import numpy as np
import polars as pl
import pyarrow as pa

from ray.data import Dataset

from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
from perfect_bloomfilter_ray.stages.topk import _multi_key_part


def _quantiles_block(
    keys: list[str], value_col: str, qs: list[float], kind: str, names: list[str]
):
    def fn(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.drop_columns(["_part"]))
            .drop_nulls([value_col])
            .sort([*keys, value_col])
        )
        v = df[value_col].to_numpy()
        n = len(v)
        change = np.zeros(n, dtype=bool)
        if n:
            change[0] = True
        for k in keys:
            a = df[k].to_numpy()
            change[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n))
        idx = pl.Series("_i", starts, dtype=pl.UInt32)
        out = df.select([pl.col(k).gather(idx) for k in keys])
        cols = []
        for q, name in zip(qs, names):
            if kind == "disc":
                pick = starts + np.maximum(np.ceil(q * counts).astype(np.int64) - 1, 0)
                vals = v[pick] if n else np.empty(0, dtype=np.float64)
            else:
                pos = (counts - 1) * q
                lo = np.floor(pos).astype(np.int64)
                hi = np.ceil(pos).astype(np.int64)
                if n:
                    vlo, vhi = v[starts + lo], v[starts + hi]
                    vals = vlo + (vhi - vlo) * (pos - lo)
                else:
                    vals = np.empty(0, dtype=np.float64)
            cols.append(pl.Series(name, vals.astype(np.float64)))
        return out.with_columns(cols).to_arrow()

    return fn


def exact_grouped_quantiles(
    ds: Dataset,
    keys: list[str] | str,
    value_col: str,
    qs: list[float],
    kind: str = "disc",
    names: list[str] | None = None,
    num_blocks: int | None = None,
) -> Dataset:
    """One row per ``keys`` group with an exact quantile column per ``q``.

    ``kind="disc"`` == DuckDB ``quantile_disc`` (element of the data, exact
    across engines); ``kind="cont"`` == ``quantile_cont`` (interpolated —
    round before comparing). See module docstring for the scale shape.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if kind not in ("disc", "cont"):
        raise ValueError(f"kind must be 'disc' or 'cont', got {kind!r}")
    names = names or [f"q{str(q).replace('0.', '')}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names must match qs")
    nb = choose_num_blocks(ds, num_blocks)

    def add_part(t: pa.Table) -> pa.Table:
        return _multi_key_part(t, keys, nb)

    cols = [*keys, value_col]
    return (
        ds.select_columns(cols)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(_quantiles_block(keys, value_col, qs, kind, names), batch_format="pyarrow")
    )


def grouped_quantiles_from_counts(
    ds: Dataset,
    keys: list[str] | str,
    value_col: str,
    qs: list[float],
    kind: str = "disc",
    names: list[str] | None = None,
):
    """Exact grouped quantiles for BOUNDED-CARDINALITY value columns via
    distinct-(keys, value) count partials.

    :func:`exact_grouped_quantiles` co-locates each group's ROWS in one
    task — the right shape when groups are numerous and individually small.
    When the grouping key is LOW-cardinality (e.g. ~5 languages over a
    10^12-row corpus) that contract breaks: one task would hold ~20% of the
    corpus. This variant changes the reduction instead of the partitioning:
    ``groupby(keys + [value]) → count`` is a NARROW shuffle whose output
    size is the number of distinct (group, value) pairs — for integer
    metrics (char counts, token counts) that is bounded by
    ``|groups| × |value domain|``, independent of row count — and the exact
    quantile falls out of the weighted distribution on the driver
    (post-aggregation altitude, same contract as broadcast-join small
    sides).

    Quantile conventions match :func:`exact_grouped_quantiles` / DuckDB:
    ``disc`` picks the element at rank ``ceil(q*n) - 1``; ``cont``
    interpolates at position ``(n-1)*q``. Returns a pandas DataFrame with
    one row per group (sorted by ``keys``), columns ``keys + names``.
    """
    import pandas as pd

    from ray.data.aggregate import Count

    keys = [keys] if isinstance(keys, str) else list(keys)
    if kind not in ("disc", "cont"):
        raise ValueError(f"kind must be 'disc' or 'cont', got {kind!r}")
    names = names or [f"q{str(q).replace('0.', '')}" for q in qs]
    if len(names) != len(qs):
        raise ValueError("names must match qs")

    counts = (
        ds.select_columns([*keys, value_col])
        .groupby([*keys, value_col])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
        .dropna(subset=[value_col])
        .sort_values([*keys, value_col])
        .reset_index(drop=True)
    )
    v = counts[value_col].to_numpy(dtype=np.float64)
    c = counts["_n"].to_numpy(dtype=np.int64)
    m = len(v)
    change = np.zeros(m, dtype=bool)
    if m:
        change[0] = True
    for k in keys:
        a = counts[k].to_numpy()
        change[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], m)
    out_rows = {k: counts[k].to_numpy()[starts] for k in keys}
    cum = np.cumsum(c)
    # total rows per group and cumulative-count base per group
    base = np.where(starts > 0, cum[starts - 1], 0)
    totals = cum[ends - 1] - base if m else np.empty(0, dtype=np.int64)

    def value_at_rank(r: np.ndarray) -> np.ndarray:
        # r is a 0-based per-group rank; map to global cumulative position
        pos = np.searchsorted(cum, base + r, side="right")
        return v[pos] if m else np.empty(0, dtype=np.float64)

    res = {}
    for q, name in zip(qs, names):
        if kind == "disc":
            rank = np.maximum(np.ceil(q * totals).astype(np.int64) - 1, 0)
            res[name] = value_at_rank(rank)
        else:
            p = (totals - 1) * q
            lo = np.floor(p).astype(np.int64)
            hi = np.ceil(p).astype(np.int64)
            vlo, vhi = value_at_rank(lo), value_at_rank(hi)
            res[name] = vlo + (vhi - vlo) * (p - lo)
    return pd.DataFrame({**out_rows, **res})


def quantile_trim(
    ds: Dataset,
    keys: list[str] | str,
    value_col: str,
    lo_q: float,
    hi_q: float,
    num_blocks: int | None = None,
) -> Dataset:
    """Keep rows whose ``value_col`` lies within the group's discrete
    [``lo_q``, ``hi_q``] quantiles (winsor-style outlier trim, inclusive).

    Bounds use ``kind="disc"`` so both cut points are actual data values —
    the boundary comparison is then bit-identical in any engine (the SQL
    oracle joins ``quantile_disc`` bounds and applies the same BETWEEN).

    The bounds table is one row per distinct group; collecting it to the
    driver and re-broadcasting is the same small-side contract as
    joins.lookup_join (documented driver-side materialization, NOT a
    full-data collect).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    bounds = exact_grouped_quantiles(
        ds, keys, value_col, [lo_q, hi_q], kind="disc", names=["_lo", "_hi"],
        num_blocks=num_blocks,
    )
    bounds_df = pl.from_arrow(pa.Table.from_pandas(bounds.to_pandas(), preserve_index=False))

    def trim(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        j = df.join(bounds_df, on=keys, how="left")
        keep = (pl.col(value_col) >= pl.col("_lo")) & (pl.col(value_col) <= pl.col("_hi"))
        return j.filter(keep).drop(["_lo", "_hi"]).to_arrow()

    return ds.map_batches(trim, batch_format="pyarrow")


def quantile_bin(
    ds: Dataset,
    keys: list[str] | str,
    value_col: str,
    n_bins: int = 4,
    bin_col: str = "bin",
    num_blocks: int | None = None,
) -> Dataset:
    """Equi-depth quantile binning: add a 0-based bin code per row, where
    bin ``b`` means the value exceeds exactly ``b`` of the group's
    ``n_bins - 1`` interior discrete quantile cut points — the standard
    feature-bucketing transform before gradient boosting / embedding-table
    lookup. Unlike ``ntile`` (equal ROW counts, order-dependent), bins are
    value-threshold based: equal values always land in the same bin.

    Cut points come from :func:`exact_grouped_quantiles` (``disc`` kind, so
    thresholds are actual data values and the comparison is engine-exact);
    the one-row-per-group threshold table broadcasts like
    :func:`quantile_trim`'s bounds. Null values bin as null.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = [i / n_bins for i in range(1, n_bins)]
    names = [f"_t{i}" for i in range(1, n_bins)]
    th = exact_grouped_quantiles(
        ds, keys, value_col, qs, kind="disc", names=names, num_blocks=num_blocks
    )
    th_df = pl.from_arrow(pa.Table.from_pandas(th.to_pandas(), preserve_index=False))

    def binfn(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        j = df.join(th_df, on=keys, how="left")
        if names:
            expr = sum((pl.col(value_col) > pl.col(nm)).cast(pl.Int64) for nm in names)
        else:  # n_bins == 1: everything is bin 0
            expr = pl.lit(0, dtype=pl.Int64)
        return j.with_columns(expr.alias(bin_col)).drop(names).to_arrow()

    return ds.map_batches(binfn, batch_format="pyarrow")


def histogram(
    ds: Dataset,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> Dataset:
    """Fixed-width histogram of ``col`` over ``[lo, hi)`` — the profiling /
    feature-binning primitive. Values outside the range (and nulls) are
    excluded, SQL-filter style; empty bins are omitted (GROUP BY semantics).

    Binning is ``floor((v − lo) / w)`` in float64 — bit-identical across
    engines, so the oracle compare is exact. One ``map_batches`` pass emits
    ≤ ``nbins`` partial-count rows per block (np.bincount); a tiny groupby
    sums them. No data-row shuffle. Output: ``(bin, bin_lo, bin_hi, n)``.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    w = (float(hi) - float(lo)) / int(nbins)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v < hi)]
        if len(v) == 0:
            return pa.table({"bin": pa.array([], pa.int64()), "pn": pa.array([], pa.int64())})
        b = np.floor((v - lo) / w).astype(np.int64)
        # float edge: v just below hi can round to nbins — clamp like SQL's
        # floor on the same double op would (it can't, bins are [0, nbins))
        b = np.minimum(b, nbins - 1)
        counts = np.bincount(b, minlength=0)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz.astype(np.int64)), "pn": pa.array(counts[nz].astype(np.int64))})

    def finish(t: pa.Table) -> pa.Table:
        b = t.column("bin").to_numpy()
        return pa.table(
            {
                "bin": t.column("bin"),
                "bin_lo": pa.array(lo + b * w),
                "bin_hi": pa.array(lo + (b + 1) * w),
                "n": t.column("n"),
            }
        )

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("pn", alias_name="n"))
        .map_batches(finish, batch_format="pyarrow")
    )


def robust_zscore(
    ds: Dataset,
    key: str,
    col: str,
    out_col: str = "rz",
    scale: float = 1.4826,
    num_blocks: int | None = None,
) -> Dataset:
    """Per-key robust z-score: ``(x − median) / (scale · MAD)`` with
    ``MAD = median(|x − median|)`` — the outlier score that (unlike
    mean/std) is immune to the outliers it is hunting. ``scale`` defaults
    to the normal-consistency constant 1.4826.

    Three streaming passes: exact grouped median (one slim value shuffle),
    a shuffle-free map computing ``|x − med|`` against the broadcast median
    LUT feeding the exact grouped MAD (second value shuffle), then a final
    shuffle-free scoring map against the broadcast (med, mad) LUT. The LUTs
    are one row per key — bounded-key contract, same as zscore_normalize.
    Keys with MAD == 0 (or unseen) get null.
    """
    import ray

    med = (
        exact_grouped_quantiles(ds, key, col, [0.5], kind="cont", names=["med"], num_blocks=num_blocks)
        .to_pandas()
        .sort_values(key)
    )
    med_keys = med[key].to_numpy()
    med_vals = med["med"].to_numpy().astype(np.float64)
    med_ref = ray.put((med_keys, med_vals))

    def absdev(t: pa.Table) -> pa.Table:
        k_sorted, m = ray.get(med_ref)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(k_sorted, kv), 0, len(k_sorted) - 1)
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({key: t.column(key), "_ad": pa.array(np.abs(x - m[idx]))})

    mad = (
        exact_grouped_quantiles(
            ds.map_batches(absdev, batch_format="pyarrow"),
            key,
            "_ad",
            [0.5],
            kind="cont",
            names=["mad"],
            num_blocks=num_blocks,
        )
        .to_pandas()
        .sort_values(key)
    )
    lut_ref = ray.put((med_keys, med_vals, mad["mad"].to_numpy().astype(np.float64)))

    def score(t: pa.Table) -> pa.Table:
        k_sorted, m, s = ray.get(lut_ref)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(k_sorted, kv), 0, len(k_sorted) - 1)
        hit = k_sorted[idx] == kv
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        denom = scale * s[idx]
        with np.errstate(invalid="ignore", divide="ignore"):
            rz = (x - m[idx]) / denom
        rz = np.where(hit & (denom > 0), rz, np.nan)
        return t.append_column(out_col, pa.array(rz))

    return ds.map_batches(score, batch_format="pyarrow")


def _two_sample_scan(
    ds: Dataset,
    value_col: str,
    group_col: str,
    num_buckets: int,
    bucket_fn,
):
    """Shared scaffold for exact two-sample rank statistics (KS, Mann-
    Whitney): collapse per batch to distinct ``(value, c0, c1)`` partial
    counts (the only corpus-sized exchange is distinct-value-wide), fold
    per-range-bucket net counts into O(num_buckets) driver-side carries,
    then run ``bucket_fn(v_sorted, c0_sorted, c1_sorted, carry0, carry1,
    n0, n1)`` per co-located bucket — it returns a dict of int64 scalars —
    and collect the one-row-per-bucket partials. NULL values are dropped.

    The only shuffles are keyed by the ~num_buckets int bucket ids — the
    final distinct-value collapse happens vectorized INSIDE each bucket
    group (a 600k-distinct-key hash groupby costs ~8s in Ray at sf0.1;
    the bucket-keyed shuffle + in-group polars collapse is ~6x cheaper).

    Returns ``(n0, n1, per_bucket_partials: pd.DataFrame | None)``.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def _drop_null(t: pa.Table) -> pa.Table:
        return t.filter(t.column(value_col).is_valid())

    ds = ds.map_batches(_drop_null, batch_format="pyarrow")
    mm = ds.aggregate(Min(value_col), Max(value_col))
    vmin, vmax = mm[f"min({value_col})"], mm[f"max({value_col})"]
    if vmin is None:
        return 0, 0, None
    width = (float(vmax) - float(vmin)) / num_buckets or 1.0

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([value_col, group_col]))
        out = (
            df.group_by(value_col)
            .agg(
                (pl.col(group_col) == 0).sum().cast(pl.Int64).alias("c0"),
                (pl.col(group_col) == 1).sum().cast(pl.Int64).alias("c1"),
            )
            .with_columns(
                ((pl.col(value_col) - vmin) / width)
                .floor()
                .clip(0, num_buckets - 1)
                .cast(pl.Int64)
                .alias("_bkt")
            )
        )
        return out.to_arrow()

    # per-batch distinct partials; feeds the net pass AND the bucket scan
    counts = ds.map_batches(partial, batch_format="pyarrow").materialize()

    nets = (
        counts.groupby("_bkt")
        .aggregate(Sum("c0", alias_name="n0"), Sum("c1", alias_name="n1"))
        .to_pandas()
        .sort_values("_bkt")
        .reset_index(drop=True)
    )
    n0, n1 = int(nets["n0"].sum()), int(nets["n1"].sum())
    carry0 = nets["n0"].cumsum().shift(1, fill_value=0).astype("int64")
    carry1 = nets["n1"].cumsum().shift(1, fill_value=0).astype("int64")
    carries = ray.put(
        {int(b): (int(a), int(c)) for b, a, c in zip(nets["_bkt"], carry0, carry1)}
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        ca0, ca1 = ray.get(carries)[int(t.column("_bkt")[0].as_py())]
        # final distinct-value collapse, vectorized inside the bucket group
        g = (
            pl.from_arrow(t.select([value_col, "c0", "c1"]))
            .group_by(value_col)
            .agg(pl.col("c0").sum(), pl.col("c1").sum())
            .sort(value_col)
        )
        v = g[value_col].to_numpy()
        c0 = g["c0"].to_numpy().astype(np.int64)
        c1 = g["c1"].to_numpy().astype(np.int64)
        stats = bucket_fn(v, c0, c1, ca0, ca1, n0, n1)
        return pa.table({k: pa.array([int(x)], pa.int64()) for k, x in stats.items()})

    parts = (
        counts.groupby("_bkt").map_groups(per_bucket, batch_format="pyarrow").to_pandas()
    )
    return n0, n1, parts


def ks_two_sample(
    ds: Dataset,
    value_col: str,
    group_col: str,
    num_buckets: int = 1024,
) -> dict:
    """Distributed EXACT two-sample Kolmogorov-Smirnov statistic between the
    ``group_col == 0`` and ``group_col == 1`` value distributions.

    ``D = max_x |F0(x) - F1(x)|`` needs a global ordered ECDF scan — the
    same shape as an all-to-one sort. Instead (:func:`_two_sample_scan`):
    a distinct-value collapse, an O(num_buckets) driver carry fold (the
    same carry decomposition as ``windows.peak_concurrency``), and a
    per-bucket vectorized scan whose maxima reduce to the global max.
    Driver state is O(num_buckets); the distinct-value table never leaves
    the cluster.

    Exactness: the statistic is returned as the integer numerator
    ``ks_num = max |cum0*n1 - cum1*n0|`` with denominators ``n0, n1``
    (``D = ks_num / (n0*n1)``) — integer arithmetic end to end, so the SQL
    oracle hashes bit-identically. int64-safe while ``n0*n1 < 2^63``
    (~3e9 rows per side); beyond that, widen to the float path downstream.

    NULL values are dropped. If either side is empty, ``ks_num`` degrades
    to the one-sided max (D undefined statistically; documented, not hit).
    """

    def bucket_stats(v, c0, c1, ca0, ca1, n0, n1):
        cum0 = ca0 + np.cumsum(c0)
        cum1 = ca1 + np.cumsum(c1)
        return {"num": np.abs(cum0 * n1 - cum1 * n0).max()}

    n0, n1, parts = _two_sample_scan(ds, value_col, group_col, num_buckets, bucket_stats)
    if parts is None:
        return {"n0": 0, "n1": 0, "ks_num": 0}
    return {"n0": n0, "n1": n1, "ks_num": int(parts["num"].max())}


def mannwhitney_u(
    ds: Dataset,
    value_col: str,
    group_col: str,
    num_buckets: int = 1024,
) -> dict:
    """Distributed EXACT Mann-Whitney U (Wilcoxon rank-sum) statistic with
    midrank tie handling, via the same distinct-value segmented scan as
    :func:`ks_two_sample` — no global sort, O(num_buckets) driver state.

    Integer arithmetic end to end: with ``before(x)`` = rows (either group)
    strictly below x and ``m(x) = c0+c1`` the tie-group size, the doubled
    rank sum of group 1 is ``2*R1 = sum_x c1 * (2*before + m + 1)`` and
    ``two_u1 = 2*R1 - n1*(n1+1)`` (so ``U1 = two_u1 / 2``). ``tie_sum =
    sum m*(m^2-1)`` feeds the normal-approximation variance downstream:
    ``Var(U) = n0*n1/12 * ((n+1) - tie_sum/(n*(n-1)))``. int64-safe while
    ``n0 * n1 < 2^62``.
    """

    def bucket_stats(v, c0, c1, ca0, ca1, n0, n1):
        m = c0 + c1
        before = (ca0 + ca1) + np.concatenate([[0], np.cumsum(m)[:-1]])
        two_r1 = (c1 * (2 * before + m + 1)).sum()
        return {"two_r1": two_r1, "tie_sum": (m * (m * m - 1)).sum()}

    n0, n1, parts = _two_sample_scan(ds, value_col, group_col, num_buckets, bucket_stats)
    if parts is None:
        return {"n0": 0, "n1": 0, "two_u1": 0, "tie_sum": 0}
    return {
        "n0": n0,
        "n1": n1,
        "two_u1": int(parts["two_r1"].sum()) - n1 * (n1 + 1),
        "tie_sum": int(parts["tie_sum"].sum()),
    }


def dense_midranks(
    ds: Dataset,
    value_col: str,
    num_buckets: int = 1024,
    out_col: str = "two_rank",
    minmax: tuple | None = None,
):
    """Distributed midrank assignment: a ``(value, two_rank)`` Dataset where
    ``two_rank = 2 * rank`` (doubled so tied midranks stay exact integers:
    ``2*before + m + 1`` for a tie group of size ``m`` with ``before`` rows
    strictly below). Same shape as :func:`_two_sample_scan`: distinct-value
    collapse, O(num_buckets) driver carry fold, per-bucket vectorized scan.
    The rank table stays distributed — join it back to rows by value.

    ``minmax`` skips the min/max pass when the caller already knows the
    value range (it only sizes range buckets — any superset works).

    Returns ``(ranks_ds, n_rows, n_distinct)``. NULL values are dropped.
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def _drop_null(t: pa.Table) -> pa.Table:
        return t.filter(t.column(value_col).is_valid())

    ds = ds.map_batches(_drop_null, batch_format="pyarrow")
    if minmax is None:
        mm = ds.aggregate(Min(value_col), Max(value_col))
        vmin, vmax = mm[f"min({value_col})"], mm[f"max({value_col})"]
    else:
        vmin, vmax = minmax
    if vmin is None:
        return None, 0, 0
    width = (float(vmax) - float(vmin)) / num_buckets or 1.0

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([value_col]))
        return (
            df.group_by(value_col)
            .len(name="m")
            .with_columns(
                pl.col("m").cast(pl.Int64),
                ((pl.col(value_col) - vmin) / width)
                .floor()
                .clip(0, num_buckets - 1)
                .cast(pl.Int64)
                .alias("_bkt"),
            )
            .to_arrow()
        )

    # per-batch distinct partials; the only shuffles key on the int bucket
    # ids (same rationale as _two_sample_scan — a wide distinct-key groupby
    # is ~6x dearer than a bucket-keyed shuffle + in-group collapse)
    counts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    nets = (
        counts.groupby("_bkt")
        .aggregate(Sum("m", alias_name="m"))
        .to_pandas()
        .sort_values("_bkt")
        .reset_index(drop=True)
    )
    n = int(nets["m"].sum())
    carry = nets["m"].cumsum().shift(1, fill_value=0).astype("int64")
    carries = ray.put({int(b): int(c) for b, c in zip(nets["_bkt"], carry)})

    def per_bucket(t: pa.Table) -> pa.Table:
        ca = ray.get(carries)[int(t.column("_bkt")[0].as_py())]
        g = (
            pl.from_arrow(t.select([value_col, "m"]))
            .group_by(value_col)
            .agg(pl.col("m").sum())
            .sort(value_col)
        )
        v = g[value_col].to_numpy()
        m = g["m"].to_numpy().astype(np.int64)
        before = ca + np.concatenate([[0], np.cumsum(m)[:-1]])
        two_rank = 2 * before + m + 1
        return pa.table({value_col: pa.array(v), out_col: pa.array(two_rank)})

    ranks = counts.groupby("_bkt").map_groups(per_bucket, batch_format="pyarrow")
    # upper bound on distinct count (per-batch partial rows), cheap via
    # materialized metadata — conservative for broadcast-vs-join gating
    return ranks, n, counts.count()


def spearman_rho(
    ds: Dataset,
    x_col: str,
    y_col: str,
    num_buckets: int = 1024,
) -> dict:
    """Distributed EXACT Spearman rank correlation (midrank ties) between
    two columns: Pearson correlation of the doubled midranks, which are
    exact integers (:func:`dense_midranks`), so every moment sum is integer
    arithmetic and the final rho is one fixed float expression over exact
    int64 sums — bit-reproducible against a SQL oracle.

    Shape: two distinct-value rank scans, then the rank tables attach back
    to rows by value — size-gated: a distinct-value set under
    ``broadcast_max_distinct`` broadcasts as a sorted-LUT searchsorted map
    (shuffle-free; the common case — quantity-like columns have tiny
    cardinality), an unbounded one goes through a hash co-partitioned join
    (never on the driver). Then map-side integer moment partials and one
    tiny reduce. int64-exact while ``n * (2n)^2 < 2^63`` (n ≲ 1.2e6 rows);
    beyond that use the float moment path (stages/agg.grouped_corr).

    Rows with a NULL in either column are dropped (SQL corr semantics).
    """
    import ray

    from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks

    broadcast_max_distinct = 1 << 20

    def _drop_null(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(
            pc.and_(t.column(x_col).is_valid(), t.column(y_col).is_valid())
        )

    # two-column projection only; feeds two rank scans + the join (spillable)
    rows = ds.select_columns([x_col, y_col]).map_batches(
        _drop_null, batch_format="pyarrow"
    ).materialize()
    from ray.data.aggregate import Max, Min

    mm = rows.aggregate(Min(x_col), Max(x_col), Min(y_col), Max(y_col))
    rx, n, ndx = dense_midranks(
        rows, x_col, num_buckets, out_col="trx",
        minmax=(mm[f"min({x_col})"], mm[f"max({x_col})"]),
    )
    ry, _, ndy = dense_midranks(
        rows, y_col, num_buckets, out_col="try_",
        minmax=(mm[f"min({y_col})"], mm[f"max({y_col})"]),
    )
    if n == 0:
        return {"n": 0, "s1": 0, "s2": 0, "s11": 0, "s22": 0, "s12": 0, "rho": 0.0}

    def _attach(j: Dataset, ranks: Dataset, key: str, out_col: str, nd: int) -> Dataset:
        if nd <= broadcast_max_distinct:
            rt = ranks.to_pandas()
            vals = rt[key].to_numpy()
            order = np.argsort(vals)
            lut = ray.put((vals[order], rt[out_col].to_numpy().astype(np.int64)[order]))

            def mapfn(t: pa.Table) -> pa.Table:
                v_sorted, r_sorted = ray.get(lut)
                x = t.column(key).to_numpy()
                idx = np.searchsorted(v_sorted, x)
                return t.append_column(out_col, pa.array(r_sorted[idx]))

            return j.map_batches(mapfn, batch_format="pyarrow")
        nb = choose_num_blocks(j)
        return j.join(ranks, "inner", num_partitions=nb, on=(key,))

    j = _attach(rows, rx, x_col, "trx", ndx)
    j = _attach(j, ry, y_col, "try_", ndy)

    def moments(t: pa.Table) -> pa.Table:
        a = t.column("trx").to_numpy().astype(np.int64)
        b = t.column("try_").to_numpy().astype(np.int64)
        return pa.table(
            {
                "pn": pa.array([len(a)], pa.int64()),
                "s1": pa.array([int(a.sum())], pa.int64()),
                "s2": pa.array([int(b.sum())], pa.int64()),
                "s11": pa.array([int((a * a).sum())], pa.int64()),
                "s22": pa.array([int((b * b).sum())], pa.int64()),
                "s12": pa.array([int((a * b).sum())], pa.int64()),
            }
        )

    s = j.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n_, s1, s2 = int(s["pn"]), int(s["s1"]), int(s["s2"])
    s11, s22, s12 = int(s["s11"]), int(s["s22"]), int(s["s12"])
    num = float(n_) * float(s12) - float(s1) * float(s2)
    den = np.sqrt(float(n_) * float(s11) - float(s1) * float(s1)) * np.sqrt(
        float(n_) * float(s22) - float(s2) * float(s2)
    )
    rho = num / den if den > 0 else 0.0
    return {"n": n_, "s1": s1, "s2": s2, "s11": s11, "s22": s22, "s12": s12, "rho": rho}


def kendall_tau_b(ds: Dataset, x_col: str, y_col: str) -> dict:
    """EXACT Kendall tau-b between two LOW-CARDINALITY ordinal columns —
    the tie-corrected rank-concordance twin of :func:`spearman_rho`.

    The whole statistic is a function of the (x, y) contingency table, so
    the corpus is scanned once (distributed groupby count — exact) and the
    O(|X|·|Y|) cell matrix finishes on the driver with 2-D prefix sums:
    ``nc = Σ M[i,j]·P[<i,<j]`` (concordant), ``nd = Σ M[i,j]·P[<i,>j]``
    (discordant), tie terms from the row/column marginals. Every count is an
    exact int64 (bounds: each product ≤ n², safe to n ≈ 3e9 rows); tau-b is
    ONE fixed float expression over them, mirrored term-for-term by a SQL
    cell self-join oracle. The low-cardinality assumption (quantities,
    discount steps, ratings — not prices) is what makes this exact at 100 TB:
    driver state is cells, never rows.

    Returns ``{n, s, n0, n1, n2, tau_b}`` with ``s = nc − nd``,
    ``n0 = C(n,2)``, ``n1/n2`` = tied pairs in x / y, and
    ``tau_b = s / sqrt((n0−n1)·(n0−n2))``.
    """
    from ray.data.aggregate import Count

    cells = (
        ds.select_columns([x_col, y_col])
        .groupby([x_col, y_col])
        .aggregate(Count(alias_name="m"))
        .to_pandas()
    )
    xs = np.sort(cells[x_col].unique())
    ys = np.sort(cells[y_col].unique())
    xi = np.searchsorted(xs, cells[x_col].to_numpy())
    yi = np.searchsorted(ys, cells[y_col].to_numpy())
    M = np.zeros((len(xs), len(ys)), dtype=np.int64)
    M[xi, yi] = cells["m"].to_numpy().astype(np.int64)
    # P[i, j] = count of rows with x < x_i AND y < y_j (strict 2-D prefix)
    cum = M.cumsum(axis=0).cumsum(axis=1)
    P = np.zeros_like(cum)
    P[1:, 1:] = cum[:-1, :-1]
    # Q[i, j] = count of rows with x < x_i AND y > y_j (strict suffix in y)
    cum_rev = M[:, ::-1].cumsum(axis=0).cumsum(axis=1)[:, ::-1]
    Q = np.zeros_like(cum_rev)
    Q[1:, :-1] = cum_rev[:-1, 1:]
    nc = int((M * P).sum())
    nd = int((M * Q).sum())
    n = int(M.sum())
    row, col = M.sum(axis=1), M.sum(axis=0)
    n0 = n * (n - 1) // 2
    n1 = int((row * (row - 1) // 2).sum())
    n2 = int((col * (col - 1) // 2).sum())
    s = nc - nd
    den = math.sqrt(float(n0 - n1) * float(n0 - n2))
    tau = float(s) / den if den > 0 else 0.0
    return {"n": n, "s": s, "n0": n0, "n1": n1, "n2": n2, "tau_b": tau}


def ks_group_vs_rest(
    ds: Dataset,
    value_col: str,
    group_col: str,
    num_buckets: int = 1024,
):
    """Per-group distribution-drift matrix: for every category ``g`` of
    ``group_col`` (bounded cardinality — event types, languages, sources),
    the EXACT two-sample KS statistic of group-g values vs all other rows,
    in ONE corpus scan — the "which segment drifted" monitoring report.

    Same segmented machinery as :func:`ks_two_sample`, vectorized across
    groups: per-batch distinct ``(value, group, c)`` partials, per-bucket
    G-vector carries folded on the driver (O(num_buckets * G) state), and a
    per-bucket scan computing all G one-vs-rest maxima from one cumulative
    count matrix. Integer numerators: ``D_g = ks_num / (n_g * (n - n_g))``.

    ONE corpus scan: the distinct-pair partial pass is the only
    corpus-sized read; group list, n_g, value min/max and the bucket key
    all derive from the (much smaller) materialized partials table.

    Returns a pandas frame ``(group, n_g, ks_num)`` sorted by group.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column(value_col).is_valid())
        if len(t) == 0:
            return pa.table(
                {
                    value_col: pa.array([], t.schema.field(value_col).type),
                    group_col: pa.array([], t.schema.field(group_col).type),
                    "c": pa.array([], pa.int64()),
                }
            )
        df = pl.from_arrow(t.select([value_col, group_col]))
        return (
            df.group_by([value_col, group_col])
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .to_arrow()
        )

    # the ONLY corpus-sized pass; everything below reads the distinct table
    pairs = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        return pd.DataFrame({"group": [], "n_g": [], "ks_num": []})

    sums = (
        pairs.groupby(group_col)
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .dropna(subset=[group_col])
    )
    groups = sorted(sums[group_col])
    gidx = {g: i for i, g in enumerate(groups)}
    G = len(groups)
    mm = pairs.aggregate(Min(value_col), Max(value_col))
    vmin, vmax = mm[f"min({value_col})"], mm[f"max({value_col})"]
    if vmin is None or G == 0:
        return pd.DataFrame({"group": [], "n_g": [], "ks_num": []})
    width = (float(vmax) - float(vmin)) / num_buckets or 1.0

    def add_bkt(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = np.clip(np.floor((v - vmin) / width), 0, num_buckets - 1).astype(np.int64)
        return t.append_column("_bkt", pa.array(bkt))

    counts = pairs.map_batches(add_bkt, batch_format="pyarrow")

    nets = (
        counts.groupby(["_bkt", group_col])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    n_g = np.zeros(G, np.int64)
    for g, c in nets.groupby(group_col)["c"].sum().items():
        n_g[gidx[g]] = int(c)
    n = int(n_g.sum())
    # per-bucket per-group carries: cumulative counts of all lower buckets
    piv = (
        nets.pivot_table(index="_bkt", columns=group_col, values="c", fill_value=0)
        .reindex(columns=groups, fill_value=0)
        .sort_index()
    )
    cum = piv.cumsum().shift(1, fill_value=0).to_numpy().astype(np.int64)
    carries = ray.put({int(b): cum[i] for i, b in enumerate(piv.index)})

    def per_bucket(t: pa.Table) -> pa.Table:
        ca = ray.get(carries)[int(t.column("_bkt")[0].as_py())]
        g = (
            pl.from_arrow(t.select([value_col, group_col, "c"]))
            .group_by([value_col, group_col])
            .agg(pl.col("c").sum())
            .sort(value_col)
        )
        v = g[value_col].to_numpy()
        uniq, vcode = np.unique(v, return_inverse=True)
        gc = np.array([gidx[x] for x in g[group_col].to_list()], np.int64)
        M = np.zeros((len(uniq), G), np.int64)
        np.add.at(M, (vcode, gc), g["c"].to_numpy().astype(np.int64))
        cumg = ca[None, :] + np.cumsum(M, axis=0)
        cumtot = cumg.sum(axis=1, keepdims=True)
        num = np.abs(cumg * (n - n_g)[None, :] - (cumtot - cumg) * n_g[None, :])
        best = num.max(axis=0)
        return pa.table(
            {f"g{i}": pa.array([int(best[i])], pa.int64()) for i in range(G)}
        )

    parts = counts.groupby("_bkt").map_groups(per_bucket, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {
            "group": groups,
            "n_g": n_g,
            "ks_num": [int(parts[f"g{i}"].max()) for i in range(G)],
        }
    )


def weighted_grouped_quantiles(
    ds: Dataset,
    key_col: str,
    value_col: str,
    weight_col: str,
    qs: list[tuple[int, int]],
) -> pd.DataFrame:
    """EXACT weighted lower quantiles per group, for integer weights:
    wq(q) = min{ v : cumweight(<= v) * q_den >= q_num * totalweight } —
    every comparison is pure int64, the returned value is a data value, so
    the result is bitwise reproducible and matches a SQL cumulative-window
    oracle exactly.

    Scale shape: each batch collapses to distinct ``(key, value) -> weight
    sum`` partials (the only corpus-sized exchange is distinct-pair wide),
    one key-keyed groupby co-locates a group's distinct values, and the
    cumulative scan is a vectorized sort+cumsum+searchsorted inside the
    group. ``qs`` are exact rationals (num, den).
    """
    import polars as pl

    def partial(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([key_col, value_col, weight_col]))
            .drop_nulls([value_col])
            .group_by([key_col, value_col])
            .agg(pl.col(weight_col).sum().cast(pl.Int64).alias("_w"))
            .to_arrow()
        )

    def per_key(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select([key_col, value_col, "_w"]))
            .group_by(value_col)
            .agg(pl.col("_w").sum())
            .sort(value_col)
        )
        v = df[value_col].to_numpy()
        cum = np.cumsum(df["_w"].to_numpy().astype(np.int64))
        tot = int(cum[-1]) if len(cum) else 0
        if tot == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "q_num": pa.array([], pa.int64()),
                    "q_den": pa.array([], pa.int64()),
                    "wq": pa.array([], t.schema.field(value_col).type),
                }
            )
        keys, nums, dens, vals = [], [], [], []
        for qn, qd in qs:
            # first index where cum * qd >= qn * tot (int64-exact)
            pos = int(np.searchsorted(cum * qd, qn * tot, side="left"))
            pos = min(pos, len(v) - 1)
            keys.append(t.column(key_col)[0].as_py())
            nums.append(qn)
            dens.append(qd)
            vals.append(v[pos])
        return pa.table(
            {
                key_col: pa.array(keys, t.schema.field(key_col).type),
                "q_num": pa.array(nums, pa.int64()),
                "q_den": pa.array(dens, pa.int64()),
                "wq": pa.array(np.array(vals)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(per_key, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values([key_col, "q_den", "q_num"]).reset_index(drop=True)


def wasserstein_group_vs_rest(
    ds: Dataset,
    value_col: str,
    group_col: str,
    num_buckets: int = 1024,
    scale: int = 100,
):
    """Per-group EXACT 1-Wasserstein (earth-mover) drift vs the rest of the
    corpus — the SUM counterpart of :func:`ks_group_vs_rest`'s max:
    ``W1(g) = ∫ |F_g − F_rest| dx``. Values are fixed-pointed first
    (``floor(value·scale)`` — the identical IEEE op on both engine and
    oracle sides), so every term is pure int64:
    ``w1_num(g) = Σ_i |cum_g·(n−n_g) − (cum_rest)·n_g| · (x_{i+1} − x_i)``
    over consecutive distinct merged values, and
    ``W1(g) = w1_num / (scale · n_g · (n − n_g))``. Bit-exact against the
    SQL window oracle; int64 range bounds documented by the census contract
    (n·span·counts must stay < 2^63 — holds through sf0.1 with margin).

    Same ONE-corpus-scan shape as the KS matrix: distinct ``(value, group,
    c)`` partials, per-bucket cumulative-carry vectors folded on the driver
    (O(num_buckets·G)), per-bucket internal gap sums computed
    independently, and the BETWEEN-bucket gap terms resolved on the driver
    from each bucket's (first_x, last_x) and the entry carries.

    Returns a pandas frame ``(group, n_g, w1_num)`` sorted by group.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column(value_col).is_valid())
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.floor(v * scale).astype(np.int64)
        tt = pa.table({"_x": pa.array(x), group_col: t.column(group_col)})
        return (
            pl.from_arrow(tt)
            .group_by(["_x", group_col])
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .to_arrow()
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        return pd.DataFrame({"group": [], "n_g": [], "w1_num": []})

    sums = (
        pairs.groupby(group_col)
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .dropna(subset=[group_col])
    )
    groups = sorted(sums[group_col])
    gidx = {g: i for i, g in enumerate(groups)}
    G = len(groups)
    mm = pairs.aggregate(Min("_x"), Max("_x"))
    vmin, vmax = mm["min(_x)"], mm["max(_x)"]
    if vmin is None or G == 0:
        return pd.DataFrame({"group": [], "n_g": [], "w1_num": []})
    width = max(1, (int(vmax) - int(vmin) + 1) // num_buckets)

    def add_bkt(t: pa.Table) -> pa.Table:
        x = t.column("_x").to_numpy(zero_copy_only=False)
        bkt = np.minimum((x - int(vmin)) // width, num_buckets - 1).astype(np.int64)
        return t.append_column("_bkt", pa.array(bkt))

    counts = pairs.map_batches(add_bkt, batch_format="pyarrow")

    nets = (
        counts.groupby(["_bkt", group_col])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    n_g = np.zeros(G, np.int64)
    for g, c in nets.groupby(group_col)["c"].sum().items():
        n_g[gidx[g]] = int(c)
    n = int(n_g.sum())
    piv = (
        nets.pivot_table(index="_bkt", columns=group_col, values="c", fill_value=0)
        .reindex(columns=groups, fill_value=0)
        .sort_index()
    )
    cum = piv.cumsum().shift(1, fill_value=0).to_numpy().astype(np.int64)
    carries = ray.put({int(b): cum[i] for i, b in enumerate(piv.index)})

    def per_bucket(t: pa.Table) -> pa.Table:
        ca = ray.get(carries)[int(t.column("_bkt")[0].as_py())]
        g = (
            pl.from_arrow(t.select(["_x", group_col, "c"]))
            .group_by(["_x", group_col])
            .agg(pl.col("c").sum())
            .sort("_x")
        )
        x = g["_x"].to_numpy()
        uniq, vcode = np.unique(x, return_inverse=True)
        gc = np.array([gidx[v] for v in g[group_col].to_list()], np.int64)
        M = np.zeros((len(uniq), G), np.int64)
        np.add.at(M, (vcode, gc), g["c"].to_numpy().astype(np.int64))
        cumg = ca[None, :] + np.cumsum(M, axis=0)
        cumtot = cumg.sum(axis=1, keepdims=True)
        num = np.abs(cumg * (n - n_g)[None, :] - (cumtot - cumg) * n_g[None, :])
        gaps = np.diff(uniq)  # internal gaps only; boundary gaps fold on driver
        seg = (num[:-1] * gaps[:, None]).sum(axis=0) if len(uniq) > 1 else np.zeros(G, np.int64)
        cols = {f"g{i}": pa.array([int(seg[i])], pa.int64()) for i in range(G)}
        cols["_first_x"] = pa.array([int(uniq[0])], pa.int64())
        cols["_last_x"] = pa.array([int(uniq[-1])], pa.int64())
        cols["_b"] = pa.array([int(t.column("_bkt")[0].as_py())], pa.int64())
        return pa.table(cols)

    parts = (
        counts.groupby("_bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
        .to_pandas()
        .sort_values("_b")
        .reset_index(drop=True)
    )
    w1 = parts[[f"g{i}" for i in range(G)]].to_numpy().astype(np.int64).sum(axis=0)
    # between-bucket segments: |F diff| is constant across the gap and equals
    # the entry-carry numerator of the LATER bucket
    carry_map = {int(b): cum[i] for i, b in enumerate(piv.index)}
    for j in range(1, len(parts)):
        b = int(parts.loc[j, "_b"])
        ca = carry_map[b]
        ct = int(ca.sum())
        num = np.abs(ca * (n - n_g) - (ct - ca) * n_g)
        gap = int(parts.loc[j, "_first_x"]) - int(parts.loc[j - 1, "_last_x"])
        w1 += num * gap
    return pd.DataFrame({"group": groups, "n_g": n_g, "w1_num": w1})


def kuiper_group_vs_rest(
    ds: Dataset,
    value_col: str,
    group_col: str,
    num_buckets: int = 1024,
):
    """Per-group Kuiper drift statistic vs the rest: ``V = D+ + D−`` where
    ``D+ = sup(F_g − F_rest)`` and ``D− = sup(F_rest − F_g)`` — unlike the
    KS max it weighs both tails equally (and is rotation-invariant on
    circular domains), the classic complement for detecting median-shift
    vs tail-shift drift. Integer numerators like the KS matrix:
    ``v_num = max(0, max(cum_g·(n−n_g) − cum_rest·n_g)) +
    max(0, max(cum_rest·n_g − cum_g·(n−n_g)))`` and
    ``V_g = v_num / (n_g·(n−n_g))``. Same ONE-corpus-scan bucket-carry
    machinery as :func:`ks_group_vs_rest`; per-bucket SIGNED maxima fold
    on the driver.

    Returns a pandas frame ``(group, n_g, v_num)`` sorted by group.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(t.column(value_col).is_valid())
        if len(t) == 0:
            return pa.table(
                {
                    value_col: pa.array([], t.schema.field(value_col).type),
                    group_col: pa.array([], t.schema.field(group_col).type),
                    "c": pa.array([], pa.int64()),
                }
            )
        df = pl.from_arrow(t.select([value_col, group_col]))
        return (
            df.group_by([value_col, group_col])
            .len(name="c")
            .with_columns(pl.col("c").cast(pl.Int64))
            .to_arrow()
        )

    pairs = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        return pd.DataFrame({"group": [], "n_g": [], "v_num": []})

    sums = (
        pairs.groupby(group_col)
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .dropna(subset=[group_col])
    )
    groups = sorted(sums[group_col])
    gidx = {g: i for i, g in enumerate(groups)}
    G = len(groups)
    mm = pairs.aggregate(Min(value_col), Max(value_col))
    vmin, vmax = mm[f"min({value_col})"], mm[f"max({value_col})"]
    if vmin is None or G == 0:
        return pd.DataFrame({"group": [], "n_g": [], "v_num": []})
    width = (float(vmax) - float(vmin)) / num_buckets or 1.0

    def add_bkt(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        bkt = np.clip(np.floor((v - vmin) / width), 0, num_buckets - 1).astype(np.int64)
        return t.append_column("_bkt", pa.array(bkt))

    counts = pairs.map_batches(add_bkt, batch_format="pyarrow")
    nets = (
        counts.groupby(["_bkt", group_col])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    n_g = np.zeros(G, np.int64)
    for g, c in nets.groupby(group_col)["c"].sum().items():
        n_g[gidx[g]] = int(c)
    n = int(n_g.sum())
    piv = (
        nets.pivot_table(index="_bkt", columns=group_col, values="c", fill_value=0)
        .reindex(columns=groups, fill_value=0)
        .sort_index()
    )
    cum = piv.cumsum().shift(1, fill_value=0).to_numpy().astype(np.int64)
    carries = ray.put({int(b): cum[i] for i, b in enumerate(piv.index)})

    def per_bucket(t: pa.Table) -> pa.Table:
        ca = ray.get(carries)[int(t.column("_bkt")[0].as_py())]
        g = (
            pl.from_arrow(t.select([value_col, group_col, "c"]))
            .group_by([value_col, group_col])
            .agg(pl.col("c").sum())
            .sort(value_col)
        )
        v = g[value_col].to_numpy()
        uniq, vcode = np.unique(v, return_inverse=True)
        gc = np.array([gidx[x] for x in g[group_col].to_list()], np.int64)
        M = np.zeros((len(uniq), G), np.int64)
        np.add.at(M, (vcode, gc), g["c"].to_numpy().astype(np.int64))
        cumg = ca[None, :] + np.cumsum(M, axis=0)
        cumtot = cumg.sum(axis=1, keepdims=True)
        signed = cumg * (n - n_g)[None, :] - (cumtot - cumg) * n_g[None, :]
        dpos = signed.max(axis=0)
        dneg = (-signed).max(axis=0)
        cols = {f"p{i}": pa.array([int(dpos[i])], pa.int64()) for i in range(G)}
        cols.update({f"m{i}": pa.array([int(dneg[i])], pa.int64()) for i in range(G)})
        return pa.table(cols)

    parts = counts.groupby("_bkt").map_groups(per_bucket, batch_format="pyarrow").to_pandas()
    v_num = [
        max(0, int(parts[f"p{i}"].max())) + max(0, int(parts[f"m{i}"].max()))
        for i in range(G)
    ]
    return pd.DataFrame({"group": groups, "n_g": n_g, "v_num": v_num})
