"""Distributed k-means (full Lloyd iterations) over an embedding column.

Unlike the IVF coarse quantizer (stages/ann.py), which fits on a driver-side
SAMPLE, this is the full clustering loop over the whole Dataset — the shape
a curation pipeline uses for topic bucketing, semantic dedup partitioning,
or diversity-aware sampling:

- init: deterministic k-means++ seeding on a driver-side sample;
- per iteration: centroids broadcast once via ``ray.put``; one
  ``map_batches`` pass emits ONE ``(cluster, n, dim-wise sum, tag)`` partial
  row per cluster per block (so only ``k × blocks`` tiny rows leave the
  tasks — never the assignments); the driver merges partials **in sorted
  (cluster, tag) order** so the float accumulation is deterministic
  run-to-run; empty clusters keep their previous centroid.
- final pass: per-cluster sizes and inertia (sum of squared distances).

Assignments are argmin over squared Euclidean distance, ties to the lowest
cluster id (numpy argmin first-hit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from perfect_bloomfilter_ray.stages.centroids import _vectors


def _pp_init(sample: np.ndarray, k: int, seed: int) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii 2007) on the driver sample:
    D²-weighted sequential picks — near-certain one-seed-per-cluster on
    separated data, where uniform seeding routinely double-seeds a blob and
    Lloyd gets stuck in the split-merge local optimum. Deterministic for a
    given (sample, seed)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    first = int(rng.integers(n))
    cents = [sample[first].astype(np.float64)]
    d2 = ((sample - cents[0]) ** 2).sum(axis=1)
    for _ in range(min(k, n) - 1):
        tot = d2.sum()
        if tot <= 0:
            nxt = int(rng.integers(n))
        else:
            nxt = int(rng.choice(n, p=d2 / tot))
        cents.append(sample[nxt].astype(np.float64))
        d2 = np.minimum(d2, ((sample - cents[-1]) ** 2).sum(axis=1))
    return np.stack(cents)


def _assign(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
    d = -2.0 * (vecs @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d, axis=1)


def kmeans_full(
    ds: Dataset,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 10,
    seed: int = 1,
) -> tuple[np.ndarray, pa.Table]:
    """Returns ``(centroids (k, dim), per-cluster stats table)`` where the
    stats table has columns (cluster, n, inertia)."""
    import ray

    sample_parts = list(
        ds.select_columns([vec_col]).limit(4096).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    sample = _vectors(pa.concat_tables(sample_parts).column(vec_col))
    cents = _pp_init(sample, k, seed)

    def partials(cents_ref):
        def fn(t: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            vecs = _vectors(t.column(vec_col))
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            a = _assign(vecs, c)
            rows_c, rows_n, rows_s, rows_tag = [], [], [], []
            for cl in np.unique(a):
                m = a == cl
                rows_c.append(int(cl))
                rows_n.append(int(m.sum()))
                rows_s.append(vecs[m].sum(axis=0).astype(np.float64).tobytes())
                rows_tag.append(int(ids[m].min()))
            return pa.table(
                {
                    "cluster": pa.array(rows_c, pa.int64()),
                    "n": pa.array(rows_n, pa.int64()),
                    "vsum": pa.array(rows_s, pa.binary()),
                    "tag": pa.array(rows_tag, pa.int64()),
                }
            )

        return fn

    dim = None
    for _ in range(iters):
        ref = ray.put(cents.astype(np.float64))
        part = ds.map_batches(partials(ref), batch_format="pyarrow").to_pandas()
        part = part.sort_values(["cluster", "tag"]).reset_index(drop=True)
        dim = cents.shape[1]
        new = cents.copy()
        for cl, grp in part.groupby("cluster"):
            tot = np.zeros(dim, dtype=np.float64)
            for b in grp["vsum"]:
                tot += np.frombuffer(b, dtype=np.float64)
            new[int(cl)] = tot / grp["n"].sum()
        cents = new

    ref = ray.put(cents.astype(np.float64))

    def stats(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vecs = _vectors(t.column(vec_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        a = _assign(vecs, c)
        rows = {"cluster": [], "n": [], "inertia": [], "tag": []}
        for cl in np.unique(a):
            m = a == cl
            diff = vecs[m] - c[cl]
            rows["cluster"].append(int(cl))
            rows["n"].append(int(m.sum()))
            rows["inertia"].append(float((diff * diff).sum()))
            rows["tag"].append(int(ids[m].min()))
        return pa.table(
            {
                "cluster": pa.array(rows["cluster"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "inertia": pa.array(rows["inertia"], pa.float64()),
                "tag": pa.array(rows["tag"], pa.int64()),
            }
        )

    sp = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    sp = sp.sort_values(["cluster", "tag"]).reset_index(drop=True)
    agg = sp.groupby("cluster").agg(n=("n", "sum"), inertia=("inertia", "sum")).reset_index()
    out = pa.table(
        {
            "cluster": pa.array(agg["cluster"].astype("int64")),
            "n": pa.array(agg["n"].astype("int64")),
            "inertia": pa.array(agg["inertia"].astype("float64")),
        }
    )
    return cents, out
