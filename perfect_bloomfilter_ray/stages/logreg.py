"""Distributed logistic regression (full-batch gradient descent).

The model-based quality-filter trainer (fastText-classifier shape without
the embedding table): features are computed per batch, each iteration is ONE
``map_batches`` pass emitting the exact per-block gradient partial (a
``(p+1)``-vector plus loss/count scalars), the driver sums partials **in a
deterministic order** (sorted by block tag) and takes the step. Weights
broadcast per iteration via ``ray.put``; nothing row-level ever leaves the
tasks. Full-batch GD (not SGD) so the fit is deterministic and
merge-order-independent up to the documented sorted-partial accumulation.

Standardization uses exact integer-free moments gathered in the same first
pass. Reference: any convex-optimization text; the distributed shape is the
classic "parameter broadcast + gradient partial" pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def logreg_fit(
    ds: Dataset,
    feature_fn,
    label_fn,
    n_features: int,
    iters: int = 60,
    lr: float = 0.5,
    tag_col: str | None = None,
) -> dict:
    """``feature_fn(t) -> (rows, p) float64``; ``label_fn(t) -> (rows,) {0,1}``.
    Returns {'w': (p+1,) weights (bias last), 'loss': final mean log-loss,
    'n': rows, 'accuracy': training accuracy}."""
    import ray

    # pass 0: feature moments for standardization + class balance
    def moments(t: pa.Table) -> pa.Table:
        x = feature_fn(t)
        y = label_fn(t)
        return pa.table(
            {
                "n": pa.array([len(y)], pa.int64()),
                "pos": pa.array([int(y.sum())], pa.int64()),
                "sx": pa.array([x.sum(axis=0).tobytes()], pa.binary()),
                "sxx": pa.array([(x * x).sum(axis=0).tobytes()], pa.binary()),
                "tag": pa.array([_tag(t, tag_col)], pa.int64()),
            }
        )

    mp = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sort_values("tag")
    n = int(mp["n"].sum())
    sx = np.sum([np.frombuffer(b, np.float64) for b in mp["sx"]], axis=0)
    sxx = np.sum([np.frombuffer(b, np.float64) for b in mp["sxx"]], axis=0)
    mu = sx / n
    sd = np.sqrt(np.maximum(sxx / n - mu * mu, 1e-12))

    w = np.zeros(n_features + 1, dtype=np.float64)
    for _ in range(iters):
        ref = ray.put((w, mu, sd))

        def grad(t: pa.Table) -> pa.Table:
            ww, m, s = ray.get(ref)
            x = (feature_fn(t) - m) / s
            y = label_fn(t).astype(np.float64)
            z = x @ ww[:-1] + ww[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            g = np.concatenate([x.T @ err, [err.sum()]])
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            return pa.table(
                {
                    "g": pa.array([g.tobytes()], pa.binary()),
                    "loss": pa.array([float(loss)], pa.float64()),
                    "n": pa.array([len(y)], pa.int64()),
                    "acc": pa.array([int(((p >= 0.5) == (y >= 0.5)).sum())], pa.int64()),
                    "tag": pa.array([_tag(t, tag_col)], pa.int64()),
                }
            )

        gp = ds.map_batches(grad, batch_format="pyarrow").to_pandas().sort_values("tag")
        g = np.sum([np.frombuffer(b, np.float64) for b in gp["g"]], axis=0) / n
        w = w - lr * g
    loss = float(gp["loss"].sum() / n)
    acc = float(gp["acc"].sum() / n)
    return {"w": w, "loss": loss, "n": n, "accuracy": acc, "mu": mu, "sd": sd}


def _tag(t: pa.Table, tag_col: str | None) -> int:
    if tag_col is None or len(t) == 0:
        return 0
    col = t.column(tag_col)
    import pyarrow.compute as pc

    return int(pc.min(col).as_py() or 0)
