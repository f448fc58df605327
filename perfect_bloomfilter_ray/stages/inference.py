"""Model-weights batch inference stages (numpy forward pass, no framework).

The missing piece between the hashing-trick embedder (functions/embed.py —
weights SYNTHESIZED per actor) and a production model-scoring stage: here
the weights are REAL learned arrays that exist once on the driver, ship to
the cluster ONCE via ``ray.put`` (object-store broadcast — zero-copy reads
from every worker on the same node; never re-pickled per batch or per
task), and each actor fetches them a single time in ``__init__``. Per-batch
work is one vectorized forward pass (matmuls + elementwise), the exact
shape a torch-backed scorer would have — swap ``_forward`` for a real
framework call without touching the pipeline.

Determinism contract (what the SQL oracle relies on): for a 2-layer MLP
with p features and h hidden units, numpy's row-vector matmul evaluates
each unit as the LEFT-TO-RIGHT dot ``((x0*w0 + x1*w1) + ...) + bias`` —
the same IEEE-754 tree an SQL engine builds for the literal expression
``x0*w0 + x1*w1 + ... + bias`` — so logits are bit-identical across
engines. Sigmoid uses per-row ``math.exp`` (libm — matches DuckDB
bitwise, where numpy's SIMD exp can differ by 1 ulp) and is only applied
to BOUNDED row sets (top-k outputs), per the suite's oracle-exactness
policy.

Scale shape: weights are O(model), batches are O(batch) — no shuffle, no
driver traffic after the one ``ray.put``. At 10^12 rows this stage is
embarrassingly parallel and the actor pool is sized by ``concurrency`` ×
``num_cpus`` like every stateful stage in this repo.

Reference parity: the reference engine (/root/reference, filter.rs) has no
model surface; this implements the [RULE] "model-weights inference actor"
row (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def mlp_init(sizes: list[int], seed: int = 7) -> dict:
    """Deterministic small-MLP weights: ``sizes = [p, h1, ..., 1]``.
    He-scaled normals from a fixed generator — a stand-in for trained
    weights with the exact storage layout ``logreg_to_mlp`` produces."""
    rng = np.random.default_rng(seed)
    layers = []
    for a, b in zip(sizes[:-1], sizes[1:]):
        w = (rng.standard_normal((a, b)) * np.sqrt(2.0 / a)).astype(np.float64)
        bias = np.zeros(b, dtype=np.float64)
        layers.append((w, bias))
    return {"layers": layers}


def logreg_to_mlp(fit: dict) -> dict:
    """Wrap a ``stages.logreg.logreg_fit`` result (weights + bias, bias
    last) as a 1-layer model for :class:`NumpyModelScorer` — the
    train-distributed → broadcast-infer handoff."""
    w = np.asarray(fit["w"], dtype=np.float64)
    return {
        "layers": [(w[:-1].reshape(-1, 1), w[-1:])],
        "standardize": (fit.get("mu"), fit.get("sd")),
    }


class NumpyModelScorer:
    """Actor-pool batch callable: features → model logit column.

    ``weights``: either the weights dict itself or a ``ray.ObjectRef`` to
    one (the broadcast path — ``ray.put(weights)`` once on the driver, the
    ref resolves ONCE per actor here in ``__init__``).

    ``feature_fn(t: pa.Table) -> (rows, p) float64`` — same contract as
    ``logreg_fit``. Output: the batch's ``id_cols`` plus ``out_col``
    (raw logit — bit-exact across engines; apply sigmoid downstream on
    bounded sets only, see module docstring).
    """

    def __init__(self, weights, feature_fn, id_cols: list[str], out_col: str = "logit"):
        try:
            import ray

            if isinstance(weights, ray.ObjectRef):
                weights = ray.get(weights)
        except ImportError:  # plain-python unit use
            pass
        self.layers = [(np.asarray(w, np.float64), np.asarray(b, np.float64)) for w, b in weights["layers"]]
        std = weights.get("standardize")
        self._mu, self._sd = (std if std and std[0] is not None else (None, None))
        self.feature_fn = feature_fn
        self.id_cols = list(id_cols)
        self.out_col = out_col

    def _forward(self, x: np.ndarray) -> np.ndarray:
        if self._mu is not None:
            x = (x - self._mu) / self._sd
        n_layers = len(self.layers)
        for i, (w, b) in enumerate(self.layers):
            x = x @ w + b
            if i < n_layers - 1:
                x = np.maximum(x, 0.0)  # ReLU == SQL greatest(z, 0.0)
        return x[:, 0]

    def __call__(self, t: pa.Table) -> pa.Table:
        z = self._forward(self.feature_fn(t))
        cols = {c: t.column(c) for c in self.id_cols}
        cols[self.out_col] = pa.array(z, pa.float64())
        return pa.table(cols)


def model_score_dataset(
    ds: Dataset,
    weights: dict,
    feature_fn,
    id_cols: list[str],
    out_col: str = "logit",
    concurrency=(1, 4),
    batch_size: int = 4096,
) -> Dataset:
    """Broadcast ``weights`` once (``ray.put``) and score ``ds`` through an
    actor pool of :class:`NumpyModelScorer`."""
    import ray

    ref = ray.put(weights)
    return ds.map_batches(
        NumpyModelScorer,
        fn_constructor_kwargs={
            "weights": ref,
            "feature_fn": feature_fn,
            "id_cols": id_cols,
            "out_col": out_col,
        },
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )
