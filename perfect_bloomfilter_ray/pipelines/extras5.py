"""Round-5 extras: model-weights inference, codec-backed multimodal
additions, and scale-pattern queries.

Registered into the same QUERIES/ORACLE_SQL dicts as pipelines/queries.py
(imported at its tail, before the SQL-first registration reorder).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from perfect_bloomfilter_ray.pipelines.queries import QUERIES, _round, _t, q

# Fixed MLP weights for the oracle-backed inference query. Every constant is
# an EXACT binary fraction (k/2^m), so the only rounding either engine ever
# performs is in the additions — and both build the identical left-to-right
# IEEE-754 expression tree (see stages/inference.py determinism contract).
_W1 = [[0.25, -0.5, 0.125], [0.0625, 0.75, -0.25]]  # (2 features × 3 hidden)
_B1 = [0.5, -1.0, 0.25]
_W2 = [1.5, -0.75, 0.5]  # (3 hidden → 1 logit)
_B2 = -0.25


@q(
    "mlp_purchase_propensity",
    sql="""
    WITH f AS (
      SELECT event_id,
             CAST(CAST(extract(hour FROM ts) AS BIGINT) AS DOUBLE) AS h,
             value AS v
      FROM events WHERE value IS NOT NULL
    ),
    hid AS (
      SELECT event_id,
             greatest(h * 0.25   + v * 0.0625 + 0.5,  0.0) AS u1,
             greatest(h * -0.5   + v * 0.75   + -1.0, 0.0) AS u2,
             greatest(h * 0.125  + v * -0.25  + 0.25, 0.0) AS u3
      FROM f
    ),
    z AS (
      SELECT event_id, u1 * 1.5 + u2 * -0.75 + u3 * 0.5 + -0.25 AS logit
      FROM hid
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      FROM z
    ),
    topk AS (
      SELECT event_id, logit FROM z ORDER BY logit DESC, event_id LIMIT 20
    )
    SELECT t.event_id, t.logit, a.n, a.n_pos
    FROM topk t, agg a ORDER BY t.logit DESC, t.event_id
    """,
)
def mlp_purchase_propensity(sf_dir: str):
    """Model-weights inference at scale: a 2-layer MLP (fixed exact-binary
    weights) scores every event through the broadcast-weights actor pool
    (stages/inference.py — ray.put once, ray.get once per actor in
    __init__, vectorized forward per batch). Output: global positive count
    (logit > 0 — the integer-exact full-scan readout) + the top-20 logits
    (raw doubles — bit-identical expression trees both sides)."""
    from perfect_bloomfilter_ray.stages.inference import model_score_dataset

    ds = _t(sf_dir, "events", ["event_id", "ts", "value"]).filter(
        lambda r: r["value"] is not None
    )

    def feats(t: pa.Table) -> np.ndarray:
        ts = pc.cast(t.column("ts"), pa.timestamp("us"))
        h = pc.cast(pc.hour(ts), pa.int64()).to_numpy().astype(np.float64)
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        return np.stack([h, v], axis=1)

    weights = {
        "layers": [
            (np.array(_W1, np.float64), np.array(_B1, np.float64)),
            (np.array(_W2, np.float64).reshape(3, 1), np.array([_B2], np.float64)),
        ]
    }
    scored = model_score_dataset(ds, weights, feats, id_cols=["event_id"], out_col="logit")

    def partial(t: pa.Table) -> pa.Table:
        z = t.column("logit").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -z))[:20]  # per-block top-k partial
        return pa.table(
            {
                "event_id": pa.array(ids[order]),
                "logit": pa.array(z[order]),
                "n": pa.array([len(z)] + [0] * (len(order) - 1) if len(order) else [], pa.int64()),
                "n_pos": pa.array(
                    [int((z > 0).sum())] + [0] * (len(order) - 1) if len(order) else [], pa.int64()
                ),
            }
        )

    parts = scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    n_pos = int(parts["n_pos"].sum())
    top = parts.sort_values(["logit", "event_id"], ascending=[False, True]).head(20)
    return pd.DataFrame(
        {
            "event_id": top["event_id"].to_numpy(),
            "logit": top["logit"].to_numpy(),
            "n": np.full(len(top), n, dtype=np.int64),
            "n_pos": np.full(len(top), n_pos, dtype=np.int64),
        }
    ).reset_index(drop=True)
