"""Stable assignment (Gale-Shapley deferred acceptance with quotas).

The hospitals-residents matching primitive behind contention-free data
placement and task assignment: proposers (users) rank a BOUNDED set of
slots (event types) by affinity, slots rank proposers by the same affinity
matrix, each slot takes at most ``quota`` proposers, and batch deferred-
acceptance rounds (McVitie-Wilson style: every unmatched proposer proposes
simultaneously) converge to the unique proposer-optimal stable assignment.
Deterministic affinity keys (count DESC, id ASC) make every round exactly
mirrorable by an unrolled SQL oracle.

Scale shape: the ONLY corpus-dimension pass is the distributed
(proposer, slot) affinity groupby; rounds run vectorized on the driver
over proposer-dimension arrays x bounded slots (the ``bfs_levels``
bounded-state contract — at unbounded proposer cardinality the same
rounds distribute as slot-keyed top-q shuffles, the escape hatch named
here for parity with pagerank_dataset).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def stable_assignment(
    ds: Dataset,
    user_col: str,
    type_col: str,
    quota_div: int = 7,
    rounds: int = 10,
) -> pd.DataFrame:
    """Batch Gale-Shapley over the (user, type) interaction-count affinity
    matrix: users propose down their preference list (count DESC, type
    ASC); each type keeps its top ``n_users // quota_div`` proposers by
    (count DESC, user ASC). Returns one row per user:
    ``(user_id, matched_type, proposals_made)`` with '-' for users left
    unmatched after exhausting their list (total capacity is deliberately
    below demand). Bounded ``rounds`` keeps the computation mirrorable by
    an unrolled SQL oracle; these inputs settle in <= 7 rounds (a proposer
    advances at most |types| times), and the settled state is the unique
    proposer-optimal stable matching (Gale & Shapley 1962; Roth 1984 for
    the quota form).
    """
    from ray.data.aggregate import Count as _Count

    cnt = (
        ds.groupby([user_col, type_col])
        .aggregate(_Count(alias_name="c"))
        .to_pandas()
    )
    users = np.sort(cnt[user_col].unique())
    types = np.sort(cnt[type_col].unique())
    U, T = len(users), len(types)
    C = np.zeros((U, T), dtype=np.int64)
    ui = np.searchsorted(users, cnt[user_col].to_numpy())
    ti = np.searchsorted(types, cnt[type_col].to_numpy())
    C[ui, ti] = cnt["c"].to_numpy().astype(np.int64)

    # preference matrix: per user, type indices by (count DESC, type ASC);
    # nvalid = number of types actually interacted with
    order = np.lexsort((np.arange(T)[None, :].repeat(U, axis=0), -C), axis=1)
    pref = np.take_along_axis(
        np.arange(T)[None, :].repeat(U, axis=0), order, axis=1
    )
    nvalid = (C > 0).sum(axis=1)

    q = U // quota_div
    ptr = np.zeros(U, dtype=np.int64)  # rank (1-based) of current proposal/held
    held = np.full(U, -1, dtype=np.int64)
    for _ in range(rounds):
        proposing = (held < 0) & (ptr < nvalid)
        if not proposing.any():
            break
        tgt = np.full(U, -1, dtype=np.int64)
        tgt[proposing] = pref[proposing, ptr[proposing]]
        ptr[proposing] += 1
        for t in range(T):
            cand = np.flatnonzero((held == t) | (tgt == t))
            if len(cand) <= q:
                held[cand] = t
                continue
            keykeep = np.lexsort((cand, -C[cand, t]))[:q]
            held[cand] = -1
            held[cand[keykeep]] = t
    matched = np.where(held >= 0, types[np.clip(held, 0, None)], "-")
    return pd.DataFrame(
        {"user_id": users, "matched_type": matched, "proposals_made": ptr}
    )
