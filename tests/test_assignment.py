"""Gale-Shapley stable assignment (stages/assignment.py): stability audit
and parity with the classic sequential deferred-acceptance algorithm."""

import numpy as np
import pandas as pd
import pytest


def _counts(rng, n_users, types, rows):
    u = rng.integers(0, n_users, size=rows)
    t = rng.integers(0, len(types), size=rows)
    return pd.DataFrame({"user_id": u, "event_type": [types[i] for i in t]})


def test_stable_assignment_no_blocking_pair_and_sequential_parity(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.assignment import stable_assignment

    rng = np.random.default_rng(23)
    types = ["a", "b", "c", "d"]
    df = _counts(rng, 60, types, 2000)
    got = stable_assignment(
        rd.from_pandas(df).repartition(4), "user_id", "event_type", quota_div=7
    )

    cnt = df.groupby(["user_id", "event_type"]).size().reset_index(name="c")
    users = sorted(cnt["user_id"].unique())
    C = {(r.user_id, r.event_type): r.c for r in cnt.itertuples()}
    prefs = {
        u: [
            t
            for _, t in sorted(
                (-C[(u, t)], t) for t in types if (u, t) in C
            )
        ]
        for u in users
    }
    q = len(users) // 7

    # classic SEQUENTIAL deferred acceptance (one proposal at a time) —
    # proposer-optimality makes the batch fixpoint identical
    ptr = {u: 0 for u in users}
    held: dict = {}
    free = list(users)
    while free:
        u = free.pop(0)
        if ptr[u] >= len(prefs[u]):
            continue
        t = prefs[u][ptr[u]]
        ptr[u] += 1
        held.setdefault(t, [])
        held[t].append(u)
        held[t].sort(key=lambda x: (-C[(x, t)], x))
        if len(held[t]) > q:
            bumped = held[t].pop()
            free.append(bumped)
    want = {u: "-" for u in users}
    for t, us in held.items():
        for u in us:
            want[u] = t
    got_map = dict(zip(got["user_id"], got["matched_type"]))
    assert got_map == want

    # stability: no blocking pair (u, t)
    members = {t: [u for u in users if got_map[u] == t] for t in types}
    for u in users:
        mt = got_map[u]
        better = prefs[u] if mt == "-" else prefs[u][: prefs[u].index(mt)]
        for t in better:
            assert len(members[t]) == q, (u, t, "type has room a user wants")
            worst = max(members[t], key=lambda x: (-C[(x, t)], x))
            # worst member sorts LAST by (c desc, id asc) => key is max
            assert (-C[(u, t)], u) > (-C[(worst, t)], worst), (u, t, "blocking pair")

    # quota respected, proposals bounded by list length
    assert all(len(m) <= q for m in members.values())
    nv = {u: len(prefs[u]) for u in users}
    assert all(p <= nv[u] for u, p in zip(got["user_id"], got["proposals_made"]))


def test_stable_assignment_quota_slack_matches_everyone(ray_session):
    """With capacity above demand every user lands on their first choice."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.assignment import stable_assignment

    rng = np.random.default_rng(5)
    types = ["x", "y"]
    df = _counts(rng, 20, types, 400)
    got = stable_assignment(
        rd.from_pandas(df), "user_id", "event_type", quota_div=1
    )
    cnt = df.groupby(["user_id", "event_type"]).size().reset_index(name="c")
    first = (
        cnt.sort_values(["user_id", "c", "event_type"], ascending=[True, False, True])
        .groupby("user_id")
        .head(1)
        .set_index("user_id")["event_type"]
    )
    assert dict(zip(got["user_id"], got["matched_type"])) == first.to_dict()
    assert (got["proposals_made"] == 1).all()
