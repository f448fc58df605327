"""PageRank (stages/graph.py) vs driver-side numpy power iteration."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _np_pagerank(edges, iters, d):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in set(edges):
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - d) / n)
        for a, b in set(edges):
            nr[idx[b]] += d * r[idx[a]] / out[idx[a]]
        r = nr
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.graph import pagerank

    rng = np.random.default_rng(13)
    edges = [tuple(e) for e in rng.integers(0, 12, size=(60, 2)).tolist()]
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    out = pagerank(rd.from_arrow(t), iters=4, damping=0.85)
    exp = _np_pagerank(edges, 4, 0.85)
    got = dict(zip(out["node"], out["rank"]))
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12
    # ranks are a (leaky, due to dangling) distribution: bounded by 1
    assert 0 < sum(got.values()) <= 1.0 + 1e-9
