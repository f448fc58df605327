"""Dead-letter split routing + XOR parity shard recovery."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from perfect_bloomfilter_ray.stages.parity import recover_shard, write_parity
from perfect_bloomfilter_ray.stages.validate import split_valid


def test_split_valid_routes_and_annotates(ray_session):
    import ray

    df = pd.DataFrame(
        {
            "a": [1, None, 5, 200, 3],
            "lang": ["en", "de", "xx", "en", "fr"],
        }
    )
    rules = [
        {"col": "a", "rule": "not_null"},
        {"col": "a", "rule": "in_range", "lo": 0, "hi": 100},
        {"col": "lang", "rule": "in_set", "values": ["en", "de", "fr"]},
    ]
    good, bad = split_valid(ray.data.from_pandas(df), rules)
    g, b = good.to_pandas(), bad.to_pandas()
    assert len(g) + len(b) == len(df)
    assert sorted(g["a"].tolist()) == [1, 3]
    # row with a=None violates ONLY rule 0 — nulls skip the range rule,
    # matching validate_rules semantics exactly
    assert (b.loc[b["a"].isna(), "_violations"] == "0").all()
    assert (b.loc[b["lang"] == "xx", "_violations"] == "2").all()
    assert (b.loc[b["a"] == 200, "_violations"] == "1").all()


def test_split_valid_rejects_unique_rule(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError):
        split_valid(ds, [{"col": "a", "rule": "unique"}])


def _mk_shards(tmp_path, k=4):
    rng = np.random.RandomState(0)
    names = []
    for i in range(k):
        p = tmp_path / f"shard-{i:03d}.parquet"
        pd.DataFrame({"x": rng.randint(0, 100, 50 + i * 17)}).to_parquet(p)
        names.append(p.name)
    return names


def test_parity_recovers_deleted_shard(ray_session, tmp_path):
    names = _mk_shards(tmp_path)
    write_parity(str(tmp_path))
    lost = names[2]
    orig = open(tmp_path / lost, "rb").read()
    os.remove(tmp_path / lost)
    data = recover_shard(str(tmp_path), lost)
    assert hashlib.sha256(data).hexdigest() == hashlib.sha256(orig).hexdigest()
    # the recovered file is byte-identical AND still a readable parquet
    t = pq.read_table(tmp_path / lost)
    assert t.num_rows == 50 + 2 * 17


def test_parity_refuses_double_erasure(ray_session, tmp_path):
    names = _mk_shards(tmp_path)
    write_parity(str(tmp_path))
    os.remove(tmp_path / names[0])
    os.remove(tmp_path / names[1])
    with pytest.raises(ValueError):
        recover_shard(str(tmp_path), names[0])


def test_parity_uncovered_file_raises(ray_session, tmp_path):
    _mk_shards(tmp_path)
    write_parity(str(tmp_path))
    with pytest.raises(ValueError):
        recover_shard(str(tmp_path), "never-written.parquet")
