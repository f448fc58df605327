"""Jaro-Winkler scorer: DuckDB bit-parity fuzz + blocked-pairs stage."""

from __future__ import annotations

import random

import duckdb
import pytest

from perfect_bloomfilter_ray.stages.fuzzy import jaro_winkler


@pytest.mark.parametrize(
    "a,b,want",
    [
        ("martha", "marhta", 0.9611111111111111),
        ("dwayne", "duane", 0.84),
        ("", "", 0.0),  # DuckDB's convention: empty → 0, even vs itself
        ("abc", "", 0.0),
        ("same", "same", 1.0),
    ],
)
def test_known_values(a, b, want):
    assert jaro_winkler(a, b) == pytest.approx(want, abs=1e-15)


def test_duckdb_bit_parity_fuzz():
    con = duckdb.connect()
    rng = random.Random(1234)
    alphabet = "abcdef "
    for _ in range(2000):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        theirs = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == theirs, (a, b)


def test_blocked_pairs_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.fuzzy import blocked_jaro_winkler_pairs

    t = pa.table(
        {
            "blk": ["x", "x", "x", "y", "y"],
            "name": ["martha", "marhta", "zzzzz", "dwayne", "duane"],
        }
    )
    out = (
        blocked_jaro_winkler_pairs(rd.from_arrow(t), "blk", "name", threshold=0.8)
        .to_pandas()
        .sort_values(["blk", "name_a"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("x", "marhta", "martha"),
        ("y", "duane", "dwayne"),
    ]


def test_damerau_known_values():
    from perfect_bloomfilter_ray.stages.fuzzy import damerau_levenshtein

    assert damerau_levenshtein("ca", "abc") == 2  # unrestricted, not OSA's 3
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("abcd", "acbd") == 1
    assert damerau_levenshtein("", "xyz") == 3
    assert damerau_levenshtein("same", "same") == 0


def test_damerau_duckdb_bit_parity_fuzz():
    from perfect_bloomfilter_ray.stages.fuzzy import damerau_levenshtein

    con = duckdb.connect()
    rng = random.Random(99)
    for _ in range(1500):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 9)))
        assert (
            damerau_levenshtein(a, b)
            == con.execute("select damerau_levenshtein(?, ?)", [a, b]).fetchone()[0]
        ), (a, b)
