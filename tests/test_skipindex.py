"""Per-file Bloom data-skipping index (stages/skipindex.py)."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def indexed_orders(ray_session, tmp_path_factory):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.skipindex import build_bloom_skip_index

    scratch = str(tmp_path_factory.mktemp("skipidx"))
    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", pc.cast(pc.bit_wise_and(t.column("o_orderkey"), 7), pa.int32()))

    orders.map_batches(add_part, batch_format="pyarrow").write_parquet(scratch, partition_cols=["part"])
    files = sorted(glob.glob(f"{scratch}/**/*.parquet", recursive=True))
    manifest = build_bloom_skip_index(files, "o_orderkey", scratch + "_idx")
    return manifest, files


def test_index_covers_every_file(indexed_orders):
    manifest, files = indexed_orders
    assert [f["path"] for f in manifest["files"]] == files
    assert sum(f["n_rows"] for f in manifest["files"]) == 1500  # sf0.001 orders


def test_lookup_exact_and_pruned(indexed_orders):
    import duckdb

    from perfect_bloomfilter_ray.stages.skipindex import pruned_point_lookup

    manifest, files = indexed_orders
    keys = [1, 2, 3, 7, 32, 999999999]
    ds, stats = pruned_point_lookup(manifest, keys, columns=["o_orderkey", "o_custkey"])
    got = ds.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet' "
        "WHERE o_orderkey IN (1,2,3,7,32,999999999) ORDER BY o_orderkey"
    ).df()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["o_custkey"].tolist() == want["o_custkey"].tolist()
    # keys hit ≤ 6 of the 8 hash partitions → at least 2 files pruned
    assert stats["files_total"] == len(files)
    assert stats["files_read"] < stats["files_total"]


def test_no_false_negatives_bulk(indexed_orders):
    """Every present key must survive pruning (bloom has no false negatives)."""
    import duckdb

    from perfect_bloomfilter_ray.stages.skipindex import prune_files

    manifest, _files = indexed_orders
    present = duckdb.sql(
        f"SELECT o_orderkey FROM '{SF}/orders.parquet' ORDER BY o_orderkey LIMIT 50"
    ).df()["o_orderkey"].tolist()
    for k in present:
        survivors, _ = prune_files(manifest, [int(k)])
        assert survivors, f"key {k} pruned away"


def test_absent_keys_prune_everything(indexed_orders):
    from perfect_bloomfilter_ray.stages.skipindex import prune_files

    manifest, _files = indexed_orders
    # far outside the key range → zone check alone kills every file
    survivors, stats = prune_files(manifest, [10**12 + 7])
    assert survivors == []
    assert stats["files_pruned"] == stats["files_total"]


def test_bloom_prunes_within_range(indexed_orders):
    """Zone ranges of all 8 hash partitions overlap (keys are dense 0..1499,
    partitioned by key & 7), so pruning beyond the owning partition is
    entirely the bloom's work: probing key 9 (lives only in part=1) must
    admit only part=1's files, modulo the ~3e-13 per-file FPR."""
    from perfect_bloomfilter_ray.stages.skipindex import prune_files

    manifest, files = indexed_orders
    survivors, stats = prune_files(manifest, [9])
    assert survivors, "present key must survive"
    assert all("part=1" in p for p in survivors)
    assert stats["files_read"] < len([p for p in files if "part=1" in p]) + 1


def test_range_scan_exact_and_pruned(indexed_orders):
    import duckdb

    from perfect_bloomfilter_ray.stages.skipindex import pruned_range_scan

    manifest, files = indexed_orders
    # the fixture partitions by o_orderkey & 7 (hash-ish), so zones are wide;
    # a range covering few keys still reads all files whose zone overlaps —
    # correctness first, pruning asserted on the range-partitioned layout below
    ds, stats = pruned_range_scan(manifest, 100, 199, columns=["o_orderkey", "o_custkey"])
    got = ds.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT o_orderkey, o_custkey FROM '{SF}/orders.parquet' "
        "WHERE o_orderkey BETWEEN 100 AND 199 ORDER BY o_orderkey"
    ).df()
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert stats["files_total"] == len(files)


def test_range_scan_prunes_on_range_partitioned_layout(ray_session, tmp_path):
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.skipindex import (
        build_bloom_skip_index,
        pruned_range_scan,
    )

    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(pc.divide(pc.cast(t.column("o_orderkey"), pa.int64()), 200), pa.int32())
        return t.append_column("part", part)

    scratch = str(tmp_path / "ranged")
    orders.map_batches(add_part, batch_format="pyarrow").write_parquet(
        scratch, partition_cols=["part"]
    )
    files = sorted(glob.glob(f"{scratch}/**/*.parquet", recursive=True))
    manifest = build_bloom_skip_index(files, "o_orderkey", str(tmp_path / "idx"))
    ds, stats = pruned_range_scan(manifest, 250, 349, columns=["o_orderkey"])
    got = sorted(ds.to_pandas()["o_orderkey"].tolist())
    assert got == list(range(250, 350))
    # keys 250-349 live in range-partitions 1 (200-399) only
    assert stats["files_read"] < stats["files_total"]
    assert stats["files_pruned"] >= stats["files_total"] - 2
