"""Source format coverage: CSV and JSON ingestion agree with Parquet."""

import pyarrow as pa
import pyarrow.csv
import pytest


@pytest.fixture(scope="module")
def csv_json_copies(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("fmts")
    src = "/root/testdata/sf0.001/orders.parquet"
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{src}')) TO '{d}/orders.csv' (HEADER)")
    duckdb.sql(f"COPY (SELECT * FROM read_parquet('{src}')) TO '{d}/orders.json'")
    return str(d), src


def _agg(ds):
    from ray.data.aggregate import Count, Sum

    out = (
        ds.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    out["total"] = out["total"].round(2)
    return out


def test_read_csv_matches_parquet(ray_session, csv_json_copies):
    import ray.data as rd

    d, src = csv_json_copies
    a = _agg(rd.read_csv(f"{d}/orders.csv"))
    b = _agg(rd.read_parquet(src))
    assert a.equals(b)


def test_read_json_matches_parquet(ray_session, csv_json_copies):
    import ray.data as rd

    d, src = csv_json_copies
    a = _agg(rd.read_json(f"{d}/orders.json"))
    b = _agg(rd.read_parquet(src))
    assert a.equals(b)


def test_orc_roundtrip_stripe_parallel(ray_session, tmp_path):
    """ORC sink -> stripe-parallel source roundtrip: same rows as the
    parquet original, column pruning honored, multi-stripe files split
    into multiple read items."""
    import pyarrow.orc as orc
    import pyarrow.parquet as pq
    import ray.data as rd

    from perfect_bloomfilter_ray.sources.orc import read_orc, write_orc_shards

    src = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    # force several stripes in one file to prove the split geometry
    one = tmp_path / "one"
    one.mkdir()
    with orc.ORCWriter(str(one / "docs.orc"), stripe_size=16 * 1024) as w:
        for i in range(0, len(src), 100):
            w.write(src.slice(i, 100))
    n_stripes = orc.ORCFile(str(one / "docs.orc")).nstripes
    assert n_stripes > 1

    got = read_orc(str(one), columns=["doc_id", "n_chars"]).materialize()
    assert got.num_blocks() == n_stripes
    gdf = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    sdf = src.select(["doc_id", "n_chars"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert gdf.equals(sdf)

    # sink: one ORC file per block, manifest-only on the driver, re-readable
    out = tmp_path / "sink"
    ds = rd.read_parquet("/root/testdata/sf0.01/documents.parquet")
    paths = write_orc_shards(ds, str(out))
    assert paths and all(p.endswith(".orc") for p in paths)
    back = read_orc(str(out)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(src.to_pandas().sort_values("doc_id").reset_index(drop=True))
    # rerun overwrites the same shard names (atomic publish, no duplicates)
    assert sorted(write_orc_shards(rd.read_parquet("/root/testdata/sf0.01/documents.parquet"), str(out))) == paths


def test_read_text_source_parity(ray_session, tmp_path):
    """Line-delimited text source: ray.data.read_text over sharded .txt
    files parses back to the same (doc_id, text) rows as the parquet
    original (tab-framed, texts contain no tabs/newlines in this corpus)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    src = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    assert not src["text"].str.contains("[\t\n]", regex=True).any()
    d = tmp_path / "txt"
    d.mkdir()
    for i in range(4):  # several shards: the read fans out per file
        part = src.iloc[i::4]
        (d / f"part-{i}.txt").write_text(
            "".join(f"{r.doc_id}\t{r.text}\n" for r in part.itertuples())
        )

    def parse(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        sp = df["text"].str.split_exact("\t", 1).struct.rename_fields(["id", "body"])
        out = df.with_columns(sp.alias("s")).unnest("s")
        return pa.table(
            {
                "doc_id": out["id"].cast(pl.Int64).to_arrow(),
                "text": out["body"].to_arrow(),
            }
        )

    got = (
        rd.read_text(str(d))
        .map_batches(parse, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(src.sort_values("doc_id").reset_index(drop=True))


def test_ipc_shard_roundtrip_and_pruning(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.sources.ipc import read_ipc, write_ipc_shards

    df = pd.DataFrame(
        {
            "k": np.arange(1000, dtype="int64"),
            "v": np.arange(1000, dtype="int64") * 3,
            "s": [f"row{i}" for i in range(1000)],
        }
    )
    out = str(tmp_path / "ipc")
    paths = write_ipc_shards(rd.from_pandas(df).repartition(4), out)
    assert len(paths) >= 1 and all(p.endswith(".arrow") for p in paths)

    back = read_ipc(out).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["k", "v", "s"]], df)

    pruned = read_ipc(out, columns=["k", "v"])
    assert set(pruned.schema().names) == {"k", "v"}
    assert int(pruned.to_pandas()["v"].sum()) == int(df["v"].sum())

    # rerun over the same block layout overwrites the same shard names
    paths2 = write_ipc_shards(rd.from_pandas(df).repartition(4), out)
    assert paths2 == paths
