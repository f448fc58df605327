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
