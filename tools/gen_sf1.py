"""Synthesize an sf1.0-scale test set by key-shifted 10x replication of the
driver's sf0.1 tables (the driver's own generator is not shipped; for the
latent-bug hunt the data only needs the same SCHEMA at 10x size — the Ray
query and the DuckDB oracle always read the SAME files, so exact-hash
comparison is valid on any input).

Replication keeps referential integrity: each key column shifts by
(global max over every table using it + 1) * copy, identically wherever it
appears, so FKs keep resolving and per-key behavioral patterns replicate.
Dimension tables (region, nation) and timestamps stay fixed — the time
axis just gets 10x denser, and name-like strings get a copy suffix so
name-keyed grouping stays aligned with key-keyed grouping.

Usage: python tools/gen_sf1.py [out_dir] [copies]   (default /tmp/sf1.0, 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main(out_dir: str = "/tmp/sf1.0", copies: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tabs = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split()
    }

    # one shift constant per logical key, consistent across tables
    def maxv(*cols):
        return max(int(pc.max(c).as_py()) for c in cols) + 1

    shift = {
        "cust": maxv(tabs["customer"]["c_custkey"], tabs["orders"]["o_custkey"]),
        "supp": maxv(tabs["supplier"]["s_suppkey"], tabs["lineitem"]["l_suppkey"]),
        "part": maxv(tabs["part"]["p_partkey"], tabs["lineitem"]["l_partkey"]),
        "order": maxv(tabs["orders"]["o_orderkey"], tabs["lineitem"]["l_orderkey"]),
        "event": maxv(tabs["events"]["event_id"]),
        "user": maxv(tabs["events"]["user_id"]),
        "doc": maxv(tabs["documents"]["doc_id"]),
        "vec": maxv(tabs["embeddings"]["vec_id"]),
    }
    key_cols = {
        "c_custkey": "cust", "o_custkey": "cust",
        "s_suppkey": "supp", "l_suppkey": "supp",
        "p_partkey": "part", "l_partkey": "part",
        "o_orderkey": "order", "l_orderkey": "order",
        "event_id": "event", "user_id": "user",
        "doc_id": "doc", "vec_id": "vec",
    }
    name_cols = {"c_name", "s_name", "p_name"}

    for t in ("region", "nation"):
        pq.write_table(tabs[t], f"{out_dir}/{t}.parquet")

    for t in ("customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"):
        src = tabs[t]
        parts = []
        for k in range(copies):
            cols = {}
            for name in src.column_names:
                col = src.column(name)
                if name in key_cols:
                    cols[name] = pc.add(col, pa.scalar(shift[key_cols[name]] * k, col.type))
                elif name in name_cols and k > 0:
                    cols[name] = pc.binary_join_element_wise(
                        col, pa.scalar(f"#r{k}"), ""
                    )
                else:
                    cols[name] = col
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{out_dir}/{t}.parquet")
        print(t, out.num_rows)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0",
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
    )
