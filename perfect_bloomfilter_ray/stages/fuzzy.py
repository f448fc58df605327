"""Blocked fuzzy-match pair join (entity-resolution blocking + hamming).

Finds document pairs whose text prefixes are within a hamming distance —
the classic blocked record-linkage shape: an all-pairs comparison is
O(n²) and dead at corpus scale, so rows are first grouped into BLOCKS by
cheap deterministic keys (source, length bucket, …) and only within-block
pairs are compared. The blocking keys are the documented partitioning
assumption: a true match split across blocks is never compared (recall is
bounded by the blocking scheme; the standard trade, cf. Christen 2012).

Shape mirrors ``stages/cooccur.py``: coarse hash partition on the block
keys (all of a block co-locates), ONE vectorized partition pass (per-block
char-matrix pairwise compare — blocks are small by construction, the
compare is numpy broadcasting, O(|block|²·L) on uint32 char codes), no
driver materialization. Output: (id_a, id_b, dist) with id_a < id_b.

The hamming comparison is over the first ``prefix_len`` CHARACTERS (not
bytes) of the lowercased text, right-padded with ``pad_char`` — exactly
DuckDB's ``hamming(rpad(substr(lower(text),1,L), L, pad), …)``, so the
operator is exact-SQL-oracle-checkable (`prefix_hamming_pairs`).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ray.data import Dataset

from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
from perfect_bloomfilter_ray.stages.topk import _multi_key_part


def blocked_hamming_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    prefix_len: int = 24,
    max_dist: int = 3,
    pad_char: str = "~",
    num_blocks: int | None = None,
) -> Dataset:
    """All within-block pairs with prefix hamming distance ≤ ``max_dist``."""
    nb = choose_num_blocks(ds, num_blocks)

    def prep_route(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([id_col, text_col, *block_cols]))
        df = df.with_columns(
            pl.col(text_col)
            .fill_null("")
            .str.to_lowercase()
            .str.slice(0, prefix_len)
            .str.pad_end(prefix_len, pad_char)
            .alias("_pfx")
        ).drop(text_col)
        return _multi_key_part(df.to_arrow(), block_cols, nb)

    def pairs_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        ids_a: list[np.ndarray] = []
        ids_b: list[np.ndarray] = []
        dists: list[np.ndarray] = []
        # python loop over BLOCKS (small by the blocking contract); the
        # pairwise compare inside each block is fully vectorized
        for _, g in df.group_by(block_cols):
            n = len(g)
            if n < 2:
                continue
            ids = g[id_col].to_numpy()
            # char-level matrix (n, prefix_len): utf-32 so multibyte chars
            # count one position, matching SQL hamming semantics
            mat = np.frombuffer(
                "".join(g["_pfx"].to_list()).encode("utf-32-le"), dtype=np.uint32
            ).reshape(n, prefix_len)
            iu, ju = np.triu_indices(n, k=1)
            d = (mat[iu] != mat[ju]).sum(axis=1)
            m = d <= max_dist
            if not m.any():
                continue
            a, b = ids[iu[m]], ids[ju[m]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            ids_a.append(lo)
            ids_b.append(hi)
            dists.append(d[m].astype(np.int64))
        if not ids_a:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(ids_a)),
                "id_b": pa.array(np.concatenate(ids_b)),
                "dist": pa.array(np.concatenate(dists)),
            }
        )

    return (
        ds.map_batches(prep_route, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(pairs_block, batch_format="pyarrow")
    )
