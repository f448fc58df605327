"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; neither this
module nor the library calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline smoke: deterministic synthetic web-page corpus
    (input_hint schema) through the one-pass multi-sketch build + per-lang
    grouped summary, then a per-lang HLL over the sf0.001 documents table.
    Returns a stable-schema DataFrame (one row per lang)."""
    import ray.data as rd

    from perfect_bloomfilter_ray.pipelines.flagship import flagship
    from perfect_bloomfilter_ray.sources.corpus import pages_dataset
    from perfect_bloomfilter_ray.stages.agg import sketch_grouped
    from perfect_bloomfilter_ray.state.hll import HyperLogLog

    pages_summary = flagship(pages_dataset(2_000, seed=42), expected_urls=2_000)

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    doc_langs = sketch_grouped(
        docs,
        key="lang",
        col="text",
        factory=lambda: HyperLogLog(12),
        name="distinct_doc_texts_est",
        finalize_fn=lambda s: float(s.estimate()),
    ).to_pandas()

    out = pages_summary.merge(doc_langs, on="lang", how="outer").sort_values("lang").reset_index(drop=True)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from perfect_bloomfilter_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
