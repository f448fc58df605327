"""Flagship pipeline: one streaming pass over a web-page corpus → all sketches.

read_parquet (pruned columns) → map_batches invariant check + host extraction
→ ONE multi-aggregate pass building every sketch family at once (each block
visited once; Ray tree-merges the five accumulator sets independently) plus
grouped per-lang sketches via the two-phase shuffle tree.

This is the pipeline `entry()` smoke-runs at sf0.001, `bench.py` times at
scale, and the scaling benchmark runs at two parallelism levels.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.config import BloomConfig
from perfect_bloomfilter_ray.functions.text import extract_text, host_of
from perfect_bloomfilter_ray.state.bloom import BloomCascade
from perfect_bloomfilter_ray.state.cms import CountMinSketch
from perfect_bloomfilter_ray.state.hll import HyperLogLog
from perfect_bloomfilter_ray.state.kll import KLLSketch
from perfect_bloomfilter_ray.state.tdigest import TDigest
from perfect_bloomfilter_ray.stages.agg import multi_sketch_global, sketch_grouped


def prepare_pages(ds: Dataset, check_invariant: bool = True) -> Dataset:
    """Add host + text_len columns; optionally verify the row invariant
    (text byte-identical to extract_text(html), BASELINE.json input_hint)."""

    def prep(t: pa.Table) -> pa.Table:
        if check_invariant and "html" in t.column_names:
            recomputed = extract_text(t.column("html"))
            bad = pc.sum(
                pc.cast(pc.not_equal(recomputed, t.column("text")), pa.int64())
            ).as_py()
            if bad:
                raise ValueError(f"text invariant violated for {bad} rows in batch")
        out = t.append_column("host", host_of(t.column("url")))
        return out.append_column("text_len", pc.utf8_length(t.column("text")))

    return ds.map_batches(prep, batch_format="pyarrow")


def build_all_sketches(pages: Dataset, expected_urls: int) -> dict:
    """One streaming pass, five sketch families (partial-per-batch + tree
    merge — see ``multi_sketch_global``). Returns {name: sketch object}."""
    return multi_sketch_global(
        pages,
        {
            "bloom_url": ("url", lambda: BloomCascade.for_capacity(expected_urls, BloomConfig())),
            "hll_url": ("url", lambda: HyperLogLog(14)),
            "cms_host": ("host", lambda: CountMinSketch(1e-4, 1e-3)),
            "kll_text_len": ("text_len", lambda: KLLSketch(256)),
            "tdigest_text_len": ("text_len", lambda: TDigest(200)),
        },
    )


def per_lang_summary(pages: Dataset, salt: int | None = None) -> Dataset:
    """Grouped sketches per lang (two-phase partial/merge shuffle tree).

    ``salt`` adds the intermediate salted merge level (see ``sketch_grouped``)
    — needed when partial count per key is huge (10^5+ blocks over few keys);
    at benchmark scale (~10^2 partials) the extra all-to-all costs more than
    it saves, so it is off by default and exercised in tests/docs."""
    return sketch_grouped(
        pages,
        key="lang",
        col="url",
        factory=lambda: HyperLogLog(12),
        name="distinct_urls_est",
        finalize_fn=lambda s: float(s.estimate()),
        salt=salt,
    )


def flagship(sf_dir_or_pages, expected_urls: int | None = None) -> pd.DataFrame:
    """End-to-end: prepare → build global sketches → per-lang summary.

    Accepts a pages Dataset or a directory containing pages parquet. Returns
    a one-row-per-lang DataFrame plus global sketch stats as attrs.
    """
    import ray.data as rd

    if isinstance(sf_dir_or_pages, str):
        ds = rd.read_parquet(sf_dir_or_pages)
    else:
        ds = sf_dir_or_pages
    n = expected_urls or max(1024, ds.count())
    pages = prepare_pages(ds)
    sketches = build_all_sketches(pages, n)
    # Per-lang pass only needs (lang, url): project at the read so the heavy
    # html/text columns never enter this pipeline (the invariant check already
    # ran in the global pass above).
    slim = ds.select_columns(["lang", "url"])
    per_lang = per_lang_summary(slim).to_pandas().sort_values("lang").reset_index(drop=True)

    bloom = sketches["bloom_url"]
    summary = {
        "rows": n,
        "distinct_urls_est": sketches["hll_url"].estimate(),
        "bloom_layers": len(bloom.layers),
        "bloom_key_count": bloom.key_count,
        "bloom_effective_fpr": bloom.effective_fpr(),
        "text_len_p50_kll": sketches["kll_text_len"].quantile(0.5),
        "text_len_p99_kll": sketches["kll_text_len"].quantile(0.99),
        "text_len_p50_tdigest": sketches["tdigest_text_len"].quantile(0.5),
        "cms_total": sketches["cms_host"].total,
    }
    per_lang.attrs["summary"] = summary
    return per_lang
