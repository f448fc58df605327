"""Deterministic synthetic Common-Crawl-style web-page corpus (FIXTURES.md F1).

Schema (BASELINE.json input_hint, exactly):
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Every field of row ``i`` is a pure function of ``(seed, i)`` (counter-based
splitmix64 streams — no RNG state), so generation parallelizes over Ray blocks
and is byte-identical regardless of block layout, worker count or run:
``text`` is EXACTLY ``functions.text.extract_text(html)`` — the row invariant
the flagship pipeline re-checks byte-for-byte.

Skew: hosts Zipf(s=1.1) over H hosts, lang Zipf over 10 languages (en-heavy)
— deliberately skewed to exercise the salted merge paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from perfect_bloomfilter_ray.functions.hashing import splitmix64
from perfect_bloomfilter_ray.functions.text import extract_text

_U64 = np.uint64

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl"]
_LANG_ZIPF_S = 1.3
NUM_HOSTS = 10_000
_HOST_ZIPF_S = 1.1
DUP_FRAC = 0.02  # exact-duplicate rows, to exercise duplicate-insert semantics
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in epoch-us
_SPAN_US = 30 * 86_400 * 1_000_000

# deterministic 256-word vocabulary (seeded word shapes, no external data)
_CONS = "bcdfghklmnprstvz"
_VOW = "aeiou"
WORDS = [
    _CONS[(i * 7) % 16] + _VOW[(i * 3) % 5] + _CONS[(i * 11 + 5) % 16] + (_VOW[(i * 13) % 5] + _CONS[(i * 5 + 3) % 16] if i % 3 else "")
    for i in range(256)
]


def _stream(seed: int, ids: np.ndarray, field: int) -> np.ndarray:
    """Counter-based uint64 stream: mix(seed, row_id, field)."""
    salt = _U64((field * 0xBF58476D1CE4E5B9 + seed) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        x = ids.astype(_U64) * _U64(0x9E3779B97F4A7C15) + salt
    return splitmix64(x)


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


_HOST_CDF = _zipf_cdf(NUM_HOSTS, _HOST_ZIPF_S)
_LANG_CDF = _zipf_cdf(len(LANGS), _LANG_ZIPF_S)


def _uniform(h: np.ndarray) -> np.ndarray:
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


def gen_pages_table(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate the pages table for the given row ids (vectorized where it
    counts; the HTML assembly is a plain join over numpy-chosen words)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)

    # a dup_frac slice of rows clones the content of an earlier row id
    dup_u = _uniform(_stream(seed, ids, 0))
    content_ids = ids.copy()
    is_dup = (dup_u < DUP_FRAC) & (ids > 0)
    content_ids[is_dup] = _stream(seed, ids[is_dup], 1) % np.maximum(ids[is_dup].astype(_U64), _U64(1))

    host_idx = np.searchsorted(_HOST_CDF, _uniform(_stream(seed, content_ids, 2)))
    lang_idx = np.searchsorted(_LANG_CDF, _uniform(_stream(seed, content_ids, 3)))
    ts = BASE_TS_US + (_stream(seed, ids, 4) % _U64(_SPAN_US)).astype(np.int64)

    # paragraph structure: 1-5 paragraphs × 20-80 words, log-normal-ish sizes
    n_paras = 1 + (_stream(seed, content_ids, 5) % _U64(5)).astype(np.int64)
    total_words = np.zeros(n, dtype=np.int64)
    para_words: list[list[np.ndarray]] = []
    for r in range(n):
        cid = content_ids[r]
        paras = []
        for p in range(n_paras[r]):
            wcount = 20 + int(_stream(seed, np.array([cid]), 16 + p)[0] % 61)
            widx = _stream(seed + p, np.arange(cid, cid + wcount), 32) % _U64(256)
            paras.append(widx.astype(np.int64))
            total_words[r] += wcount
        para_words.append(paras)

    words = np.array(WORDS, dtype=object)
    urls, htmls = [], []
    for r in range(n):
        cid = int(content_ids[r])
        title_idx = _stream(seed, np.arange(cid, cid + 3), 48) % _U64(256)
        title = " ".join(words[i] for i in title_idx.astype(np.int64))
        body = "".join(
            "<p>" + " ".join(words[i] for i in p) + "</p>" for p in para_words[r]
        )
        path_hex = f"{int(_stream(seed, np.array([cid]), 6)[0]):016x}"
        urls.append(f"https://site{host_idx[r]:05d}.example/{path_hex[:2]}/{path_hex}")
        htmls.append(
            f"<html><head><title>{title}</title></head><body>{body}</body></html>".encode()
        )

    html_arr = pa.array(htmls, pa.binary())
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": html_arr,
            "text": extract_text(html_arr),
            "lang": pa.array(np.array(LANGS, dtype=object)[lang_idx], pa.string()),
        }
    )


def pages_dataset(n_rows: int, seed: int = 42, override_num_blocks: int | None = None):
    """Parallel deterministic generation as a Ray Dataset (lazy)."""
    import ray.data as rd

    base = rd.range(n_rows, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return gen_pages_table(batch.column("id").to_numpy(), seed)

    return base.map_batches(gen, batch_format="pyarrow", batch_size=8192)


def write_pages(out_dir: str, n_rows: int, seed: int = 42, num_blocks: int | None = None) -> str:
    """Materialize the corpus to partitioned Parquet (resumable layout:
    skip generation entirely if the directory already holds the right rows)."""
    import os

    marker = os.path.join(out_dir, f"_SUCCESS_{n_rows}_{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    ds = pages_dataset(n_rows, seed, override_num_blocks=num_blocks)
    if num_blocks:
        # honor the requested shard count even when Ray's writer would
        # coalesce small blocks into one file (resumable layouts need >1)
        ds.write_parquet(out_dir, max_rows_per_file=max(1, n_rows // num_blocks))
    else:
        ds.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
