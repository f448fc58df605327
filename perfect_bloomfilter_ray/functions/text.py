"""Vectorized text kernels — extraction, tokenization, language ID, quality.

All kernels are polars/pyarrow-vectorized column transforms intended for use
inside ``map_batches(..., batch_format="pyarrow")``. No per-row Python in any
of them.

``extract_text`` is THE reference extractor for the corpus invariant: the
synthetic corpus stores ``text = extract_text(html)`` and the row-wise check
(BASELINE.json input_hint: "byte-identical extracted text per url") recomputes
it and compares byte-for-byte (see sources/corpus.py and
pipelines/flagship.py).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]


def _pl(col) -> pl.Series:
    if isinstance(col, pl.Series):
        return col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pl.from_arrow(col)


def extract_text(col) -> pa.Array:
    """Deterministic HTML → text: tag-strip, minimal entity unescape,
    whitespace normalization. Byte-stable across runs and processes."""
    s = _pl(col)
    if s.dtype == pl.Binary:
        s = s.cast(pl.String)
    expr = s.str.replace_all(r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        expr = expr.str.replace_all(ent, ch, literal=True)
    expr = expr.str.replace_all(r"\s+", " ").str.strip_chars()
    return expr.to_arrow()


def normalize_text(col) -> pa.Array:
    """Curation-standard text normalization: lowercase → collapse internal
    whitespace runs to one space → trim spaces. Engine-portable — exactly
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` in ANSI/DuckDB
    SQL (``strip_chars(" ")`` strips spaces only, matching SQL ``trim``)."""
    return (
        _pl(col)
        .str.to_lowercase()
        .str.replace_all(r"\s+", " ")
        .str.strip_chars(" ")
        .to_arrow()
    )


def host_of(col) -> pa.Array:
    """Host part of a URL column."""
    return _pl(col).str.extract(r"^[a-z]+://([^/]+)", 1).to_arrow()


def token_count(col) -> pa.Array:
    """Whitespace token count (matches DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` on non-empty text)."""
    return _pl(col).str.count_matches(r"\S+").cast(pl.Int64).to_arrow()


def bpe_ish_token_count(col) -> pa.Array:
    """BPE-ish token counting: words + digits runs + punctuation singles
    (a GPT-style pre-tokenizer regex, simplified)."""
    return _pl(col).str.count_matches(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]").cast(pl.Int64).to_arrow()


# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic. Deliberately small — this is a deterministic heuristic stage, not
# a model (the container has no language-ID library; SURVEY §2.3 text analysis).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "los", "que", "es", "una"],
    "it": ["il", "che", "di", "per", "una"],
    "pt": ["o", "que", "um", "para", "com"],
    "nl": ["de", "het", "een", "niet", "van"],
    "ru": ["i", "v", "ne", "na", "chto"],
    "zh": ["de", "shi", "le", "zai", "you"],
    "ja": ["no", "ni", "wa", "wo", "ga"],
}


def lang_scores(col, langs: list[str] | None = None) -> dict[str, np.ndarray]:
    """Per-language marker-hit counts (vectorized; one regex pass per lang)."""
    s = _pl(col).str.to_lowercase()
    out = {}
    for lang in langs or list(_LANG_MARKERS):
        pat = r"\b(" + "|".join(_LANG_MARKERS[lang]) + r")\b"
        out[lang] = s.str.count_matches(pat).cast(pl.Int64).to_numpy()
    return out


def lang_id(col, langs: list[str] | None = None) -> pa.Array:
    """Argmax language over marker scores; 'und' when nothing matches."""
    langs = langs or list(_LANG_MARKERS)
    scores = lang_scores(col, langs)
    mat = np.stack([scores[l] for l in langs])  # (L, n)
    best = mat.argmax(axis=0)
    none = mat.max(axis=0) == 0
    arr = np.array(langs, dtype=object)[best]
    arr[none] = "und"
    return pa.array(arr, pa.string())


def quality_features(col) -> pa.Table:
    """Quality-scoring features: n_chars, n_tokens, mean token length,
    punctuation ratio, stopword(en) ratio, uppercase ratio."""
    s = _pl(col)
    n_chars = s.str.len_chars().cast(pl.Int64)
    n_tokens = s.str.count_matches(r"\S+").cast(pl.Int64)
    n_punct = s.str.count_matches(r"[^\w\s]").cast(pl.Int64)
    n_upper = s.str.count_matches(r"[A-Z]").cast(pl.Int64)
    n_stop = s.str.to_lowercase().str.count_matches(r"\b(the|and|of|to|is|in|a|for)\b").cast(pl.Int64)
    nc = n_chars.to_numpy().astype(np.float64)
    nt = np.maximum(n_tokens.to_numpy().astype(np.float64), 1.0)
    return pa.table(
        {
            "n_chars": n_chars.to_arrow(),
            "n_tokens": n_tokens.to_arrow(),
            "mean_token_len": pa.array(nc / nt),
            "punct_ratio": pa.array(n_punct.to_numpy() / np.maximum(nc, 1.0)),
            "stopword_ratio": pa.array(n_stop.to_numpy() / nt),
            "upper_ratio": pa.array(n_upper.to_numpy() / np.maximum(nc, 1.0)),
        }
    )


def quality_score(col) -> pa.Array:
    """Composite [0,1] quality score (deterministic heuristic):
    rewards mid-length docs with normal punctuation/stopword profiles."""
    f = quality_features(col)
    nc = f["n_chars"].to_numpy().astype(np.float64)
    length_score = np.clip(nc / 500.0, 0, 1) * np.clip((20000.0 - nc) / 20000.0, 0, 1)
    punct = f["punct_ratio"].to_numpy()
    punct_score = 1.0 - np.clip(np.abs(punct - 0.03) * 10.0, 0, 1)
    stop = f["stopword_ratio"].to_numpy()
    stop_score = np.clip(stop * 5.0, 0, 1)
    return pa.array(np.round((length_score + punct_score + stop_score) / 3.0, 6))


def fingerprint64(col, normalize: bool = True) -> pa.Array:
    """Document fingerprint: 64-bit hash of the (optionally normalized) text.

    Normalization = lowercase + collapse whitespace + strip punctuation, so
    near-identical formatting variants collide (rolling-hash-style content
    fingerprint; exact-dedup key).

    Emitted as int64 (same 64 bits, reinterpreted): Ray's groupby/aggregate
    key path round-trips group keys through Python ints and overflows on
    uint64 values above 2^63, so every shuffle-key consumer gets int64.
    """
    s = _pl(col)
    if normalize:
        s = (
            s.str.to_lowercase()
            .str.replace_all(r"[^\w\s]", "")
            .str.replace_all(r"\s+", " ")
            .str.strip_chars()
        )
    return pa.array(s.hash(seed=0xF1A9).to_numpy().astype(np.uint64).view(np.int64))


def compression_ratio(col) -> pa.Array:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic cheap redundancy signal (Dolma/Gopher family: boilerplate and
    template spam compress far below prose; near-random noise compresses
    above it). zlib level 1 keeps this ~100 MB/s/core; the loop is
    per-DOCUMENT (a codec call per row, like any decode stage), with all
    framing vectorized. Empty docs score 1.0. Deterministic for a given
    zlib, so tests pin exact values."""
    import zlib

    from perfect_bloomfilter_ray.functions.hashing import _to_polars

    s = _to_polars(col)
    raw = s.fill_null("").cast(pl.Binary).to_list()
    out = np.ones(len(raw), dtype=np.float64)
    for i, b in enumerate(raw):
        if b:
            out[i] = len(zlib.compress(b, 1)) / len(b)
    return pa.array(out)
