"""PII scrubbing: regex redaction of emails / phone numbers / IPv4 addresses
in a text column, as one vectorized shuffle-free ``map_batches`` pass.

The standard pre-training hygiene step (C4 / Dolma-style rule-based PII
removal). Patterns are written in the RE2-compatible subset shared by the
Rust regex engine (polars) and DuckDB — no backreferences, no lookaround —
so the same pattern string drives both the engine and the SQL oracle
(`pii_redaction_stats` in pipelines/queries.py).

Scale shape: per-batch polars ``replace_all`` / ``count_matches`` over the
Arrow column; compiled-pattern state lives inside polars, no Python loop, no
shuffle, no driver materialization. At 100 TB this is a pure streaming map.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
from ray.data import Dataset

# category -> (pattern, replacement token). Order matters: emails are
# redacted before IPv4 so a dotted-quad inside a hostname local-part is
# consumed by the email rule first (both engines apply the same order).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\b", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
}


def scrub_batch(
    texts: pl.Series, patterns: dict[str, tuple[str, str]] | None = None
) -> tuple[pl.Series, dict[str, pl.Series]]:
    """Redact one batch; returns (redacted texts, per-category match counts)."""
    patterns = patterns or PII_PATTERNS
    counts: dict[str, pl.Series] = {}
    out = texts
    for cat, (pat, token) in patterns.items():
        counts[cat] = out.str.count_matches(pat)
        out = out.str.replace_all(pat, token)
    return out, counts


def scrub_pii(
    ds: Dataset,
    text_col: str = "text",
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str | None = None,
    count_cols: bool = True,
) -> Dataset:
    """Replace PII matches in ``text_col`` (in place, or into ``out_col``),
    optionally appending an int64 ``n_<category>`` match-count column per
    pattern for audit/reporting."""
    patterns = dict(patterns or PII_PATTERNS)

    def fn(t: pa.Table) -> pa.Table:
        s = t.column(text_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        red, counts = scrub_batch(pl.from_arrow(s), patterns)
        dest = out_col or text_col
        arr = red.to_arrow()
        if dest in t.column_names:
            t = t.set_column(t.column_names.index(dest), dest, arr)
        else:
            t = t.append_column(dest, arr)
        if count_cols:
            for cat, c in counts.items():
                t = t.append_column(f"n_{cat}", c.cast(pl.Int64).to_arrow())
        return t

    return ds.map_batches(fn, batch_format="pyarrow")
