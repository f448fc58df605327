"""URL canonicalization and registered-domain extraction — the crawl-side
normalization pass every web corpus runs before URL-keyed dedup / frontier
scheduling (reference parity: the Rust engine keys its filter on raw url
bytes, README.md:14; canonicalization widens that to equivalence-classed
urls). All kernels are vectorized polars string ops over Arrow columns; the
canonicalization rules are deliberately limited to the ANSI-SQL-mirrorable
core of RFC 3986 + the de-facto crawler extras:

  * scheme and host lowercased
  * default ports stripped (:80 for http, :443 for https)
  * fragments dropped
  * tracking params (utm_*) dropped
  * remaining query params sorted bytewise; empty query => no '?'
  * empty path => '/'

Registered-domain (eTLD+1) extraction uses longest-suffix match against a
BOUNDED public-suffix list shipped with the call (PSL-lite: the handful of
suffixes the corpus can contain — the full PSL is a broadcast lookup at
scale, same shape).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa


def _pl(col) -> pl.Series:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pl.from_arrow(col)


def canonicalize_urls(col) -> pa.Array:
    """Vectorized canonical form of a URL column (rules in module doc)."""
    s = _pl(col)
    frame = s.rename("u").to_frame()
    out = frame.select(
        scheme=pl.col("u").str.extract(r"^([A-Za-z]+)://", 1).str.to_lowercase(),
        hostport=pl.col("u").str.extract(r"^[A-Za-z]+://([^/?#]+)", 1).str.to_lowercase(),
        path=pl.col("u").str.extract(r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1).fill_null(""),
        query=pl.col("u").str.extract(r"\?([^#]*)", 1).fill_null(""),
    ).with_columns(
        host=pl.when(
            (pl.col("scheme") == "https") & pl.col("hostport").str.ends_with(":443")
        )
        .then(pl.col("hostport").str.strip_suffix(":443"))
        .when((pl.col("scheme") == "http") & pl.col("hostport").str.ends_with(":80"))
        .then(pl.col("hostport").str.strip_suffix(":80"))
        .otherwise(pl.col("hostport")),
        path=pl.when(pl.col("path") == "").then(pl.lit("/")).otherwise(pl.col("path")),
        qsorted=pl.col("query")
        .str.split("&")
        .list.eval(
            pl.element().filter(
                (pl.element() != "") & ~pl.element().str.starts_with("utm_")
            )
        )
        .list.sort()
        .list.join("&"),
    ).select(
        canon=pl.col("scheme")
        + pl.lit("://")
        + pl.col("host")
        + pl.col("path")
        + pl.when(pl.col("qsorted") == "")
        .then(pl.lit(""))
        .otherwise(pl.lit("?") + pl.col("qsorted"))
    )
    return out["canon"].to_arrow()


def registered_domain(hosts, suffixes: list[str]) -> pa.Array:
    """eTLD+1 by LONGEST suffix match against the bounded suffix list:
    'a.b.co.uk' with suffix 'co.uk' -> 'b.co.uk'. Hosts matching no suffix
    (or equal to a bare suffix) return themselves."""
    s = _pl(hosts)
    expr = None
    # longest-first so 'co.uk' beats 'uk'
    for suf in sorted(suffixes, key=len, reverse=True):
        cond = pl.col("h").str.ends_with("." + suf)
        label = (
            pl.col("h")
            .str.strip_suffix("." + suf)
            .str.extract(r"([^.]+)$", 1)
        )
        branch = label + pl.lit("." + suf)
        expr = pl.when(cond).then(branch) if expr is None else expr.when(cond).then(branch)
    expr = pl.col("h") if expr is None else expr.otherwise(pl.col("h"))
    return s.rename("h").to_frame().select(rd=expr)["rd"].to_arrow()
