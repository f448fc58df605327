"""WARC-style archive source/sink — ingest Common-Crawl-shaped raw captures.

Common Crawl ships as WARC files (ISO 28500): concatenated records, each a
``WARC/1.0`` header block (CRLF-separated ``Name: value`` lines, terminated
by a blank line) followed by ``Content-Length`` bytes of payload and a
``CRLF CRLF`` record separator. This module implements the subset a
training-data pipeline needs — ``response`` records carrying page bytes —
with a writer (for tests and re-sharding) and a parser that turns raw
archive bytes into the library's canonical pages schema
(url, warc_ts, html — see BASELINE.json input_hint; text/lang are derived
downstream by ``functions.text``).

Scale shape: archives are read with ``ray.data.read_binary_files`` (one
record batch per file — WARC shards are ~1 GB by convention, the file IS
the natural block) and parsed inside ``map_batches``. Parsing walks each
blob record-by-record (a byte-offset loop — this is a FILE-FORMAT decoder,
sequential by nature like every parquet/CSV reader; the per-record work is
O(header bytes) with payloads sliced zero-copy via memoryview), emitting
one Arrow table per archive. No shuffle, no driver involvement; a corrupt
record raises with its byte offset rather than silently resyncing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def make_warc_bytes(
    urls: list[str], ts_us: np.ndarray, payloads: list[bytes], record_type: str = "response"
) -> bytes:
    """Serialize records into a WARC-style archive (the test/re-shard sink)."""
    out = bytearray()
    for url, t, payload in zip(urls, np.asarray(ts_us, dtype=np.int64), payloads):
        # epoch-us -> WARC-Date (ISO 8601, UTC, second resolution kept exact
        # by storing the sub-second part in a WARC-Date-Us extension header)
        header = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {record_type}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date-Us: {int(t)}\r\n"
            f"Content-Length: {len(payload)}\r\n"
        ).encode("utf-8")
        out += header + _CRLF + payload + _SEP
    return bytes(out)


def parse_warc_bytes(blob: bytes, keep_types: tuple[str, ...] = ("response",)) -> pa.Table:
    """Parse one archive blob into (url, warc_ts, html) Arrow columns."""
    mv = memoryview(blob)
    urls: list[str] = []
    ts: list[int] = []
    payloads: list[bytes] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos:pos + 5] != b"WARC/":
            raise ValueError(f"malformed WARC record at byte {pos}: missing version line")
        hdr_end = blob.find(_SEP, pos)
        if hdr_end < 0:
            raise ValueError(f"malformed WARC record at byte {pos}: unterminated header")
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", errors="replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"malformed WARC record at byte {pos}: bad Content-Length")
        body_start = hdr_end + len(_SEP)
        body_end = body_start + length
        if blob[body_end:body_end + len(_SEP)] != _SEP:
            raise ValueError(f"malformed WARC record at byte {pos}: bad record separator")
        if headers.get("warc-type") in keep_types:
            urls.append(headers.get("warc-target-uri", ""))
            ts.append(int(headers.get("warc-date-us", "0")))
            payloads.append(bytes(mv[body_start:body_end]))
        pos = body_end + len(_SEP)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(ts, dtype=np.int64)).cast(pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
        }
    )


def read_warc(paths: str | list[str], keep_types: tuple[str, ...] = ("response",)):
    """WARC archives → pages Dataset (url, warc_ts, html), one parse task per
    file. Feed the result to ``pipelines.enrich`` / ``flagship`` after
    deriving text+lang (``functions.text.extract_text`` / ``lang_id``)."""
    import ray.data as rd

    def parse(t: pa.Table) -> pa.Table:
        tables = [parse_warc_bytes(b.as_py(), keep_types) for b in t.column("bytes")]
        return pa.concat_tables(tables) if tables else parse_warc_bytes(b"")

    return rd.read_binary_files(paths).map_batches(parse, batch_format="pyarrow")


def write_warc_shards(ds, out_dir: str, prefix: str = "shard") -> list[str]:
    """Pages Dataset → one WARC file per block, written INSIDE the tasks
    (the driver never sees page bytes). Shard names derive from the block's
    first url hash — deterministic for a given block layout, so a rerun
    overwrites the same names via atomic tmp+rename instead of duplicating
    (the same publish convention as the JSONL shard sink). Returns the
    written paths (the small manifest is the only thing on the driver)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        import zlib

        first = t.column("url")[0].as_py() or ""
        tag = zlib.crc32(f"{first}:{len(t)}".encode()) & 0xFFFFFFFF
        path = os.path.join(out_dir, f"{prefix}-{tag:08x}.warc")
        blob = make_warc_bytes(
            t.column("url").to_pylist(),
            t.column("warc_ts").cast(pa.int64()).to_numpy(),
            [v.as_py() for v in t.column("html")],
        )
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic publish
        return pa.table({"path": pa.array([path]), "n": pa.array([len(t)], pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow", batch_size=None).to_pandas()
    return sorted(manifest["path"].tolist())
