"""Corpus generator + text kernel tests (FIXTURES.md F1 invariants)."""

import numpy as np
import polars as pl
import pyarrow as pa

from perfect_bloomfilter_ray.functions.text import (
    extract_text,
    fingerprint64,
    host_of,
    lang_id,
    quality_score,
    token_count,
)
from perfect_bloomfilter_ray.sources.corpus import DUP_FRAC, LANGS, gen_pages_table


def test_generation_deterministic_and_layout_independent():
    a = gen_pages_table(np.arange(0, 300))
    b = gen_pages_table(np.arange(100, 300))
    assert a.slice(100).equals(b)  # same rows regardless of block layout
    again = gen_pages_table(np.arange(0, 300))
    assert a.equals(again)


def test_text_invariant_byte_identical():
    t = gen_pages_table(np.arange(2000))
    assert t.column("text").to_pylist() == extract_text(t.column("html")).to_pylist()


def test_schema_matches_input_hint():
    t = gen_pages_table(np.arange(10))
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert t.schema.field("url").type == pa.string()
    assert t.schema.field("warc_ts").type == pa.timestamp("us")
    assert t.schema.field("html").type == pa.binary()
    assert t.schema.field("lang").type == pa.string()


def test_dup_and_skew_profile():
    t = gen_pages_table(np.arange(10_000))
    texts = t.column("text").to_pylist()
    dup_rate = 1 - len(set(texts)) / len(texts)
    assert 0.5 * DUP_FRAC < dup_rate < 2 * DUP_FRAC
    langs = t.column("lang").to_pylist()
    assert max(set(langs), key=langs.count) == "en"  # zipf skew, en-heavy
    assert set(langs) <= set(LANGS)


def test_extract_text_rules():
    html = pa.array([b"<html><body><p>Hello &amp; <b>world</b></p>\n<p>again</p></body></html>"])
    assert extract_text(html).to_pylist() == ["Hello & world again"]


def test_host_and_tokens():
    assert host_of(pa.array(["https://a.example/x/y"])).to_pylist() == ["a.example"]
    assert token_count(pa.array(["one  two three", "", " x "])).to_pylist() == [3, 0, 1]


def test_lang_id_on_marker_text():
    out = lang_id(pa.array(["the cat and the dog is here", "der Hund und die Katze ist", "xyzzy"]))
    assert out.to_pylist() == ["en", "de", "und"]


def test_quality_and_fingerprint():
    scores = quality_score(pa.array(["the quick brown fox, and the lazy dog." * 20, "x"]))
    assert scores[0].as_py() > scores[1].as_py()
    fp = fingerprint64(pa.array(["Hello,   World!", "hello world", "different"]))
    assert fp[0].as_py() == fp[1].as_py()  # normalization collapses formatting
    assert fp[0].as_py() != fp[2].as_py()


def test_canonicalize_urls_rules():
    """Every canonicalization rule, one assertion each; idempotence on the
    already-canonical output."""
    import pyarrow as pa

    from perfect_bloomfilter_ray.functions.urls import (
        canonicalize_urls,
        registered_domain,
    )

    urls = pa.array(
        [
            "HTTPS://WWW.Example.COM:443/a/b?b=2&utm_source=x&a=1#frag",
            "http://site.co.uk:80",                      # default port + empty path
            "https://x.org/p?",                          # empty query keeps no '?'
            "http://a.b.co.uk/q?z=1&y=2",                # param sort
            "https://h.com:8443/x",                      # NON-default port kept
            "https://h.com/x?utm_source=a&utm_medium=b", # all params tracking
        ]
    )
    got = canonicalize_urls(urls).to_pylist()
    assert got == [
        "https://www.example.com/a/b?a=1&b=2",
        "http://site.co.uk/",
        "https://x.org/p",
        "http://a.b.co.uk/q?y=2&z=1",
        "https://h.com:8443/x",
        "https://h.com/x",
    ]
    assert canonicalize_urls(pa.array(got)).to_pylist() == got  # idempotent

    rd = registered_domain(
        pa.array(["www.example.com", "a.b.co.uk", "co.uk", "localhost", "x.ac.uk"]),
        ["com", "co.uk", "org"],
    ).to_pylist()
    assert rd == ["example.com", "b.co.uk", "co.uk", "localhost", "x.ac.uk"]


def test_proximity_search_edge_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from perfect_bloomfilter_ray.pipelines.queries import QUERIES

    # direct kernel check through the registered query on a tiny synthetic set
    import perfect_bloomfilter_ray.pipelines.extras as ex

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "hash join",                     # adjacent -> 1
                "hash x y join",                 # gap 2 -> 1
                "hash x y z join",               # gap 3 -> 0 (beyond window)
                "join hash",                     # wrong order -> 0
                "hash a join hash join",         # pairs: (0,2),(2? no) -> count
            ],
        }
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    import pyarrow.parquet as pq
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    # satisfy _t's read of the documents table only
    out = ex.proximity_hash_join_docs(d)
    got = dict(zip(out.to_pandas()["doc_id"], out.to_pandas()["n_matches"])) if hasattr(out, "to_pandas") else dict(zip(out["doc_id"], out["n_matches"]))
    # doc5 tokens: hash(0) a(1) join(2) hash(3) join(4): pairs (0,2),(0?4 gap4 no),(3,4) -> 2
    assert got == {1: 1, 2: 1, 5: 2}


def test_vocab_growth_curve_invariants(ray_session):
    import perfect_bloomfilter_ray.pipelines.extras as ex

    out = ex.vocab_growth_curve("/root/testdata/sf0.001")
    # monotone cumulative curves; totals consistent
    assert (out["cum_words"].diff().dropna() >= 0).all()
    assert (out["cum_tokens"].diff().dropna() >= 0).all()
    assert out["cum_words"].iloc[-1] == out["new_words"].sum()
    assert out["cum_tokens"].iloc[-1] == out["bucket_tokens"].sum()
    # Heaps: vocabulary grows sublinearly in tokens — later buckets add
    # fewer new words per token than the first bucket
    first_rate = out["new_words"].iloc[0] / out["bucket_tokens"].iloc[0]
    last_rate = out["new_words"].iloc[-1] / out["bucket_tokens"].iloc[-1]
    assert last_rate <= first_rate
