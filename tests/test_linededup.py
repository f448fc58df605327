"""Line-level dedup (stages/linededup.py): brute-force parity for both
splitters, including text reassembly and the all-lines-dropped edge."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def newline_corpus():
    rng = np.random.default_rng(23)
    boiler = ["Accept cookies to continue", "Copyright 2024 Example Corp", "Home | About | Contact"]
    docs = []
    for i in range(120):
        lines = [f"unique content {i} {rng.integers(1_000_000)}" for _ in range(rng.integers(1, 5))]
        for b in boiler:
            if rng.random() < 0.5:
                lines.insert(int(rng.integers(0, len(lines) + 1)), b)
        if i == 7:
            lines = [boiler[0], boiler[1]]  # doc that empties entirely
        if i == 11:
            lines = ["   ", ""]  # whitespace-only lines -> zero lines
        docs.append("\n".join(lines))
    return docs


def _brute_sep(docs: list[str], min_count: int):
    split = lambda t: [s.strip() for s in t.split("\n") if s.strip()]
    cnt = Counter(l for t in docs for l in split(t))
    common = {l for l, c in cnt.items() if c >= min_count}
    kept = [[l for l in split(t) if l not in common] for t in docs]
    return (
        [len(split(t)) for t in docs],
        [len(k) for k in kept],
        [sum(len(l) for l in k) for k in kept],
        ["\n".join(k) for k in kept],
    )


def test_sep_splitter_matches_bruteforce(ray_session, newline_corpus):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.linededup import (
        SepSplitter,
        common_line_hashes,
        common_lines_broadcast,
        drop_common_lines,
    )

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(newline_corpus))), "text": newline_corpus})
    ).repartition(5)
    sp = SepSplitter("\n")
    ref = common_lines_broadcast(common_line_hashes(ds, "text", min_count=2, splitter=sp))
    out = (
        drop_common_lines(ds, ref, "text", splitter=sp)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bn, bk, bc, btxt = _brute_sep(newline_corpus, 2)
    assert out["n_lines"].tolist() == bn
    assert out["n_lines_kept"].tolist() == bk
    assert out["kept_chars"].tolist() == bc
    assert out["text"].tolist() == btxt


def test_token_chunk_splitter_matches_bruteforce(ray_session):
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.linededup import (
        TokenChunkSplitter,
        common_line_hashes,
        common_lines_broadcast,
        drop_common_lines,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(9)]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 40)))) for _ in range(150)]
    docs[4] = ""  # tokenless doc

    n = 5
    tok = lambda t: re.findall(r"[a-z0-9]+", t.lower())
    chunks = lambda t: [" ".join(tok(t)[i : i + n]) for i in range(0, len(tok(t)), n)]
    cnt = Counter(c for t in docs for c in chunks(t))
    common = {c for c, k in cnt.items() if k >= 3}
    kept = [[c for c in chunks(t) if c not in common] for t in docs]
    assert any(common), "fixture must actually produce common chunks"

    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))), "text": docs})).repartition(4)
    sp = TokenChunkSplitter(n)
    ref = common_lines_broadcast(common_line_hashes(ds, "text", min_count=3, splitter=sp))
    out = (
        drop_common_lines(ds, ref, "text", splitter=sp)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_lines"].tolist() == [len(chunks(t)) for t in docs]
    assert out["n_lines_kept"].tolist() == [len(k) for k in kept]
    assert out["text"].tolist() == [" ".join(k) for k in kept]


def test_line_dedup_gate_join_path_matches_broadcast(ray_session, newline_corpus):
    """A pathological corpus where EVERY line is common: broadcast_max_lines=0
    forces the co-partitioned join path; output must be bit-identical to
    the broadcast path (shared _rebuild assembly)."""
    import pandas as pd
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.linededup import SepSplitter, line_dedup

    # adversarial: machine-generated corpus where the duplicated-line
    # vocabulary is the whole corpus (every line appears >= 2 times)
    lines = [f"generated boilerplate line {i}" for i in range(300)]
    rng = np.random.default_rng(5)
    docs = ["\n".join(rng.choice(lines, size=6)) for _ in range(200)]
    docs += docs[:100]  # guarantee every line repeats
    ds = lambda: rd.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    ).repartition(5)

    sp = SepSplitter("\n")
    bcast = (
        line_dedup(ds(), "text", "doc_id", min_count=2, splitter=sp)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    joined = (
        line_dedup(ds(), "text", "doc_id", min_count=2, splitter=sp, broadcast_max_lines=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (bcast["n_lines_kept"] < bcast["n_lines"]).any()
    pd.testing.assert_frame_equal(bcast, joined[bcast.columns])


def test_line_dedup_join_path_mixed_corpus(ray_session, newline_corpus):
    """Join path on the regular mixed corpus (string rebuild + empty docs),
    against the brute-force reference."""
    import ray.data as rd

    from perfect_bloomfilter_ray.stages.linededup import SepSplitter, line_dedup

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(newline_corpus))), "text": newline_corpus})
    ).repartition(5)
    out = (
        line_dedup(ds, "text", "doc_id", min_count=2, splitter=SepSplitter("\n"),
                   broadcast_max_lines=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    bn, bk, bc, btxt = _brute_sep(newline_corpus, 2)
    assert out["n_lines"].tolist() == bn
    assert out["n_lines_kept"].tolist() == bk
    assert out["kept_chars"].tolist() == bc
    assert out["text"].tolist() == btxt
