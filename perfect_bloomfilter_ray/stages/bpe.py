"""Distributed BPE vocabulary induction (Sennrich et al. 2016).

The tokenizer-training shape every LLM data pipeline needs: the corpus-sized
work — counting word frequencies — runs distributed (map-side per-batch
partial counts, one groupby-sum exchange, exact top-``top_words`` via the
tree-reduce ``global_top_k``), and the merge loop then runs on the BOUNDED
word-frequency table (the standard trainer architecture: sentencepiece / the
GPT-2 trainer operate on word counts, not the raw corpus — vocab growth is
capped by construction, so driver-side state is O(top_words), independent of
corpus size).

Determinism: merges pick (max pair count, then lexicographically smallest
pair) — rerun- and partition-order-stable, which the driver's oracle
comparison relies on. The incremental pair-count maintenance (inverted
pair→word index) makes the loop O(affected words) per merge instead of a
full recount.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa

from ray.data import Dataset


_WORD_RE = r"[a-z0-9]+"
_EOW = "</w>"


def word_frequencies(ds: Dataset, text_col: str = "text", top_words: int = 30_000) -> pa.Table:
    """Exact corpus word frequencies, bounded to the ``top_words`` most
    frequent (ties broken lexicographically). One exchange over distinct
    (word, partial-count) pairs per block."""
    import polars as pl

    from ray.data.aggregate import Sum

    from perfect_bloomfilter_ray.stages.topk import global_top_k

    def partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(pa.table({"text": t.column(text_col)}))
        return (
            df.with_columns(pl.col("text").str.to_lowercase().str.extract_all(_WORD_RE).alias("w"))
            .drop("text")
            .explode("w")
            .drop_nulls("w")
            .group_by("w")
            .len(name="pcnt")
            .with_columns(pl.col("pcnt").cast(pl.Int64))
            .to_arrow()
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("pcnt", alias_name="cnt"))
    )
    top = global_top_k(counts, "cnt", top_words, descending=True, tie_cols=["w"])
    return top.to_pandas().sort_values(["cnt", "w"], ascending=[False, True]).pipe(pa.Table.from_pandas, preserve_index=False)


def train_bpe(words: list[str], counts: list[int], num_merges: int) -> list[tuple[str, str, int]]:
    """Greedy BPE merge loop over a bounded word-frequency table.

    Returns ``[(left, right, support), ...]`` in merge order, where support
    is the pair count at merge time. Symbols start as characters plus an
    end-of-word marker; each merge concatenates the globally most frequent
    adjacent pair (count desc, pair lexicographic asc — deterministic)."""
    syms: list[list[str]] = [list(w) + [_EOW] for w in words]
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (s, c) in enumerate(zip(syms, counts)):
        for p in zip(s, s[1:]):
            pair_counts[p] += c
            pair_words[p].add(wi)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        (l, r), support = best
        merged = l + r
        merges.append((l, r, support))
        for wi in list(pair_words[(l, r)]):
            s, c = syms[wi], counts[wi]
            # remove this word's current pair contributions, apply the merge,
            # re-add the new ones (stale pair_words memberships are tolerated:
            # a stale word subtracts and re-adds the same pairs — net zero)
            for p in zip(s, s[1:]):
                pair_counts[p] -= c
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_words[p].add(wi)
        del pair_words[(l, r)]
        pair_counts[(l, r)] = 0
    return merges


def bpe_merge_table(
    ds: Dataset, text_col: str = "text", num_merges: int = 100, top_words: int = 30_000
) -> pa.Table:
    """End-to-end: distributed word counting → bounded merge loop → Arrow
    table (rank, left, right, merged, support)."""
    wf = word_frequencies(ds, text_col, top_words)
    words = wf.column("w").to_pylist()
    counts = wf.column("cnt").to_pylist()
    merges = train_bpe(words, counts, num_merges)
    return pa.table(
        {
            "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
            "left": pa.array([m[0] for m in merges]),
            "right": pa.array([m[1] for m in merges]),
            "merged": pa.array([m[0] + m[1] for m in merges]),
            "support": pa.array([m[2] for m in merges], pa.int64()),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word (greedy lowest-rank-first, the
    standard BPE encoder): repeatedly merge the adjacent pair with the
    smallest merge rank until none applies."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def fertility_report(ds: Dataset, text_col: str, num_merges: int = 200, top_words: int = 30_000) -> dict:
    """Tokenizer fertility (tokens emitted per word, occurrence-weighted) of
    a BPE vocabulary trained on the SAME corpus — the standard tokenizer-
    quality number (lower = better compression; chars+1 baseline without
    merges). Train once (bounded merge loop), broadcast the rank table,
    encode per batch over batch-unique words only."""
    import ray
    from ray.data.aggregate import Sum

    wf = word_frequencies(ds, text_col, top_words)
    merges = train_bpe(wf.column("w").to_pylist(), wf.column("cnt").to_pylist(), num_merges)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    ranks_ref = ray.put(ranks)

    import polars as pl

    def part(t: pa.Table) -> pa.Table:
        rk = ray.get(ranks_ref)
        df = pl.from_arrow(pa.table({"text": t.column(text_col)}))
        words = (
            df.with_columns(pl.col("text").str.to_lowercase().str.extract_all(_WORD_RE).alias("w"))
            .drop("text")
            .explode("w")
            .drop_nulls("w")
            .group_by("w")
            .len(name="n")
        )
        toks = np.array([len(encode_word(w, rk)) for w in words["w"].to_list()], dtype=np.int64)
        n = words["n"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "words": pa.array([int(n.sum())], pa.int64()),
                "tokens": pa.array([int((toks * n).sum())], pa.int64()),
                "chars": pa.array(
                    [int((np.array([len(w) + 1 for w in words["w"].to_list()], dtype=np.int64) * n).sum())],
                    pa.int64(),
                ),
            }
        )

    agg = ds.map_batches(part, batch_format="pyarrow").sum(["words", "tokens", "chars"])
    words, tokens, chars = int(agg["sum(words)"]), int(agg["sum(tokens)"]), int(agg["sum(chars)"])
    return {
        "num_merges": len(merges),
        "words": words,
        "tokens": tokens,
        "fertility": round(tokens / max(words, 1), 6),
        "baseline_chars_per_word": round(chars / max(words, 1), 6),
    }
