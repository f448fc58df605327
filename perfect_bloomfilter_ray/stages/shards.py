"""Training-shard packing: assign documents to fixed-budget output shards.

The last step of a training-data pipeline: documents are packed greedily
into shards of ~``budget`` cost units (tokens / chars / bytes) so each
downstream trainer file is near-uniform. Global greedy packing is inherently
sequential, so the scalable formulation is hierarchical:

- hash-partition documents into ``P`` coarse partitions (``part_col``) —
  each partition is one task, sized by stages/partitioning.choose_num_blocks;
- within a partition, order deterministically (``order_col``, ties by
  ``id_col``) and take an exclusive running sum of cost: the shard sequence
  number is ``cum // budget``. One vectorized cumsum per partition — no
  per-document loop, no global sort, no driver state.

A shard is identified by ``(part, seq)``; writers map that pair to one
output file, which is also the resume unit (skip finished (part, seq) pairs
on restart). Documents never move across partitions, so re-running any
partition reproduces its exact shard assignment — lineage is the pair
itself.

The deterministic order key makes the assignment engine-portable: the SQL
oracle (`packed_shard_stats`) reproduces it with a window running-sum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def pack_shards(
    ds: Dataset,
    cost_col: str,
    budget: int,
    part_col: str,
    order_col: str,
    id_col: str,
    seq_col: str = "shard_seq",
) -> Dataset:
    """Append the within-partition shard sequence number (``cum // budget``).

    ``part_col`` / ``order_col`` are caller-computed (typically 64-bit
    hashes of the document id) so the caller controls portability of the
    assignment; cost must be a non-negative integer column.
    """

    def per_part(t: pa.Table) -> pa.Table:
        okey = t.column(order_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cost = t.column(cost_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, okey))
        cum = np.zeros(len(cost), np.int64)
        np.cumsum(cost[order][:-1], out=cum[1:] if len(cost) else cum[:0])
        seq = cum // np.int64(budget)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return t.append_column(seq_col, pa.array(seq[inv]))

    return ds.groupby(part_col).map_groups(per_part, batch_format="pyarrow")


def deterministic_shuffle(
    ds: Dataset,
    id_col: str,
    mult: int = 2654435761,
    mod: int = 1_000_000_007,
    key_col: str = "shuffle_key",
) -> Dataset:
    """Deterministic global training-order shuffle: sort by the
    multiplicative-hash residue of ``id_col``.

    Training runs need a corpus-wide pseudo-random document order that is
    (a) reproducible across engines and re-runs and (b) resumable —
    `random_shuffle(seed=...)` satisfies neither across engine versions.
    The residue ``((id % mod) * (mult % mod)) % mod`` is computed in uint64
    modular arithmetic (explicitly reduced so it cannot wrap — the id range
    is unbounded), emitted as int64 (< mod, always positive), and the sort
    is Ray's range-partitioned distributed sort — the honest all-to-all at
    100 TB, pipelined block-wise rather than materialized.

    SQL-portable: ``ORDER BY (id % 1000000007) * (2654435761 % 1000000007)
    % 1000000007, id`` (BIGINT-safe: the product is < 2^63).
    """
    u_mod = np.uint64(mod)
    u_mult = np.uint64(mult % mod)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        r = ((ids % u_mod) * u_mult) % u_mod
        return t.append_column(key_col, pa.array(r.view(np.int64)))

    return ds.map_batches(add_key, batch_format="pyarrow").sort([key_col, id_col])


def write_jsonl_shards(
    ds: Dataset,
    out_dir: str,
    part_col: str = "part",
    seq_col: str = "shard_seq",
    order_cols: list[str] | None = None,
) -> dict:
    """Write one JSONL file per ``(part, seq)`` training shard — the trainer-
    facing sink for pack_shards output. Returns (and persists) a manifest.

    Layout/resume contract (same as checkpoint.resumable_etl, at shard
    granularity): file ``part-PPPPP-seq-SSSSS.jsonl``, written to a temp
    name and published with an atomic rename; a re-run SKIPS every (part,
    seq) whose file already exists, so a failed 100-TB export loses at most
    the shards in flight. Each shard is written by the task that owns its
    group — the driver never sees record data, only the one-row-per-shard
    manifest.

    ``order_cols`` fixes the record order inside each file (pass the pack
    ordering columns to make files byte-reproducible across runs).
    """
    import json
    import os

    import polars as pl

    os.makedirs(out_dir, exist_ok=True)

    def write_group(t: pa.Table) -> pa.Table:
        part = t.column(part_col)[0].as_py()
        seq = t.column(seq_col)[0].as_py()
        name = f"part-{part:05d}-seq-{seq:05d}.jsonl"
        path = os.path.join(out_dir, name)
        rows = len(t)
        if os.path.exists(path):
            return pa.table(
                {"part": pa.array([part], pa.int64()), "seq": pa.array([seq], pa.int64()),
                 "rows": pa.array([rows], pa.int64()), "path": pa.array([path]),
                 "resumed": pa.array([True])}
            )
        df = pl.from_arrow(t.drop_columns([part_col, seq_col]))
        if order_cols:
            df = df.sort(order_cols)
        tmp = path + ".tmp"
        df.write_ndjson(tmp)
        os.replace(tmp, path)
        return pa.table(
            {"part": pa.array([part], pa.int64()), "seq": pa.array([seq], pa.int64()),
             "rows": pa.array([rows], pa.int64()), "path": pa.array([path]),
             "resumed": pa.array([False])}
        )

    shard_rows = (
        ds.groupby([part_col, seq_col])
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["part", "seq"])
        .reset_index(drop=True)
    )
    manifest = {
        "out_dir": out_dir,
        "num_shards": int(len(shard_rows)),
        "num_resumed": int(shard_rows["resumed"].sum()),
        "num_written": int((~shard_rows["resumed"]).sum()),
        "total_rows": int(shard_rows["rows"].sum()),
        "shards": shard_rows.to_dict("records"),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def chunk_documents(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    overlap: int = 16,
) -> Dataset:
    """Split each document into fixed-size token chunks with overlap — the
    context-window prep step for training / retrieval indexing.

    Tokens are the normalized ``[a-z0-9]+`` stream (lowercased); chunk ``k``
    covers tokens ``[k·step, min(k·step + size, n))`` with
    ``step = size − overlap``; a doc with ``n ≤ size`` tokens yields exactly
    one chunk. Output: ``(id_col, chunk_idx, n_tokens, chunk)``.

    Pure per-batch expansion — ONE ``map_batches`` pass, no shuffle; rows
    multiply by ~``1/(1 − overlap/size)``. Everything is vectorized: chunk
    counts → flat (doc, k) index arithmetic, one polars explode for tokens
    and one group_by join for the chunk strings.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap

    import polars as pl

    def chunks(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(t.column(text_col))
        toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        ids = t.column(id_col).to_numpy()
        keep = lens > 0
        n_chunks = np.where(
            keep, np.maximum(1, (np.maximum(lens - size, 0) + step - 1) // step + 1), 0
        )
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "chunk_idx": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        from perfect_bloomfilter_ray.stages.decontam import _ranges

        doc_of = np.repeat(np.arange(len(lens)), n_chunks)
        k = _ranges(n_chunks)
        c_start = k * step
        c_len = np.minimum(c_start + size, lens[doc_of]) - c_start
        # flat token gather: chunk rows expand to token index runs
        begins = np.cumsum(lens) - lens
        flat_start = begins[doc_of] + c_start
        tok_idx = np.repeat(flat_start, c_len) + _ranges(c_len)
        flat = toks.explode().drop_nulls()
        chunk_of = np.repeat(np.arange(total), c_len)
        joined = (
            pl.DataFrame({"_c": chunk_of, "tok": flat.gather(tok_idx)})
            .group_by("_c", maintain_order=True)
            .agg(pl.col("tok").str.join(" ").alias("chunk"))
        )
        return pa.table(
            {
                id_col: pa.array(ids[doc_of]),
                "chunk_idx": pa.array(k.astype(np.int64)),
                "n_tokens": pa.array(c_len.astype(np.int64)),
                "chunk": joined["chunk"].to_arrow(),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(chunks, batch_format="pyarrow")


def select_within_budget(
    ds: Dataset,
    score_col: str,
    cost_col: str,
    id_col: str,
    budget: float,
    bins: int = 512,
    refine_rounds: int = 4,
    boundary_limit: int = 500_000,
) -> Dataset:
    """Keep the best-scoring rows whose cumulative ``cost_col`` fits a global
    ``budget``, rows ordered by ``(score desc, id asc)`` — the "top documents
    up to a token budget" corpus-selection step. SQL equivalent:
    ``WHERE sum(cost) OVER (ORDER BY score DESC, id) <= budget``.

    A global sort + prefix sum would range-shuffle the whole corpus; this is
    a distributed THRESHOLD SEARCH instead (the top-k-by-weight trick):

    1. one aggregate pass for the score range;
    2. per-batch cost histograms over ``bins`` score buckets (``bins`` rows
       leave each task; one tiny groupby-sum): walking buckets best-first,
       every bucket that fully fits is kept wholesale and the first bucket
       that crosses the budget becomes the BOUNDARY window;
    3. the boundary window re-histograms (``refine_rounds``× max, each round
       shrinking it ~``bins``-fold) until it holds ≤ ``boundary_limit`` rows
       or stops shrinking (all-tied scores);
    4. the final boundary slice is collected (bounded by step 3) and the
       exact ``(score desc, id)`` prefix rule resolves it against the
       remaining budget; the output is a streaming filter — full-keep score
       region OR broadcast boundary-id set.

    Exactness contract: costs should be integer-valued (token/char counts) —
    then every partial sum here and the SQL window cumsum are exact in
    float64 (< 2^53) and the result is row-identical to the SQL definition
    regardless of summation order. A corpus where one exact score value
    alone exceeds ``boundary_limit`` rows falls back to collecting that tied
    slice (documented driver-size cap).
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    stats = ds.aggregate(Min(score_col, alias_name="lo"), Max(score_col, alias_name="hi"))
    if stats["lo"] is None:
        return ds  # empty input
    w_lo, w_hi = float(stats["lo"]), float(stats["hi"])
    w_inc = True  # window upper edge inclusive?
    kept_cost = 0.0
    full_keep_min = np.inf  # rows with score >= this are fully kept

    def window_mask(s: np.ndarray, lo, hi, inc):
        m = s >= lo
        return m & ((s <= hi) if inc else (s < hi))

    def hist(lo, hi, inc):
        edges = np.linspace(lo, hi, bins + 1)

        def part(t: pa.Table) -> pa.Table:
            s = t.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
            c = t.column(cost_col).to_numpy(zero_copy_only=False).astype(np.float64)
            m = window_mask(s, lo, hi, inc)
            if not m.any():
                return pa.table(
                    {"b": pa.array([], pa.int64()), "pc": pa.array([], pa.float64()), "pn": pa.array([], pa.int64())}
                )
            b = np.clip(np.digitize(s[m], edges) - 1, 0, bins - 1)
            pc = np.bincount(b, weights=c[m], minlength=bins)
            pn = np.bincount(b, minlength=bins)
            nz = np.flatnonzero(pn)
            return pa.table({"b": pa.array(nz), "pc": pa.array(pc[nz]), "pn": pa.array(pn[nz])})

        h = (
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("b")
            .aggregate(Sum("pc", alias_name="cost"), Sum("pn", alias_name="n"))
            .to_pandas()
        )
        h = h.set_index("b").sort_index(ascending=False)  # best (highest score) first
        return edges, h

    done = False
    for _ in range(refine_rounds):
        edges, h = hist(w_lo, w_hi, w_inc)
        boundary_b = None
        for b, row in h.iterrows():
            c, n = float(row["cost"]), int(row["n"])
            if kept_cost + c <= budget:
                kept_cost += c
                continue
            boundary_b = (int(b), n)
            break
        if boundary_b is None:  # whole window fits → keep it all, no boundary
            full_keep_min = min(full_keep_min, w_lo)
            done = True
            break
        b, n = boundary_b
        # buckets above b are fully kept: their scores are >= edges[b+1]
        # (bucket b is [edges[b], edges[b+1]), top bucket inclusive)
        if b + 1 <= bins - 1:
            full_keep_min = min(full_keep_min, edges[b + 1])
        new_lo, new_hi = edges[b], edges[b + 1]
        new_inc = w_inc if b == bins - 1 else False
        if n <= boundary_limit or (new_lo == w_lo and new_hi == w_hi and new_inc == w_inc):
            w_lo, w_hi, w_inc = new_lo, new_hi, new_inc
            break  # small enough, or stopped shrinking (tied scores)
        w_lo, w_hi, w_inc = new_lo, new_hi, new_inc

    # resolve the boundary slice exactly on the driver
    keep_ids = np.empty(0, dtype=object)
    if not done:
        remaining = budget - kept_cost

        def pick(t: pa.Table) -> pa.Table:
            s = t.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
            m = window_mask(s, w_lo, w_hi, w_inc)
            return t.filter(pa.array(m)).select([id_col, score_col, cost_col])

        rows = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        if len(rows):
            rows = rows.sort_values([score_col, id_col], ascending=[False, True])
            cum = rows[cost_col].to_numpy(dtype=np.float64).cumsum()
            keep_ids = rows.loc[cum <= remaining, id_col].to_numpy()

    ids_ref = ray.put(keep_ids)
    floor = full_keep_min

    def final(t: pa.Table) -> pa.Table:
        ks = ray.get(ids_ref)
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(np.float64)
        m = s >= floor
        if len(ks):
            m |= np.isin(t.column(id_col).to_numpy(zero_copy_only=False), ks)
        return t.filter(pa.array(m))

    return ds.map_batches(final, batch_format="pyarrow")


def greedy_max_coverage(
    docs: Dataset,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
):
    """Greedy maximum-coverage corpus selection (Nemhauser et al. 1978 —
    the classic (1-1/e)-approximation submodular greedy): ``k`` rounds,
    each picking the document whose word ``n``-grams cover the most
    not-yet-covered grams (tie: smallest id). The dual of token-budget
    selection: pick a FIXED NUMBER of documents maximizing coverage,
    the diversity criterion in data-pruning / active-learning curation.

    Scale shape: the distinct (doc, gram-hash) pair set is built in ONE
    ``map_batches`` pass (a document's text lives in exactly one row, so a
    per-batch lexsort-dedup IS the global distinct set — no shuffle) and
    materialized once, ~16 B/row in the object store. Every round is one
    SHUFFLE-FREE scan of those pairs: the covered set broadcasts as a
    sorted int64 array (bounded by k x max-doc-vocab), each block emits a
    per-block top-1 partial (complete per doc — a doc's pairs never span
    blocks), and an O(blocks) driver fold picks the winner; one
    winner-filtered scan then collects its grams into the covered set.
    Gram identity is the 64-bit rolling hash shared with
    decontam/ngramdup (collisions ~2e-19/pair — the repo-standard
    contract). Returns a pandas frame (step, doc_id, gain, covered_total);
    stops early when no document adds coverage.
    """
    import pandas as pd
    import polars as pl
    import pyarrow.compute as pc
    import ray

    from perfect_bloomfilter_ray.stages.decontam import _ngram_hashes

    def pairs_batch(t: pa.Table) -> pa.Table:
        texts = pl.from_arrow(t.column(text_col))
        if isinstance(texts, pl.DataFrame):
            texts = texts.to_series()
        hs, di = _ngram_hashes(texts, n)
        if len(hs) == 0:
            return pa.table(
                {"_id64": pa.array([], pa.int64()), "g": pa.array([], pa.int64())}
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        o = np.lexsort((hs.view(np.int64), di))
        d_s, h_s = di[o], hs[o]
        new = np.ones(len(o), dtype=bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        return pa.table(
            {
                "_id64": pa.array(ids[d_s[new]].astype(np.int64)),
                "g": pa.array(h_s[new].view(np.int64)),
            }
        )

    pairs = (
        docs.select_columns([id_col, text_col])
        .map_batches(pairs_batch, batch_format="pyarrow")
        .materialize()
    )

    covered = np.empty(0, dtype=np.int64)
    rows: list[tuple[int, int, int, int]] = []
    for step in range(1, k + 1):
        cov_ref = ray.put(np.sort(covered))

        def block_top1(t: pa.Table, _c=cov_ref) -> pa.Table:
            cov = ray.get(_c)
            ids = t.column("_id64").to_numpy(zero_copy_only=False)
            g = t.column("g").to_numpy(zero_copy_only=False)
            if len(cov):
                idx = np.searchsorted(cov, g)
                idx[idx >= len(cov)] = len(cov) - 1
                m = cov[idx] != g
                ids, g = ids[m], g[m]
            if len(ids) == 0:
                return pa.table(
                    {"doc": pa.array([], pa.int64()), "gain": pa.array([], pa.int64())}
                )
            gains = pl.DataFrame({"doc": ids}).group_by("doc").len(name="gain")
            d = gains["doc"].to_numpy()
            gn = gains["gain"].to_numpy().astype(np.int64)
            best = np.lexsort((d, -gn))[0]
            return pa.table({"doc": pa.array(d[best : best + 1]), "gain": pa.array(gn[best : best + 1])})

        tops = pairs.map_batches(block_top1, batch_format="pyarrow", batch_size=None).to_pandas()
        if "gain" not in tops.columns:  # all blocks empty: to_pandas drops columns
            break
        tops = tops[tops["gain"] > 0]
        if len(tops) == 0:
            break
        sel = np.lexsort((tops["doc"].to_numpy(), -tops["gain"].to_numpy()))[0]
        win = int(tops["doc"].iloc[sel])
        gain = int(tops["gain"].iloc[sel])

        def winner_grams(t: pa.Table, _w=win) -> pa.Table:
            m = pc.equal(t.column("_id64"), pa.scalar(_w, pa.int64()))
            return t.filter(m).select(["g"])

        wg = pairs.map_batches(winner_grams, batch_format="pyarrow").to_pandas()["g"].to_numpy()
        covered = np.union1d(covered, wg)
        rows.append((step, win, gain, len(covered)))

    return pd.DataFrame(rows, columns=["step", "doc_id", "gain", "covered_total"])
