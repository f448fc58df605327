"""Blocked fuzzy-match pair join (entity-resolution blocking + hamming).

Finds document pairs whose text prefixes are within a hamming distance —
the classic blocked record-linkage shape: an all-pairs comparison is
O(n²) and dead at corpus scale, so rows are first grouped into BLOCKS by
cheap deterministic keys (source, length bucket, …) and only within-block
pairs are compared. The blocking keys are the documented partitioning
assumption: a true match split across blocks is never compared (recall is
bounded by the blocking scheme; the standard trade, cf. Christen 2012).

Shape mirrors ``stages/cooccur.py``: coarse hash partition on the block
keys (all of a block co-locates), ONE vectorized partition pass (per-block
char-matrix pairwise compare — blocks are small by construction, the
compare is numpy broadcasting, O(|block|²·L) on uint32 char codes), no
driver materialization. Output: (id_a, id_b, dist) with id_a < id_b.

The hamming comparison is over the first ``prefix_len`` CHARACTERS (not
bytes) of the lowercased text, right-padded with ``pad_char`` — exactly
DuckDB's ``hamming(rpad(substr(lower(text),1,L), L, pad), …)``, so the
operator is exact-SQL-oracle-checkable (`prefix_hamming_pairs`).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.stages.partitioning import choose_num_blocks
from perfect_bloomfilter_ray.stages.topk import _multi_key_part


def blocked_hamming_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    prefix_len: int = 24,
    max_dist: int = 3,
    pad_char: str = "~",
    num_blocks: int | None = None,
) -> Dataset:
    """All within-block pairs with prefix hamming distance ≤ ``max_dist``."""
    nb = choose_num_blocks(ds, num_blocks)

    def prep_route(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([id_col, text_col, *block_cols]))
        df = df.with_columns(
            pl.col(text_col)
            .fill_null("")
            .str.to_lowercase()
            .str.slice(0, prefix_len)
            .str.pad_end(prefix_len, pad_char)
            .alias("_pfx")
        ).drop(text_col)
        return _multi_key_part(df.to_arrow(), block_cols, nb)

    def pairs_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        ids_a: list[np.ndarray] = []
        ids_b: list[np.ndarray] = []
        dists: list[np.ndarray] = []
        # python loop over BLOCKS (small by the blocking contract); the
        # pairwise compare inside each block is fully vectorized
        for _, g in df.group_by(block_cols):
            n = len(g)
            if n < 2:
                continue
            ids = g[id_col].to_numpy()
            # char-level matrix (n, prefix_len): utf-32 so multibyte chars
            # count one position, matching SQL hamming semantics
            mat = np.frombuffer(
                "".join(g["_pfx"].to_list()).encode("utf-32-le"), dtype=np.uint32
            ).reshape(n, prefix_len)
            iu, ju = np.triu_indices(n, k=1)
            d = (mat[iu] != mat[ju]).sum(axis=1)
            m = d <= max_dist
            if not m.any():
                continue
            a, b = ids[iu[m]], ids[ju[m]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            ids_a.append(lo)
            ids_b.append(hi)
            dists.append(d[m].astype(np.int64))
        if not ids_a:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(ids_a)),
                "id_b": pa.array(np.concatenate(ids_b)),
                "dist": pa.array(np.concatenate(dists)),
            }
        )

    return (
        ds.map_batches(prep_route, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(pairs_block, batch_format="pyarrow")
    )


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Plain Levenshtein DP (matches DuckDB's ``levenshtein``). With ``cap``,
    early-exits once the distance provably exceeds it (banded row minimum)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    prev = list(range(lb + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * lb
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[lb]


def damerau_levenshtein(a: str, b: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein (Lowrance & Wagner 1975) — adjacent
    transpositions may interleave with other edits; matches DuckDB's
    ``damerau_levenshtein`` (e.g. 'ca' vs 'abc' = 2, where the restricted
    OSA variant gives 3)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def edit_vocab_pairs(
    ds: Dataset,
    text_col: str = "text",
    top_words: int = 5000,
    max_distance: int = 2,
    metric: str = "levenshtein",
) -> pa.Table:
    """Edit-distance-≤``max_distance`` pairs within the corpus vocabulary —
    SymSpell deletion-neighborhood blocking (Garbe 2012), the
    spell-correction / query-rewrite candidate miner.

    The corpus-sized work (exact word frequencies + top-``top_words`` cut)
    runs distributed via :func:`stages.bpe.word_frequencies`; the blocking
    then runs on the BOUNDED vocabulary: every word emits itself plus every
    deletion variant up to depth ``max_distance`` as block keys; two words
    within edit distance d share a depth-≤d deletion key (the SymSpell
    superset property), and an exact Levenshtein verify (capped DP) keeps
    true pairs only. All-pairs is O(V²·L²); deletion blocking is O(V·L^d)
    keys with tiny buckets — the same scheme scales to unbounded vocab as
    an explode + groupby if ``top_words`` is lifted. The verify loops
    Python over CANDIDATES (bounded by construction), not over the corpus.

    Returns (wa, wb, dist) with wa < wb, sorted — row-identical to the SQL
    ``levenshtein(a, b) <= d`` cross-join oracle over the same top-V rule.
    """
    from collections import defaultdict

    from perfect_bloomfilter_ray.stages.bpe import word_frequencies

    wf = word_frequencies(ds, text_col, top_words)
    words = wf.column("w").to_pylist()

    def deletions(w: str, depth: int) -> set[str]:
        out = {w}
        frontier = {w}
        for _ in range(depth):
            nxt = set()
            for v in frontier:
                for i in range(len(v)):
                    nxt.add(v[:i] + v[i + 1 :])
            nxt -= out
            out |= nxt
            frontier = nxt
        return out

    buckets: defaultdict[str, list[int]] = defaultdict(list)
    for wi, w in enumerate(words):
        for k in deletions(w, max_distance):
            buckets[k].append(wi)
    cand = set()
    for members in buckets.values():
        if len(members) > 1:
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    a, b = words[members[x]], words[members[y]]
                    if a != b:
                        cand.add((min(a, b), max(a, b)))
    verified = []
    for a, b in sorted(cand):
        if metric == "damerau":
            d = damerau_levenshtein(a, b)
        else:
            d = levenshtein(a, b, cap=max_distance)
        if d <= max_distance:
            verified.append((a, b, d))
    return pa.table(
        {
            "wa": pa.array([p[0] for p in verified]),
            "wb": pa.array([p[1] for p in verified]),
            "dist": pa.array([p[2] for p in verified], pa.int64()),
        }
    )


def sorted_neighborhood_pairs(
    ds: Dataset,
    id_col: str,
    key_col: str,
    window: int = 5,
    num_blocks: int | None = None,
) -> Dataset:
    """Sorted-neighborhood ER blocking (Hernandez-Stolfo 1995): candidate
    pairs are rows within ``window`` positions of each other in the GLOBAL
    (key, id) order. Exact equivalent of the SQL window join
    ``b.rn - a.rn BETWEEN 1 AND window-1`` over ``row_number() OVER
    (ORDER BY key, id)``.

    Distributed in two bounded exchanges, no sort shuffle and no driver
    materialization of rows:

    1. **Global ranks** — keys bucket by their 2-char prefix (prefix buckets
       are contiguous in lexicographic order, so per-bucket offsets from one
       tiny count pass turn local sorted positions into exact global ranks).
       Keys must be ASCII-normalized upstream: python/polars/DuckDB then all
       agree on binary ordering. Skew note: one shared 2-char prefix lands
       in one partition — the standard blocking-key contract (cf.
       ``blocked_hamming_pairs``).
    2. **Windowed pairs** — each (id, rank) row routes to rank-buckets
       ``r // window`` and ``r // window + 1``; any pair closer than
       ``window`` co-locates in the higher rank's bucket, where a shift-by-d
       scan over the (dense, contiguous) ranks emits it exactly once.

    Output: ``(id_a, id_b, rank_gap)`` with id_a the LOWER-RANK member.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    nb = choose_num_blocks(ds, num_blocks)

    def project(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([id_col, key_col]))
        df = df.with_columns(pl.col(key_col).fill_null("").str.slice(0, 2).alias("_bk"))
        return df.to_arrow()

    slim = ds.map_batches(project, batch_format="pyarrow")

    # pass 1: bucket counts -> exact global offsets (bounded: <= alphabet^2)
    import ray
    from ray.data.aggregate import Count

    counts = slim.groupby("_bk").aggregate(Count(alias_name="n")).to_pandas()
    if counts.empty:  # empty input: groupby yields a column-less frame
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "rank_gap": pa.array([], pa.int64())})
        )
    counts = counts.sort_values("_bk").reset_index(drop=True)
    counts["off"] = counts["n"].cumsum().shift(1, fill_value=0).astype("int64")
    off_ref = ray.put(dict(zip(counts["_bk"], counts["off"])))

    def rank_block(t: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        df = pl.from_arrow(t.drop_columns(["_part"]))
        outs = []
        for (bk,), g in df.group_by(["_bk"]):
            g = g.sort([key_col, id_col])
            r = np.arange(len(g), dtype=np.int64) + int(offs[bk])
            outs.append(pa.table({"id": g[id_col].to_arrow(), "rank": pa.array(r)}))
        if not outs:
            return pa.table({"id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    ranked = (
        slim.map_batches(lambda t: _multi_key_part(t, ["_bk"], nb), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(rank_block, batch_format="pyarrow")
    )

    w = int(window)

    def fanout(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy()
        b0 = r // w
        ids = t.column("id").to_numpy()
        return pa.table(
            {
                "id": pa.array(np.concatenate([ids, ids])),
                "rank": pa.array(np.concatenate([r, r])),
                "_rb": pa.array(np.concatenate([b0, b0 + 1])),
            }
        )

    def pairs_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.drop_columns(["_part"]))
        a_out, b_out, d_out = [], [], []
        for (rb,), g in df.group_by(["_rb"]):
            g = g.sort("rank")
            r = g["rank"].to_numpy()
            ids = g["id"].to_numpy()
            for d in range(1, w):
                if len(r) <= d:
                    break
                lo, hi = r[:-d], r[d:]
                # dense ranks: distance-d neighbours are exactly d apart;
                # attribute each pair to the HIGHER rank's home bucket
                m = (hi - lo == d) & (hi // w == rb)
                if m.any():
                    a_out.append(ids[:-d][m])
                    b_out.append(ids[d:][m])
                    d_out.append(np.full(int(m.sum()), d, dtype=np.int64))
        if not a_out:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "rank_gap": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out)),
                "id_b": pa.array(np.concatenate(b_out)),
                "rank_gap": pa.array(np.concatenate(d_out)),
            }
        )

    return (
        ranked.map_batches(fanout, batch_format="pyarrow")
        .map_batches(lambda t: _multi_key_part(t, ["_rb"], nb), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(pairs_block, batch_format="pyarrow")
    )


def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity, bit-identical to DuckDB's
    ``jaro_winkler_similarity``: match window ``max(la,lb)//2 - 1``,
    transpositions = FLOOR(out-of-order matches / 2), Winkler prefix bonus
    (cap 4, weight 0.1) only above the 0.7 boost threshold, and 0.0 when
    either string is empty (including '' vs '' — DuckDB's convention)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    matched_b = [False] * lb
    a_match = []
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not matched_b[j] and b[j] == ca:
                matched_b[j] = True
                a_match.append(ca)
                break
    m = len(a_match)
    if m == 0:
        return 0.0
    b_match = [b[j] for j in range(lb) if matched_b[j]]
    t = sum(1 for x, y in zip(a_match, b_match) if x != y) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > 0.7:
        l = 0
        for x, y in zip(a, b):
            if x == y and l < 4:
                l += 1
            else:
                break
        jaro += l * 0.1 * (1.0 - jaro)
    return jaro


def blocked_jaro_winkler_pairs(
    ds: Dataset,
    block_col: str,
    name_col: str,
    threshold: float = 0.75,
) -> Dataset:
    """Record-linkage candidate scoring: within each block, every pair of
    DISTINCT names with Jaro-Winkler similarity ≥ ``threshold``. Output
    ``(block, name_a, name_b)`` with ``name_a < name_b`` — ids only, no
    float column, so the result hashes bit-exactly against the SQL
    self-join oracle (both sides compute identical IEEE doubles; verified
    bit-equal to DuckDB across the full pair domain).

    Scale shape: one hash exchange on ``block_col`` (the standard-blocking
    exchange every ER pipeline needs anyway), then per-block work on the
    DISTINCT-name vocabulary — bounded like :func:`edit_vocab_pairs`'s, so
    the pairwise loop runs over the bounded name domain, never corpus rows.
    """

    def per_block(t: pa.Table) -> pa.Table:
        names = pc.unique(t.column(name_col)).to_pylist()
        names = sorted(n for n in names if n is not None)
        blk = t.column(block_col)[0].as_py()
        out_a: list[str] = []
        out_b: list[str] = []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                if jaro_winkler(names[i], names[j]) >= threshold:
                    out_a.append(names[i])
                    out_b.append(names[j])
        bt = t.schema.field(block_col).type
        return pa.table(
            {
                block_col: pa.array([blk] * len(out_a), type=bt),
                "name_a": pa.array(out_a, pa.string()),
                "name_b": pa.array(out_b, pa.string()),
            }
        )

    return ds.groupby(block_col).map_groups(per_block, batch_format="pyarrow")
