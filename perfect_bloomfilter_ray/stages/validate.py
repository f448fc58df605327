"""Data-quality expectation checks (great-expectations-lite).

``validate_rules`` evaluates a rule list over a Dataset in ONE streaming
pass for all scalar rules (plus one pre-aggregated pass + tiny groupby
per uniqueness rule) and returns a violation
count per rule — the data-contract gate a training-data pipeline runs
before accepting an ingest batch. Rules are pure-Arrow predicates, so the
pass is vectorized and shuffle-free; only `unique` needs a shuffle, and it
ships per-batch pre-aggregated (value, count) partials like every distinct
pattern in this repo.

Rule forms (dicts):
  {"rule": "not_null", "col": c}
  {"rule": "in_range", "col": c, "lo": x, "hi": y}   # inclusive, nulls skip
  {"rule": "in_set",   "col": c, "values": [...]}
  {"rule": "matches",  "col": c, "pattern": r"..."}  # RE2-portable regex
  {"rule": "unique",   "col": c}   # violations = n_rows - n_distinct_non_null
                                   # (SQL count(*) - count(DISTINCT c): every
                                   # null row counts as a violation)

No reference counterpart (membership-only engine); part of the [RULE]
pipeline-hygiene surface next to stages/pii.py and stages/quality.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def validate_rules(ds: Dataset, rules: list[dict]) -> pd.DataFrame:
    """Violation counts per rule: ``(rule_id, rule, col, n_violations)``.

    ``unique`` counts ``n_rows - n_distinct_non_null`` (exactly SQL
    ``count(*) - count(DISTINCT col)`` — null keys are always violations);
    all other rules count rows failing the predicate. One streaming pass
    evaluates every non-unique rule together.
    """
    scalar_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] != "unique"]
    unique_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] == "unique"]

    def check(t: pa.Table) -> pa.Table:
        ids, viols = [], []
        for i, r in enumerate(rules):
            col_name = r["col"]
            if r["rule"] == "unique":
                continue
            c = t.column(col_name)
            if r["rule"] == "not_null":
                bad = c.null_count
            else:
                if r["rule"] == "in_range":
                    ok = pc.and_(
                        pc.greater_equal(c, pa.scalar(r["lo"])),
                        pc.less_equal(c, pa.scalar(r["hi"])),
                    )
                elif r["rule"] == "in_set":
                    ok = pc.is_in(c, value_set=pa.array(r["values"]))
                elif r["rule"] == "matches":
                    ok = pc.match_substring_regex(c, r["pattern"])
                else:
                    raise ValueError(f"unknown rule {r['rule']!r}")
                # violation = non-null value failing the predicate; nulls skip
                # (pc.is_in yields False — not null — for null inputs, so the
                # null-skip must be explicit)
                bad_mask = pc.and_(pc.is_valid(c), pc.invert(pc.fill_null(ok, False)))
                bad = pc.sum(bad_mask).as_py() or 0
            ids.append(i)
            viols.append(int(bad))
        return pa.table(
            {"rid": pa.array(ids, pa.int64()), "pv": pa.array(viols, pa.int64())}
        )

    out = {i: 0 for i, _ in scalar_rules}
    if scalar_rules:
        agg = (
            ds.map_batches(check, batch_format="pyarrow")
            .groupby("rid")
            .aggregate(Sum("pv", alias_name="v"))
            .to_pandas()
        )
        for r in agg.itertuples():
            out[int(r.rid)] = int(r.v)

    for i, r in unique_rules:
        col = r["col"]

        def partial(t: pa.Table, col=col) -> pa.Table:
            import polars as pl

            return (
                pl.from_arrow(t.select([col]))
                .group_by(col)
                .len(name="pc")
                .with_columns(pl.col("pc").cast(pl.Int64))
                .to_arrow()
            )

        counts = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(col)
            .aggregate(Sum("pc", alias_name="c"))
        )

        def surplus(t: pa.Table, col=col) -> pa.Table:
            # rows - distinct_non_null == SQL count(*) - count(DISTINCT col):
            # a null group contributes ALL its rows (distinct ignores nulls)
            c = t.column("c").to_numpy(zero_copy_only=False)
            valid = pc.is_valid(t.column(col)).to_numpy(zero_copy_only=False)
            return pa.table(
                {"s": pa.array([int(c.sum()) - int(valid.sum())], pa.int64())}
            )

        tot = counts.map_batches(surplus, batch_format="pyarrow").aggregate(
            Sum("s", alias_name="s")
        )
        out[i] = int(tot["s"] or 0)

    return pd.DataFrame(
        {
            "rule_id": np.arange(len(rules), dtype=np.int64),
            "rule": [r["rule"] for r in rules],
            "col": [r["col"] for r in rules],
            "n_violations": np.array([out[i] for i in range(len(rules))], dtype=np.int64),
        }
    )


def split_valid(ds: Dataset, rules: list[dict]) -> tuple[Dataset, Dataset]:
    """Dead-letter routing: returns ``(good, bad)`` where ``bad`` holds every
    row violating ANY scalar rule, annotated with a ``_violations``
    comma-joined rule-id list, and ``good`` holds the rest — the
    quarantine-sink pattern (bad rows land in a side table for triage
    instead of poisoning the pipeline or being silently dropped).

    Scalar rules only (``unique`` is a table-level property; use
    :func:`validate_rules` for it).  Null semantics MATCH validate_rules:
    a null value violates only ``not_null`` — range/set/regex rules skip
    nulls, so a row validate_rules declared clean is never quarantined.
    One shared predicate evaluation per branch; both branches stream — no
    materialization here, callers sink each side wherever they need (the
    bad side is typically tiny).
    """
    scalar_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] != "unique"]
    if len(scalar_rules) != len(rules):
        raise ValueError("split_valid handles scalar rules only (no 'unique')")

    def viol_matrix(t: pa.Table):
        import numpy as np

        flags = []
        for i, r in scalar_rules:
            c = t.column(r["col"])
            if r["rule"] == "not_null":
                bad = pc.is_null(c)
            else:
                if r["rule"] == "in_range":
                    ok = pc.and_(
                        pc.greater_equal(c, pa.scalar(r["lo"])),
                        pc.less_equal(c, pa.scalar(r["hi"])),
                    )
                elif r["rule"] == "in_set":
                    ok = pc.is_in(c, value_set=pa.array(r["values"]))
                elif r["rule"] == "matches":
                    ok = pc.match_substring_regex(pc.cast(c, pa.string()), r["pattern"])
                else:
                    raise ValueError(f"unknown rule {r['rule']!r}")
                # identical expression to validate_rules: violation = a
                # NON-NULL value failing the predicate; nulls skip
                bad = pc.and_(pc.is_valid(c), pc.invert(pc.fill_null(ok, False)))
            flags.append((i, np.asarray(pc.fill_null(bad, False))))
        any_bad = np.zeros(len(t), dtype=bool)
        for _, f in flags:
            any_bad |= f
        return flags, any_bad

    def good_fn(t: pa.Table) -> pa.Table:
        _, any_bad = viol_matrix(t)
        return t.filter(pa.array(~any_bad))

    def bad_fn(t: pa.Table) -> pa.Table:
        flags, any_bad = viol_matrix(t)
        t2 = t.filter(pa.array(any_bad))
        if len(t2) == 0:
            return t2.append_column("_violations", pa.array([], pa.string()))
        import numpy as np

        labels = [[] for _ in range(len(t))]
        for i, f in flags:
            for idx in np.flatnonzero(f):
                labels[idx].append(str(i))
        kept = [",".join(labels[i]) for i in np.flatnonzero(any_bad)]
        return t2.append_column("_violations", pa.array(kept, pa.string()))

    return (
        ds.map_batches(good_fn, batch_format="pyarrow"),
        ds.map_batches(bad_fn, batch_format="pyarrow"),
    )
