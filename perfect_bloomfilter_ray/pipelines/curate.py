"""Corpus curation — the canonical training-data preparation chain.

filter (lang allowlist + length band + optional quality floor)
  → exact dedup (content-fingerprint routed, keep lowest id)
  → optional near-duplicate removal (MinHash-LSH clusters)
  → per-doc enrichment stats

Everything streams: filters are vectorized Arrow masks inside ``map_batches``,
dedup shuffles only fingerprint-routed slim rows (stages.dedup), near-dup
clustering broadcasts a drop set sized by the duplicate count — the corpus
itself is never materialized. At 100 TB this is one pass over the data plus
the dedup shuffles of slim rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from perfect_bloomfilter_ray.stages.dedup import drop_near_duplicates, exact_dedup


def curate(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en", "de"),
    min_chars: int = 200,
    max_chars: int | None = None,
    near_dup: bool = False,
    near_dup_threshold: float = 0.7,
) -> Dataset:
    """Filter + dedup a document Dataset; returns the curated Dataset.

    The lang/length predicates are deliberately SQL-expressible so the whole
    exact path is oracle-checkable; heuristic filters (quality, lang-id) can
    be layered on via ``functions.text`` before calling this.
    """
    lang_set = pa.array(list(langs))

    def keep(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column(text_col))
        mask = pc.and_(pc.is_in(t.column(lang_col), value_set=lang_set), pc.greater_equal(n, pa.scalar(min_chars)))
        if max_chars is not None:
            mask = pc.and_(mask, pc.less_equal(n, pa.scalar(max_chars)))
        return t.filter(mask)

    filtered = ds.map_batches(keep, batch_format="pyarrow")
    deduped = exact_dedup(filtered, text_col, id_col)
    if near_dup:
        deduped = drop_near_duplicates(deduped, text_col, id_col, threshold=near_dup_threshold)
    return deduped


def model_quality_filter(
    ds: Dataset,
    fit: dict,
    feature_fn,
    threshold: float = 0.0,
    text_col: str = "text",
    score_col: str = "quality_logit",
) -> Dataset:
    """Learned quality gate for the curation waterfall: score every document
    with TRAINED weights (a ``stages.logreg.logreg_fit`` result — the
    fastText-classifier shape) through the broadcast-weights inference actor
    pool (stages/inference.py: ``ray.put`` once, ``ray.get`` once per actor
    in ``__init__``), keep rows with logit ≥ ``threshold`` (logit 0 ==
    probability 0.5), and carry the score column for downstream
    mixing/selection. One embarrassingly parallel pass — no shuffle."""
    from perfect_bloomfilter_ray.stages.inference import NumpyModelScorer, logreg_to_mlp

    import ray

    ref = ray.put(logreg_to_mlp(fit))

    class _ScoreAndFilter(NumpyModelScorer):
        def __init__(self):
            super().__init__(ref, feature_fn, id_cols=[], out_col=score_col)

        def __call__(self, t: pa.Table) -> pa.Table:
            z = self._forward(self.feature_fn(t))
            out = t.append_column(score_col, pa.array(z, pa.float64()))
            return out.filter(pa.array(z >= threshold))

    return ds.map_batches(
        _ScoreAndFilter, batch_size=4096, concurrency=(1, 4), batch_format="pyarrow"
    )
