"""End-to-end corpus curation: the composed keep-path a pretraining data
pipeline actually runs, as ONE DataFrame plan.

    quality filter -> benchmark decontamination -> exact dedup -> split

Each stage is the already-tested operator from its own module; composing them
here proves the stages stack without materialization barriers: the whole
curation is a single Catalyst plan (the only shuffles are the dedup groupBy
and the decontam hit aggregate — both map-side combinable; the quality filter
and split assignment are narrow and fuse into the scans around them).

Near-dup clustering (``dedup.near_dup_clusters``) is deliberately NOT inside
this composition: it is iterative (its own driver loop) and runs as a
separate pass between dedup and split in production — see
``dedup.dedup_canonical``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lucene_kmp_spark.pipeline import decontam as _decontam
from lucene_kmp_spark.pipeline import dedup as _dedup
from lucene_kmp_spark.pipeline import mix as _mix
from lucene_kmp_spark.pipeline import textstats as _textstats


def curate(
    df: DataFrame,
    eval_df: DataFrame | None = None,
    min_quality: float = 0.5,
    ngram: int = 5,
    split_weights: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curated corpus: rows of ``df`` that (1) score >= min_quality, (2) share
    no word ``ngram``-gram with ``eval_df`` (skipped when None), (3) are the
    min-id representative of their exact-text group, with (4) a deterministic
    ``split`` column appended. Original columns are preserved."""
    scores = _textstats.quality_score(df, text_col, id_col).select(id_col, "quality")
    kept = df.join(
        scores.filter(scores.quality >= min_quality).select(id_col), id_col, "left_semi"
    )
    if eval_df is not None:
        kept = _decontam.decontaminate(
            kept, eval_df, n=ngram, text_col=text_col, id_col=id_col
        )
    kept = _dedup.dedup_exact(kept, text_col, id_col)
    return _mix.split_by_hash(kept, split_weights, id_col=id_col)
