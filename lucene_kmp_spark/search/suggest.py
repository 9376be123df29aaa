"""Spell suggestion ("did you mean"): corrections from the live term
dictionary, the DirectSpellChecker surface (Lucene suggest module —
beyond the reference repo's own port surface; semantics follow the
published DirectSpellChecker: candidates within maxEdits of the query
term, ranked by similarity then document frequency).

Spark shape: ONE term_dict scan with a length-window + common-prefix
Catalyst prefilter (the FuzzyTermsEnum cut — term_dict is term-sorted
Parquet, so the prefix range prunes row groups), JVM `levenshtein` on the
survivors, TakeOrdered for the top-k. The term dictionary is
vocabulary-scale (≪ corpus), so suggestion cost is independent of corpus
size."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def suggest_terms(
    searcher,
    term: str,
    k: int = 5,
    max_edits: int = 2,
    prefix_len: int = 0,
    min_df: int = 1,
) -> DataFrame:
    """Top-k corrections for ``term``: (term, distance, df), ordered by
    (distance asc, df desc, term asc) — DirectSpellChecker's
    score-then-frequency comparator with a deterministic tie-break.
    The query term itself is excluded (it is not a correction)."""
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    td = searcher.index.term_dict
    cand = td.filter(
        (F.length("term") >= F.lit(len(term) - max_edits))
        & (F.length("term") <= F.lit(len(term) + max_edits))
        & (F.col("term") != F.lit(term))
        & (F.col("df") >= F.lit(int(min_df)))
    )
    if prefix_len > 0:
        lo = term[:prefix_len]
        # prefix range: [lo, lo + MAX_CHAR) — pushes into the term-sorted scan
        cand = cand.filter(F.col("term").startswith(lo))
    scored = cand.select(
        "term",
        F.levenshtein(F.col("term"), F.lit(term)).cast("int").alias("distance"),
        F.col("df").cast("long").alias("df"),
    ).filter(F.col("distance") <= max_edits)
    return scored.orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    ).limit(k)
