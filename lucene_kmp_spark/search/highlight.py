"""Offsets consumers: snippet/passage extraction from the OFFSETS postings
flag (``index/PostingsEnum.kt:12-76``).

The reference core stores offsets precisely so highlighter-style consumers can
slice surface text without re-analysis (the Lucene highlighter module itself
is unported in the reference — this is the minimal first-consumer surface, not
a port of that module). As a training-data pipeline op this is "matched
context extraction": show every document's first match window for a term.

Plan shape: term-pruned occurrence decode (one scan of the term's posting
blocks) -> per-doc min-struct aggregate -> broadcast-friendly join to the docs
row store -> pure column substring. No Python in the hot path beyond the
existing Arrow block decode; scales with the term's df, not the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_snippet(searcher, term: str, width: int = 20) -> DataFrame:
    """(doc_id, start_offset, end_offset, snippet): the ±``width``-char window
    around each matching doc's FIRST occurrence of ``term``.

    First = minimum (start_offset, end_offset) — deterministic under any
    partitioning. The window start clips at 0; substring clips the tail."""
    occ = searcher.term_offsets(term)
    first = occ.groupBy("doc_id").agg(
        F.min(F.struct("start_offset", "end_offset")).alias("_f")
    )
    text_col = searcher.index.field_name
    j = first.join(searcher.index.docs.select("doc_id", text_col), "doc_id")
    s = F.col("_f.start_offset")
    e = F.col("_f.end_offset")
    return j.select(
        "doc_id",
        s.alias("start_offset"),
        e.alias("end_offset"),
        F.expr(
            f"substring({text_col}, "
            f"greatest(0, _f.start_offset - {int(width)}) + 1, "
            f"(_f.end_offset + {int(width)}) - greatest(0, _f.start_offset - {int(width)}))"
        ).alias("snippet"),
    )


def top_passages(
    searcher,
    terms: list[str],
    n: int = 10,
    window: int = 16,
    per_doc: int = 1,
) -> DataFrame:
    """Best-passage extraction — the UnifiedHighlighter surface (upstream
    Lucene ``search/uhighlight``; unported in the reference repo, like
    grouping/mlt — this implements the published semantics Spark-first).

    Passages are fixed ``window``-token position windows (a deterministic,
    engine-portable stand-in for the sentence BreakIterator — documented
    deviation; window boundaries never affect WHICH terms score, only how
    they group). The score follows PassageScorer's unique-term shape:

        score(passage) = Σ over distinct query terms t present of
                         idf_bm25(t) * tf_p(t) / (tf_p(t) + 1)

    with idf_bm25 = ln(1 + (N - df + 0.5)/(df + 0.5)) and tf_p the term's
    frequency inside the passage — term weight × a saturating tf, exactly
    PassageScorer.weight × PassageScorer.tf's roles.

    Plan shape: ONE term-pruned occurrence decode (scan ∝ Σ df, not corpus)
    → two hash aggregates (per-(doc,window,term) then per-(doc,window)) →
    one per-doc window for the ``per_doc`` cut → TakeOrdered(n) → a
    doc_id join to the row store for the surface substring. No Python
    beyond the existing Arrow block decode.

    Returns (doc_id, window_id, score, start_offset, end_offset, snippet),
    best-first (score desc, doc_id asc, window_id asc), limited to ``n``.
    Requires ``build_index(index_options="offsets")``.
    """
    terms = list(dict.fromkeys(terms))
    w = int(window)
    if w < 1:
        raise ValueError("window must be >= 1")
    occ = searcher._live(
        searcher.term_occurrences(terms).select(
            "doc_id", "term", "position", "start_offset", "end_offset"
        )
    )
    stats = searcher.term_stats(terms)
    n_docs = searcher.index.stats.doc_count
    idf = {
        t: math.log(1.0 + (n_docs - s.df + 0.5) / (s.df + 0.5))
        for t, s in stats.items()
    }
    spark = searcher.index.spark
    schema = (
        "doc_id long, window_id int, score double, "
        "start_offset int, end_offset int, snippet string"
    )
    if not idf:
        return spark.createDataFrame([], schema=schema)
    idf_map = F.create_map(
        *[x for t, v in idf.items() for x in (F.lit(t), F.lit(float(v)))]
    )
    per_term = (
        occ.withColumn("window_id", F.floor(F.col("position") / w).cast("int"))
        .groupBy("doc_id", "window_id", "term")
        .agg(
            F.count("*").cast("double").alias("freq"),
            F.min("start_offset").alias("so"),
            F.max("end_offset").alias("eo"),
        )
    )
    passages = (
        per_term.withColumn(
            "_c", idf_map[F.col("term")] * (F.col("freq") / (F.col("freq") + F.lit(1.0)))
        )
        .groupBy("doc_id", "window_id")
        .agg(
            F.sum("_c").alias("score"),
            F.min("so").alias("start_offset"),
            F.max("eo").alias("end_offset"),
        )
    )
    if per_doc is not None:
        wnd = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("window_id"))
        passages = (
            passages.withColumn("_r", F.row_number().over(wnd))
            .filter(F.col("_r") <= int(per_doc))
            .drop("_r")
        )
    text_col = searcher.index.field_name
    j = passages.join(searcher.index.docs.select("doc_id", text_col), "doc_id")
    return (
        j.select(
            "doc_id",
            "window_id",
            "score",
            "start_offset",
            "end_offset",
            F.expr(
                f"substring({text_col}, start_offset + 1, end_offset - start_offset)"
            ).alias("snippet"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("window_id"))
        .limit(int(n))
    )
