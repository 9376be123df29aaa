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

from pyspark.sql import DataFrame
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
