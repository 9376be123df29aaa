"""Matches API — the distributed analog of ``Weight.matches``.

Reference: ``search/Matches.kt`` / ``MatchesIterator.kt`` /
``TermMatchesIterator.kt`` / ``DisjunctionMatchesIterator.kt`` /
``NamedMatches.kt``. The reference hands back a per-document iterator of
match intervals ordered by (startPosition, endPosition), with offsets when
the index stores them and ``-1`` otherwise, reporting only documents that
match the WHOLE query and skipping prohibited (MUST_NOT) clauses.

The Spark-first form returns ONE DataFrame of every match interval —
``(doc_id, query, start_position, end_position, start_offset, end_offset)``
— instead of a per-doc iterator: the driver never loops documents, the
per-field iterator becomes an ``ORDER BY doc_id, start_position,
end_position`` consumer-side sort, and the sub-match "TermQuery equivalent"
of the reference becomes the ``query`` label column (term text for term
matches, the joined phrase for phrase intervals; ``NamedMatches`` relabeling
via the ``name=`` argument).

Supported leaves: the term family (Term/Synonym/TermInSet + the multi-term
expanders Prefix/Wildcard/Regexp/TermRange/Fuzzy), exact phrases (slop=0:
interval = [start, start+n-1], the ExactPhraseMatcher width), and boolean /
dismax / constant-score composition. Non-positional clauses
(ColumnFilter/RangeField/FieldExists/MatchAll) contribute no intervals —
the reference's MATCH_WITH_NO_TERMS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite_query,
)

MATCH_SCHEMA = (
    "doc_id long, query string, start_position int, end_position int, "
    "start_offset int, end_offset int"
)


def _collect_leaves(searcher, q: Query) -> tuple[list[str], list[PhraseQuery]]:
    """Positive match-producing leaves of the query tree: concrete term
    strings (multi-term queries expanded against the term dictionary, the
    same TermsEnum path scoring uses) and exact phrases. MUST_NOT subtrees
    are skipped (the reference never reports prohibited matches)."""
    terms: list[str] = []
    phrases: list[PhraseQuery] = []

    def walk(node: Query):
        node = rewrite_query(node)
        if isinstance(node, TermQuery):
            terms.append(node.term)
        elif isinstance(node, (SynonymQuery, TermInSetQuery)):
            terms.extend(node.terms)
        elif isinstance(node, (PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery)):
            terms.extend(searcher._multiterm_terms(node))
        elif isinstance(node, FuzzyQuery):
            terms.extend(searcher._fuzzy_terms(node))
        elif isinstance(node, PhraseQuery):
            if node.slop != 0:
                raise ValueError("matches() reports intervals for exact (slop=0) phrases only")
            phrases.append(node)
        elif isinstance(node, MultiPhraseQuery):
            raise ValueError("matches() does not support MultiPhraseQuery yet")
        elif isinstance(node, BooleanQuery):
            for c in node.clauses:
                if c.occur != Occur.MUST_NOT:
                    walk(c.query)
        elif isinstance(node, ConstantScoreQuery):
            walk(node.query)
        elif isinstance(node, DisjunctionMaxQuery):
            for sub in node.queries:
                walk(sub)
        # every other leaf: MATCH_WITH_NO_TERMS — no intervals

    walk(q)
    return sorted(set(terms)), phrases


def _term_intervals(searcher, terms: list[str]) -> DataFrame | None:
    """One row per term occurrence. Offsets come from the OFFSETS postings
    cells when the index stores them, else -1 (MatchesIterator contract)."""
    if not terms:
        return None
    if searcher.index.extra.get("index_options", "positions") == "offsets":
        occ = searcher.term_occurrences(terms)
        return occ.select(
            "doc_id",
            F.col("term").alias("query"),
            F.col("position").cast("int").alias("start_position"),
            F.col("position").cast("int").alias("end_position"),
            F.col("start_offset").cast("int"),
            F.col("end_offset").cast("int"),
        )
    pos = searcher._positions_df(terms).select(
        "term", "doc_id", F.explode("positions").alias("p")
    )
    return pos.select(
        "doc_id",
        F.col("term").alias("query"),
        F.col("p").cast("int").alias("start_position"),
        F.col("p").cast("int").alias("end_position"),
        F.lit(-1).cast("int").alias("start_offset"),
        F.lit(-1).cast("int").alias("end_offset"),
    )


def _phrase_intervals(searcher, q: PhraseQuery) -> DataFrame:
    """Exact-phrase match intervals [start, start + n - 1]
    (ExactPhraseMatcher.kt reports startPosition = lead position,
    endPosition = last term's position). One pivoted positions scan + an
    Arrow kernel emitting starts — the same single-shuffle plan the scoring
    path uses."""
    uniq = list(dict.fromkeys(q.terms))
    slot_idx = [uniq.index(t) for t in q.terms]
    n = len(q.terms)
    piv = searcher._pivoted_positions(uniq).select(
        "doc_id", *[f"_pos_{i}" for i in range(len(uniq))]
    )

    def gen(batches):
        for pdf in batches:
            docs_out, starts_out = [], []
            cols = [pdf[f"_pos_{i}"].values for i in range(len(uniq))]
            for row_i, doc in enumerate(pdf["doc_id"].values):
                cand = np.asarray(cols[slot_idx[0]][row_i], dtype=np.int64)
                ok = np.ones(len(cand), dtype=bool)
                for off in range(1, n):
                    ok &= np.isin(
                        cand + off, np.asarray(cols[slot_idx[off]][row_i], dtype=np.int64)
                    )
                for st in cand[ok]:
                    docs_out.append(int(doc))
                    starts_out.append(int(st))
            yield pd.DataFrame({"doc_id": docs_out, "start_position": starts_out})

    hits = piv.mapInPandas(gen, schema="doc_id long, start_position int")
    label = " ".join(q.terms)
    out = hits.select(
        "doc_id",
        F.lit(label).alias("query"),
        F.col("start_position").cast("int"),
        (F.col("start_position") + F.lit(n - 1)).cast("int").alias("end_position"),
    )
    if searcher.index.extra.get("index_options", "positions") == "offsets":
        occ = searcher.term_occurrences(list(set([q.terms[0], q.terms[-1]])))
        first = occ.filter(F.col("term") == q.terms[0]).select(
            "doc_id",
            F.col("position").cast("int").alias("start_position"),
            F.col("start_offset").cast("int"),
        )
        last = occ.filter(F.col("term") == q.terms[-1]).select(
            "doc_id",
            F.col("position").cast("int").alias("end_position"),
            F.col("end_offset").cast("int"),
        )
        return (
            out.join(first, ["doc_id", "start_position"])
            .join(last, ["doc_id", "end_position"])
            .select(
                "doc_id", "query", "start_position", "end_position",
                "start_offset", "end_offset",
            )
        )
    return out.select(
        "doc_id", "query", "start_position", "end_position",
        F.lit(-1).cast("int").alias("start_offset"),
        F.lit(-1).cast("int").alias("end_offset"),
    )


def matches_df(searcher, q: Query, name: str | None = None) -> DataFrame:
    """All match intervals of ``q`` across the index, restricted to documents
    that match the WHOLE query (Weight.matches only reports on matching
    docs). ``name`` relabels every interval — the NamedMatches.kt wrapper."""
    terms, phrases = _collect_leaves(searcher, q)
    parts = []
    t_iv = _term_intervals(searcher, terms)
    if t_iv is not None:
        parts.append(t_iv)
    parts.extend(_phrase_intervals(searcher, p) for p in phrases)
    spark = searcher.index.spark
    if not parts:
        return spark.createDataFrame([], schema=MATCH_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    docset = searcher._doc_set(q, dedup=False)
    out = out.join(docset, "doc_id", "left_semi")
    if searcher.live_filter is not None:
        out = out.join(searcher.live_filter, "doc_id", "left_anti")
    if name is not None:
        out = out.withColumn("query", F.lit(name))
    return out.orderBy("doc_id", "start_position", "end_position")
