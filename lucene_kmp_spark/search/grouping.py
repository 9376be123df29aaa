"""Result grouping / collapse: top groups ranked by their best-scoring hit.

Lucene's grouping module (two-pass TermFirstPassGroupingCollector /
TopGroupsCollector) re-expressed relationally: the transcript-search shape
"best conversations for this query, best turns within each". The reference
repo does not port the grouping module; this follows the published Lucene
semantics (group head = highest-scoring doc; groups ordered by head score,
ties by head docID) because collapsing by conv_id is the natural query
surface for the north-rule transcript corpus.

Plan shape (scale notes):
* one scored set (whatever the query costs) joined to the stored-fields
  column being grouped — a doc_id co-keyed join;
* ONE window rank partitioned by the group value (group sizes = a
  conversation's matching turns, bounded by conversation length);
* group ranking limits FIRST (TakeOrdered over group heads), then ranks the
  surviving k rows in a single tiny partition — never a global row_number
  over all groups (10^9 conversations would serialize).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_groups(
    searcher,
    q,
    group_col: str,
    k: int = 10,
    docs_per_group: int = 1,
    quantize: int | None = None,
) -> DataFrame:
    """Top-k groups by best hit, with the best ``docs_per_group`` hits inside
    each. Returns (group, group_rank, within_rank, doc_id, score) ordered by
    (group_rank, within_rank).

    ``quantize`` ranks on floor(score·10^q) instead of the raw float —
    the cross-engine float protocol for oracle comparison; None (default)
    ranks on the raw score."""
    scored = searcher.execute(q)
    if searcher.dtype == np.float32:
        scored = scored.select("doc_id", F.col("score").cast("float").alias("score"))
    rank_key = (
        F.floor(F.col("score") * F.lit(float(10 ** quantize)))
        if quantize is not None
        else F.col("score")
    )
    hits = scored.join(searcher.index.docs.select("doc_id", group_col), "doc_id")
    # One window over the group-key shuffle is the best plan at every scale
    # tried: a hash-agg-heads + broadcast-winners rewrite was A/B'd
    # (interleaved, identical results) and LOST ~30% — the aggregate
    # shuffles on the same key, so it removes no exchange, only adds
    # stages. The window's per-partition sort parallelizes across the
    # group-hash partitions, so the plan holds at 100x (group count grows,
    # per-partition sort stays bounded).
    w_in = Window.partitionBy(group_col).orderBy(F.desc(rank_key), F.asc("doc_id"))
    # the ranked set feeds BOTH the group-head TakeOrdered and the final
    # within-group cut — persist it so the scored subtree (the expensive
    # postings scan + window shuffle) runs ONCE, not once per consumer;
    # the result is <= docs_per_group rows per group, so materializing
    # eagerly and releasing the cache before returning costs little
    within = (
        hits.withColumn("within_rank", F.row_number().over(w_in).cast("int"))
        .filter(F.col("within_rank") <= docs_per_group)
        .persist()
    )
    try:
        heads = within.filter(F.col("within_rank") == 1)
        top_heads = heads.orderBy(F.desc(rank_key), F.asc("doc_id")).limit(k)
        # k rows only: the global rank window runs on one tiny partition
        w_g = Window.orderBy(F.desc(rank_key), F.asc("doc_id"))
        groups = top_heads.select(
            group_col, F.row_number().over(w_g).cast("int").alias("group_rank")
        )
        out = (
            within.join(groups, group_col)
            .select(group_col, "group_rank", "within_rank", "doc_id", "score")
            .orderBy("group_rank", "within_rank")
        )
        rows = out.collect()
        return searcher.index.spark.createDataFrame(rows, out.schema)
    finally:
        within.unpersist()


def facet_counts(
    searcher,
    q,
    facet_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Facet counts over a query's match set (Lucene facets-module
    StringValueFacetCounts shape): (value, count) for the top-n values of a
    stored-fields column among matching docs, ordered (count desc, value
    asc). MUST_NOT/two-phase semantics come from the engine's own match set;
    the facet itself is one doc_id join + one hash aggregate."""
    matches = searcher.execute(q).select("doc_id")
    return (
        matches.join(searcher.index.docs.select("doc_id", facet_col), "doc_id")
        .groupBy(facet_col)
        .agg(F.count("*").cast("long").alias("count"))
        .orderBy(F.desc("count"), F.asc(facet_col))
        .limit(top_n)
    )


def range_facet_counts(
    searcher,
    q,
    value_col: str,
    ranges: list[tuple[str, int | float | None, int | float | None]],
) -> DataFrame:
    """Numeric range facets over a query's match set — the facets-module
    LongRangeFacetCounts / DoubleRangeFacetCounts shape (upstream Lucene
    facet/range; beyond the reference repo's port surface like the string
    facets above). ``ranges`` are (label, min, max) with INCLUSIVE bounds
    (LongRange's minInclusive/maxInclusive default form; None = open end);
    ranges may overlap — a doc counts once per range it falls in, exactly
    the module's per-range counters.

    Plan: one scored match set, one doc_id join to the stored column, then
    a single projection of per-range indicator sums (one aggregate row —
    no per-range scans, no shuffle beyond the match join). Returns
    (label, count) in the caller's range order."""
    matches = searcher.execute(q).select("doc_id")
    j = matches.join(searcher.index.docs.select("doc_id", value_col), "doc_id")
    aggs = []
    for label, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(value_col) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(value_col) <= F.lit(hi))
        aggs.append(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long").alias(label)
        )
    row = j.agg(*aggs)
    # unpivot to (label, count) preserving caller order via an index column
    labels = [label for label, _lo, _hi in ranges]
    stack = ", ".join(f"'{i}:{l}', `{l}`" for i, l in enumerate(labels))
    return (
        row.selectExpr(f"stack({len(labels)}, {stack}) AS (_k, count)")
        .withColumn("label", F.expr("substring_index(_k, ':', -1)"))
        .withColumn("_i", F.expr("CAST(substring_index(_k, ':', 1) AS INT)"))
        .orderBy("_i")
        .select("label", "count")
    )
