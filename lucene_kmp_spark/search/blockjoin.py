"""Parent-child joined search — the Lucene join-module surface
(ToParentBlockJoinQuery / ToChildBlockJoinQuery / ScoreMode), which the
reference repo does not port; semantics follow the published Lucene join
module so users of that API can switch.

Lucene indexes each parent contiguously after its children in one block and
maps child hits to parents through a parent bitset (BitSetProducer). In the
columnar model the parent key is simply a column on every child row
(``conv_id`` for transcript turns, ``source`` for documents), so:

* child → parent is ONE hash aggregate on the parent key — partial
  (map-side) aggregation applies, the shuffle is bounded by the number of
  DISTINCT parents, and no co-located block layout is required;
* parent → children is a semi/inner join against the (small) matching
  parent-key set — broadcast-sized whenever the parent match set is
  selective, which AQE detects at runtime.

Both directions therefore survive 100 TB: neither materializes anything
per-(parent × child) and the only shuffle key is the parent key.

ScoreMode (org.apache.lucene.search.join.ScoreMode): ``none`` (parents
score 0), ``avg`` / ``max`` / ``min`` / ``total`` over the MATCHING
children's scores only — identical to the Lucene aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_MODES = ("none", "avg", "max", "min", "total")

_AGGS = {
    "avg": F.avg,
    "max": F.max,
    "min": F.min,
    "total": F.sum,
}


def to_parent_scores(
    searcher, child_query, parent_col: str, score_mode: str = "max",
    child_filter=None,
) -> DataFrame:
    """ToParentBlockJoinQuery: score every parent that has ≥1 child matching
    ``child_query``. Returns ``(parent_col, score)`` — one row per matching
    parent. ``child_filter`` optionally restricts which children may
    contribute (the childFilter argument of the Lucene query)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    scored = searcher.execute(child_query)
    if child_filter is not None:
        scored = scored.join(searcher._doc_set(child_filter), "doc_id", "left_semi")
    child_parents = searcher.index.docs.select("doc_id", parent_col)
    joined = scored.join(child_parents, "doc_id")
    if score_mode == "none":
        # ScoreMode.None: parents match but carry no child evidence (score 0)
        return joined.select(parent_col).distinct().withColumn("score", F.lit(0.0))
    agg = _AGGS[score_mode]("score").alias("score")
    return joined.groupBy(parent_col).agg(agg)


def to_parent_topk(
    searcher, child_query, parent_col: str, k: int = 10,
    score_mode: str = "max", child_filter=None,
) -> DataFrame:
    """Ranked ToParentBlockJoin: top-k parents by joined score
    (score desc, parent key asc — the deterministic tiebreak this engine
    uses everywhere docIDs would be)."""
    parents = to_parent_scores(
        searcher, child_query, parent_col, score_mode, child_filter
    )
    return parents.orderBy(F.desc("score"), F.asc(parent_col)).limit(k)


def to_child_docset(
    searcher, parent_keys: DataFrame | None = None, parent_col: str = "",
    child_query=None,
) -> DataFrame:
    """ToChildBlockJoinQuery: every child doc whose PARENT matches. The
    parent match set is either given directly (``parent_keys`` — one column
    named ``parent_col``, e.g. a predicate evaluated on a parent-attribute
    table) or derived from ``child_query`` (parents having ≥1 child match —
    the common has-a-matching-sibling form). Returns child ``doc_id`` rows."""
    if (parent_keys is None) == (child_query is None):
        raise ValueError("pass exactly one of parent_keys= / child_query=")
    if child_query is not None:
        parent_keys = to_parent_scores(
            searcher, child_query, parent_col, score_mode="none"
        ).select(parent_col)
    docs = searcher.index.docs.select("doc_id", parent_col)
    out = docs.join(parent_keys.select(parent_col).distinct(), parent_col, "left_semi")
    if searcher.live_filter is not None:
        out = out.join(searcher.live_filter, "doc_id", "left_anti")
    return out.select("doc_id")
