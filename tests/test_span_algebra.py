"""Composable span algebra (queries/spans/*): golden matches per operator,
generic evaluator == term fast path on plain near queries, and SpanNot
scoring-terms semantics."""

import numpy as np
import pytest

from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_kmp_spark.search.spans import eval_spans, span_freq

DOCS = [
    ("c", 0, "quick brown fox jumps"),
    ("c", 1, "quick red fox sleeps"),
    ("c", 2, "brown dog jumps high"),
    ("c", 3, "fox quick brown run"),
    ("c", 4, "the quick and the brown fox"),
]


@pytest.fixture(scope="module")
def searcher(spark):
    df = spark.createDataFrame(DOCS, "conv_id string, turn_idx int, text string")
    withids = assign_doc_ids(df).persist()
    withids.count()
    return IndexSearcher(build_index(withids))


def _hits(s, q):
    return {r["doc_id"] for r in s.execute(q).collect()}


# ------------------------------------------------------------ pure evaluator
def test_eval_spans_golden():
    pos = {"a": np.array([0, 5]), "b": np.array([1, 3]), "c": np.array([2])}
    assert eval_spans(SpanTermQuery("a"), pos) == [(0, 1, 0), (5, 6, 0)]
    assert eval_spans(SpanOrQuery((SpanTermQuery("a"), SpanTermQuery("c"))), pos) == [
        (0, 1, 0), (2, 3, 0), (5, 6, 0),
    ]
    # a NOT next-to c (post context 1): a@0 survives? exclude c@2 overlaps [0,2)? no -> ok
    sn = SpanNotQuery(SpanTermQuery("a"), SpanTermQuery("c"), pre=0, post=0)
    assert eval_spans(sn, pos) == [(0, 1, 0), (5, 6, 0)]
    sn2 = SpanNotQuery(SpanTermQuery("b"), SpanTermQuery("c"), pre=1, post=0)
    # b@3: exclude window [2,4) hits c@2 -> dropped; b@1 survives
    assert eval_spans(sn2, pos) == [(1, 2, 0)]
    assert eval_spans(SpanFirstQuery(SpanTermQuery("b"), end=2), pos) == [(1, 2, 0)]
    # ordered near (a then b): chains a@0->b@1 (gap 0); a@5 has no b after
    near = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=0, in_order=True)
    assert eval_spans(near, pos) == [(0, 2, 0)]
    # nested: (a or c) near-ordered b with slop 1
    nested = SpanNearQuery(
        (SpanOrQuery((SpanTermQuery("a"), SpanTermQuery("c"))), SpanTermQuery("b")),
        slop=1,
        in_order=True,
    )
    # chains: a@0->b@1 (gap 0), c@2->b@3 (gap 0)
    assert eval_spans(nested, pos) == [(0, 2, 0), (2, 4, 0)]
    assert span_freq(nested, pos) == 2.0


# ----------------------------------------------------------- engine queries
def test_span_or(searcher):
    q = SpanOrQuery((SpanTermQuery("fox"), SpanTermQuery("dog")))
    assert _hits(searcher, q) == {0, 1, 2, 3, 4}


def test_span_first(searcher):
    # 'fox' within the first 2 positions: docs 3 (fox@0)
    q = SpanFirstQuery(SpanTermQuery("fox"), end=2)
    assert _hits(searcher, q) == {3}
    q2 = SpanFirstQuery(SpanTermQuery("quick"), end=1)
    assert _hits(searcher, q2) == {0, 1}


def test_span_not(searcher):
    # 'quick' not immediately followed by 'brown' (post=1):
    # doc0 quick@0 brown@1 -> excluded; doc1 quick@0 red -> kept;
    # doc3 quick@1 brown@2 -> excluded; doc4 quick@1 brown@4 -> kept
    q = SpanNotQuery(SpanTermQuery("quick"), SpanTermQuery("brown"), pre=0, post=1)
    assert _hits(searcher, q) == {1, 4}


def test_nested_or_inside_near(searcher):
    # (brown or red) then fox, ordered adjacent
    q = SpanNearQuery(
        (SpanOrQuery((SpanTermQuery("brown"), SpanTermQuery("red"))), SpanTermQuery("fox")),
        slop=0,
        in_order=True,
    )
    assert _hits(searcher, q) == {0, 1, 4}


def test_generic_matches_term_fast_path(searcher):
    plain = SpanNearQuery(("quick", "fox"), slop=2, in_order=True)
    generic = SpanNearQuery((SpanTermQuery("quick"), SpanTermQuery("fox")), slop=2, in_order=True)
    a = sorted((r["doc_id"], r["score"]) for r in searcher.execute(plain).collect())
    b = sorted((r["doc_id"], r["score"]) for r in searcher.execute(generic).collect())
    assert a == b and a


def test_span_not_excludes_only_matching_spans(searcher):
    # exclude term absent from index -> include unchanged, scoring unchanged
    q = SpanNotQuery(SpanTermQuery("fox"), SpanTermQuery("zzznope"))
    a = sorted((r["doc_id"], r["score"]) for r in searcher.execute(q).collect())
    b = sorted((r["doc_id"], r["score"]) for r in searcher.execute(SpanTermQuery("fox")).collect())
    assert a == b


# ------------------------------------------- round 2: containing/within/range
def test_span_containing_eval():
    """big = ordered near(a,b) slop 2; little = c inside the gap.
    SpanContainingQuery keeps the BIG span (ContainSpans, payload from big)."""
    from lucene_kmp_spark.search.query import SpanContainingQuery, SpanWithinQuery

    pos = {"a": np.array([0]), "b": np.array([3]), "c": np.array([2]), "d": np.array([9])}
    big = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=2, in_order=True)
    got = eval_spans(SpanContainingQuery(big, SpanTermQuery("c")), pos)
    assert got == [(0, 4, 2)]  # the big span survives
    # little outside every big span -> nothing
    assert eval_spans(SpanContainingQuery(big, SpanTermQuery("d")), pos) == []
    # within keeps the LITTLE span
    got_w = eval_spans(SpanWithinQuery(big, SpanTermQuery("c")), pos)
    assert got_w == [(2, 3, 0)]
    assert eval_spans(SpanWithinQuery(big, SpanTermQuery("d")), pos) == []


def test_span_position_range_eval():
    from lucene_kmp_spark.search.query import SpanPositionRangeQuery

    pos = {"a": np.array([0, 3, 7])}
    got = eval_spans(SpanPositionRangeQuery(SpanTermQuery("a"), start=2, end=6), pos)
    assert got == [(3, 4, 0)]  # 0 fails start>=2, 7 fails end<=6


def test_span_containing_executor(searcher):
    from lucene_kmp_spark.search.query import SpanContainingQuery

    big = SpanNearQuery((SpanTermQuery("quick"), SpanTermQuery("fox")), slop=2, in_order=True)
    # docs where quick..fox (gap<=2) contains 'brown': doc0 (quick brown fox),
    # doc4 (quick and the brown fox -> gap 3 too wide? quick@1 fox@5 w=3 no)
    hits = _hits(searcher, SpanContainingQuery(big, SpanTermQuery("brown")))
    assert hits == {0}


def test_span_within_executor(searcher):
    from lucene_kmp_spark.search.query import SpanWithinQuery

    big = SpanNearQuery((SpanTermQuery("quick"), SpanTermQuery("fox")), slop=2, in_order=True)
    hits = _hits(searcher, SpanWithinQuery(big, SpanTermQuery("brown")))
    assert hits == {0}


def test_span_position_range_executor(searcher):
    from lucene_kmp_spark.search.query import SpanPositionRangeQuery

    # 'fox' at position >=2 with end<=3: doc0 (fox@2), doc1 (fox@2); doc3 has
    # fox@0 (fails start), doc4 fox@5 (fails end)
    q = SpanPositionRangeQuery(SpanTermQuery("fox"), start=2, end=3)
    assert _hits(searcher, q) == {0, 1}


def test_span_multiterm_wrapper(searcher):
    from lucene_kmp_spark.search.query import PrefixQuery, SpanMultiTermWrapper

    # prefix 'ju' -> {jumps}; wrapped in SpanFirst(end=3): doc2 (jumps@2)
    q = SpanFirstQuery(SpanMultiTermWrapper(PrefixQuery("ju")), end=3)
    assert _hits(searcher, q) == {2}
    # inside a near: quick .. (ju* ) within slop 2, ordered
    near = SpanNearQuery(
        (SpanTermQuery("brown"), SpanMultiTermWrapper(PrefixQuery("ju"))),
        slop=2, in_order=True,
    )
    assert _hits(searcher, near) == {0, 2}
