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
