"""Parity tests for MultiPhrase / SpanNear / FieldExists / Feature /
sort-by-field / rescore operators (SURVEY.md §2.3-2.4 remaining rows)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import (
    FeatureQuery,
    FieldExistsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    SpanNearQuery,
    TermQuery,
    rewrite_query,
)


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=50, seed=17)).persist()
    docs.count()
    idx = build_index(docs)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    return IndexSearcher(idx), NaiveIndex(rows)


def _score_map(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


# ---------------------------------------------------------------- MultiPhrase
def test_multi_phrase_rewrites():
    assert rewrite_query(MultiPhraseQuery((("a",),))) == TermQuery("a")
    assert rewrite_query(MultiPhraseQuery((("a",), ("b",)), slop=1)) == PhraseQuery(
        ("a", "b"), slop=1
    )


@pytest.mark.parametrize("slop", [0, 2])
def test_multi_phrase_vs_naive(env, slop):
    s, naive = env
    q = MultiPhraseQuery((("kingdom", "gospel"), ("of", "the")), slop=slop)
    got, exp = _score_map(s.execute(q)), naive.scores(q)
    assert set(got) == set(exp) and got, slop
    for d in got:
        assert np.float32(got[d]) == np.float32(exp[d]), (slop, d)


def test_multi_phrase_golden(spark):
    """'big cat ran' matches ("big","large")("cat","dog") exactly once."""
    docs = spark.createDataFrame(
        [("c", 0, "big cat ran"), ("c", 1, "large dog sat"), ("c", 2, "big rat ran"),
         ("c", 3, "the large cat")],
        "conv_id string, turn_idx int, text string",
    )
    withids = assign_doc_ids(docs)
    s = IndexSearcher(build_index(withids))
    q = MultiPhraseQuery((("big", "large"), ("cat", "dog")))
    got = _score_map(s.execute(q))
    assert set(got) == {0, 1, 3}
    naive = NaiveIndex([(r["doc_id"], r["text"]) for r in withids.collect()])
    exp = naive.scores(q)
    for d in got:
        assert np.float32(got[d]) == np.float32(exp[d])


# ------------------------------------------------------------------- SpanNear
@pytest.mark.parametrize("in_order", [True, False])
@pytest.mark.parametrize("slop", [0, 3])
def test_span_near_vs_naive(env, in_order, slop):
    s, naive = env
    q = SpanNearQuery(("kingdom", "hope"), slop=slop, in_order=in_order)
    got, exp = _score_map(s.execute(q)), naive.scores(q)
    assert set(got) == set(exp), (in_order, slop)
    for d in got:
        assert np.float32(got[d]) == np.float32(exp[d]), (in_order, slop, d)


def test_span_near_golden(spark):
    docs = spark.createDataFrame(
        [("c", 0, "a b"), ("c", 1, "b a"), ("c", 2, "a x x b"), ("c", 3, "b x a")],
        "conv_id string, turn_idx int, text string",
    )
    withids = assign_doc_ids(docs)
    s = IndexSearcher(build_index(withids))
    # ordered slop=1: "a b" (width 0) and "b x a"?? no — a must precede b
    got = _score_map(s.execute(SpanNearQuery(("a", "b"), slop=1, in_order=True)))
    assert set(got) == {0}
    # unordered slop=1: "a b", "b a", "b x a" (width 1); "a x x b" width 2 out
    got = _score_map(s.execute(SpanNearQuery(("a", "b"), slop=1, in_order=False)))
    assert set(got) == {0, 1, 3}
    # unordered slop=2 adds "a x x b"
    got = _score_map(s.execute(SpanNearQuery(("a", "b"), slop=2, in_order=False)))
    assert set(got) == {0, 1, 2, 3}


def test_span_near_ordered_shrink(spark):
    """'a x a b': every clause-0 start attempts a stretch (NearSpansOrdered);
    a@0 fails slop 0 (gap 2) but a@2, b@3 is a width-0 ordered match."""
    docs = spark.createDataFrame(
        [("c", 0, "a x a b")], "conv_id string, turn_idx int, text string"
    )
    withids = assign_doc_ids(docs)
    s = IndexSearcher(build_index(withids))
    got = _score_map(s.execute(SpanNearQuery(("a", "b"), slop=0, in_order=True)))
    assert set(got) == {0}  # a@2, b@3 is a width-0 ordered match


def test_span_near_ordered_javadoc_overlap(spark):
    """The NearSpansOrdered.kt javadoc example: querying (t1 t2 t3) with
    slop 1 against 't1 t2 t1 t3 t2 t3' matches TWICE — (t1 t2 .. t3) and
    (t1 .. t2 t3) — because later matches reuse advanced clause iterators.
    freq = 1/(1+1) + 1/(1+1) = 1.0 exactly (widths are the gap sums)."""
    from lucene_kmp_spark.search.spans import eval_spans, span_freq
    from lucene_kmp_spark.search.query import SpanTermQuery

    pos = {"t1": np.array([0, 2]), "t2": np.array([1, 4]), "t3": np.array([3, 5])}
    q3 = SpanNearQuery(
        (SpanTermQuery("t1"), SpanTermQuery("t2"), SpanTermQuery("t3")),
        slop=1, in_order=True,
    )
    assert eval_spans(q3, pos) == [(0, 4, 1), (2, 6, 1)]
    assert span_freq(q3, pos) == 1.0

    # engine term fast path agrees (and with the naive oracle)
    docs = spark.createDataFrame(
        [("c", 0, "t1 t2 t1 t3 t2 t3")], "conv_id string, turn_idx int, text string"
    )
    withids = assign_doc_ids(docs)
    s = IndexSearcher(build_index(withids))
    got = _score_map(s.execute(SpanNearQuery(("t1", "t2", "t3"), slop=1, in_order=True)))
    naive = NaiveIndex([(0, "t1 t2 t1 t3 t2 t3")])
    exp = naive.scores(SpanNearQuery(("t1", "t2", "t3"), slop=1, in_order=True))
    assert set(got) == {0} and np.float32(got[0]) == np.float32(exp[0])


def test_span_near_unordered_window_width():
    """NearSpansUnordered width() is the covering-window length maxEnd-start,
    not the gap: 'a b' unordered slop 0 -> one match (0, 2) with width 2."""
    from lucene_kmp_spark.search.spans import eval_spans
    from lucene_kmp_spark.search.query import SpanTermQuery

    pos = {"a": np.array([0]), "b": np.array([1])}
    q = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=0, in_order=False)
    assert eval_spans(q, pos) == [(0, 2, 2)]


def test_span_nested_width_not_accumulated():
    """Parent ordered-near width counts only THIS level's gaps — the inner
    near's own width does not leak into the outer span's width
    (NearSpansOrdered.stretchToOrder sums start-prev_end only)."""
    from lucene_kmp_spark.search.spans import eval_spans
    from lucene_kmp_spark.search.query import SpanTermQuery

    # inner: a .. b with one gap (width 1) covering [0,3); outer adds c@4: gap 1
    pos = {"a": np.array([0]), "b": np.array([2]), "c": np.array([4])}
    inner = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=1, in_order=True)
    assert eval_spans(inner, pos) == [(0, 3, 1)]
    outer = SpanNearQuery((inner, SpanTermQuery("c")), slop=1, in_order=True)
    # outer width = c.start - inner.end = 4 - 3 = 1 (NOT 1 + inner's 1 = 2)
    assert eval_spans(outer, pos) == [(0, 5, 1)]


# ---------------------------------------------------- FieldExists / Feature
def test_field_exists(env):
    s, _ = env
    q = FieldExistsQuery("tool")
    exp = s.index.docs.filter(F.col("tool").isNotNull()).count()
    assert s.count(q) == exp
    got = _score_map(s.execute(q))
    assert len(got) == exp and all(v == 1.0 for v in got.values())


def test_feature_query_functions(env):
    s, _ = env
    rows = {r["doc_id"]: r["turn_idx"] for r in s.index.docs.select("doc_id", "turn_idx").collect()}
    pos = {d: v for d, v in rows.items() if v and v > 0}

    got = _score_map(s.execute(FeatureQuery("turn_idx", function="saturation", pivot=2.0)))
    assert set(got) == set(pos)
    for d in list(pos)[:50]:
        assert abs(got[d] - pos[d] / (pos[d] + 2.0)) < 1e-9

    got = _score_map(s.execute(FeatureQuery("turn_idx", function="log", scale=1.0, boost=2.0)))
    for d in list(pos)[:50]:
        assert abs(got[d] - 2.0 * math.log(1.0 + pos[d])) < 1e-9

    got = _score_map(s.execute(FeatureQuery("turn_idx", function="sigmoid", pivot=3.0, exp=2.0)))
    for d in list(pos)[:50]:
        v = float(pos[d]) ** 2.0
        assert abs(got[d] - v / (v + 9.0)) < 1e-9


# ------------------------------------------------- sort-by-field / rescore
def test_search_sorted(env):
    s, _ = env
    got = s.search_sorted(TermQuery("hope"), [("ts", True)], k=5).collect()
    # oracle: all matching docs joined to ts, sorted ascending
    match_ids = {r["doc_id"] for r in s.execute(TermQuery("hope")).select("doc_id").collect()}
    rows = [
        (r["ts"], r["doc_id"])
        for r in s.index.docs.select("doc_id", "ts").collect()
        if r["doc_id"] in match_ids
    ]
    rows.sort()
    assert [r["doc_id"] for r in got] == [d for _, d in rows[:5]]


def test_rescore(env):
    s, naive = env
    first, second = TermQuery("hope"), TermQuery("light")
    got = [(r["doc_id"], r["score"]) for r in s.rescore(first, second, window=50, weight=2.0, k=10).collect()]
    # oracle: naive top-50 of first, + 2*second score, re-ranked
    base = naive.top_k(first, 50)
    sec = naive.scores(second)
    comb = [(d, s1 + 2.0 * sec.get(d, 0.0)) for d, s1 in base]
    comb.sort(key=lambda x: (-x[1], x[0]))
    assert [d for d, _ in got] == [d for d, _ in comb[:10]]
    for (d1, v1), (d2, v2) in zip(got, comb[:10]):
        assert abs(v1 - v2) < 1e-5


def test_rescore_sort_keeps_first_pass_scores(env):
    s, naive = env
    first = TermQuery("hope")
    got = s.rescore_sort(first, [("ts", True)], window=50, k=10).collect()
    # oracle: naive top-50 of first re-sorted by ts asc (docID tiebreak),
    # scores unchanged from the first pass (SortRescorer.kt:77-82)
    base = dict(naive.top_k(first, 50))
    ts = {r["doc_id"]: r["ts"] for r in s.index.docs.select("doc_id", "ts").collect()}
    expect = sorted(base, key=lambda d: (ts[d], d))[:10]
    assert [r["doc_id"] for r in got] == expect
    for r in got:
        assert abs(r["score"] - base[r["doc_id"]]) < 1e-6
