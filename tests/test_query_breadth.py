"""Parity for the remaining query operators vs the naive oracle."""

import numpy as np
import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    SynonymQuery,
    TermQuery,
    rewrite_query,
    MatchNoDocsQuery,
    Occur,
    BooleanClause,
)


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=50, seed=17)).persist()
    docs.count()
    idx = build_index(docs)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    return IndexSearcher(idx), NaiveIndex(rows)


def _topk(s, q, k=10):
    return [(r["doc_id"], r["score"]) for r in s.top_k(q, k).collect()]


def test_synonym_query(env):
    s, naive = env
    q = SynonymQuery(("hope", "faith"))
    got, exp = _topk(s, q), naive.top_k(q)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (d1, s1), (d2, s2) in zip(got, exp):
        assert np.float32(s1) == np.float32(s2)


def test_constant_score(env):
    s, naive = env
    q = ConstantScoreQuery(TermQuery("hope"), boost=2.5)
    got = {r["doc_id"]: r["score"] for r in s.execute(q).collect()}
    exp = naive.scores(q)
    assert got == exp


def test_dismax(env):
    s, naive = env
    q = DisjunctionMaxQuery((TermQuery("hope"), TermQuery("light")), tie_breaker=0.4)
    got = {r["doc_id"]: r["score"] for r in s.execute(q).collect()}
    # naive dismax from term scores
    a, b = naive.scores(TermQuery("hope")), naive.scores(TermQuery("light"))
    exp = {}
    for d in set(a) | set(b):
        vals = [v for v in (a.get(d), b.get(d)) if v is not None]
        exp[d] = max(vals) + 0.4 * (sum(vals) - max(vals))
    assert set(got) == set(exp)
    for d in got:
        assert abs(got[d] - exp[d]) < 1e-6


def test_boosted_term(env):
    s, naive = env
    q = TermQuery("hope", boost=3.0)
    got, exp = _topk(s, q), naive.top_k(q)
    assert got == [(d, float(np.float32(v))) for d, v in exp]


def test_boolean_rewrites(env):
    s, _ = env
    # empty -> MatchNoDocs
    assert isinstance(rewrite_query(BooleanQuery((), 0)), MatchNoDocsQuery)
    # pure negative -> MatchNoDocs
    q = BooleanQuery.build(must_not=(TermQuery("a"),))
    assert isinstance(rewrite_query(q), MatchNoDocsQuery)
    # single SHOULD clause collapses
    q = BooleanQuery.build(should=(TermQuery("a"),))
    assert rewrite_query(q) == TermQuery("a")
    # must + must_not same term -> MatchNoDocs (BooleanQuery.kt:311-320)
    q = BooleanQuery.build(must=(TermQuery("a"),), must_not=(TermQuery("a"),))
    assert isinstance(rewrite_query(q), MatchNoDocsQuery)
    # 1-term phrase -> TermQuery
    assert rewrite_query(PhraseQuery(("x",))) == TermQuery("x")
    # FILTER dedup
    q = BooleanQuery.build(must=(TermQuery("a"),), filter=(TermQuery("b"), TermQuery("b")))
    rq = rewrite_query(q)
    assert sum(1 for c in rq.clauses if c.occur == Occur.FILTER) == 1


def test_match_all_sorted_by_column(env, spark):
    s, _ = env
    # field-sort analog: match-all + ORDER BY doc values column (ts)
    docs = s.index.docs
    got = docs.orderBy("ts", "doc_id").limit(5).select("doc_id").collect()
    assert len(got) == 5


def test_nested_boolean(env):
    s, naive = env
    inner = BooleanQuery.build(should=(TermQuery("faith"), TermQuery("light")))
    q = BooleanQuery.build(must=(TermQuery("the"), inner), must_not=(TermQuery("w0003"),))
    got, exp = _topk(s, q), naive.top_k(q)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (d1, s1), (d2, s2) in zip(got, exp):
        assert abs(s1 - s2) < 2e-6  # nested double-sum association may differ 1 ulp


def test_sloppy_phrase_vs_naive(env):
    s, naive = env
    for slop in (1, 2, 4):
        q = PhraseQuery(("kingdom", "god"), slop=slop)
        got = {r["doc_id"]: r["score"] for r in s.execute(q).collect()}
        exp = naive.scores(q)
        assert set(got) == set(exp), slop
        for d in got:
            assert np.float32(got[d]) == np.float32(exp[d]), (slop, d)


def test_sloppy_phrase_golden(spark):
    """Hand-computed: 'a x b' matches "a b"~1 with matchLength 1 -> freq 0.5."""
    docs = spark.createDataFrame(
        [("c", 0, "a x b"), ("c", 1, "a b"), ("c", 2, "b a"), ("c", 3, "a x x b")],
        "conv_id string, turn_idx int, text string",
    )
    from lucene_kmp_spark.index import assign_doc_ids, build_index
    from lucene_kmp_spark.search.naive import NaiveIndex

    withids = assign_doc_ids(docs)
    s = IndexSearcher(build_index(withids))
    got = {r["doc_id"]: r["score"] for r in s.execute(PhraseQuery(("a", "b"), slop=1)).collect()}
    # doc0 'a x b': adjusted a:{0}, b:{1} -> len 1, freq 1/2
    # doc1 'a b':   len 0 -> freq 1
    # doc2 'b a':   adjusted a:{1}, b:{-1} -> len 2 > slop -> no match
    # doc3 'a x x b': len 2 > slop -> no match
    assert set(got) == {0, 1}
    naive = NaiveIndex([(r["doc_id"], r["text"]) for r in withids.collect()])
    exp = naive.scores(PhraseQuery(("a", "b"), slop=1))
    for d in got:
        assert np.float32(got[d]) == np.float32(exp[d])


def test_explain_rederives_scores(env):
    """CheckHits pattern (CheckHits.kt:130): explain().value == returned score
    for every top-k hit."""
    s, _ = env
    for q in (
        TermQuery("hope"),
        BooleanQuery.build(must=(TermQuery("the"),), should=(TermQuery("hope"),)),
        PhraseQuery(("kingdom", "of")),
        PhraseQuery(("kingdom", "god"), slop=3),
    ):
        for r in s.top_k(q, 5).collect():
            e = s.explain(q, r["doc_id"])
            assert e["match"]
            assert np.float32(e["value"]) == np.float32(r["score"]), (r, e)
            if isinstance(q, PhraseQuery):
                assert "phraseFreq" in e["description"]


def test_explain_non_matching_doc(env):
    s, naive = env
    q = TermQuery("hope")
    non_match = max(naive.norms) + 10**6  # doc id that doesn't exist
    e = s.explain(q, non_match)
    assert not e["match"] and e["value"] == 0.0


def test_match_all(env):
    s, naive = env
    q = MatchAllDocsQuery(boost=1.0)
    assert s.count(q) == naive.max_doc


def test_fuzzy_transpositions(spark):
    """Damerau/OSA (reference default): 'sprak'~1 matches 'spark'; classic
    levenshtein needs 2 edits for a transposition and must NOT match."""
    from lucene_kmp_spark.search.query import FuzzyQuery
    from lucene_kmp_spark.search.executor import _osa_distance

    assert _osa_distance("spark", "sprak", 1) == 1
    assert _osa_distance("spark", "sprak", 0) == 1  # cap+1 early exit
    assert _osa_distance("ab", "ba", 2) == 1
    assert _osa_distance("abc", "ca", 3) == 3  # OSA (no edit-after-transpose)
    assert _osa_distance("kitten", "sitting", 3) == 3

    docs = spark.createDataFrame(
        [("c", 0, "spark rules"), ("c", 1, "sprak rules"), ("c", 2, "spork rules")],
        "conv_id string, turn_idx int, text string",
    )
    from lucene_kmp_spark.index import assign_doc_ids, build_index

    s = IndexSearcher(build_index(assign_doc_ids(docs)))
    with_t = {r["doc_id"] for r in s.execute(FuzzyQuery("spark", max_edits=1)).collect()}
    without = {
        r["doc_id"]
        for r in s.execute(FuzzyQuery("spark", max_edits=1, transpositions=False)).collect()
    }
    assert with_t == {0, 1, 2}  # spark, sprak (transposition), spork (sub)
    assert without == {0, 2}


def test_ngram_phrase_rewrite(env):
    from lucene_kmp_spark.search.query import NGramPhraseQuery, rewrite_query

    q = NGramPhraseQuery(2, ("ki", "in", "ng"))
    assert rewrite_query(q) == PhraseQuery(("ki", "in", "ng"), slop=0)


def test_term_range_non_bmp_byte_order(spark):
    """SURVEY §1.5: term ranges must follow UTF-8 byte order (BytesRef
    semantics). UTF-8 byte order == code-point order, so Spark UTF8String
    comparison, python str, and the engine must all agree on non-BMP terms."""
    docs = spark.createDataFrame(
        [("c", 0, "alpha"), ("c", 1, "éclair"), ("c", 2, "中文"),
         ("c", 3, "\U0001F600"), ("c", 4, "zebra")],
        "conv_id string, turn_idx int, text string",
    )
    from lucene_kmp_spark.index import assign_doc_ids, build_index
    from lucene_kmp_spark.search.query import TermRangeQuery

    withids = assign_doc_ids(docs)
    s = IndexSearcher(build_index(withids))
    naive = NaiveIndex([(r["doc_id"], r["text"]) for r in withids.collect()])
    # range spanning from BMP into astral plane
    for lo, hi in ((None, "中文"), ("zebra", None), ("alpha", "\U0001F600")):
        q = TermRangeQuery(lo, hi, True, True)
        got = {r["doc_id"] for r in s.execute(q).collect()}
        exp = set(naive.scores(q))
        assert got == exp, (lo, hi)


def test_sort_field_selector_and_missing(spark):
    """SortField upgrades: array min/max selector (SortedNumericSortField
    selector types) + missing-value NULLS LAST policy + expression sorts."""
    from lucene_kmp_spark.index import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import MatchAllDocsQuery, SortField

    rows = [
        (0, "alpha", [3, 9]),
        (1, "alpha", [5, 6]),
        (2, "alpha", None),
        (3, "alpha", [1, 20]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, vals array<int>")
    idx = build_index(df)
    s = IndexSearcher(idx)

    got = s.search_sorted(
        MatchAllDocsQuery(), [SortField(column="vals", selector="max", ascending=False,
                                        missing_last=True)], k=10
    ).collect()
    assert [r.doc_id for r in got] == [3, 0, 1, 2]  # max 20, 9, 6, null last

    got = s.search_sorted(
        MatchAllDocsQuery(), [SortField(column="vals", selector="min", ascending=True,
                                        missing_last=True)], k=10
    ).collect()
    assert [r.doc_id for r in got] == [3, 0, 1, 2]  # min 1, 3, 5, null last

    got = s.search_sorted(
        MatchAllDocsQuery(), [SortField(expr="doc_id * 2", name="dk", ascending=False)], k=2
    ).collect()
    assert [r.doc_id for r in got] == [3, 2] and got[0]["dk"] == 6

    # legacy tuple form still works
    got = s.search_sorted(MatchAllDocsQuery(), [("doc_id", False)], k=1).collect()
    assert got[0].doc_id == 3
    idx.unpersist()


def test_sorted_dv_query_rewrites():
    """Multi-valued doc-values queries rewrite to Catalyst array predicates
    (SortedNumericDocValuesRangeQuery/SetQuery, SortedSetDocValuesRangeQuery)."""
    from lucene_kmp_spark.search.query import (
        ColumnFilterQuery,
        SortedNumericRangeQuery,
        SortedNumericSetQuery,
        SortedSetRangeQuery,
        rewrite_query,
    )

    r = rewrite_query(SortedNumericRangeQuery("vals", 10, 14))
    assert r == ColumnFilterQuery("exists(vals, v -> v >= 10 AND v <= 14)")
    r = rewrite_query(SortedNumericRangeQuery("vals", lower=3))
    assert r == ColumnFilterQuery("exists(vals, v -> v >= 3)")
    r = rewrite_query(SortedNumericSetQuery("vals", (4, 9)))
    assert r == ColumnFilterQuery("arrays_overlap(vals, array(4, 9))")
    r = rewrite_query(SortedSetRangeQuery("tags", "aa", "mm", True, False))
    assert r == ColumnFilterQuery("exists(tags, v -> v >= 'aa' AND v < 'mm')")
    # string escaping
    r = rewrite_query(SortedSetRangeQuery("tags", "o'brien", None))
    assert "o''brien" in r.sql_predicate


def test_top_groups_collapse(spark):
    """Grouping module semantics: groups ranked by head (best) hit, ties by
    head docID; within-group order (score desc, doc_id asc); docs_per_group
    caps the group's rows; groups beyond k dropped."""
    import numpy as np

    from lucene_kmp_spark.index.builder import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.grouping import top_groups
    from lucene_kmp_spark.search.query import TermQuery

    rows = []
    # group g0: doc 0 has "hit hit hit" (best); g1: doc 3 "hit hit"; g2: one weak hit
    texts = {
        0: ("g0", "hit hit hit pad pad"),
        1: ("g0", "hit pad pad pad pad"),
        2: ("g0", "pad pad pad pad pad"),
        3: ("g1", "hit hit pad pad pad"),
        4: ("g1", "hit pad pad pad pad pad pad"),
        5: ("g2", "hit pad pad pad pad pad pad pad pad pad"),
        6: ("g3", "pad pad"),
    }
    for d, (g, t) in texts.items():
        rows.append((d, g, t))
    docs = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    idx = build_index(docs, text_col="text")
    s = IndexSearcher(idx)
    out = [
        (r["grp"], r["group_rank"], r["within_rank"], r["doc_id"])
        for r in top_groups(s, TermQuery("hit"), "grp", k=2, docs_per_group=2).collect()
    ]
    # g0 head = doc 0 (tf 3); g1 head = doc 3 (tf 2, shorter than doc 4);
    # g2 exists but k=2 cuts it; within g0: doc 0 then doc 1
    assert out == [
        ("g0", 1, 1, 0),
        ("g0", 1, 2, 1),
        ("g1", 2, 1, 3),
        ("g1", 2, 2, 4),
    ], out

    # naive parity on head scores
    from lucene_kmp_spark.search.naive import NaiveIndex

    ni = NaiveIndex([(d, t) for d, (_, t) in texts.items()])
    sc = ni.scores(TermQuery("hit"))
    assert sc[0] > sc[3] > 0


def test_suggest_terms(spark):
    """DirectSpellChecker surface: distance-then-frequency ranking from the
    term dictionary; the query term excluded; prefix/min_df filters."""
    from lucene_kmp_spark.index.builder import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.suggest import suggest_terms

    rows = [
        (0, "merge merge merge marge barge"),
        (1, "merge marge purge"),
        (2, "forge gorge merge"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    s = IndexSearcher(build_index(docs, text_col="text"))
    got = [(r["term"], r["distance"], r["df"]) for r in suggest_terms(s, "mergw", k=4).collect()]
    # within 2 edits of "mergw": merge (1 sub) and marge (2 subs); the
    # *arge/*orge/*urge pack is distance 3 and excluded
    assert got == [("merge", 1, 3), ("marge", 2, 2)]
    # "mgrge" is 1 substitution from both merge and marge; the distance tie
    # breaks by df desc (merge df 3 > marge df 2)
    got2 = [(r["term"], r["distance"]) for r in suggest_terms(s, "mgrge", k=4).collect()]
    assert got2[0] == ("merge", 1)
    assert got2[1] == ("marge", 1)
    # prefix filter keeps only m-corrections
    pm = [r["term"] for r in suggest_terms(s, "mergw", k=4, prefix_len=1).collect()]
    assert pm == ["merge", "marge"]
    # the query term itself is never suggested
    self_hits = [r["term"] for r in suggest_terms(s, "merge", k=4).collect()]
    assert "merge" not in self_hits


def test_facet_counts(spark):
    """Facet counts over the match set: (count desc, value asc), match-set
    semantics from the engine (MUST_NOT respected)."""
    from lucene_kmp_spark.index.builder import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.grouping import facet_counts
    from lucene_kmp_spark.search.query import BooleanQuery, TermQuery

    rows = [
        (0, "web", "hit pad"),
        (1, "web", "hit pad"),
        (2, "book", "hit pad"),
        (3, "book", "pad pad"),
        (4, "news", "hit bad"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, src string, text string")
    s = IndexSearcher(build_index(docs, text_col="text"))
    got = [(r["src"], r["count"]) for r in facet_counts(s, TermQuery("hit"), "src").collect()]
    assert got == [("web", 2), ("book", 1), ("news", 1)]
    q = BooleanQuery.build(must=(TermQuery("hit"),), must_not=(TermQuery("bad"),))
    got = [(r["src"], r["count"]) for r in facet_counts(s, q, "src").collect()]
    assert got == [("web", 2), ("book", 1)]
