"""DocValuesRewriteMethod analog (search/DocValuesRewriteMethod.kt): the
multi-term family evaluated through the docvalues access path (the term-vector
forward index) must produce EXACTLY the postings form's match set — the
reference's contract is that the two access paths are interchangeable for the
same field. Plus SortedSetSelector MIDDLE_MIN/MIDDLE_MAX
(search/SortedSetSelector.kt:256,321)."""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import (
    PrefixQuery,
    RegexpQuery,
    SortField,
    TermRangeQuery,
    WildcardQuery,
)


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=31)).persist()
    docs.count()
    return IndexSearcher(build_index(docs, term_vectors=True))


@pytest.fixture(scope="module")
def env_no_tv(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=8, seed=31))
    return IndexSearcher(build_index(docs))


def _docset(s, q):
    return {r["doc_id"] for r in s.execute(q).select("doc_id").collect()}


@pytest.mark.parametrize(
    "make",
    [
        lambda rw: PrefixQuery("sc", rewrite_method=rw),
        lambda rw: WildcardQuery("s?ar*", rewrite_method=rw),
        lambda rw: TermRangeQuery("score", "spark", True, True, rewrite_method=rw),
        lambda rw: RegexpQuery("s(egment|hard|tream)", rewrite_method=rw),
    ],
    ids=["prefix", "wildcard", "range", "regexp"],
)
def test_doc_values_matches_postings_form(env, make):
    dv = _docset(env, make("doc_values"))
    idx = _docset(env, make("constant_score"))
    assert dv == idx and len(dv) > 0


def test_doc_values_constant_score_boost(env):
    rows = env.execute(PrefixQuery("sc", boost=2.5, rewrite_method="doc_values")).collect()
    assert rows and all(r["score"] == 2.5 for r in rows)


def test_doc_values_requires_term_vectors(env_no_tv):
    with pytest.raises(ValueError, match="term_vectors"):
        env_no_tv.execute(PrefixQuery("sc", rewrite_method="doc_values")).collect()


def test_doc_values_inside_filter_clause(env):
    # FILTER-position usage goes through _doc_set, the NO_SCORES path
    from lucene_kmp_spark.search.query import BooleanQuery, TermQuery

    q = BooleanQuery.build(
        must=[TermQuery("merge")],
        filter=[PrefixQuery("sc", rewrite_method="doc_values")],
    )
    ref = BooleanQuery.build(must=[TermQuery("merge")], filter=[PrefixQuery("sc")])
    assert _docset(env, q) == _docset(env, ref)


# ---------------------------------------------------------------- selectors


def _middle_min(vals):
    s = sorted(set(vals))  # SORTED_SET = distinct ords
    return s[(len(s) - 1) >> 1] if s else None


def _middle_max(vals):
    s = sorted(set(vals))
    return s[len(s) >> 1] if s else None


@pytest.mark.parametrize("selector,pick", [("middle_min", _middle_min), ("middle_max", _middle_max)])
def test_sorted_set_middle_selectors(spark, selector, pick):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=7)).withColumn(
        "vals",
        F.expr(
            "CASE WHEN doc_id % 5 = 0 THEN array() "
            "ELSE array(doc_id % 17, doc_id % 7 * 3, doc_id % 11, doc_id % 4) END"
        ),
    )
    s = IndexSearcher(build_index(docs))
    from lucene_kmp_spark.search.query import MatchAllDocsQuery

    got = s.search_sorted(
        MatchAllDocsQuery(),
        [SortField(column="vals", selector=selector, missing_last=True)],
        k=25,
    ).collect()
    raw = {r["doc_id"]: r["vals"] for r in docs.select("doc_id", "vals").collect()}
    keys = {d: pick(v) for d, v in raw.items()}
    exp = sorted(
        raw,
        key=lambda d: (keys[d] is None, keys[d] if keys[d] is not None else 0, d),
    )[:25]
    assert [r["doc_id"] for r in got] == exp
    # reported key column matches the selector definition
    for r in got:
        assert r["vals"] == keys[r["doc_id"]]
