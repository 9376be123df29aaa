"""IndexOrDocValuesQuery (search/IndexOrDocValuesQuery.kt): same matches
through either form, index form for bulk scoring, dv form inside a
conjunction exactly when leadCost < indexCost >>> 3."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ColumnFilterQuery,
    IndexOrDocValuesQuery,
    MatchNoDocsQuery,
    TermInSetQuery,
    TermQuery,
)


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=63)).persist()
    docs.count()
    return docs, build_index(docs)


def _pair(terms):
    """Index form = postings TermInSet; dv form = the semantically identical
    stored-column predicate (the caller's equivalence contract)."""
    alts = " OR ".join(f"array_contains(split(text, ' '), '{t}')" for t in terms)
    return IndexOrDocValuesQuery(TermInSetQuery(tuple(terms)), ColumnFilterQuery(alts))


def _ids(s, q, k=200):
    return sorted(r["doc_id"] for r in s.top_k(q, k).collect())


def test_equivalence_all_forms(env):
    docs, idx = env
    s = IndexSearcher(idx)
    iodv = _pair(["merge", "scan"])

    # standalone == index form (bulkScorer override)
    assert _ids(s, iodv) == _ids(s, iodv.index_query)

    # as FILTER under a rare and a hot lead — always the same matches
    for lead in ("kingdom", "the"):
        bq = BooleanQuery.build(must=[TermQuery(lead)], filter=[iodv])
        via_index = BooleanQuery.build(must=[TermQuery(lead)], filter=[iodv.index_query])
        via_dv = BooleanQuery.build(must=[TermQuery(lead)], filter=[iodv.dv_query])
        got = [(r["doc_id"], np.float32(r["score"])) for r in s.top_k(bq, 50).collect()]
        want = [(r["doc_id"], np.float32(r["score"])) for r in s.top_k(via_index, 50).collect()]
        want_dv = [(r["doc_id"], np.float32(r["score"])) for r in s.top_k(via_dv, 50).collect()]
        assert got == want == want_dv

    # MUST_NOT side
    bq = BooleanQuery.build(must=[TermQuery("kingdom")], must_not=[iodv])
    ref = BooleanQuery.build(must=[TermQuery("kingdom")], must_not=[iodv.index_query])
    assert _ids(s, bq) == _ids(s, ref)


def test_dispatch_rule(env):
    docs, idx = env
    s = IndexSearcher(idx)
    iodv = _pair(["the", "of"])  # hot index side -> large indexCost
    ic = s._cost_estimate(TermQuery("the")) + s._cost_estimate(TermQuery("of"))

    # rare lead: leadCost << indexCost >>> 3 -> dv form
    rare_cost = s._cost_estimate(TermQuery("kingdom"))
    assert (ic >> 3) > rare_cost
    assert s._iodv_choose(iodv, rare_cost) is iodv.dv_query

    # hot lead: leadCost >= indexCost >>> 3 -> index form
    assert s._iodv_choose(iodv, ic) is iodv.index_query

    # no cost anchor (bulk) -> index form
    assert s._iodv_choose(iodv, None) is iodv.index_query

    # unknown-cost term-level index side is refined from the term dict,
    # not treated as infinite
    small = _pair(["kingdom"])
    big_lead = s._cost_estimate(TermQuery("the"))
    assert s._iodv_choose(small, big_lead) is small.index_query


def test_rewrite(env):
    _, idx = env
    q = IndexOrDocValuesQuery(MatchNoDocsQuery(), ColumnFilterQuery("1=1"))
    assert isinstance(q.rewrite(), MatchNoDocsQuery)
    keep = _pair(["merge"])
    assert keep.rewrite() is keep
