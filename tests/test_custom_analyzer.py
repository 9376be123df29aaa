"""Pluggable analyzer surface: shingle/ngram/edge-gram analyzers through the
same build pipeline, queried as ordinary terms."""

import pytest

from lucene_kmp_spark.analysis.filters import (
    edge_ngram_analyzer,
    ngram_analyzer,
    shingle_analyzer,
    standard_analyzer,
)
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import PrefixQuery, TermQuery


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.createDataFrame(
        [("c", 0, "merge sort wins"), ("c", 1, "merge join wins"), ("c", 2, "hash join loses")],
        "conv_id string, turn_idx int, text string",
    )
    out = assign_doc_ids(d).persist()
    out.count()
    return out


def test_shingle_index(docs):
    idx = build_index(docs, analyzer=shingle_analyzer(2))
    s = IndexSearcher(idx)
    hits = {r["doc_id"] for r in s.execute(TermQuery("merge sort")).collect()}
    assert hits == {0}
    hits = {r["doc_id"] for r in s.execute(TermQuery("join wins")).collect()}
    assert hits == {1}


def test_shingle_with_unigrams(docs):
    idx = build_index(docs, analyzer=shingle_analyzer(2, keep_unigrams=True))
    s = IndexSearcher(idx)
    assert s.count(TermQuery("merge")) == 2      # unigrams present
    assert s.count(TermQuery("merge join")) == 1  # shingles too


def test_ngram_index(docs):
    idx = build_index(docs, analyzer=ngram_analyzer(3, 3))
    s = IndexSearcher(idx)
    # trigram 'erg' occurs only in 'merge' docs
    hits = {r["doc_id"] for r in s.execute(TermQuery("erg")).collect()}
    assert hits == {0, 1}


def test_edge_ngram_prefix_search(docs):
    idx = build_index(docs, analyzer=edge_ngram_analyzer(1, 4))
    s = IndexSearcher(idx)
    # search-as-you-type: the typed prefix IS a term
    hits = {r["doc_id"] for r in s.execute(TermQuery("mer")).collect()}
    assert hits == {0, 1}


def test_standard_factory_matches_default(docs):
    a = build_index(docs)
    b = build_index(docs, analyzer=standard_analyzer())
    s_a, s_b = IndexSearcher(a), IndexSearcher(b)
    qa = [(r["doc_id"], r["score"]) for r in s_a.top_k(TermQuery("merge"), 5).collect()]
    qb = [(r["doc_id"], r["score"]) for r in s_b.top_k(TermQuery("merge"), 5).collect()]
    assert qa == qb


def test_prefix_query_on_shingles(docs):
    idx = build_index(docs, analyzer=shingle_analyzer(2))
    s = IndexSearcher(idx)
    hits = {r["doc_id"] for r in s.execute(PrefixQuery("merge ")).collect()}
    assert hits == {0, 1}


def test_overlap_norms_discounted(docs):
    """discountOverlaps=true (Similarity.kt:134-144): norms count only
    position-incrementing tokens, so overlap analyzers (posIncr=0 grams)
    must encode the source-token count, not the inflated gram count."""
    from lucene_kmp_spark.util.smallfloat import int_to_byte4

    idx = build_index(docs, analyzer=shingle_analyzer(2, keep_unigrams=True))
    norms = {r["doc_id"]: r["norm"] for r in idx.norms.collect()}
    # every fixture doc has 3 source tokens; keep_unigrams emits 5 tokens/doc
    assert norms == {0: int_to_byte4(3), 1: int_to_byte4(3), 2: int_to_byte4(3)}


def test_synonym_analyzer_overlap_semantics():
    """Index-time synonym emission: posIncr=0 overlap at the source position,
    norms unaffected (distinct positions), phrases match across synonyms."""
    from lucene_kmp_spark.analysis.filters import synonym_analyzer

    a = synonym_analyzer({"fast": ("quick", "rapid")})
    terms, positions, _ = a("fast scan wins")
    assert terms == ["fast", "quick", "rapid", "scan", "wins"]
    assert positions == [0, 0, 0, 1, 2]
    # norm length the builder derives (distinct positions) excludes overlaps
    assert len(set(positions)) == 3
