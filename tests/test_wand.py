"""Pruned (block-max WAND) vs unpruned equivalence — the reference's own
oracle pattern (TestWANDScorer.kt: pruned scorer must equal naive scorer)."""

import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, TermQuery


@pytest.fixture(scope="module")
def searcher(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=120, seed=11)).persist()
    docs.count()
    return IndexSearcher(build_index(docs))


CASES = [
    TermQuery("the"),
    TermQuery("hope"),
    TermQuery("w0042"),
    BooleanQuery.build(should=(TermQuery("hope"), TermQuery("faith"), TermQuery("light"))),
    BooleanQuery.build(should=(TermQuery("the"), TermQuery("w0100"))),  # hot + rare
    BooleanQuery.build(should=(TermQuery("hope", boost=2.0), TermQuery("truth"))),
    BooleanQuery.build(should=tuple(TermQuery(t) for t in ["spark", "index", "query", "term", "score"])),
]


@pytest.mark.parametrize("idx", range(len(CASES)))
@pytest.mark.parametrize("k", [1, 10, 50])
def test_pruned_equals_unpruned(searcher, idx, k):
    q = CASES[idx]
    pruned = [(r["doc_id"], r["score"]) for r in searcher.top_k(q, k, prune=True).collect()]
    full = [(r["doc_id"], r["score"]) for r in searcher.top_k(q, k, prune=False).collect()]
    assert pruned == full


@pytest.mark.parametrize("idx", range(len(CASES)))
@pytest.mark.parametrize("k", [1, 10])
def test_maxscore_equals_unpruned(searcher, idx, k):
    """MaxScoreBulkScorer analog must also be exact (TestMaxScoreBulkScorer
    pattern: pruned == naive)."""
    q = CASES[idx]
    pruned = [
        (r["doc_id"], r["score"]) for r in searcher.top_k(q, k, prune="maxscore").collect()
    ]
    full = [(r["doc_id"], r["score"]) for r in searcher.top_k(q, k, prune=False).collect()]
    assert pruned == full


def test_wand_boost_detection(searcher):
    assert searcher._wand_boosts(TermQuery("x")) == {"x": 1.0}
    q = BooleanQuery.build(should=(TermQuery("a"), TermQuery("a"), TermQuery("b")))
    assert searcher._wand_boosts(q) == {"a": 2.0, "b": 1.0}
    q2 = BooleanQuery.build(must=(TermQuery("a"),), should=(TermQuery("b"),))
    assert searcher._wand_boosts(q2) is None
    q3 = BooleanQuery.build(should=(TermQuery("a"), TermQuery("b")), minimum_should_match=2)
    assert searcher._wand_boosts(q3) is None
