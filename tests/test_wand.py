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


def test_auto_prune_policy(searcher):
    """prune='auto' (the top_k default) applies the A/B-measured cost gate:
    MAXSCORE only for multi-term prunable disjunctions whose Σdf is a large
    corpus fraction; plain scan for single terms / rare disjunctions /
    non-prunable shapes — and the result is identical either way."""
    hot = BooleanQuery.build(should=(TermQuery("the"), TermQuery("of"), TermQuery("and")))
    rare = BooleanQuery.build(should=(TermQuery("w0042"), TermQuery("w0100")))
    assert searcher._auto_prune(hot) == "maxscore"
    assert searcher._auto_prune(rare) is False
    assert searcher._auto_prune(TermQuery("the")) is False  # single term never
    non_prunable = BooleanQuery.build(must=(TermQuery("the"),), should=(TermQuery("of"),))
    assert searcher._auto_prune(non_prunable) is False
    for q in (hot, rare):
        auto = [(r["doc_id"], r["score"]) for r in searcher.top_k(q, 10).collect()]
        full = [(r["doc_id"], r["score"]) for r in searcher.top_k(q, 10, prune=False).collect()]
        assert auto == full


def test_pruned_respects_deletes(spark):
    """θ-seeding must ignore deleted docs: with every high scorer deleted,
    pruned top-k must still equal unpruned top-k over live docs.

    The corpus spans two 8,192-doc pruning windows: window 0 holds low-score
    live docs (long docs, tf=1), window 1 holds high-score docs (short docs,
    big tf) that are ALL deleted. A θ seeded from the deleted docs exceeds
    window 0's upper bound and would prune every live hit."""
    rows = []
    for i in range(9000):
        if i < 8192:
            # low score: common term (df=8192/9000 => tiny idf), long doc
            text = "common " + "filler " * 30
        else:
            # high score: rare term (df=808 => big idf), tf=5, short doc
            text = "rare rare rare rare rare"
        rows.append(("c", i, text.strip()))
    docs = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    from lucene_kmp_spark.index import assign_doc_ids, build_index

    # conv_id constant + turn_idx ascending => doc_id == turn_idx
    withids = assign_doc_ids(docs).persist()
    idx = build_index(withids)
    deleted = spark.createDataFrame([(int(d),) for d in range(8192, 9000)], "doc_id long")
    s = IndexSearcher(idx, live_filter=deleted)
    for strategy in ("wand", "maxscore"):
        q = BooleanQuery.build(should=(TermQuery("rare"), TermQuery("common")))
        pruned = [(r["doc_id"], r["score"]) for r in s.top_k(q, 5, prune=strategy).collect()]
        full = [(r["doc_id"], r["score"]) for r in s.top_k(q, 5, prune=False).collect()]
        assert pruned == full, strategy
        assert len(pruned) == 5 and all(d < 8192 for d, _ in pruned)
