"""FilterCache (LRUQueryCache.kt analog): cached FILTER doc-sets are reused
across searches, results identical, LRU eviction unpersists."""

import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import FilterCache, IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, TermQuery


@pytest.fixture(scope="module")
def idx(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=30, seed=5)).persist()
    docs.count()
    return build_index(docs)


def test_cached_results_identical(idx):
    cache = FilterCache(max_entries=4)
    s_cached = IndexSearcher(idx, filter_cache=cache)
    s_plain = IndexSearcher(idx)
    q = BooleanQuery.build(must=(TermQuery("hope"),), filter=(TermQuery("light"),))
    a = sorted((r["doc_id"], r["score"]) for r in s_cached.top_k(q, 20).collect())
    b = sorted((r["doc_id"], r["score"]) for r in s_plain.top_k(q, 20).collect())
    assert a == b
    assert cache.misses == 1
    # second search reuses the cached filter set
    s_cached.top_k(q, 20).collect()
    assert cache.hits >= 1 and cache.misses == 1
    cache.clear()


def test_lru_eviction(idx):
    cache = FilterCache(max_entries=2)
    s = IndexSearcher(idx, filter_cache=cache)
    for t in ("hope", "light", "faith"):
        q = BooleanQuery.build(must=(TermQuery("the"),), filter=(TermQuery(t),))
        s.execute(q).count()
    assert len(cache._entries) == 2  # oldest evicted
    # evicted entry recomputes (miss), newest hits
    q = BooleanQuery.build(must=(TermQuery("the"),), filter=(TermQuery("hope"),))
    s.execute(q).count()
    assert cache.misses == 4
    cache.clear()


def test_shared_cache_is_index_scoped(idx, spark):
    """ADVICE r1: a cache shared across searchers over DIFFERENT indexes must
    key per index (LRUQueryCache keys per segment core reader) — the same
    query on index B must miss, not reuse A's doc set."""
    other = build_index(
        assign_doc_ids(synth_transcripts(spark, n_convs=10, seed=99))
    )
    cache = FilterCache(max_entries=8)
    s_a = IndexSearcher(idx, filter_cache=cache)
    s_b = IndexSearcher(other, filter_cache=cache)
    q = BooleanQuery.build(must=(TermQuery("the"),), filter=(TermQuery("hope"),))
    a_rows = s_a.execute(q).count()
    b_rows = s_b.execute(q).count()
    assert cache.misses == 2  # one per index — no cross-index reuse
    # and the cached sets really are different doc sets
    assert s_b.execute(q).count() == b_rows and cache.hits >= 1
    assert a_rows != b_rows or len(cache._entries) == 2
    cache.clear()


def test_usage_tracking_policy_thresholds(idx):
    """UsageTrackingQueryCachingPolicy.kt: costly filters cache after 2 uses,
    compound after 4, plain after 5; TermQuery-class filters never cache."""
    from lucene_kmp_spark.search.executor import UsageTrackingCachingPolicy
    from lucene_kmp_spark.search.query import (
        ConstantScoreQuery,
        FieldExistsQuery,
        MatchAllDocsQuery,
        PhraseQuery,
        PrefixQuery,
    )

    p = UsageTrackingCachingPolicy(history_size=16)
    costly = PrefixQuery("ho")
    phrase = PhraseQuery(("the", "light"))
    compound = BooleanQuery.build(should=(TermQuery("a"), TermQuery("b")))

    assert not p.should_cache(costly)
    p.on_use(costly)
    assert not p.should_cache(costly)  # freq 1 < 2
    p.on_use(costly)
    assert p.should_cache(costly)      # costly: minFrequency 2

    for i in range(3):
        p.on_use(compound)
        assert not p.should_cache(compound)
    p.on_use(compound)
    assert p.should_cache(compound)    # compound: minFrequency 4

    for i in range(4):
        p.on_use(phrase)
        assert not p.should_cache(phrase)
    p.on_use(phrase)
    assert p.should_cache(phrase)      # default: minFrequency 5

    # shouldNeverCache family — uses are not even recorded
    for q in (TermQuery("x"), FieldExistsQuery("text"), MatchAllDocsQuery(),
              ConstantScoreQuery(TermQuery("x"))):
        for _ in range(10):
            p.on_use(q)
        assert not p.should_cache(q)
        assert p.frequency(q) == 0

    # ring-buffer history: old uses age out once evicted
    small = UsageTrackingCachingPolicy(history_size=2)
    small.on_use(costly)
    small.on_use(costly)
    assert small.should_cache(costly)
    small.on_use(phrase)
    small.on_use(phrase)
    assert small.frequency(costly) == 0  # both slots now hold `phrase`


def test_policy_gates_filter_cache(idx):
    """A policy-equipped FilterCache admits a costly filter only on its
    second use, and answers stay identical to the uncached searcher."""
    from lucene_kmp_spark.search.executor import UsageTrackingCachingPolicy
    from lucene_kmp_spark.search.query import PrefixQuery

    cache = FilterCache(max_entries=4, policy=UsageTrackingCachingPolicy())
    s = IndexSearcher(idx, filter_cache=cache)
    s_plain = IndexSearcher(idx)
    q = BooleanQuery.build(must=(TermQuery("the"),), filter=(PrefixQuery("ho"),))

    a = sorted((r["doc_id"], round(r["score"], 5)) for r in s.top_k(q, 20).collect())
    assert len(cache._entries) == 0  # first use: policy veto, ran uncached
    s.top_k(q, 20).collect()
    assert len(cache._entries) == 1  # second use: admitted
    b = sorted((r["doc_id"], round(r["score"], 5)) for r in s.top_k(q, 20).collect())
    c = sorted((r["doc_id"], round(r["score"], 5)) for r in s_plain.top_k(q, 20).collect())
    assert a == b == c
    cache.clear()
