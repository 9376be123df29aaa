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
