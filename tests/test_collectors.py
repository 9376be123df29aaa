"""Collector surface (MultiCollector/TotalHitCount/Caching/Filter/
PositiveScoresOnly) vs direct searcher terminals."""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.collectors import (
    CachingCollector,
    FacetsCollector,
    FilterCollector,
    PositiveScoresOnlyCollector,
    TopScoreDocCollector,
    TotalHitCountCollector,
    multi_collect,
    topk_with_total,
)
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, TermQuery


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=7)).persist()
    docs.count()
    return IndexSearcher(build_index(docs)), docs


def test_multi_collect_matches_direct(env):
    s, docs = env
    q = TermQuery("hope")
    topk, total, facets = multi_collect(
        s,
        q,
        [TopScoreDocCollector(5), TotalHitCountCollector(), FacetsCollector(docs, "role", 3)],
    )
    direct_topk = s.top_k(q, 5).collect()
    assert [(r["doc_id"], r["score"]) for r in topk] == [
        (r["doc_id"], r["score"]) for r in direct_topk
    ]
    assert total == s.count(q)
    # facet parity vs a direct aggregate
    exp = (
        s.execute(q)
        .join(docs.select("doc_id", "role"), "doc_id")
        .groupBy("role")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("role"))
        .limit(3)
        .collect()
    )
    assert [(r["role"], r["count"]) for r in facets] == [(r["role"], r["count"]) for r in exp]


def test_caching_collector_replay(env):
    s, _ = env
    q = TermQuery("light")
    cc = CachingCollector(TopScoreDocCollector(3))
    (first,) = multi_collect(s, q, [cc])
    replay_count = cc.replay(TotalHitCountCollector())
    assert replay_count == s.count(q)
    replay_topk = cc.replay(TopScoreDocCollector(3))
    assert [(r["doc_id"], r["score"]) for r in first] == [
        (r["doc_id"], r["score"]) for r in replay_topk
    ]
    cc.unpersist()
    with pytest.raises(ValueError):
        CachingCollector().replay(TotalHitCountCollector())


def test_filter_and_positive_only(env):
    s, _ = env
    q = BooleanQuery.build(should=(TermQuery("hope"), TermQuery("light")))
    (n_even,) = multi_collect(
        s, q, [FilterCollector(TotalHitCountCollector(), lambda df: df.filter(F.col("doc_id") % 2 == 0))]
    )
    exp_even = s.execute(q).filter(F.col("doc_id") % 2 == 0).count()
    assert n_even == exp_even
    # all BM25 scores are positive -> positive-only is a no-op here
    (n_pos,) = multi_collect(s, q, [PositiveScoresOnlyCollector(TotalHitCountCollector())])
    assert n_pos == s.count(q)


def test_topk_with_total(env):
    s, _ = env
    q = TermQuery("hope")
    rows = topk_with_total(s, q, k=4).collect()
    assert len(rows) == min(4, s.count(q))
    assert all(r["total_hits"] == s.count(q) for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    direct = s.top_k(q, 4).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in direct]
