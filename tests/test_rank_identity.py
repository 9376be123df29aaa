"""North-rule invariant: identical corpus -> rank-identical top-k (docIDs AND
float32 BM25 scores) regardless of parallelism/partitioning — the sandbox
analog of running on N vs 4N executors.

Everything that could leak partitioning into results is varied: docID
assignment partition count, build shuffle partitioning, serve partitions —
results must be byte-equal."""

import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, PhraseQuery, TermQuery

QUERIES = [
    TermQuery("hope"),
    TermQuery("the"),
    BooleanQuery.build(should=(TermQuery("hope"), TermQuery("faith"), TermQuery("light"))),
    BooleanQuery.build(must=(TermQuery("the"), TermQuery("hope"))),
    PhraseQuery(("kingdom", "of")),
]


def _build(spark, num_partitions, serve_partitions):
    corpus = synth_transcripts(spark, n_convs=80, seed=31)
    docs = assign_doc_ids(corpus, num_partitions=num_partitions).persist()
    docs.count()
    idx = build_index(docs, serve_partitions=serve_partitions)
    return IndexSearcher(idx)


@pytest.fixture(scope="module")
def searchers(spark):
    lo = _build(spark, num_partitions=3, serve_partitions=2)
    hi = _build(spark, num_partitions=13, serve_partitions=8)
    return lo, hi


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_topk_rank_identical_across_partitioning(searchers, qi):
    lo, hi = searchers
    q = QUERIES[qi]
    a = [(r["doc_id"], r["score"]) for r in lo.top_k(q, 20).collect()]
    b = [(r["doc_id"], r["score"]) for r in hi.top_k(q, 20).collect()]
    assert a == b  # docIDs AND float32 scores bit-equal
    assert len(a) > 0


def test_stats_identical_across_partitioning(searchers):
    lo, hi = searchers
    assert lo.index.stats.to_dict() == hi.index.stats.to_dict()
