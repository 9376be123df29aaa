"""DirectPostingsFormat analog (codecs/memory/DirectPostingsFormat.kt):
warm_terms pins decoded hot-term postings; covered queries serve from the
cache with bit-identical results."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, PhraseQuery, TermQuery


@pytest.fixture(scope="module")
def idx(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=55)).persist()
    docs.count()
    return build_index(docs)


def _topk(s, q, k=10):
    return [(r["doc_id"], np.float32(r["score"])) for r in s.top_k(q, k).collect()]


def test_warm_serves_identical_results(idx):
    cold = IndexSearcher(idx)
    warm = IndexSearcher(idx)
    hot = ["the", "merge", "table"]
    n = warm.warm_terms(hot)
    assert n > 0

    cases = [
        TermQuery("the"),
        TermQuery("merge", boost=2.5),
        BooleanQuery.build(should=[TermQuery("the"), TermQuery("merge")]),
        BooleanQuery.build(must=[TermQuery("table"), TermQuery("merge")]),
    ]
    for q in cases:
        assert _topk(cold, q) == _topk(warm, q), q

    # uncovered terms fall through to the decode path transparently
    q = BooleanQuery.build(should=[TermQuery("the"), TermQuery("scan")])
    assert _topk(cold, q) == _topk(warm, q)

    # phrases need positions — never served from the freqs-level cache
    ph = PhraseQuery(["the", "merge"])
    assert _topk(cold, ph) == _topk(warm, ph)

    warm.cool_terms()
    assert warm._direct_df is None
    assert _topk(cold, TermQuery("the")) == _topk(warm, TermQuery("the"))


def test_cache_rows_match_decode(idx):
    s = IndexSearcher(idx)
    s.warm_terms(["merge"])
    cached = {
        (r["doc_id"], r["tf"]) for r in s._direct_df.filter(F.col("term") == "merge").collect()
    }
    decoded = {
        (r["doc_id"], r["tf"]) for r in s.term_freqs(["merge"]).collect()
    }
    assert cached == decoded
    s.cool_terms()
