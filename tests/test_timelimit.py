"""Time-limited search (TimeLimitingBulkScorer.kt / ExitableDirectoryReader.kt
analog): a query that overruns its budget is cancelled cluster-wide and
raises TimeExceededError; a query within budget returns normal results."""

import time

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import TermQuery
from lucene_kmp_spark.search.timelimit import (
    TimeExceededError,
    run_with_time_limit,
    top_k_with_timeout,
)


@pytest.fixture(scope="module")
def idx(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=30, seed=5)).persist()
    docs.count()
    return build_index(docs)


def test_within_budget_returns_results(spark, idx):
    s = IndexSearcher(idx)
    rows = top_k_with_timeout(s, TermQuery("the"), 10, timeout_sec=120.0)
    plain = s.top_k(TermQuery("the"), 10).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in plain
    ]


def test_overrun_is_cancelled(spark):
    # a deliberately slow job: per-row python sleep via a UDF
    from pyspark.sql.types import IntegerType

    @F.udf(IntegerType())
    def slow(x):
        time.sleep(0.5)
        return x

    df = spark.range(200).select(slow(F.col("id")).alias("v"))
    t0 = time.perf_counter()
    with pytest.raises(TimeExceededError) as ei:
        run_with_time_limit(spark, lambda: df.collect(), timeout_sec=2.0)
    elapsed = time.perf_counter() - t0
    assert ei.value.timeout_sec == 2.0
    assert elapsed < 40.0  # cancelled, not run to completion (~100s serial)


def test_errors_propagate(spark):
    def boom():
        raise RuntimeError("inner failure")

    with pytest.raises(RuntimeError, match="inner failure"):
        run_with_time_limit(spark, boom, timeout_sec=5.0)


def test_knn_under_time_limit(spark, idx):
    """TimeLimitingKnnCollectorManager composition (search/
    TimeLimitingKnnCollectorManager.kt): a knn query runs under the same
    job-group budget machinery — in budget it returns the exact top-k,
    over budget it cancels and raises."""
    import numpy as np

    from lucene_kmp_spark.search.knn import knn_topk

    rng = np.random.RandomState(3)
    vecs = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.randn(8)]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in rng.randn(8)]
    direct = knn_topk(vecs, q, k=5, id_col="vec_id").collect()
    timed = run_with_time_limit(spark, lambda: knn_topk(vecs, q, k=5, id_col="vec_id").collect(), 120.0)
    assert [tuple(r) for r in timed] == [tuple(r) for r in direct]

    slow = vecs.withColumn(
        "embedding",
        F.udf(lambda v: (time.sleep(2.0), v)[1], "array<float>")(F.col("embedding")),
    )
    t0 = time.time()
    with pytest.raises(TimeExceededError):
        run_with_time_limit(spark, lambda: knn_topk(slow, q, k=5, id_col="vec_id").collect(), 1.0)
    assert time.time() - t0 < 60


def test_partial_results_generous_budget(spark, idx):
    """partial_top_k with a comfortable budget returns the EXACT top-k and
    timed_out=False (partialResultsAfterTimeout's no-timeout contract)."""
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import TermQuery
    from lucene_kmp_spark.search.timelimit import partial_top_k

    s = IndexSearcher(idx)
    exact = [(r["doc_id"], round(float(r["score"]), 5))
             for r in s.top_k(TermQuery("the"), 10).collect()]
    rows, timed_out = partial_top_k(s, TermQuery("the"), 10, timeout_sec=300.0)
    assert timed_out is False
    assert [(r["doc_id"], round(float(r["score"]), 5)) for r in rows] == exact


def test_partial_results_expired_budget(spark, idx):
    """A deadline already in the past yields the empty partial page (every
    partition's gate closes before forwarding) — no exception, the
    TimeLimitingBulkScorer partial contract."""
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import TermQuery
    from lucene_kmp_spark.search.timelimit import partial_top_k

    s = IndexSearcher(idx)
    rows, timed_out = partial_top_k(s, TermQuery("the"), 10, timeout_sec=-1.0)
    assert timed_out is True
    assert rows == []
