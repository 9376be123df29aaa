"""LongDistanceFeatureQuery (document/LongDistanceFeatureQuery.kt) and
LatLonPoint.nearest (document/NearestNeighbor.kt) semantics."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.geo import haversin_meters, nearest_neighbors
from lucene_kmp_spark.search.query import LongDistanceFeatureQuery


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=5)).persist()
    docs = docs.withColumn("ts_ms", (F.col("doc_id") * 1000 + 17).cast("long")).persist()
    docs.count()
    idx = build_index(docs)
    return IndexSearcher(idx), docs


def test_long_distance_feature_scores(env):
    s, docs = env
    q = LongDistanceFeatureQuery("ts_ms", origin=50_000, pivot=10_000, boost=2.0)
    got = {r["doc_id"]: r["score"] for r in s.execute(q).collect()}
    vals = {r["doc_id"]: r["ts_ms"] for r in docs.select("doc_id", "ts_ms").collect()}
    assert set(got) == set(vals)
    for d, v in vals.items():
        exp = 2.0 * 10_000 / (10_000 + abs(v - 50_000))
        assert math.isclose(got[d], exp, rel_tol=1e-12)


def test_long_distance_feature_topk_order(env):
    s, _ = env
    q = LongDistanceFeatureQuery("ts_ms", origin=50_000, pivot=10_000)
    rows = s.top_k(q, 5).collect()
    # nearest value to the origin wins; ties by doc_id
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert rows[0]["doc_id"] == 50  # ts_ms = 50_017, closest to 50_000


def test_pivot_validation():
    with pytest.raises(ValueError):
        LongDistanceFeatureQuery("f", origin=0, pivot=0)


def test_nearest_neighbors(spark, env):
    _, docs = env
    pts = docs.withColumn(
        "lat", (F.col("doc_id") % 170 - 85).cast("double")
    ).withColumn("lon", (F.col("doc_id") % 350 - 175).cast("double"))
    got = [(r["doc_id"], r["distance_m"]) for r in nearest_neighbors(pts, "lat", "lon", 10.0, 20.0, k=5).collect()]
    from lucene_kmp_spark.search.geo import (
        decode_latitude,
        decode_longitude,
        encode_latitude,
        encode_longitude,
    )

    rows = pts.select("doc_id", "lat", "lon").collect()
    exp = sorted(
        (
            (
                r["doc_id"],
                haversin_meters(
                    decode_latitude(encode_latitude(r["lat"])),
                    decode_longitude(encode_longitude(r["lon"])),
                    10.0,
                    20.0,
                ),
            )
            for r in rows
        ),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, g), (_, e) in zip(got, exp):
        assert math.isclose(g, e, rel_tol=1e-9)


def test_feature_sort_field(env):
    """FeatureSortField (document/FeatureSortField.kt): descending feature
    order, missing feature sorts as 0, docID asc tiebreak."""
    from lucene_kmp_spark.search.query import MatchAllDocsQuery, SortField

    s, docs = env
    # a feature column with nulls (docs the feature field skips)
    feat = docs.withColumn(
        "pagerank",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None).cast("double")).otherwise(
            F.pmod(F.col("doc_id") * 37, F.lit(100)).cast("double")
        ),
    )
    from lucene_kmp_spark.index import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher

    s2 = IndexSearcher(build_index(feat))
    got = s2.search_sorted(MatchAllDocsQuery(), [SortField.feature("pagerank")], k=15).collect()
    rows = feat.select("doc_id", "pagerank").collect()
    want = sorted(
        ((r["pagerank"] or 0.0), r["doc_id"]) for r in rows
    )
    want = [d for v, d in sorted(want, key=lambda t: (-t[0], t[1]))][:15]
    assert [r["doc_id"] for r in got] == want
