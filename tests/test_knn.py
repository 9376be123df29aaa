"""KnnFloatVectorQuery parity (search/KnnFloatVectorQuery.kt,
AbstractKnnVectorQuery.kt pre-filter semantics, VectorSimilarityFunction.kt
score mappings) vs independent numpy computation."""

import numpy as np
import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.knn import knn_topk
from lucene_kmp_spark.search.query import KnnFloatVectorQuery, TermQuery


def _synth_vectors(n=64, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=(n, dim)).astype(np.float64)


def _np_scores(vecs, q, fn):
    if fn == "euclidean":
        return 1.0 / (1.0 + ((vecs - q) ** 2).sum(axis=1))
    dot = vecs @ q
    if fn == "dot_product":
        return np.maximum(0.0, (1.0 + dot) / 2.0)
    if fn == "cosine":
        cos = dot / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
        return np.maximum(0.0, (1.0 + cos) / 2.0)
    # maximum_inner_product: VectorUtil.kt:291-296
    return np.where(dot < 0, 1.0 / (1.0 - dot), dot + 1.0)


@pytest.fixture(scope="module")
def vec_env(spark):
    vecs = _synth_vectors()
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "doc_id long, embedding array<double>",
    ).persist()
    df.count()
    return df, vecs


@pytest.mark.parametrize("fn", ["euclidean", "dot_product", "cosine", "maximum_inner_product"])
def test_knn_similarity_mappings(vec_env, fn):
    df, vecs = vec_env
    q = vecs[0] * 0.5
    got = {r["doc_id"]: r["score"] for r in knn_topk(df, list(q), k=64, fn=fn).collect()}
    exp = _np_scores(vecs, q, fn)
    assert len(got) == 64
    for d, s in got.items():
        assert abs(s - exp[d]) < 1e-12, (fn, d)


def test_knn_topk_order_and_tiebreak(vec_env):
    df, vecs = vec_env
    q = vecs[3]
    got = [(r["doc_id"], r["score"]) for r in knn_topk(df, list(q), k=5, fn="cosine").collect()]
    exp = _np_scores(vecs, q, "cosine")
    order = sorted(range(len(vecs)), key=lambda i: (-exp[i], i))[:5]
    assert [d for d, _ in got] == order
    assert got[0][0] == 3  # self is nearest under cosine


def test_knn_prefilter_not_postfilter(vec_env):
    """Filter restricts candidates BEFORE the heap: k results still come
    back, drawn from the filtered pool (AbstractKnnVectorQuery rewrite)."""
    df, vecs = vec_env
    q = vecs[3]
    got = [r["doc_id"] for r in
           knn_topk(df, list(q), k=5, fn="cosine", predicate="doc_id % 2 = 1").collect()]
    exp = _np_scores(vecs, q, "cosine")
    order = [i for i in sorted(range(len(vecs)), key=lambda i: (-exp[i], i)) if i % 2 == 1][:5]
    assert got == order and len(got) == 5


def test_knn_query_through_searcher(spark, vec_env):
    """End-to-end: KnnFloatVectorQuery via IndexSearcher.execute with a text
    filter Query — candidates are docs matching the filter, scored by vector
    similarity."""
    vec_df, vecs = vec_env
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=11)).persist()
    docs.count()
    s = IndexSearcher(build_index(docs), vectors=vec_df)
    flt = TermQuery("merge")
    match = {r["doc_id"] for r in s.execute(flt).collect()} & set(range(len(vecs)))
    assert match, "fixture must produce filter matches inside the vector id range"
    q = vecs[1] * -0.25
    res = [(r["doc_id"], r["score"]) for r in
           s.execute(KnnFloatVectorQuery(tuple(q), k=3, fn="euclidean", filter=flt)).collect()]
    exp = _np_scores(vecs, q, "euclidean")
    order = [i for i in sorted(range(len(vecs)), key=lambda i: (-exp[i], i)) if i in match][:3]
    assert [d for d, _ in res] == order
    for d, sc in res:
        assert abs(sc - exp[d]) < 1e-12


def test_knn_without_vectors_raises(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=5, seed=3))
    s = IndexSearcher(build_index(docs))
    with pytest.raises(ValueError, match="vectors"):
        s.execute(KnnFloatVectorQuery((1.0, 0.0), k=1))
