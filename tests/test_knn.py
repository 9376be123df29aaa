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


# ---- byte vectors, similarity-threshold, seeded (KnnByteVectorQuery.kt,
# ---- AbstractVectorSimilarityQuery.kt, SeededKnnVectorQuery.kt) ----

from lucene_kmp_spark.search.knn import (  # noqa: E402
    knn_byte_topk,
    seeded_ivf_topk,
    vector_similarity_all,
)
from lucene_kmp_spark.search.query import (  # noqa: E402
    KnnByteVectorQuery,
    SeededKnnVectorQuery,
    VectorSimilarityQuery,
)


def _synth_bytes(n=48, dim=8, seed=13):
    rng = np.random.RandomState(seed)
    return rng.randint(-128, 128, size=(n, dim)).astype(np.int64)


def _np_byte_scores(vecs, q, fn):
    v = vecs.astype(np.float64)
    qf = np.asarray(q, dtype=np.float64)
    if fn == "euclidean":
        return 1.0 / (1.0 + ((v - qf) ** 2).sum(axis=1))
    dot = v @ qf
    if fn == "dot_product":
        # VectorUtil.kt:281-285 dotProductScore
        return 0.5 + dot / (v.shape[1] * (1 << 15))
    if fn == "cosine":
        return (1.0 + dot / (np.linalg.norm(v, axis=1) * np.linalg.norm(qf))) / 2.0
    return np.where(dot < 0, 1.0 / (1.0 - dot), dot + 1.0)


@pytest.fixture(scope="module")
def byte_env(spark):
    vecs = _synth_bytes()
    df = spark.createDataFrame(
        [(i, [int(x) for x in vecs[i]]) for i in range(len(vecs))],
        "doc_id long, embedding array<int>",
    ).persist()
    df.count()
    return df, vecs


@pytest.mark.parametrize("fn", ["euclidean", "dot_product", "cosine", "maximum_inner_product"])
def test_byte_similarity_mappings(byte_env, fn):
    df, vecs = byte_env
    q = [int(x) for x in vecs[0] // 2]
    got = {r["doc_id"]: r["score"] for r in knn_byte_topk(df, q, k=48, fn=fn).collect()}
    exp = _np_byte_scores(vecs, q, fn)
    assert len(got) == 48
    for d, s in got.items():
        assert abs(s - exp[d]) < 1e-9, (fn, d)


def test_vector_similarity_threshold_all_above(vec_env):
    """FloatVectorSimilarityQuery: result = EVERY doc ≥ resultSimilarity,
    score = boost * similarity; traversalSimilarity never changes it."""
    df, vecs = vec_env
    q = vecs[5]
    exp = _np_scores(vecs, q, "cosine")
    tau = float(np.sort(exp)[-8])  # 8 docs at/above
    got = {r["doc_id"]: r["score"] for r in
           vector_similarity_all(df, list(q), tau, traversal_similarity=tau - 0.1,
                                 fn="cosine", boost=2.0).collect()}
    exp_ids = {i for i in range(len(vecs)) if exp[i] >= tau}
    assert set(got) == exp_ids and len(got) == 8
    for d, s in got.items():
        assert abs(s - 2.0 * exp[d]) < 1e-12


def test_vector_similarity_traversal_gt_result_raises(vec_env):
    df, _ = vec_env
    with pytest.raises(ValueError, match="traversalSimilarity"):
        vector_similarity_all(df, [1.0] * 8, 0.5, traversal_similarity=0.9)


def test_seeded_ivf_probes_seed_lists(vec_env, spark):
    """Seeds vote for IVF lists; the probe scans ONLY those lists, so a
    nearest vector whose list holds no seed is (by design) not returned,
    while everything returned comes from seed lists (LADR semantics)."""
    from lucene_kmp_spark.pipeline.similarity import ivf_assign_col

    df, vecs = vec_env
    cents = [list(map(float, vecs[i])) for i in (1, 2, 3, 4)]
    assigned = df.withColumn("_list", ivf_assign_col("embedding", cents))
    lists = {r["doc_id"]: r["_list"] for r in assigned.collect()}
    seed_ids = [d for d, l in lists.items() if l == 2][:3]
    assert seed_ids
    seeds = spark.createDataFrame([(i,) for i in seed_ids], "doc_id long")
    q = vecs[7]
    got = [r["doc_id"] for r in
           seeded_ivf_topk(df, list(q), cents, seeds, k=10, id_col="doc_id").collect()]
    assert got and all(lists[d] == 2 for d in got)
    # brute-force order restricted to list 2 must agree
    exp = _np_scores(vecs, q, "cosine")
    order = [i for i in sorted(range(len(vecs)), key=lambda i: (-exp[i], i))
             if lists[i] == 2][:10]
    assert got == order


def test_vector_family_through_searcher(spark, vec_env, byte_env):
    vec_df, vecs = vec_env
    byte_df, bvecs = byte_env
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=11)).persist()
    docs.count()
    idx = build_index(docs)

    s = IndexSearcher(idx, vectors=byte_df)
    q = [int(x) for x in bvecs[2] // 3]
    res = [(r["doc_id"], r["score"]) for r in
           s.execute(KnnByteVectorQuery(tuple(q), k=4, fn="dot_product")).collect()]
    exp = _np_byte_scores(bvecs, q, "dot_product")
    assert [d for d, _ in res] == sorted(range(len(bvecs)), key=lambda i: (-exp[i], i))[:4]

    s2 = IndexSearcher(idx, vectors=vec_df)
    q2 = vecs[9]
    exp2 = _np_scores(vecs, q2, "cosine")
    tau = float(np.sort(exp2)[-5])
    got = {r["doc_id"] for r in
           s2.execute(VectorSimilarityQuery(tuple(q2), result_similarity=tau)).collect()}
    assert got == {i for i in range(len(vecs)) if exp2[i] >= tau}

    cents = tuple(tuple(map(float, vecs[i])) for i in (1, 2, 3, 4))
    seeded = SeededKnnVectorQuery(tuple(q2), seed=TermQuery("merge"), centroids=cents, k=5)
    res3 = [r["doc_id"] for r in s2.execute(seeded).collect()]
    assert len(res3) == 5
