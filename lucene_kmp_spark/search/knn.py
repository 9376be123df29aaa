"""Exact kNN float-vector search (``search/KnnFloatVectorQuery.kt``,
``search/AbstractKnnVectorQuery.kt``; score mappings from
``index/VectorSimilarityFunction.kt:15-73``).

Spark-first design: the reference's HNSW graph walk is a single-node
data structure; the distributed analog of its *exact* pre-filtered path
(``AbstractKnnVectorQuery.exactSearch``) is one narrow columnar scan of the
vector table with the query vector broadcast as a literal, scored by pure
column expressions (``zip_with`` + ``aggregate`` dot products — JVM-side,
whole-stage codegen, no Python), finished with ``ORDER BY … LIMIT k``
(TakeOrderedAndProject: per-partition heaps, one tiny driver merge).
At 100 TB the scan prunes by Parquet column pruning (only id + vector read)
plus any pushed-down pre-filter predicate. Sub-linear approximate probes
(the HNSW analog) live in ``pipeline/similarity.py`` — LSH sign buckets and
IVF write-time partition pruning; this module is the exact tier they are
rescored against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VECTOR_SIMILARITIES = ("euclidean", "dot_product", "cosine", "maximum_inner_product")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def similarity_expr(fn: str, vec_col, query_vec: list[float]):
    """Score column for one similarity function — the exact non-negative
    mappings of ``VectorSimilarityFunction.kt``:

    * ``euclidean``:             1 / (1 + ||v−q||²)
    * ``dot_product``:           max(0, (1 + v·q) / 2)
    * ``cosine``:                max(0, (1 + cos(v,q)) / 2)
    * ``maximum_inner_product``: v·q < 0 ? 1/(1 − v·q) : v·q + 1
      (``VectorUtil.kt:291-296`` scaleMaxInnerProductScore)
    """
    if fn not in VECTOR_SIMILARITIES:
        raise ValueError(f"unknown vector similarity: {fn}")
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    if fn == "euclidean":
        return F.lit(1.0) / (F.lit(1.0) + _sq_dist(v, q))
    if fn == "dot_product":
        return F.greatest(F.lit(0.0), (F.lit(1.0) + _dot(v, q)) / F.lit(2.0))
    if fn == "cosine":
        cos = _dot(v, q) / (_norm(v) * _norm(q))
        return F.greatest(F.lit(0.0), (F.lit(1.0) + cos) / F.lit(2.0))
    d = _dot(v, q)
    return F.when(d < 0, F.lit(1.0) / (F.lit(1.0) - d)).otherwise(d + F.lit(1.0))


def knn_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    fn: str = "cosine",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    predicate: str | None = None,
    docset: DataFrame | None = None,
    boost: float = 1.0,
) -> DataFrame:
    """Exact top-k (id, score) — ``AbstractKnnVectorQuery.kt`` pre-filter
    semantics: the filter restricts the candidate set BEFORE top-k selection
    (not a post-filter of k results).

    ``predicate`` is a pushdown-able SQL condition on the vector table;
    ``docset`` is an already-evaluated filter-query match set (broadcast
    semi-join on ``id_col``). Ties break toward the lower id, matching the
    reference's doc-order heap tie-break (TopKnnCollector min-heap insertion
    order).
    """
    df = vectors
    if predicate is not None:
        df = df.filter(predicate)
    if docset is not None:
        df = df.join(F.broadcast(docset.select(F.col("doc_id").alias(id_col))), id_col, "semi")
    score = similarity_expr(fn, vec_col, query_vec) * F.lit(float(boost))
    return (
        df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def byte_similarity_expr(fn: str, vec_col, query_vec: list[int], dim: int | None = None):
    """Score column for signed-byte vectors — the byte overloads of
    ``VectorSimilarityFunction.kt:22-71`` (``KnnByteVectorQuery.kt`` path):

    * ``euclidean``:             1 / (1 + ||v−q||²)          (same as float)
    * ``dot_product``:           0.5 + v·q / (dim · 2¹⁵)
      (``VectorUtil.kt:281-285`` dotProductScore — scaled to [0,1])
    * ``cosine``:                (1 + cos(v,q)) / 2           (no 0-clamp)
    * ``maximum_inner_product``: same scaling as float

    Vectors are integer-valued columns (array<int>/array<tinyint>); products
    accumulate in double, which is exact for byte magnitudes.
    """
    if fn not in VECTOR_SIMILARITIES:
        raise ValueError(f"unknown vector similarity: {fn}")
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    q = F.array(*[F.lit(int(x)) for x in query_vec])
    if fn == "euclidean":
        return F.lit(1.0) / (F.lit(1.0) + _sq_dist(v, q))
    if fn == "dot_product":
        n = dim if dim is not None else len(query_vec)
        return F.lit(0.5) + _dot(v, q) / F.lit(float(n * (1 << 15)))
    if fn == "cosine":
        return (F.lit(1.0) + _dot(v, q) / (_norm(v) * _norm(q))) / F.lit(2.0)
    d = _dot(v, q)
    return F.when(d < 0, F.lit(1.0) / (F.lit(1.0) - d)).otherwise(d + F.lit(1.0))


def knn_byte_topk(
    vectors: DataFrame,
    query_vec: list[int],
    k: int = 10,
    fn: str = "dot_product",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    predicate: str | None = None,
    docset: DataFrame | None = None,
    boost: float = 1.0,
) -> DataFrame:
    """Exact top-k over signed-byte vectors (``KnnByteVectorQuery.kt``) —
    identical plan shape to :func:`knn_topk`, byte score mappings."""
    df = vectors
    if predicate is not None:
        df = df.filter(predicate)
    if docset is not None:
        df = df.join(F.broadcast(docset.select(F.col("doc_id").alias(id_col))), id_col, "semi")
    score = byte_similarity_expr(fn, vec_col, query_vec) * F.lit(float(boost))
    return (
        df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def vector_similarity_all(
    vectors: DataFrame,
    query_vec: list[float],
    result_similarity: float,
    traversal_similarity: float | None = None,
    fn: str = "cosine",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    predicate: str | None = None,
    docset: DataFrame | None = None,
    boost: float = 1.0,
    byte_vectors: bool = False,
) -> DataFrame:
    """ALL docs above a similarity threshold — Float/ByteVectorSimilarityQuery
    (``search/AbstractVectorSimilarityQuery.kt``): every doc whose similarity
    ≥ ``resultSimilarity`` scores ``boost * similarity``; the filter
    restricts candidates BEFORE thresholding (scorerSupplier's acceptDocs).

    ``traversalSimilarity`` governs only how far the reference's HNSW graph
    walk explores (must be ≤ resultSimilarity, enforced like the reference's
    ``init`` require); the exact distributed scan visits everything, so it
    never changes the result set — the threshold predicate itself is the
    pruning (Parquet-pushed when the score is precomputed at write time).
    """
    if traversal_similarity is not None and traversal_similarity > result_similarity:
        raise ValueError("traversalSimilarity should be <= resultSimilarity")
    df = vectors
    if predicate is not None:
        df = df.filter(predicate)
    if docset is not None:
        df = df.join(F.broadcast(docset.select(F.col("doc_id").alias(id_col))), id_col, "semi")
    sim = (
        byte_similarity_expr(fn, vec_col, [int(x) for x in query_vec])
        if byte_vectors
        else similarity_expr(fn, vec_col, query_vec)
    )
    return (
        df.select(F.col(id_col), sim.alias("_sim"))
        .filter(F.col("_sim") >= F.lit(float(result_similarity)))
        .select(F.col(id_col), (F.col("_sim") * F.lit(float(boost))).alias("score"))
    )


def seeded_ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    seed_docset: DataFrame,
    k: int = 10,
    fn: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fallback_n_probe: int = 1,
) -> DataFrame:
    """SeededKnnVectorQuery (``search/SeededKnnVectorQuery.kt``) — the
    Lexically-Accelerated Dense Retrieval pattern (LADR, SIGIR '23, cited in
    the reference's javadoc): results of a cheap seed query pick the entry
    points of the approximate search. The reference seeds the HNSW walk; the
    distributed analog seeds the IVF coarse quantizer — probe exactly the
    lists that contain seed documents, so the scan is pruned to the
    partitions the seeds vote for (``ivf_write_assigned`` partition column).

    Like the reference ("the underlying format is free to ignore the
    provided seed"), an empty seed set falls back to the plain
    centroid-routed probe with ``fallback_n_probe`` lists.
    """
    from lucene_kmp_spark.pipeline.similarity import (
        ivf_assign_col,
        nearest_lists,
    )

    assigned = (
        vectors
        if "_list" in vectors.columns
        else vectors.withColumn("_list", ivf_assign_col(vec_col, centroids))
    )
    seed_ids = seed_docset.select(F.col(seed_docset.columns[0]).alias(id_col))
    seed_lists = [
        r["_list"]
        for r in assigned.join(F.broadcast(seed_ids), id_col, "semi")
        .select("_list")
        .distinct()
        .collect()
    ]
    if not seed_lists:
        seed_lists = nearest_lists(query_vec, centroids, fallback_n_probe)
    probe = assigned.filter(F.col("_list").isin(sorted(seed_lists)))
    score = similarity_expr(fn, vec_col, query_vec)
    return (
        probe.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )
