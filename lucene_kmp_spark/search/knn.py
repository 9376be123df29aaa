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
