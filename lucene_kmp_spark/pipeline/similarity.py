"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force exact top-k: one narrow pass + TakeOrdered.
  The 100 TB path broadcasts the query vector; cost is a single scan.
* ``lsh_bucketed_topk`` — random-hyperplane LSH: probe only rows whose sign
  bucket matches the query's (optionally with multi-probe hamming radius 1),
  trading recall for a >100x scan reduction at scale.

Dot products run as column expressions (``zip_with`` + ``aggregate``) in
double precision, left-to-right — deterministic and engine-portable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_scores(df: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return df.withColumn(
        "cosine", _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine (ORDER BY + LIMIT = TakeOrdered)."""
    return (
        cosine_scores(df, query_vec, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _pair_dot_lr():
    """Arrow-batched pair dot product with LEFT-TO-RIGHT float64
    accumulation — bit-identical to the ``aggregate`` column expression (and
    to DuckDB's unnest-order sum, which the oracles rely on), measured 1.5x
    faster on the bucket-join verify stage at sf0.1 (255k pairs: 3.4s vs
    5.1s; a faster einsum variant was rejected — pairwise summation changes
    rounding)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def np_dot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        a = np.stack(xs.values).astype(np.float64, copy=False)
        b = np.stack(ys.values).astype(np.float64, copy=False)
        acc = a[:, 0] * b[:, 0]
        for i in range(1, a.shape[1]):
            acc = acc + a[:, i] * b[:, i]
        return pd.Series(acc)

    return np_dot


def _pair_cosine(
    df: DataFrame, threshold: float, vec_col: str, id_col: str, bucket_col: str | None
) -> DataFrame:
    """(id_a, id_b, cosine) for id_a < id_b pairs — optionally restricted to
    same-``bucket_col`` pairs (equi-join candidate generation). The per-pair
    dot runs in the Arrow/numpy kernel (see ``_pair_dot_lr``); per-vector
    norms stay column expressions (one per row, not per pair)."""
    cols = [F.col(id_col), F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("nrm")]
    if bucket_col:
        cols.append(F.col(bucket_col))
    v = df.select(*cols)
    a, b = v.alias("a"), v.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if bucket_col:
        cond = (F.col(f"a.{bucket_col}") == F.col(f"b.{bucket_col}")) & cond
    pairs = a.join(b, cond)
    np_dot = _pair_dot_lr()
    cos = np_dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        cos.alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    All-pairs form for verification scale; at 100 TB use
    ``lsh_near_dup_pairs`` so only same-bucket pairs are compared. Inputs
    past the guard threshold raise unless ``allow_all_pairs=True``."""
    from lucene_kmp_spark.pipeline._guards import guard_all_pairs

    guard_all_pairs(df, "cosine_near_dup_pairs", "lsh_near_dup_pairs", allow_all_pairs)
    return _pair_cosine(df, threshold, vec_col, id_col, bucket_col=None)


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs via the LSH sign-bucket join — the composed
    100 TB path: candidates come from an equi-join on the bucket column
    (hash-shuffle on bucket, work ∝ Σ bucket_size², never all-pairs), then
    the exact cosine verifies each candidate.

    Recall tradeoff is the standard random-hyperplane one: a pair at cosine
    similarity cos(θ) collides in all ``n_planes`` signs with probability
    (1 − θ/π)^n_planes; run with several seeds and union for higher recall
    (same shape as MinHash bands)."""
    if "_bucket" in df.columns:
        bucketed = df
    else:
        dim = len(df.select(vec_col).first()[0])
        bucketed = df.withColumn(
            "_bucket", lsh_bucket_col(vec_col, _hyperplanes(dim, n_planes, seed))
        )
    return _bucket_pairs_matmul(bucketed, threshold, vec_col, id_col, "_bucket")


def _bucket_pairs_matmul(
    bucketed: DataFrame, threshold: float, vec_col: str, id_col: str,
    bucket_col: str,
) -> DataFrame:
    """Same-bucket (id_a < id_b, cosine >= t) pairs via a per-bucket BLAS
    matmul instead of a pair-row join: the join materializes one Arrow row
    PER CANDIDATE PAIR carrying BOTH full vectors (O(pairs x dim) transfer);
    here each bucket ships once and the m x m cosine block is computed in
    chunks of 2,048 rows, so peak memory is O(chunk x m) however dup-dense
    the bucket. Bucket residency is the same as the equi-join's (a hash
    bucket co-locates either way) — size n_planes so buckets fit a worker.

    Rounding contract: the BLAS matmul sums pairwise, which can differ from
    the left-to-right float64 accumulation the oracles (DuckDB unnest-order
    sum — see ``_pair_dot_lr``) rely on by a few ulps.  So the matmul only
    MASKS candidates (threshold loosened by 1e-9, >> the ulp gap); every
    surviving pair's reported cosine — and the exact >= threshold cut — is
    recomputed left-to-right, bit-identical to ``_pair_cosine``."""
    thr = float(threshold)
    _SLACK = 1e-9  # >> dim * ulp; admits every pair the LR kernel would keep

    def per_bucket(pdf):
        import numpy as np
        import pandas as pd

        m = len(pdf)
        empty = pd.DataFrame({
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        })
        if m < 2:
            return empty
        ids = pdf[id_col].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        dim = V.shape[1]
        # left-to-right norms — bit-identical to the ``_norm`` column expr
        acc = V[:, 0] * V[:, 0]
        for d in range(1, dim):
            acc = acc + V[:, d] * V[:, d]
        nrm = np.sqrt(acc)
        outs = []
        chunk = 2048
        col_idx = np.arange(m)
        for s in range(0, m, chunk):
            e = min(s + chunk, m)
            C = (V[s:e] @ V.T) / np.outer(nrm[s:e], nrm)
            ri = np.arange(s, e)
            mask = (col_idx[None, :] > ri[:, None]) & (C >= thr - _SLACK)
            ii, jj = np.nonzero(mask)
            if ii.size == 0:
                continue
            gi = ri[ii]
            # exact left-to-right recompute for the masked candidates only
            A, B = V[gi], V[jj]
            dot = A[:, 0] * B[:, 0]
            for d in range(1, dim):
                dot = dot + A[:, d] * B[:, d]
            cos = dot / (nrm[gi] * nrm[jj])
            keep = cos >= thr
            if not keep.any():
                continue
            gi, jj, cos = gi[keep], jj[keep], cos[keep]
            ia, ib = ids[gi], ids[jj]
            swap = ia > ib
            outs.append(pd.DataFrame({
                "id_a": np.where(swap, ib, ia),
                "id_b": np.where(swap, ia, ib),
                "cosine": cos,
            }))
        return pd.concat(outs, ignore_index=True) if outs else empty

    return bucketed.select(id_col, vec_col, bucket_col).groupBy(
        bucket_col
    ).applyInPandas(per_bucket, schema="id_a long, id_b long, cosine double")


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state — pure
    function of (dim, n_planes, seed) so executors/engines agree)."""
    import math

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = math.sin(seed * 1_000_003 + p * 10_007 + d * 97) * 43758.5453
            row.append((x - math.floor(x)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_col(vec_col: str, planes: list[list[float]]):
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(F.col(vec_col), p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("long")


def lsh_write_bucketed(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    dim: int | None = None,
    vec_col: str = "embedding",
    seed: int = 42,
) -> str:
    """Materialize the LSH sign bucket as a PARTITION column: the probe side
    then reads only the matching ``_bucket=`` directories (Catalyst partition
    pruning), so a probe scans ~1/2^n_planes of the bytes instead of
    recomputing buckets over a full pass."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = df.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    bucketed.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    return path


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """ANN: score only vectors in the query's sign bucket.

    If ``df`` already carries a ``_bucket`` column (a table written by
    ``lsh_write_bucketed``), the filter hits the partition column and
    Catalyst prunes storage; otherwise the bucket is computed on the fly
    (full scan — fine for small tables, not the 100 TB path)."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    bucketed = (
        df
        if "_bucket" in df.columns
        else df.withColumn("_bucket", lsh_bucket_col(vec_col, planes))
    )
    qbits = 0
    for i, plane in enumerate(planes):
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if dot >= 0:
            qbits |= 1 << i
    probe = bucketed.filter(F.col("_bucket") == qbits)
    return cosine_topk(probe, query_vec, k, vec_col, id_col)


# --------------------------------------------------------------------- IVF
def ivf_train_centroids(
    df: DataFrame,
    n_lists: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic coarse quantizer (the IVF scale path): seed centroids are
    the vectors with the smallest xxhash64(id, seed) per hash-slot, refined by
    ``iters`` Lloyd steps (assign = argmax cosine, update = mean — both plain
    DataFrame aggregations, no RNG state, any-parallelism stable)."""
    from pyspark.sql.window import Window

    w = F.row_number().over(
        Window.partitionBy(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_lists))
        ).orderBy(F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.col(id_col))
    )
    seeds = (
        df.withColumn("_rn", w)
        .filter(F.col("_rn") == 1)
        .select(vec_col)
        .collect()
    )
    centroids = [[float(v) for v in r[vec_col]] for r in seeds]
    for _ in range(iters):
        assigned = df.withColumn("_list", ivf_assign_col(vec_col, centroids))
        dim = len(centroids[0])
        means = assigned.groupBy("_list").agg(
            *[F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"c{i}") for i in range(dim)]
        ).collect()
        new = {int(r["_list"]): [float(r[f"c{i}"]) for i in range(dim)] for r in means}
        centroids = [new.get(i, c) for i, c in enumerate(centroids)]
    return centroids


def _assign_struct(vec_col: str, centroids: list[list[float]]):
    """(cos, idx) of the winning centroid — argmax cosine, ties to the higher
    index (the ``array_max`` struct comparison rule)."""
    structs = []
    for i, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(v)) for v in c])
        cos = _dot(F.col(vec_col), arr) / (_norm(F.col(vec_col)) * _norm(arr))
        structs.append(F.struct(cos.alias("cos"), F.lit(i).alias("idx")))
    return F.array_max(F.array(*structs))


def ivf_assign_col(vec_col: str, centroids: list[list[float]]):
    """list id = argmax cosine over centroids, as a pure column expression."""
    return _assign_struct(vec_col, centroids)["idx"]


def nearest_lists(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """The ``n_probe`` list ids whose centroids are nearest the query by
    cosine (ties by list id) — the coarse-quantizer routing decision."""
    import math

    qn = math.sqrt(sum(v * v for v in query_vec)) or 1.0
    sims = []
    for i, c in enumerate(centroids):
        cn = math.sqrt(sum(v * v for v in c)) or 1.0
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, c))
        sims.append((dot / (qn * cn), i))
    sims.sort(key=lambda x: (-x[0], x[1]))
    return [i for _s, i in sims[: max(1, n_probe)]]


def ivf_write_assigned(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
) -> str:
    """Materialize the IVF list assignment as a PARTITION column
    (``_list=<i>/`` directories).  This is the write-time half of the scale
    path: a probe then filters on the partition column only, Catalyst prunes
    whole directories, and scan bytes shrink to ~n_probe/n_lists of the
    table (the distributed analog of HNSW's sub-linear probes,
    ``util/hnsw/HnswGraphSearcher.kt``)."""
    assigned = df.withColumn("_list", ivf_assign_col(vec_col, centroids))
    assigned.write.mode("overwrite").partitionBy("_list").parquet(path)
    return path


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: brute-force cosine only inside the ``n_probe`` lists whose
    centroids are nearest the query. With ``n_probe == len(centroids)`` this
    is exactly brute force.

    If ``df`` already carries a ``_list`` column (a table written by
    ``ivf_write_assigned``), the probe filter hits the partition column and
    the scan reads only ~n_probe/n_lists of the bytes; otherwise assignment
    is computed on the fly (full scan — verification scale only)."""
    probe_lists = nearest_lists(query_vec, centroids, n_probe)
    assigned = (
        df
        if "_list" in df.columns
        else df.withColumn("_list", ivf_assign_col(vec_col, centroids))
    )
    probe = assigned.filter(F.col("_list").isin(probe_lists))
    return cosine_topk(probe, query_vec, k, vec_col, id_col)


# ---------------------------------------------------------------- SemDeDup
def semdedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic deduplication by
    clustering embeddings and removing within-cluster semantic duplicates.

    Each vector is assigned to its nearest centroid (cosine); within a
    cluster, members are visited in (similarity-to-centroid ASC, id ASC)
    order — the paper's keep-the-example-farthest-from-the-centroid policy —
    and a member is a duplicate if its max cosine to any EARLIER member
    reaches ``threshold`` (the published implementation's upper-triangular
    max test). Returns every row as (id, list, is_dup).

    Scale shape: assignment is a pure column expression; the per-cluster
    pairwise pass is ONE shuffle keyed by the cluster id (free if ``df``
    carries a write-time ``_list`` partition column) with numpy matrix
    products inside Arrow batches. The quadratic is cluster-bounded — the
    algorithm's own cost model: ``n_lists`` grows with the corpus so cluster
    sizes stay constant (the paper uses k=50k at 1B examples).

    Float protocol: the visit order quantizes centroid-cosine at 1e-7 and the
    duplicate test quantizes max-pair-cosine at 1e-4 (ties broken by id), so
    the decision is reproducible across engines (numpy / SQL doubles).
    """
    thr_q = int(np.floor(threshold * 10000))
    best = _assign_struct(vec_col, centroids)
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_vec"),
        best["idx"].alias("_list"),
        F.floor(best["cos"] * 10000000).cast("long").alias("_ccos_q"),
    )

    id_field = df.schema[id_col]
    out_schema = f"{id_col} {id_field.dataType.simpleString()}, list int, is_dup boolean"

    def _cluster_dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ccos_q", id_col], kind="mergesort").reset_index(drop=True)
        v = np.asarray(pdf["_vec"].tolist(), dtype=np.float64)
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0.0] = 1.0
        v /= norms[:, None]
        sims = v @ v.T
        n = len(pdf)
        dup = np.zeros(n, dtype=bool)
        for i in range(1, n):
            dup[i] = np.floor(sims[i, :i].max() * 10000) >= thr_q
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "list": np.full(n, int(pdf["_list"].iloc[0]), dtype=np.int32),
                "is_dup": dup,
            }
        )

    return assigned.groupBy("_list").applyInPandas(_cluster_dedup, out_schema)


def semdedup_keep(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The surviving rows of ``semdedup`` — the semantically deduplicated
    corpus (an inner join on the kept id set, broadcast-sized per partition)."""
    kept = semdedup(df, centroids, threshold, vec_col, id_col).filter(
        ~F.col("is_dup")
    ).select(id_col)
    return df.join(kept, id_col, "inner")
