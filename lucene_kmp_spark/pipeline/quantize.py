"""Scalar-quantized vector search: the int8-codes IO tier for ANN at scale.

Upstream Lucene stores vectors scalar-quantized (Lucene99ScalarQuantizedVectorsFormat
/ ScalarQuantizer: a per-segment [min, max] interval maps each float component
to a small integer code; COSINE vectors are L2-normalized first so quantized
dot ~ cosine, and search scores codes with affine correction terms, optionally
RESCORING top candidates against the raw floats). The reference repo ports the
float HNSW surface only, but at 100 TB this tier is where the IO goes: int8
codes are 4x smaller than float32, so the candidate-generation scan reads a
quarter of the bytes — and the candidate key here reduces to two INTEGER
sums per doc (exact, associative, partition-order-independent) combined with
fixed double coefficients, so candidate sets are bit-deterministic across
engines and cluster sizes.

Math: with codes c = clamp(floor((x_norm - mn)/s + 0.5)) the dequantized
component is mn + c*s, so the dequantized dot of doc d against query q is

    dot = n*mn^2 + mn*s*(S_d + S_q) + s^2 * ID     where
    ID  = sum_i c_d[i]*c_q[i]   (integer),  S_d = sum_i c_d[i]  (integer)

Terms without d are rank-constant, so the candidate ORDER key is
``s^2 * ID + mn*s * S_d`` — two exact integers scaled by shared literals
(ScalarQuantizedVectorSimilarity's offset-correction algebra).

Plan shape (all JVM column expressions — no Python in the scan):

1. ``quantize_params`` — one aggregate for the global [min, max] interval of
   the NORMALIZED components (the deterministic whole-data form of
   ScalarQuantizer's sampled confidence interval).
2. ``scalar_quantize`` — codes as a ``transform`` over the vector column;
   write the codes column (4x smaller) and keep floats for rescoring.
3. ``quantized_topk`` — stage 1 ranks by the corrected integer key above and
   keeps ``rescore``·k candidates; stage 2 joins the (tiny, broadcast)
   candidate set back to the raw float vectors and orders by exact cosine.
   TakeOrderedAndProject at both stages.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_expr(vec_col: str):
    """sqrt(sum x^2) in explicit double arithmetic (sequential in-array
    fold, replayable in any engine); an all-zero vector yields 1.0 so its
    components stay zero instead of NaN."""
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return F.when(nrm > 0.0, nrm).otherwise(F.lit(1.0))


def _unit_expr(vec_col: str, norm_col: str | None = None):
    """L2-normalize: x / norm. IMPORTANT perf note: when ``norm_col`` is
    None the norm aggregate is INLINED inside the per-element lambda and
    Catalyst re-evaluates it for every component — O(d^2) per row. Callers
    on the hot path must stage the norm once per row (``withColumn``) and
    pass its name; the inline form is kept for tiny/oracle-parity uses."""
    nrm = F.col(norm_col) if norm_col else _norm_expr(vec_col)
    return F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm)


def quantize_params(df: DataFrame, vec_col: str = "embedding", bits: int = 8) -> dict:
    """Global quantization interval over the NORMALIZED components: one
    aggregate (exact min/max — deterministic). Returns {"min", "max",
    "scale", "bits"} as python doubles; embed them as literals on every
    engine that must agree."""
    staged = df.select(F.col(vec_col), _norm_expr(vec_col).alias("_qnrm"))
    unit = _unit_expr(vec_col, norm_col="_qnrm")
    row = staged.select(
        F.min(F.array_min(unit)).alias("mn"), F.max(F.array_max(unit)).alias("mx")
    ).collect()[0]
    if row["mn"] is None or row["mx"] is None:
        raise ValueError(
            "cannot derive quantization interval from an empty (or all-"
            f"filtered) dataset: min/max over '{vec_col}' came back NULL"
        )
    mn, mx = float(row["mn"]), float(row["mx"])
    levels = (1 << bits) - 1
    scale = (mx - mn) / levels if mx > mn else 1.0
    return {"min": mn, "max": mx, "scale": scale, "bits": bits}


def quantize_code_expr(vec_col: str, params: dict, norm_col: str | None = None):
    """codes = clamp_{0..2^bits-1}(floor((x_norm - min)/scale + 0.5)) as an
    array<int> column expression (half-up rounding in explicit double
    arithmetic). Pass a staged ``norm_col`` on any hot path — see
    :func:`_unit_expr`'s O(d^2) note."""
    mn, scale = params["min"], params["scale"]
    maxq = (1 << params["bits"]) - 1
    return F.transform(
        _unit_expr(vec_col, norm_col=norm_col),
        lambda x: F.least(
            F.lit(maxq),
            F.greatest(
                F.lit(0),
                F.floor((x - F.lit(mn)) / F.lit(scale) + F.lit(0.5)).cast("int"),
            ),
        ),
    )


def attach_codes(
    df: DataFrame, params: dict, vec_col: str = "embedding", codes_col: str = "codes"
) -> DataFrame:
    """Codes column with the per-row norm staged ONCE (the O(d)-per-row
    form; the naive inline expression re-evaluates the norm aggregate per
    component — measured as the dominant cost of the code write at 4M x 128
    vectors)."""
    return (
        df.withColumn("_qnrm", _norm_expr(vec_col))
        .withColumn(codes_col, quantize_code_expr(vec_col, params, norm_col="_qnrm"))
        .drop("_qnrm")
    )


def scalar_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    params: dict | None = None,
    bits: int = 8,
) -> tuple[DataFrame, dict]:
    """Attach the int-codes column. At write time persist the codes (and
    drop the float column from the hot path) — the candidate scan then reads
    1/4 of the bytes; the float column is fetched only for the rescore join."""
    params = params or quantize_params(df, vec_col, bits)
    return attach_codes(df, params, vec_col, codes_col), params


def quantize_vector(vec, params: dict) -> list[int]:
    """Driver-side twin of :func:`quantize_code_expr` for the query vector
    (normalize, then code)."""
    mn, scale = params["min"], params["scale"]
    maxq = (1 << params["bits"]) - 1
    nrm = 0.0
    for x in vec:
        nrm += float(x) * float(x)
    nrm = math.sqrt(nrm) or 1.0  # zero vector: keep zeros, like _unit_expr
    return [
        min(maxq, max(0, int(math.floor((float(x) / nrm - mn) / scale + 0.5))))
        for x in vec
    ]


def quantized_topk(
    df: DataFrame,
    query_vec,
    params: dict,
    k: int = 10,
    rescore: int = 4,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage quantized search: corrected-integer-dot candidates, exact
    float-cosine rescore. Returns (id, score, rank) for the top ``k``;
    candidate stage keeps ``rescore * k`` rows (Lucene's oversample-then-
    rescore knob). Stage-1 ordering is (key desc, id asc) with the key built
    from two exact per-doc integers, so the candidate cut is identical on
    any partitioning/engine. Stage 2 only touches ``rescore*k`` rows: the
    join back to the float vectors is broadcast-sized by construction."""
    qcodes = quantize_vector(query_vec, params)
    mn, s = params["min"], params["scale"]
    if codes_col not in df.columns:
        # stage codes once per row (norm staged inside): the two integer
        # aggregates below each re-evaluate their child otherwise
        df = attach_codes(df, params, vec_col, codes_col)
    codes = F.col(codes_col)
    qarr = F.array(*[F.lit(int(c)) for c in qcodes])
    int_dot = F.aggregate(
        F.zip_with(codes, qarr, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    code_sum = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    # rank-constant terms (n*mn^2, mn*s*S_q) dropped; coefficients are shared
    # double literals over exact integers -> engine-independent ordering
    key = F.lit(s * s) * int_dot.cast("double") + F.lit(mn * s) * code_sum.cast("double")
    cands = (
        df.select(F.col(id_col), key.alias("qkey"))
        .orderBy(F.desc("qkey"), F.asc(id_col))
        .limit(int(rescore) * int(k))
    )
    qn = 0.0
    for x in query_vec:
        qn += float(x) * float(x)
    qn = math.sqrt(qn) or 1.0  # zero query: scores become 0, not a crash
    qf = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qf, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    nrm = F.when(nrm > 0.0, nrm).otherwise(F.lit(1.0))
    rescored = (
        F.broadcast(cands)
        .join(df.select(id_col, vec_col), id_col)
        .select(F.col(id_col), (dot / (nrm * F.lit(qn))).alias("cosine"))
        # floor-quantize the reported score so cross-engine float noise in
        # the double reductions can't flip equal-score ranks
        .withColumn("score", F.floor(F.col("cosine") * 10000) / 10000)
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
        .select(F.col(id_col), "score", "rank")
    )


def _table_bytes(df: DataFrame) -> int | None:
    """On-disk bytes of the DataFrame's backing files (None when the plan is
    not file-backed — in-memory test DataFrames, views over joins, ...)."""
    import os as _os
    from urllib.parse import urlparse

    files = df.inputFiles()
    if not files:
        return None
    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return None  # remote store: size unknown here, treat as unbounded
        try:
            total += _os.path.getsize(p.path)
        except OSError:
            return None
    return total


def _memory_budget_bytes(spark=None) -> int:
    """Best-effort executor page-cache budget.

    local master: half of physical RAM (driver == executor box, the share a
    hot float table can realistically keep warm).  Non-local master: the
    driver's RAM says nothing about executors, so derive from
    ``spark.executor.memory × executor count`` when configured (a
    conservative stand-in for aggregate executor page cache) and fall back
    to a modest 8 GiB/executor-unknown default.  Both tiers return correct
    results, so a wrong guess costs performance only — callers on real
    clusters should pass ``memory_budget`` explicitly."""
    import os as _os

    master = ""
    if spark is not None:
        try:
            master = spark.conf.get("spark.master", "") or ""
        except Exception:
            master = ""
    if master and not master.startswith("local"):
        try:
            mem = spark.conf.get("spark.executor.memory", None)
            n = int(spark.conf.get("spark.executor.instances", "0") or 0)
            if mem and n > 0:
                units = {"k": 10, "m": 20, "g": 30, "t": 40}
                m = mem.strip().lower()
                if len(m) >= 2 and m.endswith("b") and m[-2] in units:
                    m = m[:-1]  # "512mb" -> "512m"
                if m[-1] in units:
                    val, mult = int(m[:-1]), units[m[-1]]
                else:
                    # Spark parses a unitless executor-memory value as MiB
                    val, mult = int(m), 20
                return (val << mult) * n
        except Exception:
            pass
        return 8 << 30
    try:
        return (_os.sysconf("SC_PAGE_SIZE") * _os.sysconf("SC_PHYS_PAGES")) // 2
    except (ValueError, OSError):
        return 64 << 30


def ann_auto_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    rescore: int = 4,
    params: dict | None = None,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    id_col: str = "vec_id",
    memory_budget: int | None = None,
) -> tuple[DataFrame, str]:
    """Cost-gated ANN scan: pick the float brute-force scan when the table
    fits in memory (page cache), the int8 quantized tier when it does not.

    The measured regimes (BENCH/BASELINE.md): warm-RAM the float scan wins —
    whole-stage-codegen double folds beat the cast-heavy long folds of the
    code scan — while cold/IO-bound the quantized scan reads ~1/4 of the
    bytes and wins by the bandwidth ratio. This is the same cost dispatch
    shape as IndexOrDocValuesQuery (lead-cost vs index-cost): a data-size
    signal, available before any scan, chooses the physical plan.

    Returns ``(topk_df, path)`` with path in {"float", "quantized"}."""
    from lucene_kmp_spark.pipeline.similarity import cosine_topk

    budget = (
        _memory_budget_bytes(df.sparkSession)
        if memory_budget is None
        else int(memory_budget)
    )
    nbytes = _table_bytes(df)
    if nbytes is not None and nbytes <= budget:
        from pyspark.sql.window import Window

        scored = cosine_topk(df, query_vec, k=k, vec_col=vec_col, id_col=id_col)
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        out = (
            scored.withColumn("score", F.floor(F.col("cosine") * 10000) / 10000)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .select(F.col(id_col), "score", "rank")
        )
        return out, "float"
    params = params or quantize_params(df, vec_col)
    return (
        quantized_topk(
            df, query_vec, params, k=k, rescore=rescore,
            vec_col=vec_col, codes_col=codes_col, id_col=id_col,
        ),
        "quantized",
    )


def ivf_quantized_topk(
    df: DataFrame,
    query_vec,
    centroids: list,
    params: dict,
    k: int = 10,
    n_probe: int = 4,
    rescore: int = 4,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """The full scale path composed: IVF partition pruning × int8 codes ×
    rescore. Over a table written by ``similarity.ivf_write_assigned`` (and
    carrying a persisted ``codes`` column) the stage-1 scan reads
    ~``n_probe/n_lists`` of the files (partition pruning on ``_list``) and a
    quarter of the bytes within them (codes, not floats) — IO shrinks
    multiplicatively; stage 2 rescoring stays O(k). Without ``_list`` the
    assignment is computed on the fly (verification scale only), identical
    results by construction."""
    from lucene_kmp_spark.pipeline.similarity import ivf_assign_col, nearest_lists

    probe_lists = nearest_lists(query_vec, centroids, n_probe)
    assigned = (
        df
        if "_list" in df.columns
        else df.withColumn("_list", ivf_assign_col(vec_col, centroids))
    )
    probe = assigned.filter(F.col("_list").isin(probe_lists))
    return quantized_topk(
        probe, query_vec, params, k=k, rescore=rescore,
        vec_col=vec_col, codes_col=codes_col, id_col=id_col,
    )
