"""Scalar-quantized vector search (pipeline/quantize.py): code correctness,
scalar-model parity for both stages, partition invariance, and rescore
recall vs exact brute force."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.pipeline.quantize import (
    quantize_params,
    quantize_vector,
    quantized_topk,
    scalar_quantize,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(11)
    rows = [(int(i), [float(x) for x in rng.randn(16).astype(np.float32)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist()
    df.count()
    return df, rows


def _model_codes(v, params):
    mn, sc, maxq = params["min"], params["scale"], (1 << params["bits"]) - 1
    nrm = 0.0
    for x in v:
        nrm += float(x) * float(x)
    nrm = math.sqrt(nrm)
    return [
        min(maxq, max(0, int(math.floor((float(x) / nrm - mn) / sc + 0.5)))) for x in v
    ]


def _model_topk(rows, params, q, k=10, rescore=4):
    """Independent scalar model of the two-stage search."""
    qc = quantize_vector(q, params)
    mn, sc = params["min"], params["scale"]

    def key(v):
        cs = _model_codes(v, params)
        idot = sum(a * b for a, b in zip(cs, qc))
        return sc * sc * float(idot) + mn * sc * float(sum(cs))

    cand = sorted(((key(v), i) for i, v in rows), key=lambda t: (-t[0], t[1]))[: rescore * k]
    qn = math.sqrt(sum(float(x) * float(x) for x in q))
    out = []
    by_id = dict(rows)
    for _, i in cand:
        v = by_id[i]
        dot = 0.0
        na = 0.0
        for a, b in zip(v, q):
            dot += float(a) * float(b)
            na += float(a) * float(a)
        s = math.floor(dot / (math.sqrt(na) * qn) * 10000) / 10000
        out.append((i, s))
    out.sort(key=lambda t: (-t[1], t[0]))
    return [(i, s, r + 1) for r, (i, s) in enumerate(out[:k])]


def test_codes_bounded_and_accurate(vecs):
    df, rows = vecs
    qdf, params = scalar_quantize(df)
    got = {r["vec_id"]: r["codes"] for r in qdf.select("vec_id", "codes").collect()}
    maxq = (1 << params["bits"]) - 1
    for i, v in rows[:50]:
        cs = got[i]
        assert all(0 <= c <= maxq for c in cs)
        # dequantization error vs the NORMALIZED component bounded by a half-step
        nrm = math.sqrt(sum(float(x) * float(x) for x in v))
        for c, x in zip(cs, v):
            deq = params["min"] + c * params["scale"]
            assert abs(deq - float(x) / nrm) <= params["scale"] / 2 + 1e-9
        assert cs == quantize_vector(v, params)  # driver twin agrees


def test_quantized_topk_matches_scalar_model(vecs):
    df, rows = vecs
    params = quantize_params(df)
    q = rows[0][1]
    got = [
        (r["vec_id"], r["score"], r["rank"])
        for r in quantized_topk(df.filter("vec_id != 0"), q, params, k=10).collect()
    ]
    exp = _model_topk([r for r in rows if r[0] != 0], params, q, k=10)
    assert [(i, r) for i, _, r in got] == [(i, r) for i, _, r in exp]
    for (gi, gs, _), (ei, es, _) in zip(got, exp):
        assert gi == ei and abs(gs - es) < 1e-9


def test_partition_invariance(vecs):
    df, rows = vecs
    params = quantize_params(df)
    q = rows[3][1]
    a = quantized_topk(df.repartition(1), q, params, k=8).collect()
    b = quantized_topk(df.repartition(13), q, params, k=8).collect()
    assert [(r["vec_id"], r["score"], r["rank"]) for r in a] == [
        (r["vec_id"], r["score"], r["rank"]) for r in b
    ]


def test_rescore_recall_vs_exact(vecs):
    df, rows = vecs
    params = quantize_params(df)
    q = rows[0][1]
    got = {r["vec_id"] for r in quantized_topk(df.filter("vec_id != 0"), q, params, k=10).collect()}
    qn = np.sqrt(sum(float(x) ** 2 for x in q))
    exact = sorted(
        (
            (-(np.dot(np.array(v, dtype=np.float64), np.array(q, dtype=np.float64)) / (np.linalg.norm(np.array(v, dtype=np.float64)) * qn)), i)
            for i, v in rows
            if i != 0
        )
    )[:10]
    exact_ids = {i for _, i in exact}
    # int8 + 4x oversample keeps ranking quality: near-total overlap with exact
    assert len(got & exact_ids) >= 8


def test_precomputed_codes_column_used(vecs):
    df, rows = vecs
    qdf, params = scalar_quantize(df)
    q = rows[5][1]
    with_codes = quantized_topk(qdf.filter("vec_id != 5"), q, params, k=5).collect()
    on_the_fly = quantized_topk(df.filter("vec_id != 5"), q, params, k=5).collect()
    assert [tuple(r) for r in with_codes] == [tuple(r) for r in on_the_fly]


def test_ivf_quantized_composition(spark, vecs, tmp_path):
    """IVF probe pruning x quantized candidates: identical to quantized_topk
    restricted to the probed lists, and the persisted form prunes partitions
    (PartitionFilters on _list in the scan)."""
    from lucene_kmp_spark.pipeline.quantize import ivf_quantized_topk
    from lucene_kmp_spark.pipeline.similarity import ivf_write_assigned, nearest_lists

    df, rows = vecs
    params = quantize_params(df)
    centroids = [rows[i][1] for i in (1, 2, 3, 4)]
    q = rows[0][1]
    got = ivf_quantized_topk(df, q, centroids, params, k=5, n_probe=2).collect()
    # reference: same probe filter spelled out, then plain quantized_topk
    from lucene_kmp_spark.pipeline.similarity import ivf_assign_col

    lists = nearest_lists(q, centroids, 2)
    manual = quantized_topk(
        df.withColumn("_list", ivf_assign_col("embedding", centroids)).filter(
            F.col("_list").isin(lists)
        ),
        q,
        params,
        k=5,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in manual]

    # write-time form: codes + _list persisted, partition pruning visible
    qdf, _ = scalar_quantize(df, params=params)
    path = str(tmp_path / "ivf_codes")
    ivf_write_assigned(qdf, centroids, path)
    stored = spark.read.parquet(path)
    res = ivf_quantized_topk(stored, q, centroids, params, k=5, n_probe=2)
    assert [tuple(r) for r in res.collect()] == [tuple(r) for r in got]
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "_list" in plan.split("PartitionFilters")[1][:200]


def test_ann_auto_gate(spark, tmp_path, vecs):
    """ann_auto_topk picks the float scan for memory-resident tables (plan
    must not touch the codes column) and the quantized tier past the budget
    (plan must not fold the float vectors in stage 1)."""
    from lucene_kmp_spark.pipeline.quantize import ann_auto_topk

    df, rows = vecs
    path = str(tmp_path / "emb_auto")
    qp = quantize_params(df)
    coded, _ = scalar_quantize(df, params=qp)
    coded.write.parquet(path)
    on_disk = spark.read.parquet(path)
    q = rows[0][1]

    out_f, chosen_f = ann_auto_topk(on_disk, q, k=5, params=qp)
    assert chosen_f == "float"
    plan_f = out_f._jdf.queryExecution().executedPlan().toString()
    assert "codes" not in plan_f  # float path never reads the codes column

    out_q, chosen_q = ann_auto_topk(on_disk, q, k=5, params=qp, memory_budget=1)
    assert chosen_q == "quantized"
    # stage-1 of the quantized path reads codes, not the float embeddings
    stage1 = out_q._jdf.queryExecution().executedPlan().toString()
    assert "codes" in stage1

    # in-memory (non-file-backed) input: size unknown -> conservative
    # quantized choice
    mem_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    _, chosen_m = ann_auto_topk(mem_df, q, k=5, params=qp)
    assert chosen_m == "quantized"

    # both paths agree on the result ids at this scale
    ids_f = [r["vec_id"] for r in out_f.collect()]
    ids_q = [r["vec_id"] for r in out_q.collect()]
    assert ids_f == ids_q


def test_memory_budget_unitless_executor_memory_is_mib():
    """ADVICE r4: Spark parses a unitless spark.executor.memory as MiB —
    '4096' must mean 4 GiB/executor, not 4 KB."""
    from lucene_kmp_spark.pipeline.quantize import _memory_budget_bytes

    class _Conf:
        def __init__(self, vals):
            self.vals = vals

        def get(self, k, default=None):
            return self.vals.get(k, default)

    class _Spark:
        def __init__(self, vals):
            self.conf = _Conf(vals)

    def budget(mem):
        return _memory_budget_bytes(_Spark({
            "spark.master": "yarn",
            "spark.executor.memory": mem,
            "spark.executor.instances": "2",
        }))

    assert budget("4096") == 2 * (4096 << 20)   # unitless => MiB
    assert budget("4g") == 2 * (4 << 30)
    assert budget("512m") == 2 * (512 << 20)
    assert budget("512mb") == 2 * (512 << 20)   # two-letter suffix
    assert budget("1t") == 2 * (1 << 40)


def test_memory_budget_fallbacks():
    """Non-local master without usable executor conf falls to the 8 GiB
    default; garbage values must not raise."""
    from lucene_kmp_spark.pipeline.quantize import _memory_budget_bytes

    class _Conf:
        def __init__(self, vals):
            self.vals = vals

        def get(self, k, default=None):
            return self.vals.get(k, default)

    class _Spark:
        def __init__(self, vals):
            self.conf = _Conf(vals)

    base = {"spark.master": "yarn"}
    assert _memory_budget_bytes(_Spark(base)) == 8 << 30  # no conf at all
    assert _memory_budget_bytes(_Spark(base | {
        "spark.executor.memory": "4g", "spark.executor.instances": "0",
    })) == 8 << 30  # zero instances
    assert _memory_budget_bytes(_Spark(base | {
        "spark.executor.memory": "lots", "spark.executor.instances": "2",
    })) == 8 << 30  # unparsable -> default, no raise
