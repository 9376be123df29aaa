"""SemDeDup (pipeline/similarity.semdedup) vs an independent scalar model:
same centroid assignment, same visit order, same quantized duplicate test."""

import math


import pytest

from lucene_kmp_spark.pipeline.similarity import semdedup, semdedup_keep

CENTROIDS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
THRESHOLD = 0.95

# two clusters; within cluster 0 vectors 0/1 are near-identical (dup pair),
# 2 is distinct; within cluster 1 vectors 10/11/12 are all near-identical
VECS = [
    (0, [1.0, 0.05, 0.0]),
    (1, [1.0, 0.051, 0.001]),
    (2, [1.0, 0.9, 0.0]),
    (10, [0.02, 1.0, 0.0]),
    (11, [0.021, 1.0, 0.0]),
    (12, [0.02, 1.0, 0.002]),
    (13, [0.9, 1.0, 0.9]),
]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def _model():
    thr_q = math.floor(THRESHOLD * 10000)
    assign = {}
    for i, v in VECS:
        best = max(
            ((_cos(v, c), idx) for idx, c in enumerate(CENTROIDS)),
            key=lambda t: (t[0], t[1]),
        )
        assign[i] = (best[1], math.floor(best[0] * 10000000))
    out = {}
    for lst in {l for l, _q in assign.values()}:
        members = sorted(
            (i for i, (l, _q) in assign.items() if l == lst),
            key=lambda i: (assign[i][1], i),
        )
        vecs = {i: dict(VECS)[i] for i in members}
        for pos, i in enumerate(members):
            if pos == 0:
                out[i] = (lst, False)
                continue
            m = max(_cos(vecs[i], vecs[j]) for j in members[:pos])
            out[i] = (lst, math.floor(m * 10000) >= thr_q)
    return out


def test_semdedup_matches_scalar_model(spark):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS], "vec_id long, embedding array<float>"
    )
    got = {
        r["vec_id"]: (r["list"], r["is_dup"])
        for r in semdedup(df, CENTROIDS, THRESHOLD).collect()
    }
    want = _model()
    assert got == want
    # sanity on the fixture itself: each cluster keeps at least one of the
    # near-identical group and drops the rest
    dups = {i for i, (_l, d) in want.items() if d}
    assert dups and dups < {i for i, _v in VECS}


def test_semdedup_keep_filters_duplicates(spark):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS], "vec_id long, embedding array<float>"
    )
    kept = {r["vec_id"] for r in semdedup_keep(df, CENTROIDS, THRESHOLD).collect()}
    want = {i for i, (_l, d) in _model().items() if not d}
    assert kept == want


def test_semdedup_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS], "vec_id long, embedding array<float>"
    )
    a = sorted(map(tuple, semdedup(df, CENTROIDS, THRESHOLD).collect()))
    b = sorted(map(tuple, semdedup(df.repartition(7), CENTROIDS, THRESHOLD).collect()))
    assert a == b


def test_semdedup_float32_input_and_singletons(spark):
    # a singleton cluster is never a duplicate
    df = spark.createDataFrame(
        [(100, [0.5, 0.5, 0.0])], "vec_id long, embedding array<float>"
    )
    rows = semdedup(df, CENTROIDS, THRESHOLD).collect()
    assert len(rows) == 1 and rows[0]["is_dup"] is False
