"""Range-field relation queries (document/IntRange.kt, FloatRange.kt +
IntRangeSlowRangeQuery.kt / BinaryRangeFieldRangeQuery.kt).

Each doc stores an interval [rng_lo, rng_hi]; RangeFieldQuery relates the
query interval by INTERSECTS / WITHIN / CONTAINS / CROSSES
(RangeFieldQuery.QueryType). Verified against a brute-force Python oracle
over the collected intervals, plus the FILTER-clause composition and the
plan-level expectation that the predicate reaches the docs scan.
"""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, RangeFieldQuery, TermQuery


@pytest.fixture(scope="module")
def env(spark):
    base = synth_transcripts(spark, n_convs=40, seed=11)
    docs = (
        assign_doc_ids(base)
        .withColumn("rng_lo", F.pmod(F.col("doc_id") * 7, F.lit(200)).cast("double"))
        .withColumn("rng_hi", (F.col("rng_lo") + F.pmod(F.col("doc_id"), F.lit(260))).cast("double"))
        .persist()
    )
    docs.count()
    idx = build_index(docs)
    rows = {r["doc_id"]: (r["rng_lo"], r["rng_hi"]) for r in docs.select("doc_id", "rng_lo", "rng_hi").collect()}
    return IndexSearcher(idx), rows


LO, UP = 120.0, 210.0


def _oracle(rows, relation, lo=LO, up=UP):
    out = set()
    for d, (dmin, dmax) in rows.items():
        inter = dmin <= up and dmax >= lo
        within = dmin >= lo and dmax <= up
        contains = dmin <= lo and dmax >= up
        ok = {
            "intersects": inter,
            "within": within,
            "contains": contains,
            "crosses": inter and not within and not contains,
        }[relation]
        if ok:
            out.add(d)
    return out


@pytest.mark.parametrize("relation", ["intersects", "within", "contains", "crosses"])
def test_relations_match_oracle(env, relation):
    s, rows = env
    q = RangeFieldQuery("rng_lo", "rng_hi", LO, UP, relation=relation)
    got = {r["doc_id"] for r in s._doc_set(q).collect()}
    exp = _oracle(rows, relation)
    assert got == exp and exp, relation  # each relation must be non-trivial here


def test_crosses_is_intersects_minus_within_contains(env):
    s, rows = env
    sets = {
        rel: {r["doc_id"] for r in s._doc_set(RangeFieldQuery("rng_lo", "rng_hi", LO, UP, relation=rel)).collect()}
        for rel in ("intersects", "within", "contains", "crosses")
    }
    assert sets["crosses"] == sets["intersects"] - sets["within"] - sets["contains"]
    assert sets["within"] <= sets["intersects"] and sets["contains"] <= sets["intersects"]


def test_constant_score_and_boolean_filter(env):
    s, rows = env
    q = RangeFieldQuery("rng_lo", "rng_hi", LO, UP, relation="within", boost=2.5)
    scored = s.execute(q)
    assert {r["score"] for r in scored.collect()} == {2.5}
    # FILTER clause composition: BM25 scores unchanged, docset restricted
    bq = BooleanQuery.build(must=(TermQuery("the"),), filter=(q,))
    got = {r["doc_id"] for r in s.execute(bq).collect()}
    base = {r["doc_id"] for r in s.execute(TermQuery("the")).collect()}
    assert got == base & _oracle(rows, "within")


def test_multi_dim_joint_crosses(env, spark):
    # 2-D: second dim = same interval shifted; joint crosses must differ from
    # the per-dim AND of crosses (the whole-range BKD test, not per-dim)
    s, rows = env
    q2 = RangeFieldQuery(
        lower=(LO, LO),
        upper=(UP, UP),
        relation="crosses",
        dims=(("rng_lo", "rng_hi"), ("rng_lo", "rng_hi")),
    )
    got = {r["doc_id"] for r in s._doc_set(q2).collect()}
    assert got == _oracle(rows, "crosses")  # identical dims degenerate to 1-D


def test_nulls_never_match(spark):
    base = synth_transcripts(spark, n_convs=6, seed=3)
    docs = assign_doc_ids(base).withColumn(
        "rng_lo",
        F.when(F.pmod(F.col("doc_id"), F.lit(2)) == 0, F.length("text").cast("double")),
    ).withColumn("rng_hi", F.col("rng_lo") + 50.0)
    idx = build_index(docs)
    s = IndexSearcher(idx)
    got = [
        r["doc_id"]
        for r in s._doc_set(RangeFieldQuery("rng_lo", "rng_hi", 0.0, 1e9, relation="intersects")).collect()
    ]
    assert got and all(d % 2 == 0 for d in got)


def test_bad_relation_rejected():
    with pytest.raises(ValueError):
        RangeFieldQuery("a", "b", 0, 1, relation="overlaps")
    with pytest.raises(ValueError):
        RangeFieldQuery(lower=0, upper=1)
