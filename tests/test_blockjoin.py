"""Parent-child joined search (Lucene join module semantics:
ToParentBlockJoinQuery / ToChildBlockJoinQuery / ScoreMode) vs the naive
per-doc oracle aggregated in Python."""

import numpy as np
import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.blockjoin import (
    to_child_docset,
    to_parent_scores,
    to_parent_topk,
)
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import BooleanQuery, TermQuery


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=23)).persist()
    docs.count()
    idx = build_index(docs)
    rows = docs.select("doc_id", "conv_id", "text").collect()
    naive = NaiveIndex([(r["doc_id"], r["text"]) for r in rows])
    parent_of = {r["doc_id"]: r["conv_id"] for r in rows}
    return IndexSearcher(idx), naive, parent_of


def _expected_parents(naive, parent_of, q, mode):
    per_doc = naive.scores(q)
    groups: dict[str, list[float]] = {}
    for d, s in per_doc.items():
        groups.setdefault(parent_of[d], []).append(s)
    agg = {
        "avg": lambda v: sum(v) / len(v),
        "max": max,
        "min": min,
        "total": sum,
        "none": lambda v: 0.0,
    }[mode]
    return {p: agg(v) for p, v in groups.items()}


@pytest.mark.parametrize("mode", ["none", "avg", "max", "min", "total"])
def test_to_parent_scores_modes(env, mode):
    s, naive, parent_of = env
    q = TermQuery("hope")
    got = {
        r["conv_id"]: r["score"]
        for r in to_parent_scores(s, q, "conv_id", score_mode=mode).collect()
    }
    exp = _expected_parents(naive, parent_of, q, mode)
    assert set(got) == set(exp)
    for p in got:
        assert abs(got[p] - exp[p]) < 1e-6, (mode, p)


def test_to_parent_topk_order(env):
    s, naive, parent_of = env
    q = BooleanQuery.build(should=(TermQuery("hope"), TermQuery("light")))
    rows = to_parent_topk(s, q, "conv_id", k=5, score_mode="total").collect()
    exp = sorted(
        _expected_parents(naive, parent_of, q, "total").items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [r["conv_id"] for r in rows] == [p for p, _ in exp]
    for r, (_, es) in zip(rows, exp):
        assert np.isclose(r["score"], es)


def test_child_filter_restricts_contributors(env):
    s, naive, parent_of = env
    q = TermQuery("hope")
    flt = TermQuery("light")
    got = {
        r["conv_id"]: r["score"]
        for r in to_parent_scores(s, q, "conv_id", "max", child_filter=flt).collect()
    }
    hope, light = naive.scores(q), set(naive.scores(flt))
    exp: dict[str, float] = {}
    for d, sc in hope.items():
        if d in light:
            p = parent_of[d]
            exp[p] = max(exp.get(p, 0.0), sc)
    assert set(got) == set(exp)
    for p in got:
        assert abs(got[p] - exp[p]) < 1e-6


def test_to_child_docset_from_child_query(env):
    s, naive, parent_of = env
    q = TermQuery("hope")
    got = {r["doc_id"] for r in to_child_docset(s, child_query=q, parent_col="conv_id").collect()}
    hit_parents = {parent_of[d] for d in naive.scores(q)}
    exp = {d for d, p in parent_of.items() if p in hit_parents}
    assert got == exp


def test_to_child_docset_from_parent_keys(env, spark):
    s, naive, parent_of = env
    some = sorted(set(parent_of.values()))[:3]
    keys = spark.createDataFrame([(p,) for p in some], "conv_id string")
    got = {r["doc_id"] for r in to_child_docset(s, parent_keys=keys, parent_col="conv_id").collect()}
    exp = {d for d, p in parent_of.items() if p in some}
    assert got == exp


def test_arg_validation(env):
    s, _, _ = env
    with pytest.raises(ValueError):
        to_parent_scores(s, TermQuery("hope"), "conv_id", score_mode="sum")
    with pytest.raises(ValueError):
        to_child_docset(s, parent_col="conv_id")
