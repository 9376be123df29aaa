"""Randomized query-tree equivalence — the reference's randomized-testing
style (RandomIndexWriter/TestBoolean2, SURVEY.md §5.5): seed-generated random
boolean/phrase/term trees must produce identical hit sets and float32-equal
scores in the distributed engine and the naive oracle."""

import random

import numpy as np
import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    SynonymQuery,
    TermQuery,
)

TERMS = [
    "the", "of", "and", "hope", "faith", "light", "kingdom", "gospel",
    "spark", "index", "merge", "w0001", "w0042", "zzznope",
]


def _random_query(rng: random.Random, depth: int = 0):
    kind = rng.choice(
        ["term", "term", "bool", "bool", "phrase", "synonym", "dismax"]
        if depth < 2
        else ["term", "phrase"]
    )
    if kind == "term":
        boost = rng.choice([1.0, 1.0, 2.0, 0.5])
        return TermQuery(rng.choice(TERMS), boost=boost)
    if kind == "phrase":
        n = rng.randint(2, 3)
        return PhraseQuery(tuple(rng.choice(TERMS[:8]) for _ in range(n)), slop=rng.choice([0, 0, 2]))
    if kind == "synonym":
        return SynonymQuery(tuple(rng.sample(TERMS[:10], rng.randint(2, 3))))
    if kind == "dismax":
        subs = tuple(_random_query(rng, depth + 1) for _ in range(rng.randint(2, 3)))
        return DisjunctionMaxQuery(subs, tie_breaker=rng.choice([0.0, 0.3]))
    n_must = rng.randint(0, 2)
    n_should = rng.randint(0 if n_must else 1, 2)
    n_not = rng.randint(0, 1)
    msm = rng.choice([0, 0, 1]) if n_should >= 1 else 0
    return BooleanQuery.build(
        must=tuple(_random_query(rng, depth + 1) for _ in range(n_must)),
        should=tuple(_random_query(rng, depth + 1) for _ in range(n_should)),
        must_not=tuple(TermQuery(rng.choice(TERMS)) for _ in range(n_not)),
        minimum_should_match=msm,
    )


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=77)).persist()
    docs.count()
    idx = build_index(docs)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    return IndexSearcher(idx), NaiveIndex(rows)


def _naive_scores(naive, q):
    if isinstance(q, DisjunctionMaxQuery):
        subs = [_naive_scores(naive, s) for s in q.queries]
        out = {}
        for d in set().union(*(m.keys() for m in subs)) if subs else set():
            vals = [m[d] for m in subs if d in m]
            out[d] = max(vals) + q.tie_breaker * (sum(vals) - max(vals))
        return out
    return naive.scores(q)


@pytest.mark.parametrize("seed", range(18))
def test_random_tree_equivalence(env, seed):
    s, naive = env
    rng = random.Random(1000 + seed)
    q = _random_query(rng)
    got = {r["doc_id"]: r["score"] for r in s.execute(q).collect()}
    exp = _naive_scores(naive, q)
    assert set(got) == set(exp), q
    for d in got:
        # double accumulation association may differ across clause nesting
        assert abs(got[d] - exp[d]) <= 3e-6 * max(1.0, abs(exp[d])), (q, d)
