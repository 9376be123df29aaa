"""FunctionScoreQuery + top_passages + infix_suggest.

Upstream surfaces: Lucene queries/function/FunctionScoreQuery,
search/uhighlight (UnifiedHighlighter passage extraction), and
suggest/analyzing/AnalyzingInfixSuggester — none ported by the reference
repo; implemented from the published semantics (see the module docstrings).
"""

import math

import numpy as np
import pytest

from lucene_kmp_spark.index import build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.highlight import top_passages
from lucene_kmp_spark.search.query import FunctionScoreQuery, TermQuery
from lucene_kmp_spark.search.suggest import infix_suggest

DOCS = [
    (0, "alpha beta gamma alpha delta epsilon zeta eta theta iota", 100),
    (1, "beta beta alpha gamma gamma gamma kappa mu nu xi", 250),
    (2, "omicron pi rho sigma tau upsilon phi chi psi omega", 50),
    (3, "alpha alpha alpha beta omicron pi rho sigma tau upsilon", 175),
]


@pytest.fixture(scope="module")
def env(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string, n_chars long")
    idx = build_index(docs, text_col="text", index_options="offsets")
    return IndexSearcher(idx, dtype=np.float64), docs


def test_function_score_replaces_score(env):
    s, _ = env
    base = {r["doc_id"]: r["score"] for r in s.execute(TermQuery("alpha")).collect()}
    fs = FunctionScoreQuery(TermQuery("alpha"), "_score * (1.0 + n_chars / 1000.0)")
    got = {r["doc_id"]: r["score"] for r in s.execute(fs).collect()}
    assert set(got) == set(base)
    chars = {d: c for d, _, c in DOCS}
    for d, v in got.items():
        assert v == pytest.approx(base[d] * (1.0 + chars[d] / 1000.0), rel=1e-12)


def test_function_score_pure_field_expression(env):
    s, _ = env
    # score ignores the wrapped query's score entirely (the FunctionScoreQuery
    # contract: source IS the score) — matches still come from the query
    fs = FunctionScoreQuery(TermQuery("omicron"), "n_chars / 10.0", boost=2.0)
    got = {r["doc_id"]: r["score"] for r in s.execute(fs).collect()}
    assert got == {2: pytest.approx(10.0), 3: pytest.approx(35.0)}


def test_function_score_boost_by_value_topk(env):
    s, _ = env
    fs = FunctionScoreQuery.boost_by_value(TermQuery("alpha"), "n_chars")
    rows = s.top_k(fs, 3).collect()
    base = {r["doc_id"]: r["score"] for r in s.execute(TermQuery("alpha")).collect()}
    chars = {d: c for d, _, c in DOCS}
    want = sorted(base, key=lambda d: -base[d] * chars[d])
    assert [r["doc_id"] for r in rows] == want[:3]


def test_top_passages_scoring_and_snippet(env):
    s, _ = env
    # window=5 splits each 10-token doc into two passages
    rows = top_passages(s, ["alpha", "gamma"], n=10, window=5, per_doc=2).collect()
    n_docs = 4
    df_alpha, df_gamma = 3, 2
    idf = {
        "alpha": math.log(1.0 + (n_docs - df_alpha + 0.5) / (df_alpha + 0.5)),
        "gamma": math.log(1.0 + (n_docs - df_gamma + 0.5) / (df_gamma + 0.5)),
    }

    def score(tf_by_term):
        return sum(idf[t] * (f / (f + 1.0)) for t, f in tf_by_term.items())

    got = {(r["doc_id"], r["window_id"]): r["score"] for r in rows}
    # doc 0 window 0: alpha@0, gamma@2, alpha@3 -> tf alpha=2, gamma=1
    assert got[(0, 0)] == pytest.approx(score({"alpha": 2, "gamma": 1}), rel=1e-12)
    # doc 1 window 0: beta beta alpha gamma gamma -> alpha=1 gamma=2
    assert got[(1, 0)] == pytest.approx(score({"alpha": 1, "gamma": 2}), rel=1e-12)
    # doc 3 window 0: alpha alpha alpha beta omicron -> alpha=3
    assert got[(3, 0)] == pytest.approx(score({"alpha": 3}), rel=1e-12)
    # doc 2 has neither term
    assert not any(r["doc_id"] == 2 for r in rows)
    # snippet covers first..last occurrence in the window, from real offsets
    r00 = next(r for r in rows if (r["doc_id"], r["window_id"]) == (0, 0))
    assert r00["snippet"] == "alpha beta gamma alpha"
    # ordering is best-first
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_top_passages_per_doc_cut(env):
    s, _ = env
    rows = top_passages(s, ["gamma"], n=10, window=5, per_doc=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == 1 for v in by_doc.values())
    # doc 1's best gamma window is window 0 (tf=3 > tf... window 1 has none)
    assert by_doc[1][0]["window_id"] == 0


def test_top_passages_unknown_term(env):
    s, _ = env
    assert top_passages(s, ["nosuchterm"], n=5).count() == 0


def test_infix_suggest(spark):
    sugg = spark.createDataFrame(
        [
            ("spark sql engine", 10),
            ("spark streaming", 30),
            ("sql parser", 20),
            ("sparse matrix", 5),
        ],
        "suggestion string, weight long",
    )
    # final-token prefix match, weight-desc rank
    got = [r["suggestion"] for r in infix_suggest(sugg, "spar", k=10).collect()]
    assert got == ["spark streaming", "spark sql engine", "sparse matrix"]
    # earlier tokens must match exactly; last token is the prefix
    got = infix_suggest(sugg, "spark s", k=10, highlight=True).collect()
    assert [r["suggestion"] for r in got] == ["spark streaming", "spark sql engine"]
    assert got[0]["highlighted"] == "<b>spark</b> <b>streaming</b>"
    assert got[1]["highlighted"] == "<b>spark</b> <b>sql</b> engine"
    # k cut
    assert infix_suggest(sugg, "s", k=2).count() == 2


def test_boost_by_query(env):
    from lucene_kmp_spark.search.query import BoostByQueryScoreQuery

    s, _ = env
    base = {r["doc_id"]: r["score"] for r in s.execute(TermQuery("alpha")).collect()}
    q = BoostByQueryScoreQuery(TermQuery("alpha"), TermQuery("omicron"), 2.0)
    got = {r["doc_id"]: r["score"] for r in s.execute(q).collect()}
    assert set(got) == set(base)  # boost_match adds no matches
    # doc 3 contains both alpha and omicron -> x2; docs 0/1 unchanged
    assert got[3] == pytest.approx(base[3] * 2.0, rel=1e-12)
    assert got[0] == pytest.approx(base[0], rel=1e-12)
    assert got[1] == pytest.approx(base[1], rel=1e-12)


def test_range_facet_counts(env):
    from lucene_kmp_spark.search.grouping import range_facet_counts

    s, _ = env
    # alpha matches docs 0 (n_chars 100), 1 (250), 3 (175)
    rows = range_facet_counts(
        s,
        TermQuery("alpha"),
        "n_chars",
        [("lo", None, 150), ("mid", 150, 300), ("overlap", 100, 175), ("all", None, None)],
    ).collect()
    got = [(r["label"], r["count"]) for r in rows]
    assert got == [("lo", 1), ("mid", 2), ("overlap", 2), ("all", 3)]
