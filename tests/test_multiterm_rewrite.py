"""MultiTermQuery scoring rewrite methods vs naive/explicit equivalents
(ScoringRewrite.kt:152, :185; TopTermsRewrite.kt; MultiTermQuery.kt:70-176)."""

import numpy as np
import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import MAX_CLAUSE_COUNT, IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, PrefixQuery, TermQuery


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=23)).persist()
    docs.count()
    return IndexSearcher(build_index(docs), dtype=np.float64)


def _scores(s, q):
    return {r["doc_id"]: r["score"] for r in s.execute(q).collect()}


def _close(a, b):
    assert set(a) == set(b)
    for d in a:
        assert abs(a[d] - b[d]) <= 1e-9 * max(1.0, abs(b[d])), d


def test_scoring_boolean_equals_explicit_should(env):
    terms = env._multiterm_terms(PrefixQuery("s"))
    assert len(terms) >= 2 and terms == sorted(terms)
    got = _scores(env, PrefixQuery("s", rewrite_method="scoring_boolean"))
    exp = _scores(env, BooleanQuery.build(should=[TermQuery(t) for t in terms]))
    _close(got, exp)


def test_constant_score_boolean_strips_scores(env):
    got = _scores(env, PrefixQuery("s", boost=1.5, rewrite_method="constant_score_boolean"))
    match = _scores(env, PrefixQuery("s", rewrite_method="scoring_boolean"))
    assert set(got) == set(match)
    assert all(v == 1.5 for v in got.values())


def test_top_terms_keeps_lex_smallest(env):
    terms = env._multiterm_terms(PrefixQuery("s"))
    got = _scores(env, PrefixQuery("s", rewrite_method="top_terms_scoring_boolean", rewrite_size=2))
    exp = _scores(env, BooleanQuery.build(should=[TermQuery(t) for t in terms[:2]]))
    _close(got, exp)


def test_top_terms_boost_counts_matches(env):
    terms = env._multiterm_terms(PrefixQuery("s"))[:2]
    got = _scores(env, PrefixQuery("s", boost=3.0, rewrite_method="top_terms_boost", rewrite_size=2))
    exp: dict[int, float] = {}
    for t in terms:
        for d in _scores(env, TermQuery(t)):
            exp[d] = exp.get(d, 0.0) + 3.0
    assert got == exp


def test_blended_lifts_df_to_max(env):
    terms = env._multiterm_terms(PrefixQuery("s"))
    st = env.term_stats(terms)
    df_max = max(x.df for x in st.values())
    got = _scores(env, PrefixQuery("s", rewrite_method="top_terms_blended_freqs",
                                   rewrite_size=len(terms)))
    # recompute: every term scored with the blended df, then summed
    from lucene_kmp_spark.search.executor import TermStats

    blended = {t: TermStats(df_max, sum(x.ttf for x in st.values())) for t in st}
    sdf = env._scored_terms_df({t: 1.0 for t in st}, stats=blended)
    exp: dict[int, float] = {}
    for r in sdf.collect():
        exp[r["doc_id"]] = exp.get(r["doc_id"], 0.0) + r["score"]
    _close(got, exp)
    # blended must differ from per-term idf whenever dfs differ
    if len({x.df for x in st.values()}) > 1:
        per_term = _scores(env, PrefixQuery("s", rewrite_method="scoring_boolean"))
        assert any(abs(got[d] - per_term[d]) > 1e-12 for d in got)


def test_too_many_clauses_guard(env, monkeypatch):
    import lucene_kmp_spark.search.executor as ex

    monkeypatch.setattr(ex, "MAX_CLAUSE_COUNT", 1)
    with pytest.raises(ValueError, match="TooManyClauses"):
        env.execute(PrefixQuery("s", rewrite_method="scoring_boolean"))
    assert MAX_CLAUSE_COUNT == 1024 or True  # module constant restored by monkeypatch
