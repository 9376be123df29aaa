"""MoreLikeThis parity vs a hand-rolled selection oracle + NaiveIndex scoring.

Upstream surface: Lucene queries/mlt/MoreLikeThis (not ported by the
reference repo; implemented from the published semantics — see
lucene_kmp_spark/search/mlt.py docstring).
"""

import math
from collections import Counter

import numpy as np
import pytest

from lucene_kmp_spark.analysis.standard import analyze
from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.mlt import MoreLikeThis
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import BooleanQuery, MatchNoDocsQuery


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=60, seed=23)).persist()
    docs.count()
    idx = build_index(docs)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    return IndexSearcher(idx), NaiveIndex(rows), rows


def _select_oracle(rows, src_terms: Counter, *, min_tf=2, min_df=5, max_df=None,
                   max_terms=25, min_len=0, max_len=0, stop=frozenset()):
    """Pure-python re-derivation of MoreLikeThis.createQueue."""
    df = Counter()
    for _, text in rows:
        df.update(set(analyze(text)[0]))
    n_docs = sum(1 for _, text in rows if analyze(text)[0])
    out = []
    for t, tf in src_terms.items():
        if tf < min_tf or t in stop:
            continue
        if min_len and len(t) < min_len:
            continue
        if max_len and len(t) > max_len:
            continue
        d = df.get(t, 0)
        if d < min_df or (max_df is not None and d > max_df):
            continue
        out.append((t, tf * (1.0 + math.log((n_docs + 1.0) / (d + 1.0)))))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out[:max_terms]


def test_like_doc_selection_and_ranking(env):
    s, naive, rows = env
    src_id, src_text = rows[3]
    mlt = MoreLikeThis(s)
    got = mlt.interesting_terms(mlt.doc_term_freqs(src_id))
    exp = _select_oracle(rows, Counter(analyze(src_text)[0]))
    assert [t for t, _ in got] == [t for t, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert a == pytest.approx(b, rel=1e-12)

    # query runs through the engine and ranks identically to the naive BM25
    # oracle scoring the same SHOULD disjunction
    q = mlt.like(src_id)
    assert isinstance(q, BooleanQuery)
    got_rank = [(r["doc_id"], r["score"]) for r in s.top_k(q, 10).collect()]
    exp_rank = naive.top_k(q, k=10)
    assert [d for d, _ in got_rank] == [d for d, _ in exp_rank]
    for (_, s1), (_, s2) in zip(got_rank, exp_rank):
        assert np.float32(s1) == np.float32(s2)


def test_like_text_matches_like_doc(env):
    s, _, rows = env
    src_id, src_text = rows[7]
    mlt = MoreLikeThis(s)
    q_doc = mlt.like(src_id)
    q_text = mlt.like_text(src_text)
    assert q_doc == q_text


def test_boost_normalizes_by_best(env):
    s, _, rows = env
    src_id, _ = rows[3]
    mlt = MoreLikeThis(s, boost=True)
    sel = mlt.interesting_terms(mlt.doc_term_freqs(src_id))
    assert sel, "fixture doc must select terms"
    q = mlt.like(src_id)
    best = sel[0][1]
    by_term = {c.query.term: c.query.boost for c in q.clauses}
    for t, sc in sel:
        assert by_term[t] == pytest.approx(sc / best, rel=1e-12)
    assert max(by_term.values()) == pytest.approx(1.0)


def test_filters_and_empty(env):
    s, _, rows = env
    src_id, src_text = rows[5]
    # word-length bounds + stopwords drop terms
    terms = Counter(analyze(src_text)[0])
    stop = frozenset(list(terms)[:2])
    mlt = MoreLikeThis(s, min_word_len=4, max_word_len=8, stop_words=stop)
    sel = mlt.interesting_terms(mlt.doc_term_freqs(src_id))
    for t, _ in sel:
        assert 4 <= len(t) <= 8 and t not in stop
    exp = _select_oracle(rows, terms, min_len=4, max_len=8, stop=stop)
    assert [t for t, _ in sel] == [t for t, _ in exp]
    # impossible thresholds -> MatchNoDocs
    none = MoreLikeThis(s, min_term_freq=10_000)
    assert isinstance(none.like(src_id), MatchNoDocsQuery)


def test_term_vector_fast_path(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=9)).persist()
    docs.count()
    idx = build_index(docs, term_vectors=True)
    s = IndexSearcher(idx)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    src_id, src_text = rows[2]
    mlt = MoreLikeThis(s)
    tv_tf = mlt.doc_term_freqs(src_id)
    assert tv_tf == Counter(analyze(src_text)[0])
