"""Matches API (search/Matches.kt / MatchesIterator.kt / NamedMatches.kt):
match intervals per doc vs a brute-force Python oracle over the analyzed
text — positions always, offsets when the index stores them, -1 otherwise;
prohibited clauses report nothing; only docs matching the WHOLE query
appear; intervals ordered by (doc, start, end)."""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.analysis.standard import analyze_offsets
from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)


@pytest.fixture(scope="module")
def env(spark):
    base = synth_transcripts(spark, n_convs=25, seed=19)
    docs = assign_doc_ids(base).persist()
    docs.count()
    idx_pos = build_index(docs)
    idx_off = build_index(docs, index_options="offsets")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    return IndexSearcher(idx_pos), IndexSearcher(idx_off), texts


def _tokens(text):
    """(term, position, start_offset, end_offset) via the engine's analyzer."""
    terms, positions, starts, ends, _length = analyze_offsets(text)
    return list(zip(terms, positions, starts, ends))


def _oracle_term(texts, term, doc_filter=None):
    out = []
    for d, text in texts.items():
        if doc_filter is not None and d not in doc_filter:
            continue
        for tok in _tokens(text):
            if tok[0] == term:
                out.append((d, term, tok[1], tok[1], tok[2], tok[3]))
    return sorted(out)


def test_term_matches_with_offsets(env):
    s_pos, s_off, texts = env
    got = [tuple(r) for r in s_off.matches(TermQuery("kingdom")).collect()]
    exp = _oracle_term(texts, "kingdom")
    assert got == exp and exp


def test_positions_only_offsets_are_minus_one(env):
    s_pos, s_off, texts = env
    got = [tuple(r) for r in s_pos.matches(TermQuery("kingdom")).collect()]
    exp = [(d, q, sp, ep, -1, -1) for d, q, sp, ep, _so, _eo in _oracle_term(texts, "kingdom")]
    assert got == exp


def test_boolean_must_not_and_whole_query_restriction(env):
    s_pos, _s_off, texts = env
    q = BooleanQuery.build(must=(TermQuery("kingdom"),), must_not=(TermQuery("light"),))
    got = [tuple(r) for r in s_pos.matches(q).collect()]
    matching_docs = {
        d for d, t in texts.items()
        if any(x[0] == "kingdom" for x in _tokens(t)) and all(x[0] != "light" for x in _tokens(t))
    }
    exp = [
        (d, q2, sp, ep, -1, -1)
        for d, q2, sp, ep, _so, _eo in _oracle_term(texts, "kingdom", matching_docs)
    ]
    assert got == exp
    # prohibited term never appears as a match label
    assert all(r[1] == "kingdom" for r in got)


def test_phrase_intervals(env):
    s_pos, s_off, texts = env
    # find a bigram that actually occurs
    big = None
    for d, t in texts.items():
        toks = [x[0] for x in _tokens(t)]
        if len(toks) >= 2:
            big = (toks[0], toks[1])
            break
    q = PhraseQuery(big)
    got = [tuple(r) for r in s_off.matches(q).collect()]
    label = " ".join(big)
    exp = []
    for d, t in texts.items():
        toks = _tokens(t)
        for i in range(len(toks) - 1):
            if toks[i][0] == big[0] and toks[i + 1][0] == big[1]:
                exp.append((d, label, toks[i][1], toks[i + 1][1], toks[i][2], toks[i + 1][3]))
    assert got == sorted(exp) and exp
    # intervals span two positions
    assert all(r[3] == r[2] + 1 for r in got)


def test_multiterm_and_fuzzy_leaves(env):
    s_pos, _s_off, texts = env
    got = {r["query"] for r in s_pos.matches(PrefixQuery("king")).collect()}
    assert "kingdom" in got and all(t.startswith("king") for t in got)
    fz = {r["query"] for r in s_pos.matches(FuzzyQuery("kingdom", max_edits=1)).collect()}
    assert "kingdom" in fz


def test_named_matches_relabel(env):
    s_pos, _s_off, _texts = env
    got = {r["query"] for r in s_pos.matches(TermQuery("kingdom"), name="my_clause").collect()}
    assert got == {"my_clause"}


def test_sloppy_phrase_rejected(env):
    s_pos, _s_off, _texts = env
    with pytest.raises(ValueError):
        s_pos.matches(PhraseQuery(("a", "b"), slop=2))
