"""Lucene RegExp syntax engine (util/regexp.py vs RegExp.kt grammar)."""

import pytest

from lucene_kmp_spark.util.regexp import (
    ALL,
    CASE_INSENSITIVE,
    DEPRECATED_COMPLEMENT,
    INTERSECTION,
    NONE,
    compile_regexp,
)


def m(pat, s, **kw):
    return compile_regexp(pat, **kw).match(s)


CASES = [
    # core operators
    ("abc", "abc", True), ("abc", "ab", False), ("abc", "abcd", False),
    ("a|b", "a", True), ("a|b", "c", False),
    ("ab*", "abbb", True), ("ab+", "a", False), ("ab+", "abb", True),
    ("a?b", "b", True), ("a?b", "ab", True), ("a?b", "aab", False),
    ("a{2,3}", "a", False), ("a{2,3}", "aaa", True), ("a{2,3}", "aaaa", False),
    ("a{2}", "aa", True), ("a{2}", "aaa", False),
    ("a{2,}", "aaaa", True), ("a{2,}", "a", False),
    (".", "x", True), (".", "xy", False), (".*", "", True),
    # char classes (incl. negation = anychar ∩ complement, RegExp.kt:1062)
    ("[a-c]x", "bx", True), ("[a-c]x", "dx", False),
    ("[^a-c]x", "dx", True), ("[^a-c]x", "ax", False), ("[^a-c]x", "x", False),
    ("[ab-dz]", "c", True), ("[ab-dz]", "e", False),
    (r"\d+", "123", True), (r"\d+", "12a", False),
    (r"\w+", "ab_9", True), (r"\W", "!", True), (r"\W", "a", False),
    (r"\s", " ", True), (r"\S", " ", False),
    (r"[\d]+", "42", True), (r"[\da-f]+", "a1f", True),
    # quoted literal, groups, escapes
    ('"a.c"', "a.c", True), ('"a.c"', "abc", False),
    ("(ab)+", "abab", True), ("(ab)+", "aba", False),
    ("()", "", True),
    (r"a\.c", "a.c", True), (r"a\.c", "abc", False),
    # intersection (& — RegExp.kt INTERSECTION)
    ("[a-z]*&.*b.*", "abc", True), ("[a-z]*&.*b.*", "acd", False),
    ("a.c&..c", "abc", True), ("a.c&..d", "abc", False),
    # anystring / empty-language
    ("@", "whatever", True), ("@", "", True),
    ("#", "", False), ("#|a", "a", True),
    # numeric intervals <n-m> (Automata.makeDecimalInterval semantics:
    # variable width accepts leading zeros; fixed width is exact)
    ("<5-40>", "5", True), ("<5-40>", "40", True), ("<5-40>", "41", False),
    ("<5-40>", "05", True), ("<5-40>", "0039", True), ("<5-40>", "004", False),
    ("<10-10>", "10", True), ("<10-10>", "9", False),
    ("<01-10>", "01", True), ("<01-10>", "10", True),
    ("<01-10>", "00", False), ("<01-10>", "11", False),
    ("foo<1-100>", "foo99", True), ("foo<1-100>", "foo101", False),
    ("<100-200>", "150", True), ("<100-200>", "201", False), ("<100-200>", "99", False),
]


@pytest.mark.parametrize("pat,s,expected", CASES)
def test_match(pat, s, expected):
    assert m(pat, s) is expected, (pat, s)


def test_complement_gated_behind_deprecated_flag():
    # RegExp.kt:1359 — `~` is NOT part of ALL in Lucene 10
    flags = ALL | DEPRECATED_COMPLEMENT
    assert m("~(abc)", "abd", syntax_flags=flags)
    assert not m("~(abc)", "abc", syntax_flags=flags)
    assert m("~(abc)&[a-z]*", "zz", syntax_flags=flags)
    # without the flag, ~ is a literal char
    assert m("~x", "~x")
    assert not m("~x", "x")


def test_syntax_flags_gate_operators():
    # with NONE, & @ # < are literal characters
    assert m("a&b", "a&b", syntax_flags=NONE)
    assert m("@", "@", syntax_flags=NONE)
    assert not m("@", "anything", syntax_flags=NONE)
    # INTERSECTION alone enables & but not @
    assert m("[ab]&a", "a", syntax_flags=INTERSECTION)


def test_case_insensitive_match_flag():
    assert m("AbC", "aBc", match_flags=CASE_INSENSITIVE)
    assert not m("AbC", "aBd", match_flags=CASE_INSENSITIVE)
    # ranges stay cased (only single chars fold — RegExp.kt parseCharClasses)
    assert m("[A-C]x", "bx", match_flags=CASE_INSENSITIVE) is False
    assert m("[A-C]x", "Bx", match_flags=CASE_INSENSITIVE)
    assert m("x[b]y", "xBy", match_flags=CASE_INSENSITIVE)  # singles fold


def test_parse_errors():
    for bad in ("a{", "a{2", "a{3,2}", "[abc", '"unterminated', "(a", "<5->", "<->", "a)"):
        with pytest.raises(ValueError):
            compile_regexp(bad)
    with pytest.raises(ValueError):
        compile_regexp("<name>")  # named automata need a provider


def test_invalid_char_class_escape():
    with pytest.raises(ValueError):
        compile_regexp(r"[\q]")


def test_common_prefix():
    assert compile_regexp("scan").common_prefix() == "scan"
    assert compile_regexp("sc.n").common_prefix() == "sc"
    assert compile_regexp("sc(an|hema)").common_prefix() == "sc"
    assert compile_regexp("s[a-z]*&[a-z]*n").common_prefix() == "s"
    assert compile_regexp("(a|b)c").common_prefix() == ""
    assert compile_regexp("a*").common_prefix() == ""


def test_anchored_semantics():
    # AutomatonQuery is whole-term anchored — no substring matches
    assert not m("b", "abc")
    assert not m("ab", "abc")


def test_engine_regexp_query(spark):
    """RegexpQuery end-to-end: DFA term expansion == naive vocabulary scan."""
    import re

    from lucene_kmp_spark.data.transcripts import synth_transcripts
    from lucene_kmp_spark.index import assign_doc_ids, build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import RegexpQuery

    docs = assign_doc_ids(synth_transcripts(spark, n_convs=30, seed=23))
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    s = IndexSearcher(build_index(docs))

    from lucene_kmp_spark.analysis import analyze

    for pat, checks in [
        # intersection: starts with 's' AND ends 't' (segment, ...)
        ("s[a-z]*&[a-z]*t", lambda t: re.fullmatch("s[a-z]*", t) and re.fullmatch("[a-z]*t", t)),
        ("th(e|at)", lambda t: t in ("the", "that")),
    ]:
        got = {r.doc_id for r in s.execute(RegexpQuery(pat)).select("doc_id").collect()}
        want = {doc_id for doc_id, text in rows if any(checks(t) for t in analyze(text)[0])}
        assert got == want, pat
        assert got, f"pattern {pat} matched nothing — weak test corpus"
