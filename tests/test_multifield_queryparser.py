"""Ports of TestMultiFieldQueryParser.kt, TestMultiAnalyzer.kt and
TestMultiPhraseQueryParsing.kt — the classic parser's cross-field replication
surface and its handling of analyzers that stack tokens (posIncr 0) or skip
positions (posIncr > 1).

Skips: testStopWordSearching (index round-trip of a trivial AND query —
engine search behavior is covered by the driver oracles and
tests/test_query_breadth.py)."""

from __future__ import annotations

import pytest

from lucene_kmp_spark.queryparser.classic import (
    ClassicQueryParser,
    MultiFieldQueryParser,
    QPAnalyzer,
    QPBool,
    QPMultiPhrase,
    QPRegexp,
    QPTok,
    multifield_parse,
    multifield_parse_one,
)

from tests.test_classic_queryparser import (
    MockAnalyzer,
    MockSynonymAnalyzer,
    QPTestAnalyzer,
)


def S(q):
    return q.to_string("")


# --------------------------------------------------- TestMultiFieldQueryParser

def assert_stop_query_equals(qtxt, expected):
    fields = ["b", "t"]
    a = QPTestAnalyzer()
    mfqp = MultiFieldQueryParser(fields, a)
    assert S(mfqp.parse(qtxt)) == expected
    q = multifield_parse_one(qtxt, fields, ["SHOULD", "SHOULD"], a)
    assert S(q) == expected


def test_stopwords_parsing():
    assert_stop_query_equals("one", "b:one t:one")
    assert_stop_query_equals("one stop", "b:one t:one")
    assert_stop_query_equals("one (stop)", "b:one t:one")
    assert_stop_query_equals("one ((stop))", "b:one t:one")
    assert_stop_query_equals("stop", "")
    assert_stop_query_equals("(stop)", "")
    assert_stop_query_equals("((stop))", "")


def test_simple():
    mfqp = MultiFieldQueryParser(["b", "t"], MockAnalyzer())

    assert S(mfqp.parse("one")) == "b:one t:one"
    assert S(mfqp.parse("one two")) == "(b:one t:one) (b:two t:two)"
    assert S(mfqp.parse("+one +two")) == "+(b:one t:one) +(b:two t:two)"
    assert (
        S(mfqp.parse("+one -two -three"))
        == "+(b:one t:one) -(b:two t:two) -(b:three t:three)"
    )
    assert S(mfqp.parse("one^2 two")) == "(b:one t:one)^2.0 (b:two t:two)"
    assert S(mfqp.parse("one~ two")) == "(b:one~2 t:one~2) (b:two t:two)"
    assert S(mfqp.parse("one~0.8 two^2")) == "(b:one~0 t:one~0) (b:two t:two)^2.0"
    assert S(mfqp.parse("one* two*")) == "(b:one* t:one*) (b:two* t:two*)"
    assert S(mfqp.parse("[a TO c] two")) == "(b:[a TO c] t:[a TO c]) (b:two t:two)"
    assert S(mfqp.parse("w?ldcard")) == "b:w?ldcard t:w?ldcard"
    assert S(mfqp.parse('"foo bar"')) == 'b:"foo bar" t:"foo bar"'
    assert (
        S(mfqp.parse('"aa bb cc" "dd ee"'))
        == '(b:"aa bb cc" t:"aa bb cc") (b:"dd ee" t:"dd ee")'
    )
    assert S(mfqp.parse('"foo bar"~4')) == 'b:"foo bar"~4 t:"foo bar"~4'
    # LUCENE-1213: slop must survive when the phrase names a field
    assert S(mfqp.parse('b:"foo bar"~4')) == 'b:"foo bar"~4'
    # terms which have a field are not touched
    assert S(mfqp.parse("one f:two")) == "(b:one t:one) f:two"

    mfqp.set_default_operator(ClassicQueryParser.AND_OPERATOR)
    assert S(mfqp.parse("one two")) == "+(b:one t:one) +(b:two t:two)"
    assert (
        S(mfqp.parse('"aa bb cc" "dd ee"'))
        == '+(b:"aa bb cc" t:"aa bb cc") +(b:"dd ee" t:"dd ee")'
    )


def test_boosts_simple():
    boosts = {"b": 5.0, "t": 10.0}
    mfqp = MultiFieldQueryParser(["b", "t"], MockAnalyzer(), boosts)

    assert S(mfqp.parse("one")) == "(b:one)^5.0 (t:one)^10.0"
    assert (
        S(mfqp.parse("one AND two"))
        == "+((b:one)^5.0 (t:one)^10.0) +((b:two)^5.0 (t:two)^10.0)"
    )
    assert (
        S(mfqp.parse("one OR two"))
        == "((b:one)^5.0 (t:one)^10.0) ((b:two)^5.0 (t:two)^10.0)"
    )
    assert (
        S(mfqp.parse("one AND two AND foo:test"))
        == "+((b:one)^5.0 (t:one)^10.0) +((b:two)^5.0 (t:two)^10.0) +foo:test"
    )
    # boost with slop (lucene issue #12195)
    assert S(mfqp.parse('"one two"~2')) == '(b:"one two"~2)^5.0 (t:"one two"~2)^10.0'
    assert S(mfqp.parse("one~")) == "(b:one~2)^5.0 (t:one~2)^10.0"
    assert S(mfqp.parse("one*")) == "(b:one*)^5.0 (t:one*)^10.0"
    assert S(mfqp.parse("o?n*e")) == "(b:o?n*e)^5.0 (t:o?n*e)^10.0"
    assert S(mfqp.parse("/[a-z][123]/")) == "(b:/[a-z][123]/)^5.0 (t:/[a-z][123]/)^10.0"
    assert S(mfqp.parse("[one TO two]")) == "(b:[one TO two])^5.0 (t:[one TO two])^10.0"
    assert (
        S(mfqp.parse("one^3 AND two^4"))
        == "+((b:one)^5.0 (t:one)^10.0)^3.0 +((b:two)^5.0 (t:two)^10.0)^4.0"
    )


def test_static_method1():
    fields = ["b", "t"]
    a = MockAnalyzer()
    assert S(multifield_parse(["one", "two"], fields, a)) == "b:one t:two"
    assert S(multifield_parse(["+one", "+two"], fields, a)) == "(+b:one) (+t:two)"
    assert S(multifield_parse(["one", "+two"], fields, a)) == "b:one (+t:two)"
    assert (
        S(multifield_parse(["one +more", "+two"], fields, a)) == "(b:one +b:more) (+t:two)"
    )
    with pytest.raises(ValueError):
        multifield_parse(["blah"], fields, a)

    stop_a = QPTestAnalyzer()
    assert S(multifield_parse(["((+stop))", "+((stop))"], fields, stop_a)) == ""
    assert (
        S(multifield_parse(["one ((+stop)) +more", "+((stop)) +two"], fields, stop_a))
        == "(b:one +b:more) (+t:two)"
    )


def test_static_method2():
    fields = ["b", "t"]
    flags = ["MUST", "MUST_NOT"]
    a = MockAnalyzer()
    assert S(multifield_parse_one("one", fields, flags, a)) == "+b:one -t:one"
    assert S(multifield_parse_one("one two", fields, flags, a)) == "+(b:one b:two) -(t:one t:two)"
    with pytest.raises(ValueError):
        multifield_parse_one("blah", fields, ["MUST"], a)


def test_static_method3():
    queries = ["one", "two", "three"]
    fields = ["f1", "f2", "f3"]
    flags = ["MUST", "MUST_NOT", "SHOULD"]
    a = MockAnalyzer()
    assert S(multifield_parse(queries, fields, a, flags)) == "+f1:one -f2:two f3:three"
    with pytest.raises(ValueError):
        multifield_parse(queries, fields, a, ["MUST"])


def test_static_method3_old():
    a = MockAnalyzer()
    assert S(multifield_parse(["one", "two"], ["b", "t"], a, ["MUST", "MUST_NOT"])) == "+b:one -t:two"


class AnalyzerReturningNull(QPAnalyzer):
    """TestMultiFieldQueryParser.AnalyzerReturningNull: no tokens for f1."""

    def __init__(self):
        self.base = MockAnalyzer("whitespace", True)

    def tokens(self, field, text):
        if field == "f1":
            return []
        return self.base.tokens(field, text)

    def normalize(self, field, text):
        return text.lower()


def test_analyzer_returning_null():
    parser = MultiFieldQueryParser(["f1", "f2", "f3"], AnalyzerReturningNull())
    assert S(parser.parse("bla AND blo")) == "+(f2:bla f3:bla) +(f2:blo f3:blo)"
    # unanalyzed forms keep every field:
    assert S(parser.parse("bla*")) == "f1:bla* f2:bla* f3:bla*"
    assert S(parser.parse("bla~")) == "f1:bla~2 f2:bla~2 f3:bla~2"
    assert S(parser.parse("[a TO c]")) == "f1:[a TO c] f2:[a TO c] f3:[a TO c]"


def test_simple_regex():
    mfqp = MultiFieldQueryParser(["a", "b"], MockAnalyzer())
    expected = QPBool(
        (
            ("SHOULD", QPRegexp("a", "[a-z][123]")),
            ("SHOULD", QPRegexp("b", "[a-z][123]")),
        )
    )
    assert mfqp.parse("/[a-z][123]/") == expected


def test_multifield_synonyms():
    parser = MultiFieldQueryParser(["b", "t"], MockSynonymAnalyzer())
    assert S(parser.parse("dogs")) == "Synonym(b:dog b:dogs) Synonym(t:dog t:dogs)"
    assert parser.get_split_on_whitespace() is False
    assert (
        S(parser.parse("guinea pig"))
        == "((+b:guinea +b:pig) b:cavy) ((+t:guinea +t:pig) t:cavy)"
    )
    parser.set_split_on_whitespace(True)
    assert S(parser.parse("guinea pig")) == "(b:guinea t:guinea) (b:pig t:pig)"


# --------------------------------------------------------- TestMultiAnalyzer

class MultiAnalyzer(QPAnalyzer):
    """'multi' -> multi+multi2 stacked; 'triplemulti' -> +multi3+multi2."""

    def __init__(self):
        self.base = MockAnalyzer("whitespace", True)

    def tokens(self, field, text):
        out = []
        for t in self.base.tokens(field, text):
            out.append(t)
            if t.term == "multi":
                out.append(QPTok("multi2", 0, 1))
            elif t.term == "triplemulti":
                out.append(QPTok("multi3", 0, 1))
                out.append(QPTok("multi2", 0, 1))
        return out

    def normalize(self, field, text):
        return text.lower()


def test_multi_analyzer():
    qp = ClassicQueryParser("", MultiAnalyzer())

    # trivial, no multiple tokens:
    assert S(qp.parse("foo")) == "foo"
    assert S(qp.parse('"foo"')) == "foo"
    assert S(qp.parse("foo foobar")) == "foo foobar"
    assert S(qp.parse('"foo foobar"')) == '"foo foobar"'
    assert S(qp.parse('"foo foobar blah"')) == '"foo foobar blah"'

    # two tokens at the same position:
    assert S(qp.parse("multi foo")) == "Synonym(multi multi2) foo"
    assert S(qp.parse("foo multi")) == "foo Synonym(multi multi2)"
    assert S(qp.parse("multi multi")) == "Synonym(multi multi2) Synonym(multi multi2)"
    assert (
        S(qp.parse("+(foo multi) +(bar multi)"))
        == "+(foo Synonym(multi multi2)) +(bar Synonym(multi multi2))"
    )
    assert (
        S(qp.parse('+(foo multi) field:"bar multi"'))
        == '+(foo Synonym(multi multi2)) field:"bar (multi multi2)"'
    )

    # phrases:
    assert S(qp.parse('"multi foo"')) == '"(multi multi2) foo"'
    assert S(qp.parse('"foo multi"')) == '"foo (multi multi2)"'
    assert (
        S(qp.parse('"foo multi foobar multi"'))
        == '"foo (multi multi2) foobar (multi multi2)"'
    )

    # fields:
    assert S(qp.parse("field:multi field:foo")) == "Synonym(field:multi field:multi2) field:foo"
    assert S(qp.parse('field:"multi foo"')) == 'field:"(multi multi2) foo"'

    # three tokens at one position:
    assert S(qp.parse("triplemulti")) == "Synonym(multi2 multi3 triplemulti)"
    assert S(qp.parse("foo triplemulti foobar")) == "foo Synonym(multi2 multi3 triplemulti) foobar"

    # phrase with non-default slop:
    assert S(qp.parse('"multi foo"~10')) == '"(multi multi2) foo"~10'

    # phrase with non-default boost:
    assert S(qp.parse('"multi foo"^2')) == '("(multi multi2) foo")^2.0'

    # phrase after changing default slop:
    qp.phrase_slop = 99
    assert S(qp.parse('"multi foo" bar')) == '"(multi multi2) foo"~99 bar'
    assert S(qp.parse('"multi foo" "foo bar"~2')) == '"(multi multi2) foo"~99 "foo bar"~2'
    qp.phrase_slop = 0

    # non-default operator:
    qp.set_default_operator(ClassicQueryParser.AND_OPERATOR)
    assert S(qp.parse("multi foo")) == "+Synonym(multi multi2) +foo"


def test_multi_analyzer_with_subclass():
    class DumbQueryParser(ClassicQueryParser):
        def get_super_field_query(self, f, t, quoted):
            return super().get_field_query(f, t, quoted)

        def get_field_query(self, field, query_text, quoted):
            return self.get_super_field_query(field, query_text, quoted)

    qp = DumbQueryParser("", MultiAnalyzer())
    qp.phrase_slop = 99
    assert S(qp.get_super_field_query("", "foo bar", True)) == '"foo bar"~99'
    assert S(qp.get_super_field_query("", "multi bar", True)) == '"(multi multi2) bar"~99'
    assert S(qp.parse('"multi foo" bar')) == '"(multi multi2) foo"~99 bar'


class PosIncrementAnalyzer(QPAnalyzer):
    """'the' dropped with its increment carried (quick gets incr 2)."""

    def __init__(self):
        self.base = MockAnalyzer("whitespace", True, frozenset({"the"}))

    def tokens(self, field, text):
        return self.base.tokens(field, text)

    def normalize(self, field, text):
        return text.lower()


def test_pos_increment_analyzer():
    qp = ClassicQueryParser("", PosIncrementAnalyzer())
    assert S(qp.parse("the quick brown")) == "quick brown"
    assert S(qp.parse("the quick brown fox")) == "quick brown fox"


# ------------------------------------------------- TestMultiPhraseQueryParsing

class CannedAnalyzer(QPAnalyzer):
    def __init__(self, tokens_and_pos):
        self.tp = tokens_and_pos

    def tokens(self, field, text):
        out, last = [], 0
        for term, pos in self.tp:
            out.append(QPTok(term, pos - last, 1))
            last = pos
        return out


def test_multi_phrase_query_parsing():
    canned = [("a", 0), ("1", 0), ("b", 1), ("1", 1), ("c", 2)]
    qp = ClassicQueryParser("field", CannedAnalyzer(canned))
    q = qp.parse('"this text is acually ignored"')
    expected = QPMultiPhrase("field", (("a", "1"), ("b", "1"), ("c",)), (-1, 0, 1), 0)
    assert q == expected
