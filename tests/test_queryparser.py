from lucene_kmp_spark.queryparser import parse
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ColumnFilterQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


def occurs(q, occur):
    return [c.query for c in q.clauses if c.occur == occur]


def test_single_term():
    assert parse("Hope") == TermQuery("hope")


def test_default_or():
    q = parse("hope faith")
    assert isinstance(q, BooleanQuery)
    assert occurs(q, Occur.SHOULD) == [TermQuery("hope"), TermQuery("faith")]


def test_plus_minus():
    q = parse("+hope resurrection -tool")
    assert occurs(q, Occur.MUST) == [TermQuery("hope")]
    assert occurs(q, Occur.SHOULD) == [TermQuery("resurrection")]
    assert occurs(q, Occur.MUST_NOT) == [TermQuery("tool")]


def test_and_operator():
    q = parse("hope AND faith")
    assert occurs(q, Occur.MUST) == [TermQuery("hope"), TermQuery("faith")]


def test_phrase_and_slop():
    q = parse('"kingdom of God"')
    assert q == PhraseQuery(("kingdom", "of", "god"))
    q = parse('"kingdom god"~2')
    assert q == PhraseQuery(("kingdom", "god"), slop=2)


def test_field_filter():
    q = parse("+hope role:user")
    assert occurs(q, Occur.SHOULD) == [ColumnFilterQuery("role = 'user'")]


def test_prefix_wildcard_fuzzy():
    assert parse("hope*") == PrefixQuery("hope")
    assert parse("ho*e?") == WildcardQuery("ho*e?")
    assert parse("hope~1") == FuzzyQuery("hope", max_edits=1)
    assert parse("hope~") == FuzzyQuery("hope", max_edits=2)


def test_range():
    assert parse("[alpha TO beta]") == TermRangeQuery("alpha", "beta", True, True)
    assert parse("{alpha TO beta}") == TermRangeQuery("alpha", "beta", False, False)


def test_boost():
    q = parse("hope^2 faith")
    assert occurs(q, Occur.SHOULD)[0] == TermQuery("hope", boost=2.0)


def test_parens():
    q = parse("+hope (faith OR light)")
    assert len(occurs(q, Occur.MUST)) == 1
    inner = occurs(q, Occur.SHOULD)[0]
    assert isinstance(inner, BooleanQuery)


def test_fixture_style_query():
    q = parse('+hope resurrection "kingdom of god" -tool role:user')
    assert occurs(q, Occur.MUST) == [TermQuery("hope")]
    assert TermQuery("resurrection") in occurs(q, Occur.SHOULD)
    assert PhraseQuery(("kingdom", "of", "god")) in occurs(q, Occur.SHOULD)
    assert occurs(q, Occur.MUST_NOT) == [TermQuery("tool")]
    assert ColumnFilterQuery("role = 'user'") in occurs(q, Occur.SHOULD)


def test_empty():
    assert parse("") == MatchAllDocsQuery()


def test_multi_token_word_becomes_phrase():
    assert parse("full-text") == PhraseQuery(("full", "text"))


def test_regexp_syntax():
    from lucene_kmp_spark.queryparser import parse
    from lucene_kmp_spark.search.query import RegexpQuery, BooleanQuery

    q = parse("/sc.n/")
    assert q == RegexpQuery("sc.n")
    q = parse("merge /jo.n/")
    assert isinstance(q, BooleanQuery)
    assert any(isinstance(c.query, RegexpQuery) for c in q.clauses)
