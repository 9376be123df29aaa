"""ComplexPhraseQueryParser goldens ported from the reference's
TestComplexPhraseQuery.kt (same 8-doc corpus, same expected ID sets)."""

import pytest

from lucene_kmp_spark.index.builder import build_index
from lucene_kmp_spark.queryparser.complexphrase import (
    ComplexPhraseParseError,
    ComplexPhraseQueryParser,
    ComplexPhraseSearcher,
)
from lucene_kmp_spark.search.executor import IndexSearcher

# TestComplexPhraseQuery.kt:33-42 docsContent (name, id, role)
DOCS = [
    ("john smith", "1", "developer"),
    ("johathon smith", "2", "developer"),
    ("john percival smith", "3", "designer"),
    ("jackson waits tom", "4", "project manager"),
    ("johny perkins", "5", "orders pizza"),
    ("hapax neverson", "6", "never matches"),
    ("dog cigar", "7", "just for synonyms"),
    ("dogs don't smoke cigarettes", "8", "just for synonyms"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        [(int(i), n, i, r) for (n, i, r) in DOCS],
        schema="doc_id long, name string, id string, role string",
    )
    name_ix = build_index(df, text_col="name")
    role_ix = build_index(df, text_col="role")
    return {
        "name": IndexSearcher(name_ix),
        "role": IndexSearcher(role_ix),
    }


def _matches(corpus, qstr, in_order=True, analyzer=None):
    # checkMatches (TestComplexPhraseQuery.kt:174-177) runs the parser with
    # fuzzyPrefixLength = 1
    parser = ComplexPhraseQueryParser(
        default_field="name",
        structured_fields=("id",),
        text_fields=("role",),
        in_order=in_order,
        analyzer=analyzer,
        fuzzy_prefix_length=1,
    )
    q = parser.parse(qstr)
    searcher = ComplexPhraseSearcher(corpus, default_field="name")
    rows = searcher.execute(q).select("doc_id").collect()
    return ",".join(str(r.doc_id) for r in sorted(rows, key=lambda r: r.doc_id))


# ------------------------------------------------- testComplexPhrases (:48)
@pytest.mark.parametrize(
    "qstr,expected",
    [
        ('"john smith"', "1"),
        ('"j*   smyth~"', "1,2"),
        ('"(jo* -john)  smith"', "2"),
        ('"jo*  smith"~2', "1,2,3"),
        ('"jo* [sma TO smZ]" ', "1,2"),
        ('"john"', "1,3"),
        ('"(john OR johathon)  smith"', "1,2"),
        ('"(john OR nosuchword*)  smith"', "1"),
        ('"(jo* -john) smyth~"', "2"),
        ('"john  nosuchword*"', ""),
    ],
)
def test_complex_phrases(corpus, qstr, expected):
    assert _matches(corpus, qstr) == expected


def test_bad_queries(corpus):
    with pytest.raises(ComplexPhraseParseError):
        _matches(corpus, '"jo*  id:1 smith"')


# ---------------------------------------------- testSingleTermPhrase (:64)
@pytest.mark.parametrize(
    "qstr,expected",
    [
        ('"joh*"', "1,2,3,5"),
        ('"joh~"', "1,3,5"),
        ('"joh*" "tom"', "1,2,3,4,5"),
        ('+"j*" +"tom"', "4"),
        ('"jo*" "[sma TO smZ]" ', "1,2,3,5,8"),
        ('+"j*hn" +"sm*h"', "1,3"),
    ],
)
def test_single_term_phrase(corpus, qstr, expected):
    assert _matches(corpus, qstr) == expected


# -------------------------------------------------------- testSynonyms (:75)
def _mock_synonym_analyzer(text):
    """MockSynonymAnalyzer: 'dogs' also emits 'dog' at the same position."""
    from lucene_kmp_spark.analysis import analyze

    terms, positions, length = analyze(text)
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        out_t.append(t)
        out_p.append(p)
        if t == "dogs":
            out_t.append("dog")
            out_p.append(p)
    return out_t, out_p, length


@pytest.mark.parametrize(
    "qstr,expected,syn",
    [
        ('"dogs"', "8", False),
        ('"dogs"', "7,8", True),
        ('"dog"', "7", True),
        ('"dogs cigar*"', "", False),
        ('"dog cigar*"', "7", False),
        ('"dogs cigar*"', "7", True),
        ('"dog cigar*"', "7", True),
        ('"dogs cigar*"~2', "7,8", True),
        ('"dog cigar*"~2', "7", True),
    ],
)
def test_synonyms(corpus, qstr, expected, syn):
    an = _mock_synonym_analyzer if syn else None
    assert _matches(corpus, qstr, analyzer=an) == expected


# ------------------------------------- testUnOrderedProximitySearches (:91)
def test_unordered_proximity(corpus):
    assert _matches(corpus, '"smith jo*"~2', in_order=True) == ""
    assert _matches(corpus, '"smith jo*"~2', in_order=False) == "1,2,3"


# --------------------------------------------------- testFieldedQuery (:99)
@pytest.mark.parametrize(
    "qstr,expected",
    [
        ('name:"john smith"', "1"),
        ('name:"j*   smyth~"', "1,2"),
        ('role:"developer"', "1,2"),
        ('role:"p* manager"', "4"),
        ("role:de*", "1,2,3"),
        ('name:"j* smyth~"~5', "1,2,3"),
        ('role:"p* manager" AND name:jack*', "4"),
        ("+role:developer +name:jack*", ""),
        ('name:"john smith"~2 AND role:designer AND id:3', "3"),
    ],
)
def test_fielded_query(corpus, qstr, expected):
    assert _matches(corpus, qstr) == expected


# ------------------------------------------------------- testBoosts (:145)
def test_boosts_parse_structure():
    """Boosts inside the phrase are unwrapped during span conversion; the
    group boost survives (TestComplexPhraseQuery.kt:145-162)."""
    from lucene_kmp_spark.search.query import (
        PrefixQuery,
        SpanMultiTermWrapper,
        SpanNearQuery,
        SpanTermQuery,
    )

    parser = ComplexPhraseQueryParser(default_field="name")
    q = parser.parse('("john^3 smit*"~4)^2')
    assert isinstance(q, SpanNearQuery) and q.slop == 4 and q.in_order
    assert q.terms[0] == SpanTermQuery("john")
    # the reference golden expands smit* -> smith against its index; ours
    # defers expansion to the executor, so the parse-level shape keeps the
    # wrapper (expansion equivalence is covered by the match goldens above)
    assert q.terms[1] == SpanMultiTermWrapper(PrefixQuery("smit"))
    assert q.boost == 2.0
