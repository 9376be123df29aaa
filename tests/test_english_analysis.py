"""English analysis chain: Porter stemmer, possessive filter, S-stemmer,
EnglishAnalyzer position-hole/norm semantics, and the oracle stem-map guard.

Goldens come from the published Porter (1980) example pairs and the
reference's own tests (TestEnglishAnalyzer.kt, TestEnglishMinimalStemFilter.kt,
TestPorterStemFilter.kt testWithKeywordAttribute).
"""

import duckdb
import pytest

from lucene_kmp_spark.analysis.en import (
    ENGLISH_STOP_WORDS,
    english_analyzer,
    english_minimal_analyzer,
    english_minimal_stem,
    english_possessive,
    porter_stem,
)

# (word, stem) pairs from the worked examples in the published algorithm,
# plus the Lucene-departure cases
PORTER_PAIRS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("conformabli", "conform"), ("radicalli", "radic"),
    ("differentli", "differ"), ("vileli", "vile"), ("analogousli", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"), ("decisiveness", "decis"),
    ("hopefulness", "hope"), ("callousness", "callous"),
    ("formaliti", "formal"), ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angulariti", "angular"), ("homologous", "homolog"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # length <= 2 guard (PorterStemmer.kt: steps only run when k > k0+1)
    ("as", "as"), ("is", "is"), ("be", "be"), ("s", "s"), ("", ""),
    # 'ion' needs a preceding s/t
    ("ion", "ion"), ("adhesion", "adhes"),
]


@pytest.mark.parametrize("word,expected", PORTER_PAIRS)
def test_porter_pairs(word, expected):
    assert porter_stem(word) == expected


def test_porter_idempotent_on_result_length_2():
    # stems never crash on short/odd inputs; digits count as consonants
    for w in ("a", "ab", "ed", "ing", "x123s", "yyyy", "eee"):
        porter_stem(w)


def test_possessive_variants():
    # EnglishPossessiveFilter.kt:19-29 — three apostrophe forms, either case s
    assert english_possessive("steven's") == "steven"
    assert english_possessive("steven’s") == "steven"
    assert english_possessive("steven＇s") == "steven"
    assert english_possessive("STEVEN'S") == "STEVEN"
    assert english_possessive("s's") == "s"
    assert english_possessive("'s") == ""  # bufferLength >= 2 -> stripped
    assert english_possessive("its") == "its"
    assert english_possessive("o'clock") == "o'clock"


def test_minimal_stem_examples():
    # TestEnglishMinimalStemFilter.kt testExamples
    cases = {
        "queries": "query", "phrases": "phrase", "corpus": "corpus",
        "stress": "stress", "kings": "king", "panels": "panel",
        "aerodynamics": "aerodynamic", "congress": "congress",
        "serious": "serious",
    }
    for w, e in cases.items():
        assert english_minimal_stem(w) == e


def test_english_analyzer_basics():
    # TestEnglishAnalyzer.kt testBasics
    a = english_analyzer()
    assert a("books")[0] == ["book"]
    assert a("book")[0] == ["book"]
    assert a("the")[0] == []
    assert a("steven's")[0] == ["steven"]
    assert a("steven’s")[0] == ["steven"]
    assert a("steven＇s")[0] == ["steven"]


def test_english_analyzer_exclusions():
    # TestEnglishAnalyzer.kt testExclude — SetKeywordMarkerFilter analog
    a = english_analyzer(stem_exclusions=("books",))
    assert a("books")[0] == ["books"]
    assert a("book")[0] == ["book"]


def test_possessive_runs_before_stop():
    # "it's" -> possessive -> "it" -> stopped; the hole remains
    a = english_analyzer()
    terms, positions, length = a("it's a big table")
    assert terms == ["big", "tabl"]
    assert positions == [2, 3]
    assert length == 2  # post-stop count (stopped tokens never reach norms)


def test_stop_holes_and_positions():
    a = english_analyzer()
    terms, positions, _ = a("big the table")
    assert terms == ["big", "tabl"]
    assert positions == [0, 2]  # hole at 1 -> NOT an exact phrase match


def test_minimal_analyzer_chain():
    a = english_minimal_analyzer()
    assert a("Queries And Phrases")[0] == ["query", "and", "phrase"]


def test_oracle_stem_case_matches_porter():
    """The inline CASE map in __spark_entry__._EN_STEM_CASE must equal
    porter_stem over the real corpus vocabulary (all sfs share it)."""
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    vocab = [
        w for (w,) in con.sql(
            "SELECT DISTINCT unnest(string_split(text, ' ')) "
            "FROM '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    ]
    survivors = [w for w in vocab if w not in ENGLISH_STOP_WORDS]
    rows = con.execute(
        f"SELECT raw, {entry_mod._EN_STEM_CASE} FROM (SELECT unnest(?) AS raw)",
        [survivors],
    ).fetchall()
    for raw, mapped in rows:
        assert mapped == porter_stem(raw), (raw, mapped, porter_stem(raw))
    # and the stop list used by the oracle prelude is exactly vocab ∩ stop set
    assert {w for w in vocab if w in ENGLISH_STOP_WORDS} == {"a", "the"}
