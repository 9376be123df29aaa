"""HebMorph Hebrew chain — dictionary-free goldens ported from the
reference's TestHebrewTokenizer / NiqqudFilterTest / TestAddSuffixTokenFilter
plus Lemmatizer cascade tests over a hand-built DictHebMorph-shaped dict."""

from lucene_kmp_spark.analysis.hebrew import (
    ACRONYM,
    CONSTRUCT,
    HEBREW,
    NON_HEBREW,
    NUMERIC,
    HebrewDictionary,
    add_suffix,
    hebrew_analyzer,
    hebrew_tokenize,
    lemmatize,
    strip_niqqud,
)


def _terms(text, prefixes=None):
    return [t for t, _ty in hebrew_tokenize(text, prefixes)]


# ------------------------------------------ TestHebrewTokenizer.testBasics
def test_tokenizer_basics():
    assert _terms("books") == ["books"]
    assert _terms("book") == ["book"]
    assert _terms("steven's") == ["steven's"]
    assert _terms("steven’s") == ["steven's"]
    assert _terms("בדיקה") == ["בדיקה"]
    assert _terms('צה"ל') == ['צה"ל']
    assert _terms("צה''ל") == ['צה"ל']
    assert _terms("בדיקה אחת שתיים") == ["בדיקה", "אחת", "שתיים"]


def test_tokenizer_hyphen():
    assert _terms("some-dashed-phrase") == ["some", "dashed", "phrase"]


def test_token_types():
    toks = hebrew_tokenize('צה"ל test 57')
    assert toks[0][1] & HEBREW and toks[0][1] & ACRONYM
    assert toks[1][1] & NON_HEBREW
    assert toks[2][1] & NUMERIC


def test_construct_prefix_skip():
    """A makaf-terminated token that is a legal prefix vanishes
    (HebrewTokenizer.kt:56-58)."""
    prefixes = {"ב": 63, "ל": 63}
    toks = hebrew_tokenize("ב־בית", prefixes)
    assert [t for t, _ in toks] == ["בית"]
    # without the prefix table the construct token survives
    toks2 = hebrew_tokenize("ב־בית")
    assert [t for t, _ in toks2] == ["ב", "בית"]
    assert toks2[0][1] & CONSTRUCT


def test_acronym_prefix_strip():
    """tryStrippingPrefix fires only when the WHOLE pre-quote segment is a
    legal prefix and >=2 chars follow the quote (HebrewTokenizer.kt:110-113);
    when no quote remains in the result the Acronym type clears."""
    prefixes = {"ב": 63}
    toks = hebrew_tokenize('ב"אב', prefixes)
    assert [t for t, _ in toks] == ["אב"]
    assert not (toks[0][1] & ACRONYM)
    # ordinary acronym with a prefix: quote is next-to-last, so the strip
    # does NOT fire and the token passes through intact
    toks2 = hebrew_tokenize('וצה"ל', {"ו": 63})
    assert [t for t, _ in toks2] == ['וצה"ל']
    assert toks2[0][1] & ACRONYM


# ------------------------------------------------- NiqqudFilterTest golden
def test_niqqud_strip():
    text = "תָּכְנִית מַבְרִיקָה"
    toks = [strip_niqqud(t) for t in _terms(text)]
    assert toks == ["תכנית", "מבריקה"]


# ----------------------------------------- TestAddSuffixTokenFilter golden
def test_add_suffix():
    toks = hebrew_tokenize("book")
    assert add_suffix(toks) == ["book$"]
    assert add_suffix(hebrew_tokenize("שלום")) == ["שלום$"]
    assert add_suffix(hebrew_tokenize('בי"ס')) == ['בי"ס$']
    assert add_suffix(hebrew_tokenize("57")) == ["57"]


# -------------------------------------------------------- Lemmatizer cascade
def _dict():
    # entries[word] = (allowed_prefix_mask, [(lemma, lemma_prefix_mask)])
    return HebrewDictionary(
        entries={
            "ספר": (0b111111, [("ספר", 0b111111)]),
            "בית": (0b000001, [("בית", 0b000001)]),
            "כלב": (0b111111, [("כלב", 0b111111)]),
        },
        prefixes={"ה": 0b000001, "ו": 0b000010, "וה": 0b000010},
    )


def test_lemmatize_exact():
    assert lemmatize("ספר", _dict()) == ["ספר"]


def test_lemmatize_trailing_geresh():
    assert lemmatize("ספר'", _dict()) == ["ספר"]


def test_lemmatize_prefix_strip():
    # ה+בית: prefix mask 1 & entry mask 1 -> hit
    assert lemmatize("הבית", _dict()) == ["בית"]
    # ו+בית: prefix mask 2 & entry mask 1 == 0 -> no hit
    assert lemmatize("ובית", _dict()) == []
    # unknown word
    assert lemmatize("שולחן", _dict()) == []


def test_lemmatize_prefix_walk():
    # the walk grows the prefix while each step stays in the table:
    # "ו" then "וה" are both legal -> כלב resolves under the 2-char prefix
    assert lemmatize("והכלב", _dict()) == ["כלב"]
    # direct single prefix
    assert lemmatize("וכלב", _dict()) == ["כלב"]
    # walk stops at the first illegal prefix: "ה" legal but "הו" absent
    assert lemmatize("הוכלב", _dict()) == []


def test_analyzer_end_to_end():
    an = hebrew_analyzer(_dict())
    terms, positions, length = an("הבית test 42")
    assert terms == ["בית", "test", "42"]
    assert positions == [0, 1, 2]
    assert length == 3

    exact = hebrew_analyzer(_dict(), exact=True)
    terms, _, _ = exact("הבית test 42")
    assert terms == ["הבית$", "test$", "42"]
