"""ASCIIFoldingFilter (analysis/common miscellaneous/ASCIIFoldingFilter.kt).

Goldens ported from TestASCIIFoldingFilter.kt testLatin1Accents /
testUnmodifiedLetters; the full 1,242-char table itself is extracted from
the published testAllFoldings list (see analysis/asciifolding_data.py).
"""

import pytest

from lucene_kmp_spark.analysis.asciifolding_data import FOLD_MAP
from lucene_kmp_spark.analysis.filters import ascii_folding_analyzer, fold_ascii

# TestASCIIFoldingFilter.kt:34-125 testLatin1Accents golden pairs
LATIN1 = [
    ("Des", "Des"), ("mot", "mot"), ("clés", "cles"), ("À", "A"), ("LA", "LA"),
    ("CHAÎNE", "CHAINE"), ("Á", "A"), ("Â", "A"), ("Ã", "A"), ("Ä", "A"),
    ("Å", "A"), ("Æ", "AE"), ("Ç", "C"), ("È", "E"), ("É", "E"), ("Ê", "E"),
    ("Ë", "E"), ("Ì", "I"), ("Í", "I"), ("Î", "I"), ("Ï", "I"), ("Ĳ", "IJ"),
    ("Ð", "D"), ("Ñ", "N"), ("Ò", "O"), ("Ó", "O"), ("Ô", "O"), ("Õ", "O"),
    ("Ö", "O"), ("Ø", "O"), ("Œ", "OE"), ("Þ", "TH"), ("Ù", "U"), ("Ú", "U"),
    ("Û", "U"), ("Ü", "U"), ("Ý", "Y"), ("Ÿ", "Y"), ("à", "a"), ("á", "a"),
    ("â", "a"), ("ã", "a"), ("ä", "a"), ("å", "a"), ("æ", "ae"), ("ç", "c"),
    ("è", "e"), ("é", "e"), ("ê", "e"), ("ë", "e"), ("ì", "i"), ("í", "i"),
    ("î", "i"), ("ï", "i"), ("ĳ", "ij"), ("ð", "d"), ("ñ", "n"), ("ò", "o"),
    ("ó", "o"), ("ô", "o"), ("õ", "o"), ("ö", "o"), ("ø", "o"), ("œ", "oe"),
    ("ß", "ss"), ("þ", "th"), ("ù", "u"), ("ú", "u"), ("û", "u"), ("ü", "u"),
    ("ý", "y"), ("ÿ", "y"), ("ﬁ", "fi"), ("ﬂ", "fl"),
]


@pytest.mark.parametrize("unfolded,folded", LATIN1)
def test_latin1_goldens(unfolded, folded):
    assert fold_ascii(unfolded) == folded


def test_unmodified_letters():
    # TestASCIIFoldingFilter.kt testUnmodifiedLetters: § ¦ ¤ pass through
    for ch in ("§", "¦", "¤", "END"):
        assert fold_ascii(ch) == ch


def test_table_invariants():
    assert len(FOLD_MAP) == 1242
    # every folded output is pure ASCII
    assert all(all(ord(c) < 0x80 for c in v) for v in FOLD_MAP.values())
    # punctuation + enclosed sections present
    assert FOLD_MAP["“"] == '"' and FOLD_MAP["–"] == "-" and FOLD_MAP["⒜"] == "(a)"
    assert FOLD_MAP["Ⓐ"] == "A" and FOLD_MAP["Ａ"] == "A" and FOLD_MAP["①"] == "1"
    # vulgar fractions intentionally NOT folded (absent from the reference table)
    assert "½" not in FOLD_MAP


def test_analyzer_chain_and_preserve_original():
    run = ascii_folding_analyzer()
    terms, positions, length = run("Un café crémeux")
    assert terms == ["un", "cafe", "cremeux"] and positions == [0, 1, 2] and length == 3

    keep = ascii_folding_analyzer(preserve_original=True)
    terms, positions, length = keep("café bar")
    # folded first, original at the SAME position (posIncr=0), norms length
    # counts position increments only
    assert terms == ["cafe", "café", "bar"]
    assert positions == [0, 0, 1]
    assert length == 2


def test_end_to_end_searchable(spark):
    from lucene_kmp_spark.index import assign_doc_ids, build_index
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import TermQuery

    rows = [("c0", 0, "Un café crémeux à Paris"), ("c1", 0, "plain coffee text")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(assign_doc_ids(df), analyzer=ascii_folding_analyzer())
    s = IndexSearcher(idx)
    hits = [r["doc_id"] for r in s.top_k(TermQuery("cafe"), 10).collect()]
    assert hits == [0]
    assert s.top_k(TermQuery("café"), 10).count() == 0  # folded at index time
