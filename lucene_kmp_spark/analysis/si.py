"""Sinhala analysis chain (``analysis/extra/.../analysis/si/``).

* ``sinhala_normalize`` — ``si/SinhalaNormalizer.kt``: script
  punctuation folds and ZWJ/ZWNJ removal.
* ``sinhala_stem`` — ``si/SinhalaStemmer.kt``: first-match suffix strip
  (match requires len >= suffix + 2; results shorter than 2 rejected).
* ``sinhala_analyzer`` — ``si/SinhalaAnalyzer.kt`` chain: StandardTokenizer ->
  LowerCase -> DecimalDigit -> [keyword] ->
  SinhalaNormalization -> Stop -> SinhalaStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

SINHALA_STOP_WORDS = frozenset((
    "සහ", "හා", "හෝ", "නමුත්", "එහෙත්", "එසේ", "මේ", "මෙම", "ඒ", "එය",
    "එම", "ඔහු", "ඇය", "ඔවුන්", "මම", "අපි", "අප", "ඔබ", "ඔබගේ", "මගේ",
    "අපගේ", "ඔහුගේ", "ඇගේ", "ය", "වේ", "විය", "වූ", "වෙයි", "වන්නේ", "ඇත",
    "ඇති", "නැත", "නෑ", "නොවේ", "කර", "කරන", "කළ", "කිරීමට", "කිරීම", "බව",
    "බවට", "සඳහා", "නිසා", "මෙන්", "පරිදි", "තුළ", "මත", "වෙත", "වල",
    "සිට", "දක්වා", "ගැන", "ගැනි", "සියලු", "බොහෝ", "කිහිප", "එක්", "දෙක",
    "අද", "ඊයේ", "හෙට", "දැන්", "පසුව", "පෙර", "කවදා", "කොහේ", "කෙසේ",
    "කවුද", "කුමක්",
))

_SI_SUFFIXES = (
    "වලින්", "වලට", "වල", "යන්ගෙන්", "යන්ගේ", "යන්ට", "යන්", "වන්ගෙන්",
    "වන්ගේ", "වන්ට", "වන්", "ගෙන්", "යෙන්", "වෙන්", "යේ", "ගේ", "වක්",
    "යක්", "කින්", "ට", "ින්", "ක්", "ව", "ය",
)

_SI_DELETE = frozenset(("\u200d", "\u200c"))


def sinhala_normalize(term: str) -> str:
    out = []
    for c in term:
        if c in _SI_DELETE:
            continue
        if c == "\u0df4":
            c = "\u0964"
        out.append(c)
    return "".join(out)


def sinhala_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    for sfx in _SI_SUFFIXES:
        if len(word) >= len(sfx) + 2 and word.endswith(sfx):
            out = word[: -len(sfx)]
            return word if len(out) < 2 else out
    return word


def sinhala_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = SINHALA_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = sinhala_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = sinhala_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
