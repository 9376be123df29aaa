"""Igbo analysis chain (``analysis/extra/.../analysis/ig/``).

* ``igbo_normalize`` — ``ig/IgboNormalizer.kt``: the shared Latin fold
  plus dotted-letter folds (ị->i, ọ->o, ụ->u, ṅ->n).
* ``igbo_stem`` — ``ig/IgboStemmer.kt``: na-/ị-/i-/n-/m- prefix strip
  (consonant-gated), then suffix strip.
* chain (``ig/IgboAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> IgboNormalization -> Stop -> IgboStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as _latin_fold

IG_STOP_WORDS = frozenset((
    "#", "a", "abuo", "abụo", "agugu", "agwu", "aha", "ahu", "ala", "ama",
    "ana", "ana-kpo", "anyi", "anyị", "anyanwu", "ato", "bi", "bu",
    "bukwa", "bụrụ", "bụ", "bula", "di", "dị", "du", "e", "ebe", "ébé",
    "egwu", "gbu", "ha", "ihe", "igbo", "ike", "ime", "ishií", "ka", "kpo",
    "kwa", "madu", "ma", "maka", "màkà", "mádu", "mbu", "mere", "mgbe",
    "mmadu", "n'ime", "na", "nà", "naigeria", "n'etiti", "nde", "ne",
    "nile", "nke", "no", "nwere", "nọr", "o", "ó", "obodo", "obu", "onwa",
    "onu", "onye", "otu", "ọ", "ruru", "si", "tupu", "ubochi", "ukwu",
    "uwa", "ya", "àlà", "í", "íshí",
))


_IG_DOTS = str.maketrans({"\u1ecb": "i", "\u1ecd": "o", "\u1ee5": "u",
                          "\u1e45": "n"})
_IG_VOWELS = frozenset("aeiou\u1ecb\u1ecd\u1ee5")
_IG_SUFFIXES = ("gh\u1ecb", "ghi", "kwa", "kw\u1ecd", "kwu",
                "r\u1ecb", "ri", "ra", "la")


def igbo_normalize(term: str) -> str:
    return _latin_fold(term).translate(_IG_DOTS)


def igbo_stem(word: str) -> str:
    if len(word) <= 3 or word != word.lower():
        return word
    w = word

    def cons(c):
        return c not in _IG_VOWELS

    if len(w) > 5 and w.startswith("na"):
        w = w[2:]
    elif len(w) >= 4 and w.startswith("\u1ecb") and cons(w[1]):
        w = w[1:]
    elif len(w) >= 4 and w.startswith("i") and cons(w[1]):
        w = w[1:]
    elif len(w) >= 5 and w.startswith("n") and cons(w[1]):
        w = w[1:]
    elif len(w) >= 5 and w.startswith("m") and cons(w[1]):
        w = w[1:]
    for sfx in _IG_SUFFIXES:
        if len(w) >= len(sfx) + 3 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def igbo_analyzer(stop_words=None, stem_exclusions=(),
                  max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = IG_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = igbo_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = igbo_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
