"""Swahili analysis chain (``analysis/extra/.../analysis/sw/``).

* ``swahili_normalize`` — ``sw/SwahiliNormalizer.kt``: apostrophe/dash
  variants unified, Latin diacritics folded to base vowels/consonants.
* ``swahili_stem`` — ``sw/SwahiliStemmer.kt``: conservative dictionary-free
  stripping of subject/tense verb prefixes, noun-class prefixes, and two
  rounds of inflection suffixes; length <= 3 and mixed-case tokens pass
  through untouched.
* ``swahili_analyzer`` — ``sw/SwahiliAnalyzer.kt:32-43`` chain:
  StandardTokenizer -> LowerCaseFilter -> DecimalDigitFilter ->
  [SetKeywordMarkerFilter] -> SwahiliNormalizationFilter ->
  StopFilter(swahili) -> SwahiliStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

SWAHILI_STOP_WORDS = frozenset((
    "akasema", "alikuwa", "alisema", "baada", "basi", "bila", "cha", "chini", "hadi", "hapo",
    "hata", "hivyo", "hiyo", "huku", "huo", "ili", "ilikuwa", "juu", "kama", "karibu",
    "katika", "kila", "kima", "kisha", "kubwa", "kutoka", "kuwa", "kwa", "kwamba", "kwenda",
    "kwenye", "la", "lakini", "mara", "mdogo", "mimi", "mkubwa", "mmoja", "moja", "muda",
    "mwenye", "na", "naye", "ndani", "ng", "ni", "nini", "nonkungu", "pamoja", "pia",
    "sana", "sasa", "sauti", "tafadhali", "tena", "tu", "vile", "wa", "wakati", "wake",
    "walikuwa", "wao", "watu", "wengine", "wote", "ya", "yake", "yangu", "yao", "yeye",
    "yule", "za", "zaidi", "zake",
))

_SW_NORM = {}
for _src, _dst in (
    ("\u2019\u2018\u201b\u02b9\u02bc`\u00b4", "'"),
    ("\u2010\u2011\u2012\u2013\u2014\u2015", "-"),
    ("\u00e0\u00e1\u00e2\u00e3\u00e4\u00e5\u0101\u0103\u0105", "a"),
    ("\u00e8\u00e9\u00ea\u00eb\u0113\u0115\u0117\u0119\u011b", "e"),
    ("\u00ec\u00ed\u00ee\u00ef\u0129\u012b\u012d\u012f", "i"),
    ("\u00f2\u00f3\u00f4\u00f5\u00f6\u014d\u014f\u0151", "o"),
    ("\u00f9\u00fa\u00fb\u00fc\u0169\u016b\u016d\u016f\u0171\u0173", "u"),
    ("\u00e7\u0107\u0109\u010b\u010d", "c"),
    ("\u00f1\u0144\u0146\u0148", "n"),
):
    for _c in _src:
        _SW_NORM[_c] = _dst

_SW_VERB_PREFIXES = ("hawata", "hatuta", "hamta", "hata", "nina", "una", "ana",
                     "tuna", "mna", "wana", "nili", "uli", "ali", "tuli", "mli",
                     "wali", "nita", "uta", "ata", "tuta", "mta", "wata", "nime",
                     "ume", "ame", "tume", "mme", "wame", "haku", "ku")
_SW_NOUN_PREFIXES = ("wa", "vi", "ki", "mi", "ma", "m")
_SW_SUFFIXES = ("ishwa", "esha", "isha", "ika", "ana", "eni", "ni", "wa", "a")


def swahili_normalize(term: str) -> str:
    return "".join(_SW_NORM.get(ch, ch) for ch in term)


def _strip_prefix(word: str, prefixes, margin: int) -> str:
    for p in prefixes:
        if len(word) > len(p) + margin and word.startswith(p):
            return word[len(p):]
    return word


def _strip_suffix_once(word: str) -> str:
    for s in _SW_SUFFIXES:
        if len(word) >= len(s) + 3 and word.endswith(s):
            return word[: -len(s)]
    return word


def swahili_stem(term: str) -> str:
    """SwahiliStemmer.stem (SwahiliStemmer.kt:18-45)."""
    if len(term) <= 3 or term != term.lower():
        return term
    word = _strip_prefix(term, _SW_VERB_PREFIXES, 3)
    word = _strip_prefix(word, _SW_NOUN_PREFIXES, 3)
    word = _strip_suffix_once(word)
    word = _strip_suffix_once(word)
    return word


def swahili_analyzer(
    stop_words=SWAHILI_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """SwahiliAnalyzer.createComponents (SwahiliAnalyzer.kt:32-43)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = swahili_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = swahili_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
