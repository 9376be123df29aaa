"""Javanese analysis chain (``analysis/extra/.../analysis/jv/``).

* ``javanese_stem`` — ``jv/JavaneseStemmer.kt``: nasal-prefix undoing
  (ny->s, ng->, n->t, m->p), plain prefix strip, suffix strip applied
  twice.
* chain (``jv/JavaneseAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> JavaneseNormalization (Latin folds, same
  table as Malay) -> Stop -> JavaneseStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as javanese_normalize

JV_STOP_WORDS = frozenset((
    "#", "ana", "aku", "kula", "sampeyan", "dheweke", "iki", "iku", "kuwi",
    "yaiku", "lan", "utawa", "ing", "karo", "saka", "kanggo", "menyang",
    "nanging", "amarga", "yen", "nalika", "dadi", "bakal", "arep", "ora",
    "dudu", "durung", "bisa", "saget", "kudu", "mesti", "mung", "banget",
    "luwih", "akeh", "kabeh", "kabèh", "saben", "saiki", "biyen", "banjur",
    "nganti", "teka", "kaya", "kepiye", "apa", "sapa", "napa", "pira",
    "pinten", "endi", "kene", "kono", "kene", "ngarep", "ngisor", "cedhak",
    "adoh", "anyar", "apik", "bener", "cukup", "pungkasan", "wiwitane",
    "mula", "mangkono", "tuladhane", "babagan", "antarane", "bagean",
    "prakara", "cara", "dina", "wulan", "taun", "wektu", "ujar", "ngomong",
    "takon", "menehi", "digunakake", "rampung", "miwiti", "ditambahake",
    "disebut", "disebutake", "dituduhake", "dibutuhake",
))


_JV_PREFIXES = ("dipun", "dak", "tak", "kok", "di", "ke", "ka", "sa",
                "se", "pa", "pi")
_JV_SUFFIXES = ("aken", "ake", "ane", "ipun", "ing", "an", "na", "ne", "i")
_JV_VOWELS = frozenset("aeiou")


def _jv_strip_suffix(w: str) -> str:
    for sfx in _JV_SUFFIXES:
        if len(w) >= len(sfx) + 3 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def javanese_stem(word: str) -> str:
    if len(word) <= 3 or word != word.lower():
        return word
    w = word
    # nasal prefix first, else plain prefixes
    if len(w) >= 5 and w.startswith("ny"):
        w = "s" + w[2:]
    elif len(w) >= 5 and w.startswith("ng"):
        w = w[2:]
    elif len(w) > 4 and w.startswith("n"):
        w = "t" + w[1:]
    elif len(w) > 4 and w.startswith("m"):
        w = "p" + w[1:]
    else:
        for pre in _JV_PREFIXES:
            if len(w) > len(pre) + 3 and w.startswith(pre):
                w = w[len(pre):]
                break
    w = _jv_strip_suffix(w)
    w = _jv_strip_suffix(w)
    return w


def javanese_analyzer(stop_words=None, stem_exclusions=(),
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = JV_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = javanese_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = javanese_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
