"""Ilocano analysis chain (``analysis/extra/.../analysis/ilo/``).

* ``ilocano_stem`` — ``ilo/IlocanoStemmer.kt``: prefix strip, um/in
  infix strip, reduplication strip (hyphen pair or repeated first three
  chars), suffix strip.
* chain (``ilo/IlocanoAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> IlocanoNormalization (Latin folds) ->
  Stop -> IlocanoStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as ilocano_normalize

ILO_STOP_WORDS = frozenset((
    "#", "a", "adda", "ak", "ako", "amin", "ania", "apay", "babaen", "da",
    "dagiti", "dayta", "daytoy", "di", "ditoy", "dita", "idi", "isu",
    "iti", "ka", "kada", "kadagiti", "kami", "kayo", "ken", "kenni", "ket",
    "ko", "laeng", "mi", "mo", "na", "nga", "ni", "no", "nu", "saan",
    "siak", "sika", "ti", "tayo", "wen", "wenno", "yo",
))


_ILO_PREFIXES = ("makapag", "nakapag", "mang", "nang", "panag", "pag",
                 "nag", "ag", "ma", "na", "pa")
_ILO_SUFFIXES = ("en", "an", "in")
_ILO_VOWELS = frozenset("aeiou")


def ilocano_stem(word: str) -> str:
    if len(word) <= 3 or word != word.lower():
        return word
    w = word
    for pre in _ILO_PREFIXES:
        if len(w) >= len(pre) + 3 and w.startswith(pre):
            w = w[len(pre):]
            break
    if len(w) > 4:
        if w.startswith(("um", "in")):
            w = w[2:]
        elif "a" <= w[0] <= "z" and w[0] not in _ILO_VOWELS \
                and len(w) > 5 and w[1:3] in ("um", "in"):
            w = w[0] + w[3:]
    hy = w.find("-")
    if 0 < hy < len(w) - 1 and w[:hy] == w[hy + 1:]:
        w = w[:hy]
    elif len(w) >= 6 and w[:3] == w[3:6]:
        w = w[3:]
    for sfx in _ILO_SUFFIXES:
        if len(w) >= len(sfx) + 3 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def ilocano_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = ILO_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = ilocano_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = ilocano_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
