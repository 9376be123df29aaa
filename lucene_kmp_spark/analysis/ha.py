"""Hausa analysis chain (``analysis/extra/.../analysis/ha/``).

* ``hausa_normalize`` — ``ha/HausaNormalizer.kt``: the shared Latin fold
  plus hooked-letter folds (ɓ->b, ɗ->d, ƙ->k).
* ``hausa_stem`` — ``ha/HausaStemmer.kt``: prefix strip then suffix strip.
* chain (``ha/HausaAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> HausaNormalization -> Stop -> HausaStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as _latin_fold

HA_STOP_WORDS = frozenset((
    "#", "a", "amma", "ba", "ban", "ce", "cikin", "da", "don", "ga", "in",
    "ina", "ita", "ji", "ka", "ko", "kuma", "lokacin", "ma", "mai", "na",
    "ne", "ni", "sai", "shi", "su", "suka", "sun", "ta", "tafi", "take",
    "tana", "wani", "wannan", "wata", "ya", "yake", "yana", "yi", "za",
))


_HA_HOOKS = str.maketrans({"\u0253": "b", "\u0257": "d", "\u0199": "k"})
_HA_PREFIXES = ("na", "ta", "ya", "ba", "an")
_HA_SUFFIXES = ("wa", "ce", "shi", "su", "n", "r")


def hausa_normalize(term: str) -> str:
    return _latin_fold(term).translate(_HA_HOOKS)


def hausa_stem(word: str) -> str:
    if len(word) <= 3 or word != word.lower():
        return word
    w = word
    for pre in _HA_PREFIXES:
        if len(w) > len(pre) + 3 and w.startswith(pre):
            w = w[len(pre):]
            break
    for sfx in _HA_SUFFIXES:
        if len(w) >= len(sfx) + 3 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def hausa_analyzer(stop_words=None, stem_exclusions=(),
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = HA_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = hausa_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = hausa_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
