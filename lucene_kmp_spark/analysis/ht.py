"""Haitian Creole analysis chain (``analysis/extra/.../analysis/ht/``).

* ``haitian_normalize`` — ``ht/HaitianCreoleNormalizer.kt``: Latin folds
  plus pronoun clitic stripping (m'/w'/l'/n'/y'/k' prefixes, 'm/'w/'l/
  'n/'y suffixes).
* ``haitian_stem`` — ``ht/HaitianCreoleStemmer.kt``: -man suffix strip.
* chain (``ht/HaitianCreoleAnalyzer.kt``): StandardTokenizer ->
  LowerCase -> DecimalDigit -> [keyword] -> Normalization -> Stop -> Stem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as _latin_fold

HT_STOP_WORDS = frozenset((
    "#", "#", "a", "ak", "al", "an", "ankò", "anko", "ap", "avèk", "avek",
    "e", "epi", "eske", "gen", "ki", "kijan", "koman", "kòman", "la",
    "lan", "li", "l", "le", "m", "map", "m'ap", "men", "mwen", "n", "nan",
    "ni", "nou", "ou", "p", "pa", "pou", "pral", "sa", "se", "si", "sou",
    "ta", "tap", "te", "va", "w", "wi", "y", "ye", "yo", "yon", "youn",
))


_HT_PREFIX_CLITICS = ("m'", "w'", "l'", "n'", "y'", "k'")
_HT_SUFFIX_CLITICS = ("'m", "'w", "'l", "'n", "'y")


def haitian_normalize(term: str) -> str:
    w = _latin_fold(term)
    for pre in _HT_PREFIX_CLITICS:
        if len(w) > len(pre) + 1 and w.startswith(pre):
            return w[len(pre):]
    for sfx in _HT_SUFFIX_CLITICS:
        if len(w) > len(sfx) + 1 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def haitian_stem(word: str) -> str:
    if len(word) <= 4 or word != word.lower():
        return word
    if len(word) > 6 and word.endswith("man"):
        return word[:-3]
    return word


def haitian_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = HT_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = haitian_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = haitian_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
