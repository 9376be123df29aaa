"""Uzbek analysis chain (``analysis/extra/.../analysis/uz/``).

* ``uzbek_tokenize`` — ``uz/UzbekTokenizer.kt``: letter/digit runs that
  keep an inner apostrophe variant between letters (Oʻzbekiston stays
  one token).
* ``uzbek_normalize`` — ``uz/UzbekNormalizer.kt``: apostrophe variants
  -> ', dash unification, Latin diacritic folds.
* ``uzbek_stem`` — ``uz/UzbekStemmer.kt``: up to three rounds of
  longest-first suffix stripping (min stem 2).
* chain (``uz/UzbekAnalyzer.kt``): UzbekTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> UzbekNormalization -> Stop -> UzbekStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as _latin_fold

UZ_STOP_WORDS = frozenset((
    "#", "va", "ham", "yoki", "ammo", "lekin", "bilan", "uchun", "bu",
    "shu", "o'sha", "mana", "ana", "men", "sen", "u", "biz", "siz", "ular",
    "kim", "nima", "qachon", "qayerda", "qanday", "har", "bir", "hech",
    "barcha", "bor", "yo'q", "emas", "edi", "ekan", "bo'lgan", "bo'lib",
    "bo'ladi", "deb", "degan", "agar", "chunki", "shuning", "uchun",
))


_UZ_APOS = frozenset(("'", "\u02bb", "\u02bc", "\u2019", "\u2018",
                      "\u201b", "\u02b9", "`", "\u00b4", "\u02bd"))
_UZ_SUFFIXES = (
    "larimizdan", "laringizdan", "larimizga", "laringizga", "larining",
    "laridan", "larida", "larni", "larga", "larka", "larqa", "lar",
    "imizdan", "ingizdan", "imizga", "ingizga", "imizni", "ingizni",
    "imizda", "ingizda", "imiz", "ingiz", "ining", "sining", "ning",
    "idan", "sidan", "dan", "tan", "ida", "sida", "da", "ta", "ini",
    "sini", "ni", "iga", "siga", "ga", "ka", "qa", "im", "ing", "si",
    "i", "lik", "chi",
)


def uzbek_tokenize(text: str) -> list[str]:
    out = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isalnum():
            s = i
            i += 1
            while i < n:
                c = text[i]
                if c.isalnum():
                    i += 1
                    continue
                if c in _UZ_APOS and i + 1 < n and text[i - 1].isalpha() \
                        and text[i + 1].isalpha():
                    i += 1
                    continue
                break
            out.append(text[s:i])
        else:
            i += 1
    return out


def uzbek_normalize(term: str) -> str:
    term = "".join("'" if c in _UZ_APOS else c for c in term)
    return _latin_fold(term)


def uzbek_stem(word: str) -> str:
    if len(word) <= 2 or word != word.lower():
        return word
    w = word
    for _ in range(3):
        best = None
        for sfx in _UZ_SUFFIXES:
            if len(w) >= len(sfx) + 2 and w.endswith(sfx):
                best = sfx
                break
        if best is None:
            break
        w = w[: -len(best)]
    return word if w == word or len(w) < 2 else w


def uzbek_analyzer(stop_words=None, stem_exclusions=()):
    stop = UZ_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for pos, raw in enumerate(uzbek_tokenize(text)):
            term = decimal_digit_fold(_lower_simple(raw))
            is_keyword = term in excl
            if not is_keyword:
                term = uzbek_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = uzbek_stem(term)
            terms.append(term)
            positions.append(pos)
        return terms, positions, len(terms)

    return run
