"""Yoruba analysis chain (``analysis/extra/.../analysis/yo/``).

* ``yoruba_normalize`` — ``yo/YorubaNormalizer.kt``: combining tone marks
  dropped, Latin + dotted-letter folds (ẹ->e, ọ->o, ṣ->s, ...).
* ``yoruba_stem`` — ``yo/YorubaStemmer.kt``: 'n contraction strip,
  hyphen reduplication strip, i/a prefix strip before a consonant.
* chain (``yo/YorubaAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> YorubaNormalization -> Stop -> YorubaStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

YO_STOP_WORDS = frozenset((
    "#", "a", "an", "ati", "awon", "ba", "bere", "bi", "emi", "e", "fun",
    "fe", "gbogbo", "inu", "ju", "je", "kan", "ki", "ko", "lati", "le",
    "lo", "maa", "mi", "mo", "ni", "nigba", "nitori", "nkan", "nnkan", "o",
    "oun", "padà", "pada", "pe", "pelu", "pupo", "re", "si", "sinu", "se",
    "sugbon", "ti", "wa", "won", "yii",
))


_YO_MARKS = frozenset(("\u0300", "\u0301", "\u0304", "\u0307",
                       "\u0323"))
_YO_FOLD = str.maketrans({
    "\u2019": "'", "\u2018": "'", "\u201b": "'", "\u02b9": "'",
    "\u02bc": "'", "`": "'", "\u00b4": "'",
    "\u2010": "-", "\u2011": "-", "\u2012": "-", "\u2013": "-",
    "\u2014": "-", "\u2015": "-",
    "\u00e0": "a", "\u00e1": "a", "\u00e2": "a", "\u00e3": "a",
    "\u00e4": "a", "\u00e5": "a", "\u0101": "a", "\u0103": "a",
    "\u0105": "a",
    "\u00e8": "e", "\u00e9": "e", "\u00ea": "e", "\u00eb": "e",
    "\u0113": "e", "\u0115": "e", "\u0117": "e", "\u0119": "e",
    "\u011b": "e", "\u1eb9": "e",
    "\u00ec": "i", "\u00ed": "i", "\u00ee": "i", "\u00ef": "i",
    "\u0129": "i", "\u012b": "i", "\u012d": "i", "\u012f": "i",
    "\u1ecb": "i",
    "\u00f2": "o", "\u00f3": "o", "\u00f4": "o", "\u00f5": "o",
    "\u00f6": "o", "\u014d": "o", "\u014f": "o", "\u0151": "o",
    "\u1ecd": "o",
    "\u00f9": "u", "\u00fa": "u", "\u00fb": "u", "\u00fc": "u",
    "\u0169": "u", "\u016b": "u", "\u016d": "u", "\u016f": "u",
    "\u0171": "u", "\u0173": "u", "\u1ee5": "u",
    "\u00e7": "c", "\u0107": "c", "\u0109": "c", "\u010b": "c",
    "\u010d": "c",
    "\u00f1": "n", "\u0144": "n", "\u0146": "n", "\u0148": "n",
    "\u1e45": "n", "\u01f9": "n",
    "\u1e63": "s", "\u015f": "s", "\u015b": "s", "\u015d": "s",
    "\u0161": "s",
})
_YO_VOWELS = frozenset("aeiou")


def yoruba_normalize(term: str) -> str:
    return "".join(c for c in term if c not in _YO_MARKS).translate(_YO_FOLD)


def yoruba_stem(word: str) -> str:
    if len(word) <= 3 or word != word.lower():
        return word
    w = word
    if len(w) > 2 and w.endswith("'n"):
        w = w[:-2]
    hy = w.find("-")
    if 0 < hy < len(w) - 1 and w[:hy] == w[hy + 1:] and hy >= 3:
        w = w[:hy]
    for pre in ("i", "a"):
        if len(w) > len(pre) + 3 and w.startswith(pre):
            nxt = w[len(pre)]
            if "a" <= nxt <= "z" and nxt not in _YO_VOWELS:
                w = w[len(pre):]
                break
    return w


def yoruba_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = YO_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = yoruba_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = yoruba_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
