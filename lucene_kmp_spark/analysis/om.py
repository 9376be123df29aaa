"""Oromo analysis chain (``analysis/horn/.../analysis/om/``).

* ``oromo_normalize`` — ``om/OromoNormalizer.kt``: apostrophe-variant
  unification.
* ``oromo_stem`` — ``om/OromoStemmer.kt``: irregular-lemma map, HornMorpho
  lexicon lookup (``horn.py``), then light suffix reduction.
* chain (``om/OromoAnalyzer.kt`` ``createComponents``):
  StandardTokenizer -> LowerCase -> DecimalDigit -> OromoNormalization ->
  Stop -> [keyword] -> OromoStem.
"""
from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.horn import oromo_lexicon_stem
from lucene_kmp_spark.analysis.standard import _lower_simple, standard_tokenize

# OromoAnalyzer.kt DEFAULT_STOPWORD_DATA
OM_STOP_WORDS = frozenset((
    "fi", "kan", "kun", "kana", "sun", "sana", "akka", "ani", "ati",
    "inni", "isheen", "nutti", "isin", "isaan", "keessatti", "irra",
    "gara", "waliin", "hin", "ni",
))

_OM_APOS = frozenset("’‘ʼ`´")

# OromoStemmer.kt companion
_OM_LEMMAS = {
    "afeeramaniiru": "afeeramuu",
    "dubbanne": "dubbachuu",
    "namoota": "nama",
    "manaan": "mana",
}
_OM_SUFFIXES = (
    "oota", "wwan", "leen", "tti", "irra", "iin", "aan", "een",
    "manii", "mani", "ani", "ne", "te", "tu", "ti", "ni", "n",
)


def oromo_normalize(term: str) -> str:
    return "".join("'" if c in _OM_APOS else c for c in term)


def _strip_suffix(word: str) -> str:
    for suffix in _OM_SUFFIXES:
        if len(word) > len(suffix) + 2 and word.endswith(suffix):
            return word[: -len(suffix)]
    return word


def _light_stem(word: str) -> str:
    out = _strip_suffix(_strip_suffix(word))
    return out if len(out) >= 3 else word


def oromo_stem(word: str) -> str:
    """OromoStemmer.stem precedence: irregular lemma, HornMorpho lexicon,
    light suffix reduction."""
    if len(word) <= 2:
        return word
    mapped = _OM_LEMMAS.get(word)
    if mapped is not None:
        return mapped
    return oromo_lexicon_stem(word) or _light_stem(word)


def oromo_analyzer(stop_words=None, stem_exclusions=()):
    stop = OM_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text):
            term = oromo_normalize(decimal_digit_fold(_lower_simple(t.term)))
            if term in stop:
                continue
            if term not in excl:
                term = oromo_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
