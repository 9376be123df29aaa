"""Amharic analysis chain (``analysis/horn/.../analysis/am/``).

* ``amharic_normalize`` — ``am/AmharicNormalizer.kt``: conservative
  Ethiopic simplification (laryngeal/sibilant series folds).
* ``amharic_stem`` — ``am/AmharicStemmer.kt``: irregular-lemma map, light
  prefix/suffix strip with plural repair, then the HornMorpho lexicon
  lookup (``horn.py``).
* chain (``am/AmharicAnalyzer.kt`` ``createComponents``):
  StandardTokenizer -> LowerCase -> DecimalDigit -> AmharicNormalization ->
  Stop -> [keyword] -> AmharicStem.
"""
from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.horn import amharic_lexicon_stem
from lucene_kmp_spark.analysis.standard import _lower_simple, standard_tokenize

# AmharicAnalyzer.kt DEFAULT_STOPWORD_DATA
AM_STOP_WORDS = frozenset((
    "ነው", "ናቸው", "ነበር", "ነበሩ", "እና", "ወይም", "ግን", "እንደ", "ይህ", "ያ",
    "እኔ", "እኛ", "አንተ", "አንቺ", "እሱ", "እሷ", "እነሱ", "ላይ", "ውስጥ", "ከ",
    "ወደ", "ስለ",
))

# AmharicNormalizer.kt normalizeChar
_AM_NORM = {}
for _targets, _to in (
    ("ሃሐሓኃ", "ሀ"), ("ሑኁ", "ሁ"), ("ሒኂ", "ሂ"), ("ሔኄ", "ሄ"), ("ሕኅ", "ህ"),
    ("ሖኆ", "ሆ"), ("ሠ", "ሰ"), ("ሡ", "ሱ"), ("ሢ", "ሲ"), ("ሣ", "ሳ"),
    ("ሤ", "ሴ"), ("ሥ", "ስ"), ("ሦ", "ሶ"), ("ዐ", "አ"), ("ዑ", "ኡ"),
    ("ዒ", "ኢ"), ("ዓ", "ኣ"), ("ዔ", "ኤ"), ("ዕ", "እ"), ("ዖ", "ኦ"),
    ("ጸ", "ፀ"), ("ጹ", "ፁ"), ("ጺ", "ፂ"), ("ጻ", "ፃ"), ("ጼ", "ፄ"),
    ("ጽ", "ፅ"), ("ጾ", "ፆ"),
):
    for _c in _targets:
        _AM_NORM[_c] = _to

# AmharicStemmer.kt companion
_AM_LEMMAS = {
    "የማያስፈልጋትስ": "አስፈለገ",
    "አይደለችም": "ነው",
    "ይመጣሉ": "መጣ",
    "ቢያስጨንቁአቸው": "አስጨነቀ",
    "ለዘመዶቻችንም": "ዘመድ",
}
_AM_PREFIXES = ("እንደ", "የማይ", "ያል", "ለ", "በ", "ከ", "የ", "ስ", "እ")
_AM_SUFFIXES = (
    "ዎቻችንም", "ዎቻችን", "ዎችንም", "ዎችን", "ዎችም", "ዎች", "ቻችንም", "ቻችን",
    "ችንም", "ችን", "አቸው", "ቸው", "ችሁ", "ችህ", "ችሽ", "ችም", "ች", "ንም",
    "ን", "ም", "ስ",
)


def amharic_normalize(term: str) -> str:
    return "".join(_AM_NORM.get(c, c) for c in term)


def _strip_prefix(word: str) -> str:
    for prefix in _AM_PREFIXES:
        if len(word) > len(prefix) + 2 and word.startswith(prefix):
            return word[len(prefix):]
    return word


def _strip_suffix(word: str) -> str:
    for suffix in _AM_SUFFIXES:
        if len(word) > len(suffix) + 2 and word.endswith(suffix):
            return word[: -len(suffix)]
    return word


def _light_stem(word: str) -> str:
    out = _strip_prefix(word)
    out = _strip_suffix(_strip_suffix(out))
    if out.endswith("ፎ") and len(out) > 2:          # repairPluralStem
        out = out[:-1] + "ፍ"
    return out if len(out) >= 2 else word


def amharic_stem(word: str) -> str:
    """AmharicStemmer.stem precedence: irregular lemma, light stem (only if
    it changed the word), HornMorpho lexicon, else unchanged."""
    if len(word) <= 1:
        return word
    mapped = _AM_LEMMAS.get(word)
    if mapped is not None:
        return mapped
    light = _light_stem(word)
    if light != word:
        return light
    return amharic_lexicon_stem(word) or word


def amharic_analyzer(stop_words=None, stem_exclusions=()):
    stop = AM_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text):
            term = amharic_normalize(decimal_digit_fold(_lower_simple(t.term)))
            if term in stop:
                continue
            if term not in excl:
                term = amharic_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
