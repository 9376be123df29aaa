"""Arabic analysis chain (``analysis/common/.../analysis/ar/``).

* ``decimal_digit_fold`` — ``core/DecimalDigitFilter.kt``: any Unicode
  decimal digit folds to its ASCII 0-9 equivalent.
* ``arabic_normalize`` — ``ar/ArabicNormalizer.kt:25-85``: alef variants
  (madda / hamza above / hamza below) -> bare alef, dotless yeh -> yeh,
  teh marbuta -> heh; tatweel + harakat (fathatan/dammatan/kasratan/
  fatha/damma/kasra/shadda/sukun) deleted.
* ``arabic_stem`` — ``ar/ArabicStemmer.kt``: light stemming. FIRST matching
  prefix stripped (wa- needs length >= 4, others length >= prefix+2); then
  EVERY matching suffix stripped in list order (each needs >= 2 chars left).
* ``arabic_analyzer`` — ``ar/ArabicAnalyzer.kt:43-55`` chain:
  StandardTokenizer -> LowerCaseFilter -> DecimalDigitFilter ->
  StopFilter(arabic, UNNORMALIZED list — order matters, the stop check runs
  before normalization) -> [SetKeywordMarkerFilter] -> ArabicNormalization ->
  ArabicStemFilter. Stopword data: Jacques Savoy's BSD-licensed CLEF list.
"""

from __future__ import annotations

import unicodedata

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

ARABIC_STOP_WORDS = frozenset((
    "من", "ومن", "منها", "منه", "في", "وفي", "فيها", "فيه",
    "و", "ف", "ثم", "او", "أو", "ب", "بها", "به",
    "ا", "أ", "اى", "اي", "أي", "أى", "لا", "ولا",
    "الا", "ألا", "إلا", "لكن", "ما", "وما", "كما", "فما",
    "عن", "مع", "اذا", "إذا", "ان", "أن", "إن", "انها",
    "أنها", "إنها", "انه", "أنه", "إنه", "بان", "بأن", "فان",
    "فأن", "وان", "وأن", "وإن", "التى", "التي", "الذى", "الذي",
    "الذين", "الى", "الي", "إلى", "إلي", "على", "عليها", "عليه",
    "اما", "أما", "إما", "ايضا", "أيضا", "كل", "وكل", "لم",
    "ولم", "لن", "ولن", "هى", "هي", "هو", "وهى", "وهي",
    "وهو", "فهى", "فهي", "فهو", "انت", "أنت", "لك", "لها",
    "له", "هذه", "هذا", "تلك", "ذلك", "هناك", "كانت", "كان",
    "يكون", "تكون", "وكانت", "وكان", "غير", "بعض", "قد", "نحو",
    "بين", "بينما", "منذ", "ضمن", "حيث", "الان", "الآن", "خلال",
    "بعد", "قبل", "حتى", "عند", "عندما", "لدى", "جميع",
))


_ALEF = "\u0627"
_NORM_MAP = {
    "\u0622": _ALEF,  # alef madda
    "\u0623": _ALEF,  # alef hamza above
    "\u0625": _ALEF,  # alef hamza below
    "\u0649": "\u064A",  # dotless yeh -> yeh
    "\u0629": "\u0647",  # teh marbuta -> heh
}
_NORM_DELETE = frozenset("\u0640\u064B\u064C\u064D\u064E\u064F\u0650\u0651\u0652")

_PREFIXES = ("\u0627\u0644", "\u0648\u0627\u0644", "\u0628\u0627\u0644",
             "\u0643\u0627\u0644", "\u0641\u0627\u0644", "\u0644\u0644", "\u0648")
_SUFFIXES = ("\u0647\u0627", "\u0627\u0646", "\u0627\u062A", "\u0648\u0646",
             "\u064A\u0646", "\u064A\u0647", "\u064A\u0629", "\u0647",
             "\u0629", "\u064A")


def decimal_digit_fold(term: str) -> str:
    """DecimalDigitFilter.kt: fold every Unicode decimal digit to ASCII."""
    out = []
    for ch in term:
        d = unicodedata.digit(ch, None)
        out.append(chr(0x30 + d) if d is not None else ch)
    return "".join(out)


def arabic_normalize(term: str) -> str:
    return "".join(_NORM_MAP.get(ch, ch) for ch in term if ch not in _NORM_DELETE)


def arabic_stem(term: str) -> str:
    # stemPrefix: first match wins (ArabicStemmer.kt:36-43)
    for p in _PREFIXES:
        if len(term) >= (4 if len(p) == 1 else len(p) + 2) and term.startswith(p):
            term = term[len(p):]
            break
    # stemSuffix: every suffix in order (ArabicStemmer.kt:52-59)
    for s in _SUFFIXES:
        if len(term) >= len(s) + 2 and term.endswith(s):
            term = term[: -len(s)]
    return term


def arabic_analyzer(
    stop_words=ARABIC_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """ArabicAnalyzer.createComponents (ArabicAnalyzer.kt:43-55)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            if term in stop:  # unnormalized stop list, pre-normalization
                continue
            # ArabicNormalizationFilter is NOT keyword-aware (the reference's
            # own TODO at ArabicAnalyzer.kt:49); only the stem respects
            # exclusions (ArabicStemFilter keyword check)
            is_keyword = term in excl
            term = arabic_normalize(term)
            if not is_keyword:
                term = arabic_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
