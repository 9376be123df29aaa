"""Malayalam analysis chain (``analysis/extra/.../analysis/ml/``).

* ``malayalam_normalize`` — ``ml/MalayalamNormalizer.kt``: script
  punctuation folds and ZWJ/ZWNJ removal.
* ``malayalam_stem`` — ``ml/MalayalamStemmer.kt``: first-match suffix strip
  (match requires len >= suffix + 2; results shorter than 2 rejected).
* ``malayalam_analyzer`` — ``ml/MalayalamAnalyzer.kt`` chain: StandardTokenizer ->
  LowerCase -> DecimalDigit -> [keyword] -> IndicNormalization ->
  MalayalamNormalization -> Stop -> MalayalamStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

MALAYALAM_STOP_WORDS = frozenset((
    "ആണ്", "ആകുന്നു", "ആയിരുന്നു", "ആയി", "ഒരു", "ഈ", "ആ", "ഇത്", "അത്",
    "ഇവ", "അവ", "അവൻ", "അവൾ", "അവർ", "ഞാൻ", "നീ", "നിങ്ങൾ", "ഞങ്ങൾ",
    "നമ്മൾ", "എൻ", "എന്റെ", "നിന്റെ", "അവന്റെ", "അവളുടെ", "അവരുടെ", "ഇല്ല",
    "അല്ല", "ഉണ്ട്", "എന്ന്", "എന്ന", "എന്നാൽ", "എന്നും", "എങ്കിൽ",
    "അല്ലെങ്കിൽ", "മറ്റു", "മറ്റ്", "കൂടി", "മാത്രം", "വരെ", "മുതൽ",
    "കൂടെ", "പോലെ", "വേണ്ടി", "ശേഷം", "മുമ്പ്", "കാരണം", "അതുകൊണ്ട്",
    "പിന്നെ", "പക്ഷേ", "അതിനാൽ",
))

_ML_SUFFIXES = (
    "കളുടെ", "കളിൽനിന്ന്", "ങ്ങളിൽനിന്ന്", "ങ്ങളിൽ", "ങ്ങൾക്ക്",
    "ങ്ങൾക്ക്‌", "ങ്ങളോട്", "ങ്ങളാൽ", "ങ്ങളെ", "ങ്ങൾ", "മാരുടെ",
    "മാരിൽ", "മാർക്ക്", "മാരെ", "മാർ", "ത്തിനായി", "ത്തോട്", "ത്തിൽ",
    "ത്തിന്റെ", "ത്തിന്റേ", "ത്തിനു", "ത്തിന്", "ത്താൽ", "ക്കായി",
    "ക്കുള്ള", "ക്കുള്ളിൽ", "ക്കു", "ക്ക്", "യ്ക്ക്", "യോട്", "യോടെ",
    "യിൽ", "യുടെ", "യാൽ", "യെ", "കൊണ്ട്", "കുറിച്ച്", "വേണ്ടി", "പോലെ",
    "ശേഷം", "മുമ്പ്", "നിന്ന്", "ഇൽ", "ൽ", "ന്", "നെ", "ഓട്", "ആൽ",
    "കൾ", "കള്",
)

_ML_DELETE = frozenset(("\u200d", "\u200c"))


def malayalam_normalize(term: str) -> str:
    out = []
    for c in term:
        if c in _ML_DELETE:
            continue
        if c == "\u0d64":
            c = "\u0964"
        elif c == "\u0d65":
            c = "\u0965"
        out.append(c)
    return "".join(out)


def malayalam_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    for sfx in _ML_SUFFIXES:
        if len(word) >= len(sfx) + 2 and word.endswith(sfx):
            out = word[: -len(sfx)]
            return word if len(out) < 2 else out
    return word


def malayalam_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = MALAYALAM_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            term = indic_normalize(term)
            if not is_keyword:
                term = malayalam_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = malayalam_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
