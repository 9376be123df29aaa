"""Kannada analysis chain (``analysis/extra/.../analysis/kn/``).

* ``kannada_normalize`` — ``kn/KannadaNormalizer.kt``: script
  punctuation folds and ZWJ/ZWNJ removal.
* ``kannada_stem`` — ``kn/KannadaStemmer.kt``: first-match suffix strip
  (match requires len >= suffix + 2; results shorter than 2 rejected).
* ``kannada_analyzer`` — ``kn/KannadaAnalyzer.kt`` chain: StandardTokenizer ->
  LowerCase -> DecimalDigit -> [keyword] -> IndicNormalization ->
  KannadaNormalization -> Stop -> KannadaStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

KANNADA_STOP_WORDS = frozenset((
    "ಮತ್ತು", "ಅಥವಾ", "ಆದರೆ", "ಆದರೂ", "ಏಕೆಂದರೆ", "ಆದ್ದರಿಂದ", "ಆದಾಗ್ಯೂ", "ಈ",
    "ಆ", "ಇದು", "ಅದು", "ಇವು", "ಅವು", "ಇಲ್ಲಿ", "ಅಲ್ಲಿ", "ಎಲ್ಲಿ", "ಇಂದು",
    "ನಿನ್ನೆ", "ನಾಳೆ", "ಈಗ", "ನಂತರ", "ಮೊದಲು", "ಮೇಲೆ", "ಕೆಳಗೆ", "ಒಳಗೆ",
    "ಹೊರಗೆ", "ಮಧ್ಯೆ", "ನಾನು", "ನನ್ನ", "ನಾವು", "ನಮ್ಮ", "ನೀನು", "ನೀವು",
    "ನಿಮ್ಮ", "ಅವನು", "ಅವಳು", "ಅವರು", "ಅವರ", "ಅವನ", "ಅವಳ", "ಯಾರು", "ಯಾವ",
    "ಯಾವುದು", "ಯಾವಾಗ", "ಏನು", "ಏಕೆ", "ಹೇಗೆ", "ಎಂದು", "ಎಂಬ", "ಹಾಗೂ", "ಕೂಡ",
    "ಸಹ", "ಮಾತ್ರ", "ಎಲ್ಲಾ", "ಕೆಲವು", "ಒಂದು", "ಎರಡು", "ಹೆಚ್ಚು", "ಕಡಿಮೆ",
    "ಬಹಳ", "ತುಂಬಾ", "ಇದೆ", "ಇವೆ", "ಇದ್ದ", "ಇತ್ತು", "ಇಲ್ಲ", "ಅಲ್ಲ", "ಆಗಿದೆ",
    "ಆಗಿ", "ಆಗ", "ಮಾಡಿ", "ಮಾಡಿದ", "ಮಾಡುತ್ತದೆ", "ಮಾಡಲು",
))

_KN_SUFFIXES = (
    "ಗಳಿಂದಾಗಿ", "ಗಳಿಗಾಗಿ", "ಗಳೊಂದಿಗೆ", "ಗಳಲ್ಲಿನ", "ಗಳಲ್ಲಿ", "ಗಳಿಂದ",
    "ಗಳಿಗೆ", "ಗಳನ್ನು", "ಗಳನ್ನ", "ಗಳಾದ", "ಗಳ", "ಗಳು", "ರಿಗಾಗಿ",
    "ರಿಂದಾಗಿ", "ರೊಂದಿಗೆ", "ರಲ್ಲಿನ", "ರಲ್ಲಿ", "ರಿಂದ", "ರಿಗೆ", "ರನ್ನು",
    "ರಾದ", "ಯೊಂದಿಗೆ", "ಯಲ್ಲಿನ", "ಯಲ್ಲಿ", "ಯಿಂದ", "ಯಿಗೆ", "ಯನ್ನು",
    "ಯಾದ", "ದಲ್ಲಿನ", "ದಲ್ಲಿ", "ದಿಂದ", "ದಾಗಿ", "ದನ್ನು", "ದಾದ", "ನಿಗೆ",
    "ನಿಂದ", "ನಲ್ಲಿ", "ನನ್ನು", "ನಾದ", "ಕ್ಕಾಗಿ", "ಕ್ಕೆ", "ಗೆ", "ನ್ನು",
    "ನ್ನ", "ಲ್ಲಿ", "ದಿಂದ", "ಇಂದ", "ಯ", "ದ", "ರ",
)

_KN_DELETE = frozenset(("\u200d", "\u200c"))


def kannada_normalize(term: str) -> str:
    out = []
    prev_kn = False
    for c in term:
        if c == "\u0ce4":
            c = "\u0964"
        elif c == "\u0ce5":
            c = "\u0965"
        elif c == ":" and prev_kn:
            c = "\u0c83"
        if c in _KN_DELETE:
            continue
        out.append(c)
        prev_kn = "\u0c80" <= c <= "\u0cff"
    return "".join(out)


def kannada_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    for sfx in _KN_SUFFIXES:
        if len(word) >= len(sfx) + 2 and word.endswith(sfx):
            out = word[: -len(sfx)]
            return word if len(out) < 2 else out
    return word


def kannada_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = KANNADA_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = kannada_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = kannada_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
