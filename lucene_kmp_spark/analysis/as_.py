"""Assamese analysis chain (``analysis/extra/.../analysis/as/``).

* ``assamese_normalize`` — ``as/AssameseNormalizer.kt``: script
  punctuation folds and ZWJ/ZWNJ removal.
* ``assamese_stem`` — ``as/AssameseStemmer.kt``: first-match suffix strip
  (match requires len >= suffix + 2; results shorter than 2 rejected).
* ``assamese_analyzer`` — ``as/AssameseAnalyzer.kt`` chain: StandardTokenizer ->
  LowerCase -> DecimalDigit -> [keyword] -> IndicNormalization ->
  AssameseNormalization -> Stop -> AssameseStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

ASSAMESE_STOP_WORDS = frozenset((
    "আৰু", "বা", "অথবা", "এই", "এয়া", "এনে", "সেই", "সেয়া", "সি", "তেওঁ",
    "তেখেত", "মই", "আমি", "তুমি", "তোমাৰ", "আপুনি", "আপোনাৰ", "ই", "ইয়াৰ",
    "ইয়াত", "তাৰ", "তাত", "তাক", "যে", "যদি", "যেন", "যেতিয়া", "তেতিয়া",
    "কিন্তু", "তথাপি", "কাৰণ", "বাবে", "কাৰণে", "লাগি", "পৰা", "লৈ",
    "লগতে", "সৈতে", "মধ্যে", "ওপৰত", "তলত", "আগতে", "পিছত", "হয়", "হৈ",
    "হৈছে", "হৈছিল", "নহয়", "নাই", "আছে", "আছিল", "কৰা", "কৰি", "কৰে",
    "কৰিছে", "কৰিছিল", "কি", "কোন", "কিয়", "কেতিয়া", "কেনেকৈ", "কত",
    "সকলো", "বহু", "বেছি", "কম", "মাত্ৰ", "পুনৰ", "আজি", "কালি", "এতিয়া",
))

_AS_SUFFIXES = (
    "বিলাকৰ পৰা", "বিলাকলৈ", "বিলাকৰ", "বিলাকক", "বিলাকত", "বিলাক",
    "বোৰৰ পৰা", "বোৰলৈ", "বোৰৰ", "বোৰক", "বোৰত", "বোৰ", "সমূহৰ পৰা",
    "সমূহলৈ", "সমূহৰ", "সমূহক", "সমূহত", "সমূহ", "সকলৰ পৰা", "সকললৈ",
    "সকলৰ", "সকলক", "সকলত", "সকল", "কেইজনৰ", "কেইজনক", "কেইজন", "জনলৈ",
    "জনৰ", "জনক", "জনত", "জন", "খনলৈ", "খনৰ", "খনক", "খনত", "খন",
    "টোৰ", "টোক", "টোত", "টো", "টিৰ", "টিক", "টিত", "টি", "টাৰ", "টাক",
    "টাত", "টা", "লৈ", "ৰে", "ৰপৰা", "পৰা", "ত", "ক", "ৰ", "ে",
)

_AS_DELETE = frozenset(("\u200d", "\u200c"))


def assamese_normalize(term: str) -> str:
    out = []
    prev_bn = False
    for c in term:
        if c == "\u09f7":
            c = "\u0964"
        elif c == ":" and prev_bn:
            c = "\u0983"
        elif c == "\u09b0":
            c = "\u09f0"          # bengali ra -> assamese ra
        if c in _AS_DELETE:
            continue
        out.append(c)
        prev_bn = "\u0980" <= c <= "\u09ff"
    return "".join(out)


def assamese_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    for sfx in _AS_SUFFIXES:
        if len(word) >= len(sfx) + 2 and word.endswith(sfx):
            out = word[: -len(sfx)]
            return word if len(out) < 2 else out
    return word


def assamese_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = ASSAMESE_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = assamese_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = assamese_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
