"""Odia analysis chain (``analysis/extra/.../analysis/or/``).

* ``odia_normalize`` — ``or/OdiaNormalizer.kt``: script
  punctuation folds and ZWJ/ZWNJ removal.
* ``odia_stem`` — ``or/OdiaStemmer.kt``: first-match suffix strip
  (match requires len >= suffix + 2; results shorter than 2 rejected).
* ``odia_analyzer`` — ``or/OdiaAnalyzer.kt`` chain: StandardTokenizer ->
  LowerCase -> DecimalDigit -> [keyword] -> IndicNormalization ->
  OdiaNormalization -> Stop -> OdiaStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

ODIA_STOP_WORDS = frozenset((
    "।", "ଦେଇଛନ୍ତି", "ଲେଖାଏଁ", "ଜଣେ", "ଏହା", "ତେଣୁ", "ମିଳିଥାଏ", "ପାଇଁ",
    "ନେଉଛନ୍ତି", "ଯୋଗୁଁ", "ଏପର୍ଯ୍ୟନ୍ତ", "ଏଭଳି", "କରୁଛି", "ଓ", "ଯାଏଁ",
    "ହୋଇଛନ୍ତି", "କି", "କରାଯିବା", "ପରେ", "ଏହି", "ଏବଂ", "ଜଣ", "ଥିବା",
    "ହୋଇଥିଲା", "ତେବେ", "ଆଜି", "ଜଣଙ୍କ", "ଏଥି", "ଗତ", "ହୋଇଥିଲେ", "ହେଉଥିବା",
    "ଯୋଗେ", "ବୋଲି", "ଜଣାପଡ଼ିଛି", "ଦ୍ବାରା", "କରି", "ଯାଇ", "ଏନେଇ", "ଚାଲୁ",
    "ରହିଛି", "ତାରିଖ", "ମିଳିଛି", "ବର୍ଷୀୟ", "ଦିନତଳେ", "ସହ", "ଆସିଛନ୍ତି",
    "ମଧ୍ୟ", "କେଉଁ", "ହୋଇଯାଇଛି", "ନେଇଯାଇଛି", "କାମ", "କରିଛି", "ହେବା", "ଏବେ",
    "ହୋଇଛି", "ରଖି", "ନିଆଯାଇଥିବା", "ପର୍ଯ୍ୟନ୍ତ", "କରିଛନ୍ତି", "ଉପରେ", "ଦେଲେ",
    "ଥର", "ଆଉ",
))

_OR_SUFFIXES = (
    "ମାନଙ୍କର", "ମାନଙ୍କଠାରୁ", "ମାନଙ୍କୁ", "ମାନଙ୍କ", "ଗୁଡ଼ିକରେ",
    "ଗୁଡ଼ିକରେ", "ଗୁଡ଼ିକର", "ଗୁଡ଼ିକର", "ଗୁଡିକରେ", "ଗୁଡିକର", "ଗୁଡ଼ିକୁ",
    "ଗୁଡ଼ିକୁ", "ଗୁଡିକୁ", "ଗୁଡ଼ିକ", "ଗୁଡ଼ିକ", "ଗୁଡିକ", "ଙ୍କଠାରୁ", "ଠାରୁ",
    "ିବାକୁ", "ବାକୁ", "ିବାର", "ିବା", "ଛନ୍ତି", "ଥିଲା", "ମାନେ", "ଙ୍କର",
    "ଙ୍କୁ", "ଙ୍କ", "ଟିକୁ", "ଟିରେ", "ଟିର", "ରେ", "ରୁ", "କୁ", "ର", "ଟି",
    "ଟା",
)

_OR_DELETE = frozenset(("\u200d", "\u200c"))


def odia_normalize(term: str) -> str:
    out = []
    prev_or = False
    for c in term:
        if c == "\u0b64":
            c = "\u0964"
        elif c == "\u0b65":
            c = "\u0965"
        elif c == ":" and prev_or:
            c = "\u0b03"
        if c in _OR_DELETE:
            continue
        out.append(c)
        prev_or = "\u0b00" <= c <= "\u0b7f"
    return "".join(out)


def odia_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    for sfx in _OR_SUFFIXES:
        if len(word) >= len(sfx) + 2 and word.endswith(sfx):
            out = word[: -len(sfx)]
            return word if len(out) < 2 else out
    return word


def odia_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = ODIA_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = odia_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = odia_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
