"""Belarusian analysis chain (``analysis/extra/.../analysis/be/``).

* ``belarusian_normalize`` — ``be/BelarusianNormalizer.kt``: combining
  breve/diaeresis composition (у+\u0306 -> ў, е+\u0308 -> ё), и -> і,
  quote/dash unification.
* ``belarusian_stem`` — ``be/BelarusianStemmer.kt``: first-match
  inflectional suffix strip (min stem 4).
* chain (``be/BelarusianAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> BelarusianNormalization -> Stop ->
  BelarusianStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

BE_STOP_WORDS = frozenset((
    "#", "а", "аб", "або", "але", "без", "бо", "больш", "было", "быў",
    "была", "былі", "быць", "ва", "вам", "вас", "вось", "вы", "гэта",
    "гэты", "гэтым", "да", "для", "дзе", "ён", "ёсць", "ж", "за", "з", "і",
    "калі", "каля", "майго", "мы", "на", "над", "нас", "не", "ні", "о",
    "па", "пад", "пасля", "перад", "пра", "пры", "сабе", "сябе", "таго",
    "так", "таксама", "там", "тая", "толькі", "той", "тое", "тут", "ты",
    "у", "ў", "усе", "усё", "хто", "ці", "што", "як", "я", "яго", "яе",
    "які", "яна", "яны",
))


_BE_SUFFIXES = (
    "\u044b\u043c\u0456", "\u0456\u043c\u0456", "\u0430\u0433\u0430",
    "\u044f\u0433\u0430", "\u043e\u0433\u0430", "\u0435\u043c\u0443",
    "\u0430\u043c\u0443", "\u043e\u043c\u0443", "\u0430\u043c\u0456",
    "\u044f\u043c\u0456", "\u0430\u0433\u043e", "\u044f\u043c\u0443",
    "\u044b\u0445", "\u0456\u0445", "\u0430\u0439", "\u043e\u0439",
    "\u0443\u044e", "\u044e\u044e", "\u0430\u044f", "\u044f\u044f",
    "\u0430\u0435", "\u043e\u0435", "\u044b\u044f", "\u0456\u044f",
    "\u0430\u0445", "\u044f\u0445", "\u0430\u043c", "\u044f\u043c",
    "\u0430\u045e", "\u043e\u045e", "\u0435\u045e", "\u0435\u0439",
    "\u0446\u0446\u0430", "\u0446\u044c", "\u0446\u0456",
    "\u043b\u0430", "\u043b\u0456", "\u043b\u043e", "\u0441\u044f",
    "\u0430", "\u0443", "\u044e", "\u044b", "\u0456", "\u0435",
    "\u044f",
)
_BE_QUOTES = str.maketrans({
    "\u2019": "'", "\u2018": "'", "\u201b": "'", "\u02b9": "'",
    "\u02bc": "'", "`": "'", "\u00b4": "'",
    "\u2010": "-", "\u2011": "-", "\u2012": "-", "\u2013": "-",
    "\u2014": "-", "\u2015": "-",
})


def belarusian_normalize(term: str) -> str:
    out = []
    i = 0
    while i < len(term):
        c = term[i]
        nxt = term[i + 1] if i + 1 < len(term) else ""
        if c == "\u0443" and nxt == "\u0306":
            out.append("\u045e")
            i += 2
            continue
        if c == "\u0423" and nxt == "\u0306":
            out.append("\u040e")
            i += 2
            continue
        if c == "\u0435" and nxt == "\u0308":
            out.append("\u0451")
            i += 2
            continue
        if c == "\u0415" and nxt == "\u0308":
            out.append("\u0401")
            i += 2
            continue
        if c == "\u0438":
            out.append("\u0456")
        elif c == "\u0418":
            out.append("\u0406")
        else:
            out.append(c.translate(_BE_QUOTES))
        i += 1
    return "".join(out)


def belarusian_stem(word: str) -> str:
    if len(word) <= 4 or word != word.lower():
        return word
    for sfx in _BE_SUFFIXES:
        if len(word) >= len(sfx) + 4 and word.endswith(sfx):
            return word[: -len(sfx)]
    return word


def belarusian_analyzer(stop_words=None, stem_exclusions=(),
                        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = BE_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = belarusian_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = belarusian_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
