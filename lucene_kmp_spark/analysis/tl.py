"""Tagalog analysis chain (``analysis/extra/.../analysis/tl/``).

* ``tagalog_stem`` — ``tl/TagalogStemmer.kt``: 't/'y contraction strip,
  initial duplicated-vowel reduction, prefix strip (ma/pa/ka only before
  a consonant), um/in infix strip, CV reduplication strip, suffix strip.
* chain (``tl/TagalogAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> TagalogNormalization (curly quotes -> ')
  -> Stop -> TagalogStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

TL_STOP_WORDS = frozenset((
    "#", "akin", "aking", "ako", "alin", "am", "amin", "aming", "ang",
    "ano", "anumang", "apat", "at", "atin", "ating", "ay", "bababa",
    "bago", "bakit", "bawat", "bilang", "dahil", "dalawa", "dapat", "din",
    "dito", "doon", "gagawin", "gayunman", "ginagawa", "ginawa",
    "ginawang", "gumawa", "gusto", "habang", "hanggang", "hindi", "huwag",
    "iba", "ibaba", "ibabaw", "ibig", "ikaw", "ilagay", "ilalim", "ilan",
    "inyong", "isa", "isang", "itaas", "ito", "iyo", "iyon", "iyong", "ka",
    "kahit", "kailangan", "kailanman", "kami", "kanila", "kanilang",
    "kanino", "kanya", "kanyang", "kapag", "kapwa", "karamihan",
    "katiyakan", "katulad", "kaya", "kaysa", "ko", "kong", "kulang",
    "kumuha", "kung", "laban", "lahat", "lamang", "likod", "lima",
    "maaari", "maaaring", "maging", "mahusay", "makita", "marami",
    "marapat", "masyado", "may", "mayroon", "mga", "minsan", "mismo",
    "mula", "muli", "na", "nabanggit", "naging", "nagkaroon", "nais",
    "nakita", "namin", "napaka", "narito", "nasaan", "ng", "ngayon", "ni",
    "nila", "nilang", "nito", "niya", "niyang", "noon", "o", "pa", "paano",
    "pababa", "paggawa", "pagitan", "pagkakaroon", "pagkatapos", "palabas",
    "pamamagitan", "panahon", "pangalawa", "para", "paraan", "pareho",
    "pataas", "pero", "pumunta", "pumupunta", "sa", "saan", "sabi",
    "sabihin", "sarili", "sila", "sino", "siya", "tatlo", "tayo", "tulad",
    "tungkol", "una", "walang",
))


_TL_QUOTES = str.maketrans({"\u2019": "'", "\u2018": "'",
                            "\u201b": "'", "\u02b9": "'",
                            "\u02bc": "'"})
_TL_PREFIXES = ("pinag", "pagka", "naka", "maka", "pag", "mag", "nag",
                "ma", "pa", "ka")
_TL_SUFFIXES = ("han", "hin", "an", "in")
_TL_VOWELS = frozenset("aeiou")


def tagalog_normalize(term: str) -> str:
    return term.translate(_TL_QUOTES)


def _tl_consonant(c: str) -> bool:
    return "a" <= c <= "z" and c not in _TL_VOWELS


def tagalog_stem(word: str) -> str:
    if len(word) <= 2 or word != word.lower():
        return word
    w = word
    if len(w) > 2 and w.endswith(("'t", "'y")):
        w = w[:-2]
    if len(w) > 2 and w[0] == w[1] and w[0] in _TL_VOWELS:
        w = w[1:]
    for pre in _TL_PREFIXES:
        if len(w) > len(pre) + 2 and w.startswith(pre):
            if pre in ("ma", "pa", "ka"):
                if _tl_consonant(w[len(pre)]) and len(w) > len(pre) + 3:
                    w = w[len(pre):]
                    break
                continue
            w = w[len(pre):]
            break
    if len(w) > 3:
        if w.startswith(("um", "in")) and len(w) > 4:
            w = w[2:]
        elif _tl_consonant(w[0]) and len(w) > 4 and w[1:3] in ("um", "in"):
            w = w[0] + w[3:]
    hy = w.find("-")
    if 0 < hy < len(w) - 1 and w[:hy] == w[hy + 1:]:
        w = w[:hy]
    elif len(w) >= 4 and _tl_consonant(w[0]) and w[1] in _TL_VOWELS \
            and w[0] == w[2] and w[1] == w[3]:
        w = w[2:]
    for sfx in _TL_SUFFIXES:
        if len(w) > len(sfx) + 2 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def tagalog_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = TL_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = tagalog_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = tagalog_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
