"""Burmese analysis chain (``analysis/extra/.../analysis/my/``).

* ``burmese_tokenize`` — ``my/BurmeseTokenizer.kt``: Myanmar digit runs,
  Myanmar syllable segmentation (break before a base letter unless after
  virama or before asat), with grammatical particles split off
  longest-first; other letter/digit runs lowercased.
* ``burmese_normalize`` — ``my/BurmeseNormalizer.kt``: zero-width chars
  removed, Myanmar digits -> latin, section marks dropped, quote/dash
  unification.
* ``burmese_stem`` — ``my/BurmeseStemmer.kt``: first-match particle
  suffix strip (match requires len > suffix + 1).
* chain (``my/BurmeseAnalyzer.kt``): BurmeseTokenizer -> DecimalDigit ->
  [keyword] -> BurmeseNormalization -> Stop -> BurmeseStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold

BURMESE_STOP_WORDS = frozenset((
    "#", "က", "ကို", "မှာ", "တွင်", "မှ", "နဲ့", "နှင့်", "၏", "သည်",
    "တဲ့", "သော", "တွေ", "များ", "တို့", "အတွက်", "ကြောင့်", "ကတည်းက",
    "ပါ", "မ", "လည်း", "ပဲ", "သာ", "တော့", "သူ", "သူတို့", "ငါ",
    "ကျွန်တော်", "ကျွန်မ", "ဒီ", "ဒါ", "ဟို", "အဲဒီ", "ရှိ", "ဖြစ်",
    "မဟုတ်", "ပြီး", "ပြီးတော့",
))


_MY_PARTICLES = tuple(sorted((
    "ကတည်းက", "အတွက်", "ကြောင့်", "တွင်", "တွေ", "များ", "တို့", "သည်",
    "တဲ့", "သော", "နှင့်", "နဲ့", "မှာ", "မှ", "ကို", "က", "၏", "ပါ",
    "လည်း", "ပဲ", "သာ", "တော့",
), key=len, reverse=True))
_MY_SUFFIXES = ("ကတည်းက", "အတွက်", "ကြောင့်", "များ", "တွေ", "တို့",
                "တွင်", "သည်", "သော", "တဲ့", "နှင့်", "နဲ့", "မှာ", "မှ",
                "ကို", "က", "၏", "ပါ")
_ASAT = "\u103a"
_VIRAMA = "\u1039"
_MY_ZW = frozenset(("\u200b", "\u200c", "\u200d", "\ufeff"))
_MY_DIGITS = str.maketrans("\u1040\u1041\u1042\u1043\u1044\u1045\u1046\u1047\u1048\u1049",
                           "0123456789")
_MY_QUOTES = str.maketrans({
    "\u2019": "'", "\u2018": "'", "\u201b": "'", "\u02b9": "'",
    "\u02bc": "'", "`": "'", "\u00b4": "'",
    "\u2010": "-", "\u2011": "-", "\u2012": "-", "\u2013": "-",
    "\u2014": "-", "\u2015": "-",
})


def _my_char(c: str) -> bool:
    return ("\u1000" <= c <= "\u109f" or "\uaa60" <= c <= "\uaa7f"
            or "\ua9e0" <= c <= "\ua9ff")


def _my_digit(c: str) -> bool:
    return ("\u1040" <= c <= "\u1049" or "\u1090" <= c <= "\u1099"
            or "\ua9f0" <= c <= "\ua9f9")


def _my_base(c: str) -> bool:
    return ("\u1000" <= c <= "\u102a" or c == "\u103f"
            or "\u1050" <= c <= "\u1055" or "\u105a" <= c <= "\u105d"
            or c == "\u1061" or "\u1065" <= c <= "\u1066"
            or "\u106e" <= c <= "\u1070" or "\u1075" <= c <= "\u1081"
            or c == "\u108e" or "\uaa60" <= c <= "\uaa6f"
            or "\ua9e0" <= c <= "\ua9e4")


def _my_segment_run(text: str, start: int, end: int, out: list[str]):
    i = start
    while i < end:
        matched = False
        for particle in _MY_PARTICLES:
            j = i + len(particle)
            if j <= end and text[i:j] == particle:
                out.append(particle)
                i = j
                matched = True
                break
        if matched:
            continue
        j = i + 1
        while j < end:
            c = text[j]
            if _my_base(c) and text[j - 1] != _VIRAMA and not (
                    j + 1 < len(text) and text[j + 1] == _ASAT):
                break
            j += 1
        out.append(text[i:j])
        i = j


def burmese_tokenize(text: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if _my_digit(c):
            j = i + 1
            while j < n and _my_digit(text[j]):
                j += 1
            out.append(text[i:j])
            i = j
        elif _my_char(c):
            j = i + 1
            while j < n and _my_char(text[j]):
                j += 1
            _my_segment_run(text, i, j, out)
            i = j
        elif c.isalnum():
            j = i + 1
            while j < n and text[j].isalnum():
                j += 1
            out.append(text[i:j].lower())
            i = j
        else:
            i += 1
    return out


def burmese_normalize(term: str) -> str:
    term = "".join(c for c in term if c not in _MY_ZW
                   and c not in ("\u104a", "\u104b"))
    return term.translate(_MY_DIGITS).translate(_MY_QUOTES)


def burmese_stem(word: str) -> str:
    if len(word) <= 1:
        return word
    for sfx in _MY_SUFFIXES:
        if len(word) > len(sfx) + 1 and word.endswith(sfx):
            return word[: -len(sfx)]
    return word


def burmese_analyzer(stop_words=None, stem_exclusions=()):
    stop = BURMESE_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for pos, raw in enumerate(burmese_tokenize(text)):
            term = decimal_digit_fold(raw)
            is_keyword = term in excl
            if not is_keyword:
                term = burmese_normalize(term)
            if not term or term in stop:
                continue
            if not is_keyword:
                term = burmese_stem(term)
            terms.append(term)
            positions.append(pos)
        return terms, positions, len(terms)

    return run
