"""Sundanese analysis chain (``analysis/extra/.../analysis/su/``).

* ``sundanese_stem`` — ``su/SundaneseStemmer.kt``: plain prefix strip
  first, else nasal-prefix undoing, then one suffix strip.
* chain (``su/SundaneseAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> SundaneseNormalization (Latin folds, same
  table as Malay) -> Stop -> SundaneseStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as sundanese_normalize

SU_STOP_WORDS = frozenset((
    "#", "abdi", "acan", "aing", "anu", "antara", "aranjeunna", "atawa",
    "aya", "ayana", "ayeuna", "baheula", "bakal", "bari", "cekap", "cisa",
    "dina", "di", "dua", "duanana", "éta", "geus", "hadé", "handap",
    "hartina", "hartosna", "hayang", "hayu", "henteu", "hiji", "hoyong",
    "hungkul", "ieu", "iraha", "jadi", "janten", "jeung", "jumlah", "ka",
    "kadua", "kami", "kana", "kaayaan", "kahayang", "kali", "kieu",
    "kinilah", "kitu", "komo", "ku", "kumaha", "kukituna", "kuduna",
    "kedah", "kudu", "kuring", "lamun", "leutik", "leres", "loba",
    "mampuh", "margi", "anjeunna", "manehna", "maranéhna", "masalah",
    "masing-masing", "mastikeun", "métode", "metode", "mimiti", "mimitina",
    "na", "naha", "naon", "ngajadikeun", "ngadamel", "ngalakukeun",
    "ngomong", "ngarasa", "ngeunaan", "ngingetkeun", "ngingetan",
    "ngomong", "ngajelaskeun", "ngajawabna", "ngan", "ogé", "oké", "opat",
    "paling", "pasihan", "penting", "pisan", "pikeun", "punten", "rada",
    "rasa", "rék", "réngsé", "sabab", "sababaraha", "sakali", "sakumaha",
    "salaku", "sami", "sanajan", "sanes", "sangkan", "sarta", "saterusna",
    "sia", "siga", "sigana", "teh", "teu", "teras", "tibatan", "tina",
    "tujuanna", "tuh", "tungtung", "tungtungna", "upami", "urang",
    "wangsit", "waktosna", "anjeunna",
))


_SU_PREFIXES = ("pang", "pam", "pan", "nga", "di", "ka", "pa", "pi", "sa")
_SU_SUFFIXES = ("keun", "eun", "an", "na", "e")


def sundanese_stem(word: str) -> str:
    if len(word) <= 3 or word != word.lower():
        return word
    w = word
    stripped = False
    for pre in _SU_PREFIXES:
        if len(w) > len(pre) + 3 and w.startswith(pre):
            w = w[len(pre):]
            stripped = True
            break
    if not stripped:
        if len(w) >= 5 and w.startswith("ny"):
            w = "s" + w[2:]
        elif len(w) >= 5 and w.startswith("ng"):
            w = w[2:]
        elif len(w) > 4 and w.startswith("n"):
            w = "t" + w[1:]
        elif len(w) > 4 and w.startswith("m"):
            w = "p" + w[1:]
    for sfx in _SU_SUFFIXES:
        if len(w) >= len(sfx) + 3 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def sundanese_analyzer(stop_words=None, stem_exclusions=(),
                       max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = SU_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = sundanese_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = sundanese_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
