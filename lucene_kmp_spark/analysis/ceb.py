"""Cebuano analysis chain (``analysis/extra/.../analysis/ceb/``).

* ``cebuano_stem`` — ``ceb/CebuanoStemmer.kt``: 'g/'y/'ng contraction
  strip, nasal prefix undoing (mang/pang, man/pan -> t, mam/pam -> p)
  else plain prefix strip, um/in infix strip, reduplication strip,
  suffix strip applied twice.
* chain (``ceb/CebuanoAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> CebuanoNormalization (Latin folds, same
  table as Malay) -> Stop -> CebuanoStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.ms import malay_normalize as cebuano_normalize

CEB_STOP_WORDS = frozenset((
    "#", "ako", "akong", "alag", "alang", "ambot", "ang", "ania", "ano",
    "apan", "aron", "asa", "ayaw", "ba", "bag-o", "bahin", "bisan",
    "bitaw", "di", "diha", "dili", "dinhi", "dinha", "dito", "dunay",
    "gikan", "gihapon", "gud", "gyud", "ha", "hain", "hangtod", "ikaw",
    "ila", "ilang", "imo", "imong", "ingon", "intawon", "inyong", "isa",
    "iya", "iyang", "ka", "kada", "kadtong", "kaha", "kami", "kamo",
    "kanako", "kanang", "kanato", "kanila", "kaniya", "kaniadto", "kanimo",
    "kaninyo", "karon", "katong", "kay", "kini", "kita", "ko", "kun",
    "kung", "kuno", "lagi", "lang", "mao", "man", "mas", "matag", "may",
    "mi", "mga", "mo", "na", "nag", "nga", "ngano", "ni", "nia", "nila",
    "nilang", "nimo", "ninyo", "niya", "niyang", "nuon", "o", "og", "pa",
    "pag", "panahon", "para", "pay", "ra", "rehiyon", "sa", "samtang",
    "si", "sila", "siya", "ta", "tanan", "tungod", "ug", "unsa", "usa",
    "wala", "walay", "#", "departamento", "pransiya",
))


_CEB_PREFIXES = ("ginapang", "gipang", "ginapa", "gina", "gim", "gin",
                 "ging", "nagpa", "magpa", "maka", "naka", "nipa", "nag",
                 "mag", "pag", "gim", "gin", "gi", "mi", "ni", "mo", "na")
_CEB_SUFFIXES = ("hanan", "anan", "han", "hon", "non", "onon", "on",
                 "an", "ha", "hi", "a", "i")
_CEB_VOWELS = frozenset("aeiou")


def _ceb_consonant(c: str) -> bool:
    return "a" <= c <= "z" and c not in _CEB_VOWELS


def _ceb_strip_suffix(w: str) -> str:
    for sfx in _CEB_SUFFIXES:
        if len(w) > len(sfx) + 3 and w.endswith(sfx):
            return w[: -len(sfx)]
    return w


def cebuano_stem(word: str) -> str:
    if len(word) <= 3 or word != word.lower():
        return word
    w = word
    if len(w) > 3 and w.endswith(("'g", "'y")):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("'ng"):
        w = w[:-3]
    # nasal prefixes first, else plain prefixes
    if len(w) >= 6 and w.startswith(("mang", "pang")):
        w = w[4:]
    elif len(w) >= 5 and w.startswith(("man", "pan")):
        w = "t" + w[3:]
    elif len(w) >= 5 and w.startswith(("mam", "pam")):
        w = "p" + w[3:]
    else:
        for pre in _CEB_PREFIXES:
            if len(w) > len(pre) + 3 and w.startswith(pre):
                w = w[len(pre):]
                break
    if len(w) > 4:
        if w.startswith(("um", "in")):
            w = w[2:]
        elif _ceb_consonant(w[0]) and len(w) > 5 and w[1:3] in ("um", "in"):
            w = w[0] + w[3:]
    hy = w.find("-")
    if 0 < hy < len(w) - 1 and w[:hy] == w[hy + 1:]:
        w = w[:hy]
    elif len(w) >= 4 and _ceb_consonant(w[0]) and w[1] in _CEB_VOWELS \
            and w[0] == w[2] and w[1] == w[3]:
        w = w[2:]
    w = _ceb_strip_suffix(w)
    w = _ceb_strip_suffix(w)
    return w


def cebuano_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = CEB_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = cebuano_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = cebuano_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
