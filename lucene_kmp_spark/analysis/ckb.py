"""Sorani Kurdish analysis chain (``analysis/common/.../analysis/ckb/``).

* ``sorani_normalize`` — ``ckb/SoraniNormalizer.kt``: yeh/keheh/ae/heh/rreh
  unification, harakat + tatweel + format-char removal (ZWNJ merges a
  preceding heh into AE).
* ``sorani_stem`` — ``ckb/SoraniStemmer.kt``: light suffix cascade
  (postposition, possessive, ezafe, definite/indefinite, demonstrative).
* chain (``ckb/SoraniAnalyzer.kt`` ``createComponents``):
  StandardTokenizer -> SoraniNormalization -> LowerCase -> DecimalDigit ->
  Stop -> [keyword] -> SoraniStem.
"""
from __future__ import annotations

import unicodedata

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import _lower_simple, standard_tokenize

# SoraniAnalyzer.kt DEFAULT_STOPWORD_DATA
CKB_STOP_WORDS = frozenset((
    "و", "کە", "ی", "کرد", "ئەوەی", "سەر", "دوو", "هەروەها", "لەو",
    "دەکات", "چەند", "هەر", "ئەو", "ئەم", "من", "ئێمە", "تۆ", "ئێوە",
    "ئەوان", "بە", "پێ", "بەبێ", "بەدەم", "بەلای", "بەپێی", "بەرلە",
    "بەرەوی", "بەرەوە", "بەردەم", "بێ", "بێجگە", "بۆ", "دە", "تێ",
    "دەگەڵ", "دوای", "جگە", "لە", "لێ", "لەبەر", "لەبەینی", "لەبابەت",
    "لەبارەی", "لەباتی", "لەبن", "لەبرێتی", "لەدەم", "لەگەڵ", "لەلایەن",
    "لەناو", "لەنێو", "لەپێناوی", "لەرەتی", "لەرێ", "لەرێگا", "لەسەر",
    "لەژێر", "ناو", "نێوان", "پاش", "پێش", "وەک",
))

_DELETED = frozenset("ـًٌٍَُِّْ")


def sorani_normalize(term: str) -> str:
    buf = list(term)
    length = len(buf)
    i = 0
    while i < length:
        c = buf[i]
        if c in ("ي", "ى"):            # yeh forms -> FARSI YEH
            buf[i] = "ی"
        elif c == "ك":                       # KAF -> KEHEH
            buf[i] = "ک"
        elif c == "‌":                       # ZWNJ
            if i > 0 and buf[i - 1] == "ه":
                buf[i - 1] = "ە"
            del buf[i]
            length -= 1
            i -= 1
        elif c == "ه":                       # word-final HEH -> AE
            if i == length - 1:
                buf[i] = "ە"
        elif c == "ة":                       # TEH MARBUTA -> AE
            buf[i] = "ە"
        elif c == "ھ":                       # HEH DOACHASHMEE -> HEH
            buf[i] = "ه"
        elif c == "ر":                       # word-initial REH -> RREH
            if i == 0:
                buf[i] = "ڕ"
        elif c == "ڒ":                       # RREH-above -> RREH
            buf[i] = "ڕ"
        elif c in _DELETED:
            del buf[i]
            length -= 1
            i -= 1
        elif unicodedata.category(c) == "Cf":
            del buf[i]
            length -= 1
            i -= 1
        i += 1
    return "".join(buf)


def sorani_stem(word: str) -> str:
    """SoraniStemmer.kt suffix cascade (length guards are on the word as it
    shrinks, exactly as the reference mutates its buffer)."""
    w = word
    n = len(w)
    # postposition
    if n > 5 and w.endswith("دا"):
        w = w[:-2]
    elif n > 4 and w.endswith("نا"):
        w = w[:-1]
    elif n > 6 and w.endswith("ەوە"):
        w = w[:-3]
    n = len(w)
    # possessive pronoun
    if n > 6 and (w.endswith("مان") or w.endswith("یان") or w.endswith("تان")):
        w = w[:-3]
    n = len(w)
    # ezafe / definite / indefinite / demonstrative cascade
    if n > 6 and w.endswith("ێکی"):
        return w[:-3]
    if n > 7 and w.endswith("یەکی"):
        return w[:-4]
    if n > 5 and w.endswith("ێک"):
        return w[:-2]
    if n > 6 and w.endswith("یەک"):
        return w[:-3]
    if n > 6 and w.endswith("ەکە"):
        return w[:-3]
    if n > 5 and w.endswith("کە"):
        return w[:-2]
    if n > 7 and w.endswith("ەکان"):
        return w[:-4]
    if n > 6 and w.endswith("کان"):
        return w[:-3]
    if n > 7 and w.endswith("یانی"):
        return w[:-4]
    if n > 6 and w.endswith("انی"):
        return w[:-3]
    if n > 6 and w.endswith("یان"):
        return w[:-3]
    if n > 5 and w.endswith("ان"):
        return w[:-2]
    if n > 7 and w.endswith("یانە"):
        return w[:-4]
    if n > 6 and w.endswith("انە"):
        return w[:-3]
    if n > 5 and (w.endswith("ایە") or w.endswith("ەیە")):
        return w[:-2]
    if n > 4 and w.endswith("ە"):
        return w[:-1]
    if n > 4 and w.endswith("ی"):
        return w[:-1]
    return w


def sorani_analyzer(stop_words=None, stem_exclusions=()):
    stop = CKB_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text):
            term = decimal_digit_fold(_lower_simple(sorani_normalize(t.term)))
            if term in stop:
                continue
            if term not in excl:
                term = sorani_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
