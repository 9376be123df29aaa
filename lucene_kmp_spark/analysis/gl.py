"""Galician analysis chain (``analysis/common/.../analysis/gl/``).

* ``galician_stem`` — ``gl/GalicianStemmer.kt``: the RSLG stemmer ("Regras
  do lematizador para o galego", bvg.udc.es) over the published
  galician.rslp rules: plural, unification, adverb, repeated augmentative,
  noun-else-verb, vowel steps, then RSLG accent removal.
* ``galician_minimal_stem`` — ``gl/GalicianMinimalStemmer.kt``: only the
  Plural step (minimal plural stripper).
* ``galician_analyzer`` — ``gl/GalicianAnalyzer.kt:48-54`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(galician) ->
  [SetKeywordMarkerFilter] -> GalicianStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.galician_rslp import GALICIAN_RSLP
from lucene_kmp_spark.analysis.rslp import parse_rslp
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

GALICIAN_STOP_WORDS = frozenset((
    "a", "aínda", "alí", "aquel", "aquela", "aquelas", "aqueles",
    "aquilo", "aquí", "ao", "aos", "as", "así", "á", "ben", "cando", "che",
    "co", "coa", "comigo", "con", "connosco", "contigo", "convosco",
    "coas", "cos", "cun", "cuns", "cunha", "cunhas", "da", "dalgunha",
    "dalgunhas", "dalgún", "dalgúns", "das", "de", "del", "dela", "delas",
    "deles", "desde", "deste", "do", "dos", "dun", "duns", "dunha",
    "dunhas", "e", "el", "ela", "elas", "eles", "en", "era", "eran", "esa",
    "esas", "ese", "eses", "esta", "estar", "estaba", "está", "están",
    "este", "estes", "estiven", "estou", "eu", "é", "facer", "foi",
    "foron", "fun", "había", "hai", "iso", "isto", "la", "las", "lle",
    "lles", "lo", "los", "mais", "me", "meu", "meus", "min", "miña",
    "miñas", "moi", "na", "nas", "neste", "nin", "no", "non", "nos",
    "nosa", "nosas", "noso", "nosos", "nós", "nun", "nunha", "nuns",
    "nunhas", "o", "os", "ou", "ó", "ós", "para", "pero", "pode", "pois",
    "pola", "polas", "polo", "polos", "por", "que", "se", "senón", "ser",
    "seu", "seus", "sexa", "sido", "sobre", "súa", "súas", "tamén", "tan",
    "te", "ten", "teñen", "teño", "ter", "teu", "teus", "ti", "tido",
    "tiña", "tiven", "túa", "túas", "un", "unha", "unhas", "uns", "vos",
    "vosa", "vosas", "voso", "vosos", "vós",
))


_GL_STEPS = parse_rslp(GALICIAN_RSLP)
_GL_ACCENTS = str.maketrans({"\u00e1": "a", "\u00e9": "e", "\u00ea": "e",
                             "\u00ed": "i", "\u00f3": "o", "\u00fa": "u"})


def galician_stem(term: str) -> str:
    """GalicianStemmer.stem (GalicianStemmer.kt:39-72)."""
    w = _GL_STEPS["Plural"].apply(term)
    w = _GL_STEPS["Unification"].apply(w)
    w = _GL_STEPS["Adverb"].apply(w)
    while True:
        old = w
        w = _GL_STEPS["Augmentative"].apply(w)
        if w == old:
            break
    old = w
    w = _GL_STEPS["Noun"].apply(w)
    if w == old:
        w = _GL_STEPS["Verb"].apply(w)
    w = _GL_STEPS["Vowel"].apply(w)
    return w.translate(_GL_ACCENTS)


def galician_minimal_stem(term: str) -> str:
    """GalicianMinimalStemmer (Plural step only)."""
    return _GL_STEPS["Plural"].apply(term)


def galician_analyzer(stop_words=None, stem_exclusions=(),
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """GalicianAnalyzer.createComponents (GalicianAnalyzer.kt:48-54)."""
    stop = GALICIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(t.term)
            if term in stop:
                continue
            if term not in excl:
                term = galician_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
