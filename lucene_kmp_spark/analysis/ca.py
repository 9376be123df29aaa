"""Catalan analysis chain (``analysis/common/.../analysis/ca/``).

* ``catalan_stem`` — the reference's KMP-safe simplified CatalanStemmer
  (``snowball/ext/CatalanStemmer.kt`` — NOT the full snowball catalan
  algorithm; the reference replaced it with an accent-folding heuristic
  with a fixed exception list, and its tests pin that behavior).
* ``catalan_analyzer`` — ``ca/CatalanAnalyzer.kt:44-53`` chain:
  StandardTokenizer -> ElisionFilter(d/l/m/n/s/t) -> LowerCaseFilter ->
  StopFilter(catalan) -> [SetKeywordMarkerFilter] -> SnowballFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.fr import elision_strip
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

CATALAN_STOP_WORDS = frozenset((
    "a", "abans", "ací", "ah", "així", "això", "al", "als", "aleshores",
    "algun", "alguna", "algunes", "alguns", "alhora", "allà", "allí",
    "allò", "altra", "altre", "altres", "amb", "ambdós", "ambdues", "apa",
    "aquell", "aquella", "aquelles", "aquells", "aquest", "aquesta",
    "aquestes", "aquests", "aquí", "baix", "cada", "cadascú", "cadascuna",
    "cadascunes", "cadascuns", "com", "contra", "d'un", "d'una", "d'unes",
    "d'uns", "dalt", "de", "del", "dels", "des", "després", "dins",
    "dintre", "donat", "doncs", "durant", "e", "eh", "el", "els", "em",
    "en", "encara", "ens", "entre", "érem", "eren", "éreu", "es", "és",
    "esta", "està", "estàvem", "estaven", "estàveu", "esteu", "et", "etc",
    "ets", "fins", "fora", "gairebé", "ha", "han", "has", "havia", "he",
    "hem", "heu", "hi", "ho", "i", "igual", "iguals", "ja", "l'hi", "la",
    "les", "li", "li'n", "llavors", "m'he", "ma", "mal", "malgrat",
    "mateix", "mateixa", "mateixes", "mateixos", "me", "mentre", "més",
    "meu", "meus", "meva", "meves", "molt", "molta", "moltes", "molts",
    "mon", "mons", "n'he", "n'hi", "ne", "ni", "no", "nogensmenys",
    "només", "nosaltres", "nostra", "nostre", "nostres", "o", "oh", "oi",
    "on", "pas", "pel", "pels", "per", "però", "perquè", "poc", "poca",
    "pocs", "poques", "potser", "propi", "qual", "quals", "quan", "quant",
    "que", "què", "quelcom", "qui", "quin", "quina", "quines", "quins",
    "s'ha", "s'han", "sa", "semblant", "semblants", "ses", "seu", "seus",
    "seva", "seva", "seves", "si", "sobre", "sobretot", "sóc", "solament",
    "sols", "son", "són", "sons", "sota", "sou", "t'ha", "t'han", "t'he",
    "ta", "tal", "també", "tampoc", "tan", "tant", "tanta", "tantes",
    "teu", "teus", "teva", "teves", "ton", "tons", "tot", "tota", "totes",
    "tots", "un", "una", "unes", "uns", "us", "va", "vaig", "vam", "van",
    "vas", "veu", "vosaltres", "vostra", "vostre", "vostres",
))

# CatalanAnalyzer.DEFAULT_ARTICLES (CatalanAnalyzer.kt:66-69)
CATALAN_ARTICLES = frozenset(("d", "l", "m", "n", "s", "t"))

_CA_FOLD = str.maketrans({
    "\u00e0": "a", "\u00e1": "a", "\u00e8": "e", "\u00e9": "e",
    "\u00ec": "i", "\u00ed": "i", "\u00ef": "i", "\u00f2": "o",
    "\u00f3": "o", "\u00f9": "u", "\u00fa": "u", "\u00fc": "u",
})


def catalan_stem(term: str) -> str:
    """CatalanStemmer.stem (snowball/ext/CatalanStemmer.kt:13-37)."""
    if not term:
        return term
    s = term.replace("\u00b7", ".").translate(_CA_FOLD)
    if s.endswith("llengues"):
        return s[:-2]
    if s.endswith("llengua"):
        return s[:-1]
    if s.endswith("diccionari"):
        return s[:-3]
    if s.endswith("institut"):
        return s[:-4]
    if s.endswith("estudis"):
        return s[:-2]
    if s.endswith("catalans"):
        return s[:-1]
    if s.endswith("es") and len(s) > 4:
        return s[:-2]
    if s.endswith("s") and len(s) > 4:
        return s[:-1]
    if s.endswith("a") and len(s) > 4:
        return s[:-1]
    return s


def catalan_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """CatalanAnalyzer.createComponents (CatalanAnalyzer.kt:44-53)."""
    stop = CATALAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(elision_strip(t.term, CATALAN_ARTICLES))
            if term in stop:
                continue
            if term not in excl:
                term = catalan_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
