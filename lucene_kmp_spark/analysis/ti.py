"""Tigrinya analysis chain (``analysis/extra/.../analysis/ti/``).

* ``tigrinya_normalize`` — ``ti/TigrinyaNormalizer.kt``: Ge'ez
  homophone folds (ሐ-series -> ሀ-series, ሠ -> ሰ, ዐ -> አ, ፀ -> ጸ, ...),
  quote/dash unification.
* ``tigrinya_stem`` — ``ti/TigrinyaStemmer.kt``: first-match suffix
  strip (min stem 3).
* chain (``ti/TigrinyaAnalyzer.kt``): StandardTokenizer -> LowerCase ->
  DecimalDigit -> [keyword] -> TigrinyaNormalization -> Stop ->
  TigrinyaStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

TI_STOP_WORDS = frozenset((
    "#", "ሀደ", "ሓደ", "ሕጂ", "ምስ", "ምእንቲ", "ምኽንያቱ", "ምኽንያት", "ስለ", "ቅድሚ",
    "ብ", "ብዛዕባ", "በቲ", "በታ", "በቶም", "በተን", "ነቲ", "ነታ", "ነቶም", "ነተን", "ን",
    "ንሕና", "ንሱ", "ንሳ", "ንሳቶም", "ንስኺ", "ንስኻ", "ንስኻትኩም", "ንስኻትክን", "ንስኽን",
    "ንስኹም", "ናብ", "ናይ", "ኣብ", "ኣብቲ", "ኣብታ", "ኣብቶም", "ኣብተን", "ኣብዚ", "ኣብዛ",
    "ኣብዞም", "ኣብዘን", "ኣነ", "ኣይ", "እቲ", "እታ", "እቶም", "እተን", "እንተ", "እኳ",
    "እወ", "እዚ", "እዛ", "እዞም", "እዘን", "እዩ", "እያ", "እየ", "እዮም", "እየን", "ከም",
    "ከምዚ", "ከምዛ", "ከምኡ", "ከኣ", "ኩሉ", "ኩላ", "ኩሎም", "ኩለን", "ካብ", "ካብቲ",
    "ካብታ", "ካብቶም", "ካብተን", "ወይ", "ዘይ", "ዝ", "ድሕሪ", "ግን", "፣", "።",
))


_TI_FOLD = str.maketrans({
    "\u1203": "\u1200", "\u1210": "\u1200", "\u1213": "\u1200",
    "\u1280": "\u1200", "\u1283": "\u1200", "\u12bb": "\u1200",
    "\u1211": "\u1201", "\u1281": "\u1201",
    "\u1212": "\u1202", "\u1282": "\u1202",
    "\u1214": "\u1204", "\u1284": "\u1204",
    "\u1215": "\u1205", "\u1285": "\u1205",
    "\u1216": "\u1206", "\u1286": "\u1206",
    "\u1220": "\u1230", "\u1221": "\u1231", "\u1222": "\u1232",
    "\u1223": "\u1233", "\u1224": "\u1234", "\u1225": "\u1235",
    "\u1226": "\u1236",
    "\u12c9": "\u12cd", "\u12ce": "\u12c8",
    "\u12d0": "\u12a0", "\u12d3": "\u12a0", "\u12d1": "\u12a1",
    "\u12d2": "\u12a2", "\u12d4": "\u12a4", "\u12d5": "\u12a5",
    "\u12d6": "\u12a6",
    "\u1338": "\u1338",
    "\u1340": "\u1338", "\u1341": "\u1339", "\u1342": "\u133a",
    "\u1343": "\u133b", "\u1344": "\u133c", "\u1345": "\u133d",
    "\u1346": "\u133e",
    "\u2019": "'", "\u2018": "'", "\u201b": "'", "\u02b9": "'",
    "\u02bc": "'", "`": "'", "\u00b4": "'",
    "\u2010": "-", "\u2011": "-", "\u2012": "-", "\u2013": "-",
    "\u2014": "-", "\u2015": "-",
})
_TI_SUFFIXES = ("\u1273\u1275", "\u12b9\u121d", "\u12bd\u1295",
                "\u12a9\u121d", "\u12ad\u1295",
                "\u120d\u12a9\u121d", "\u120d\u12ad\u1295",
                "\u1208\u12ed", "\u120d\u12ab", "\u120d\u12aa",
                "\u12a3\u1275", "\u12a6\u121d", "\u12a4\u1295",
                "\u12ce\u121d", "\u12c8\u1295", "\u1293", "\u12bb",
                "\u12ba", "\u12ab", "\u12aa", "\u120b")


def tigrinya_normalize(term: str) -> str:
    return term.translate(_TI_FOLD)


def tigrinya_stem(word: str) -> str:
    if len(word) <= 3:
        return word
    for sfx in _TI_SUFFIXES:
        if len(word) >= len(sfx) + 3 and word.endswith(sfx):
            return word[: -len(sfx)]
    return word


def tigrinya_analyzer(stop_words=None, stem_exclusions=(),
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = TI_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            if not is_keyword:
                term = tigrinya_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = tigrinya_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
