"""Serbian analysis chain (``analysis/common/.../analysis/sr/``).

* ``serbian_stem`` — the reference's KMP-safe simplified SerbianStemmer
  (``snowball/ext/SerbianStemmer.kt`` — a fixed first-match suffix table,
  NOT the full snowball serbian algorithm; the reference's tests pin it).
* ``serbian_normalize`` — ``sr/SerbianNormalizationFilter.kt``: Cyrillic ->
  Latin, then diacritics removed to "bald" Latin (đ -> dj, љ -> lj,
  њ -> nj, џ -> dz; ž/š/č/ć folded).
* ``serbian_analyzer`` — ``sr/SerbianAnalyzer.kt:73-83`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(serbian) ->
  [SetKeywordMarkerFilter] -> SnowballFilter -> SerbianNormalizationFilter
  (normalization runs AFTER stemming and is not keyword-aware).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

SERBIAN_STOP_WORDS = frozenset((
    "i", "ili", "a", "ali", "pa", "biti", "ne", "jesam", "sam", "jesi",
    "si", "je", "jesmo", "smo", "jeste", "ste", "jesu", "su", "nijesam",
    "nisam", "nijesi", "nisi", "nije", "nijesmo", "nismo", "nijeste",
    "niste", "nijesu", "nisu", "budem", "budeš", "bude", "budemo",
    "budete", "budu", "budes", "bih", "bi", "bismo", "biste", "biše",
    "bise", "bio", "bili", "budimo", "budite", "bila", "bilo", "bile",
    "ću", "ćeš", "će", "ćemo", "ćete", "neću", "nećeš", "neće", "nećemo",
    "nećete", "cu", "ces", "ce", "cemo", "cete", "necu", "neces", "nece",
    "necemo", "necete", "mogu", "možeš", "može", "možemo", "možete",
    "mozes", "moze", "mozemo", "mozete", "и", "или", "а", "али", "па",
    "бити", "не", "јесам", "сам", "јеси", "си", "је", "јесмо", "смо",
    "јесте", "сте", "јесу", "су", "нијесам", "нисам", "нијеси", "ниси",
    "није", "нијесмо", "нисмо", "нијесте", "нисте", "нијесу", "нису",
    "будем", "будеш", "буде", "будемо", "будете", "буду", "будес", "бих",
    "би", "бисмо", "бисте", "бише", "бисе", "био", "били", "будимо",
    "будите", "била", "било", "биле", "ћу", "ћеш", "ће", "ћемо", "ћете",
    "нећу", "нећеш", "неће", "нећемо", "нећете", "цу", "цес", "це", "цемо",
    "цете", "нецу", "нецес", "неце", "нецемо", "нецете", "могу", "можеш",
    "може", "можемо", "можете", "мозес", "мозе", "моземо", "мозете",
))


_SR_MAP = {
    "\u0430": "a", "\u0431": "b", "\u0432": "v", "\u0433": "g",
    "\u0434": "d", "\u0435": "e", "\u0436": "z", "\u0437": "z",
    "\u0438": "i", "\u0458": "j", "\u043a": "k", "\u043b": "l",
    "\u043c": "m", "\u043d": "n", "\u043e": "o", "\u043f": "p",
    "\u0440": "r", "\u0441": "s", "\u0442": "t", "\u0443": "u",
    "\u0444": "f", "\u0445": "h", "\u0446": "c", "\u0447": "c",
    "\u045b": "c", "\u0448": "s", "\u0452": "dj", "\u0111": "dj",
    "\u0459": "lj", "\u045a": "nj", "\u045f": "dz", "\u017e": "z",
    "\u010d": "c", "\u0107": "c", "\u0161": "s",
}
_SR_TRANS = str.maketrans(_SR_MAP)


def serbian_normalize(term: str) -> str:
    """SerbianNormalizationFilter (sr/SerbianNormalizationFilter.kt:37-115)."""
    return term.translate(_SR_TRANS)


def serbian_stem(term: str) -> str:
    """SerbianStemmer.stem (snowball/ext/SerbianStemmer.kt:11-27): first
    matching rule wins, in the reference's order."""
    s = term
    if s.endswith("ima") and len(s) > 4:
        return s[:-3]
    if s.endswith("ovima") and len(s) > 6:
        return s[:-5]
    if s.endswith("evima") and len(s) > 6:
        return s[:-5]
    if s.endswith("nim") and len(s) > 4:
        return s[:-2]
    if s.endswith("ni") and len(s) > 3:
        return s[:-1]
    if s.endswith("\u0107e") and len(s) > 3:
        return s[:-1]
    if s.endswith("te") and len(s) > 3:
        return s[:-1]
    return s


def serbian_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """SerbianAnalyzer.createComponents (SerbianAnalyzer.kt:73-83)."""
    stop = SERBIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = serbian_stem(term)
            term = serbian_normalize(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
