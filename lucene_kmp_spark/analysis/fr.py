"""French analysis chain (``analysis/common/.../analysis/fr/``).

* ``elision_strip`` — ``util/ElisionFilter.kt``: removes an article prefix
  before an apostrophe (U+0027 or U+2019): "l'avion" -> "avion".  Articles
  are FrenchAnalyzer.DEFAULT_ARTICLES (matched case-insensitively; the
  filter runs BEFORE LowerCaseFilter in the chain).
* ``french_light_stem`` — ``fr/FrenchLightStemmer.kt``: the UniNE light
  stemmer (Savoy, "Light Stemming Approaches for the French, Portuguese,
  German and Hungarian Languages"): plural/suffix rules then ``norm``
  (accent fold, double-letter collapse, -ie/-r/-e strips).
* ``french_analyzer`` — ``fr/FrenchAnalyzer.kt:48-57`` chain:
  StandardTokenizer -> ElisionFilter -> LowerCaseFilter ->
  StopFilter(french) -> [SetKeywordMarkerFilter] -> FrenchLightStemFilter.
  Stop removal leaves position holes; norms count surviving tokens.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# FrenchAnalyzer.DEFAULT_ARTICLES (FrenchAnalyzer.kt:70-90), ignoreCase=true
FRENCH_ARTICLES = frozenset(
    ("l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu", "lorsqu", "puisqu")
)

# french_stop.txt (snowball) as embedded in FrenchAnalyzer.DEFAULT_STOPWORD_DATA
FRENCH_STOP_WORDS = frozenset((
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des",
    "du", "elle", "en", "et", "eux", "il", "je", "la",
    "le", "leur", "lui", "ma", "mais", "me", "même", "mes",
    "moi", "mon", "ne", "nos", "notre", "nous", "on", "ou",
    "par", "pas", "pour", "qu", "que", "qui", "sa", "se",
    "ses", "sur", "ta", "te", "tes", "toi", "ton", "tu",
    "un", "une", "vos", "votre", "vous", "c", "d", "j",
    "l", "à", "m", "n", "s", "t", "y", "étée",
    "étées", "étant", "suis", "es", "êtes", "sont", "serai", "seras",
    "sera", "serons", "serez", "seront", "serais", "serait", "serions", "seriez",
    "seraient", "étais", "était", "étions", "étiez", "étaient", "fus", "fut",
    "fûmes", "fûtes", "furent", "sois", "soit", "soyons", "soyez", "soient",
    "fusse", "fusses", "fussions", "fussiez", "fussent", "ayant", "eu", "eue",
    "eues", "eus", "ai", "avons", "avez", "ont", "aurai", "aurons",
    "aurez", "auront", "aurais", "aurait", "aurions", "auriez", "auraient", "avais",
    "avait", "aviez", "avaient", "eut", "eûmes", "eûtes", "eurent", "aie",
    "aies", "ait", "ayons", "ayez", "aient", "eusse", "eusses", "eût",
    "eussions", "eussiez", "eussent", "ceci", "cela", "celà", "cet", "cette",
    "ici", "ils", "les", "leurs", "quel", "quels", "quelle", "quelles",
    "sans", "soi",
))


def elision_strip(term: str, articles: frozenset[str] = FRENCH_ARTICLES) -> str:
    """ElisionFilter.kt: drop "<article>'" prefixes (first apostrophe only)."""
    for i, ch in enumerate(term):
        if ch == "\u0027" or ch == "\u2019":
            if term[:i].lower() in articles:
                return term[i + 1 :]
            return term
    return term


_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: list[str]) -> list[str]:
    """FrenchLightStemmer.norm (FrenchLightStemmer.kt:160-196)."""
    if len(s) > 4:
        s = [c.translate(_FR_FOLD) for c in s]
        # collapse consecutive identical letters
        i = 1
        ch = s[0]
        while i < len(s):
            if s[i] == ch and s[i].isalpha():
                del s[i]
            else:
                ch = s[i]
                i += 1
    if len(s) > 4 and s[-2] == "i" and s[-1] == "e":
        del s[-2:]
    if len(s) > 4:
        if s[-1] == "r":
            del s[-1]
        if s[-1] == "e":
            del s[-1]
        if s[-1] == "e":
            del s[-1]
        if s[-1] == s[-2] and s[-1].isalpha():
            del s[-1]
    return s


def _ends(s: list[str], suf: str) -> bool:
    return len(s) >= len(suf) and "".join(s[-len(suf) :]) == suf


def french_light_stem(term: str) -> str:
    """FrenchLightStemmer.stem (FrenchLightStemmer.kt:11-158), rule for rule."""
    s = list(term)
    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s[-2] = "l"
        del s[-1]
    if len(s) > 3 and s[-1] == "x":
        del s[-1]
    if len(s) > 3 and s[-1] == "s":
        del s[-1]
    if len(s) > 9 and _ends(s, "issement"):
        del s[-6:]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 8 and _ends(s, "issant"):
        del s[-4:]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and _ends(s, "ement"):
        del s[-4:]
        if len(s) > 3 and _ends(s, "ive"):
            del s[-1]
            s[-1] = "f"
        return "".join(_fr_norm(s))
    if len(s) > 11 and _ends(s, "ficatrice"):
        del s[-5:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 10 and _ends(s, "ficateur"):
        del s[-4:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 9 and _ends(s, "catrice"):
        del s[-3:]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if len(s) > 8 and _ends(s, "cateur"):
        del s[-2:]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 8 and _ends(s, "atrice"):
        del s[-4:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 7 and _ends(s, "ateur"):
        del s[-3:]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and _ends(s, "trice"):
        del s[-1]
        s[-3] = "e"
        s[-2] = "u"
        s[-1] = "r"
    if len(s) > 5 and _ends(s, "ième"):
        return "".join(_fr_norm(s[:-4]))
    if len(s) > 7 and _ends(s, "teuse"):
        del s[-2:]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and _ends(s, "teur"):
        del s[-1]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 5 and _ends(s, "euse"):
        return "".join(_fr_norm(s[:-2]))
    if len(s) > 8 and _ends(s, "ère"):
        del s[-1]
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if len(s) > 7 and _ends(s, "ive"):
        del s[-1]
        s[-1] = "f"
        return "".join(_fr_norm(s))
    if len(s) > 4 and (_ends(s, "folle") or _ends(s, "molle")):
        del s[-2:]
        s[-1] = "u"
        return "".join(_fr_norm(s))
    if len(s) > 9 and _ends(s, "nnelle"):
        return "".join(_fr_norm(s[:-5]))
    if len(s) > 9 and _ends(s, "nnel"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 4 and _ends(s, "ète"):
        del s[-1]
        s[-2] = "e"
    if len(s) > 8 and _ends(s, "ique"):
        del s[-4:]
    if len(s) > 8 and _ends(s, "esse"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 7 and _ends(s, "inage"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 9 and _ends(s, "isation"):
        del s[-7:]
        if len(s) > 5 and _ends(s, "ual"):
            s[-2] = "e"
        return "".join(_fr_norm(s))
    if len(s) > 9 and _ends(s, "isateur"):
        return "".join(_fr_norm(s[:-7]))
    if len(s) > 8 and _ends(s, "ation"):
        return "".join(_fr_norm(s[:-5]))
    if len(s) > 8 and _ends(s, "ition"):
        return "".join(_fr_norm(s[:-5]))
    return "".join(_fr_norm(s))


def french_analyzer(
    stop_words=FRENCH_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """FrenchAnalyzer.createComponents (FrenchAnalyzer.kt:48-57) as a
    picklable ``text -> (terms, positions, length)`` analyzer."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(elision_strip(t.term))
            if term in stop:
                continue
            if term not in excl:
                term = french_light_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
