"""German analysis chain (``analysis/common/.../analysis/de/``).

* ``german_normalize`` — ``de/GermanNormalizationFilter.kt``: the German
  snowball normalization heuristics: 'ae/oe/ue' handling via a 3-state
  machine ('u' after a vowel-ish state keeps its 'e'; after 'a'/'o'/'u' the
  following 'e' is deleted), umlauts folded, 'ß' -> 'ss'.
* ``german_light_stem`` — ``de/GermanLightStemmer.kt``: the UniNE light
  stemmer (Savoy): umlaut/accent fold + two plural/case suffix steps.
* ``german_analyzer`` — ``de/GermanAnalyzer.kt:32-39`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(german) ->
  [SetKeywordMarkerFilter] -> GermanNormalizationFilter ->
  GermanLightStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# german_stop.txt (snowball) as embedded in GermanAnalyzer.DEFAULT_STOPWORD_DATA
GERMAN_STOP_WORDS = frozenset((
    "aber", "alle", "allem", "allen", "aller", "alles", "als", "also",
    "am", "an", "ander", "andere", "anderem", "anderen", "anderer", "anderes",
    "anderm", "andern", "anderr", "anders", "auch", "auf", "aus", "bei",
    "bin", "bis", "bist", "da", "damit", "dann", "der", "den",
    "des", "dem", "die", "das", "daß", "derselbe", "derselben", "denselben",
    "desselben", "demselben", "dieselbe", "dieselben", "dasselbe", "dazu", "dein", "deine",
    "deinem", "deinen", "deiner", "deines", "denn", "derer", "dessen", "dich",
    "dir", "du", "dies", "diese", "diesem", "diesen", "dieser", "dieses",
    "doch", "dort", "durch", "ein", "eine", "einem", "einen", "einer",
    "eines", "einig", "einige", "einigem", "einigen", "einiger", "einiges", "einmal",
    "er", "ihm", "ihn", "es", "etwas", "euer", "eure", "eurem",
    "euren", "eurer", "eures", "für", "gegen", "gewesen", "hab", "habe",
    "haben", "hat", "hatte", "hatten", "hier", "hin", "hinter", "ich",
    "mich", "mir", "ihr", "ihre", "ihrem", "ihren", "ihrer", "ihres",
    "euch", "im", "in", "indem", "ins", "ist", "jede", "jedem",
    "jeden", "jeder", "jedes", "jene", "jenem", "jenen", "jener", "jenes",
    "jetzt", "kann", "kein", "keine", "keinem", "keinen", "keiner", "keines",
    "können", "könnte", "machen", "man", "manche", "manchem", "manchen", "mancher",
    "manches", "mein", "meine", "meinem", "meinen", "meiner", "meines", "mit",
    "muss", "musste", "nach", "nicht", "nichts", "noch", "nun", "nur",
    "ob", "oder", "ohne", "sehr", "sein", "seine", "seinem", "seinen",
    "seiner", "seines", "selbst", "sich", "sie", "ihnen", "sind", "so",
    "solche", "solchem", "solchen", "solcher", "solches", "soll", "sollte", "sondern",
    "sonst", "über", "um", "und", "uns", "unse", "unsem", "unsen",
    "unser", "unses", "unter", "viel", "vom", "von", "vor", "während",
    "war", "waren", "warst", "was", "weg", "weil", "weiter", "welche",
    "welchem", "welchen", "welcher", "welches", "wenn", "werde", "werden", "wie",
    "wieder", "will", "wir", "wird", "wirst", "wo", "wollen", "wollte",
    "würde", "würden", "zu", "zum", "zur", "zwar", "zwischen",
))

_N, _V, _U = 0, 1, 2


def german_normalize(term: str) -> str:
    """GermanNormalizationFilter.incrementToken (GermanNormalizationFilter.kt:17-63)."""
    s = list(term)
    state = _N
    i = 0
    while i < len(s):
        c = s[i]
        if c in ("a", "o"):
            state = _U
        elif c == "u":
            state = _U if state == _N else _V
        elif c == "e":
            if state == _U:
                del s[i]
                i -= 1
            state = _V
        elif c in ("i", "q", "y"):
            state = _V
        elif c == "ä":
            s[i] = "a"
            state = _V
        elif c == "ö":
            s[i] = "o"
            state = _V
        elif c == "ü":
            s[i] = "u"
            state = _V
        elif c == "ß":
            s[i] = "s"
            s.insert(i + 1, "s")
            i += 1
            state = _N
        else:
            state = _N
        i += 1
    return "".join(s)


_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(term: str) -> str:
    """GermanLightStemmer.stem (GermanLightStemmer.kt:10-58)."""
    s = term.translate(_DE_FOLD)
    # step 1
    n = len(s)
    if n > 5 and s.endswith("ern"):
        s = s[:-3]
    elif n > 4 and s[-2:] in ("em", "en", "er", "es"):
        s = s[:-2]
    elif n > 3 and s[-1] == "e":
        s = s[:-1]
    elif n > 3 and s[-1] == "s" and s[-2] in _ST_ENDING:
        s = s[:-1]
    # step 2
    n = len(s)
    if n > 5 and s.endswith("est"):
        s = s[:-3]
    elif n > 4 and s[-2:] in ("er", "en"):
        s = s[:-2]
    elif n > 4 and s.endswith("st") and s[-3] in _ST_ENDING:
        s = s[:-2]
    return s


def german_analyzer(
    stop_words=GERMAN_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """GermanAnalyzer.createComponents (GermanAnalyzer.kt:32-39)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
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
                term = german_light_stem(german_normalize(term))
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
