"""Scandinavian analysis chains (``analysis/common/.../analysis/{da,no,sv}/``).

Snowball danish / norwegian / swedish stemmers implemented from the published
Snowball algorithm descriptions (snowballstem.org, BSD license), validated on
the reference's analyzer goldens (TestDanishAnalyzer.kt / TestNorwegianAnalyzer.kt
/ TestSwedishAnalyzer.kt). Analyzer chains per DanishAnalyzer.kt:44-53,
NorwegianAnalyzer.kt:44-53, SwedishAnalyzer.kt:44-53: StandardTokenizer ->
LowerCaseFilter -> StopFilter -> [SetKeywordMarkerFilter] -> SnowballFilter.

Shared Snowball mechanics (all three algorithms):
* R1 = region after the first non-vowel following a vowel, clamped so at
  least 3 chars precede it (the ``hop 3``/``setmark x`` guard); words shorter
  than 3 chars have no R1.
* A suffix "in R1" must lie entirely within R1 (its start offset >= p1) —
  the longest such entry of the among table wins, and a failed condition on
  the winner does NOT fall back to shorter entries (snowball among semantics).
* p1 is marked once on the input word; later steps reuse the same offset.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# Snowball stop lists (snowballstem.org, BSD) as embedded in the reference
# analyzers' DEFAULT_STOPWORD_DATA blocks.
DANISH_STOP_WORDS = frozenset((
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som", "på",
    "de", "med", "han", "af", "for", "ikke", "der", "var", "mig", "sig",
    "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun", "nu",
    "over", "da", "fra", "du", "ud", "sin", "dem", "os", "op", "man",
    "hans", "hvor", "eller", "hvad", "skal", "selv", "her", "alle", "vil",
    "blev", "kunne", "ind", "når", "være", "dog", "noget", "ville", "jo",
    "deres", "efter", "ned", "skulle", "denne", "end", "dette", "mit",
    "også", "under", "have", "dig", "anden", "hende", "mine", "alt",
    "meget", "sit", "sine", "vor", "mod", "disse", "hvis", "din", "nogle",
    "hos", "blive", "mange", "ad", "bliver", "hendes", "været", "thi",
    "jer", "sådan",
))


NORWEGIAN_STOP_WORDS = frozenset((
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er", "som",
    "på", "de", "med", "han", "av", "ikke", "ikkje", "der", "så", "var",
    "meg", "seg", "men", "ett", "har", "om", "vi", "min", "mitt", "ha",
    "hadde", "hun", "nå", "over", "da", "ved", "fra", "du", "ut", "sin",
    "dem", "oss", "opp", "man", "kan", "hans", "hvor", "eller", "hva",
    "skal", "selv", "sjøl", "her", "alle", "vil", "bli", "ble", "blei",
    "blitt", "kunne", "inn", "når", "være", "kom", "noen", "noe", "ville",
    "dere", "deres", "kun", "ja", "etter", "ned", "skulle", "denne", "for",
    "deg", "si", "sine", "sitt", "mot", "å", "meget", "hvorfor", "dette",
    "disse", "uten", "hvordan", "ingen", "din", "ditt", "blir", "samme",
    "hvilken", "hvilke", "sånn", "inni", "mellom", "vår", "hver", "hvem",
    "vors", "hvis", "både", "bare", "enn", "fordi", "før", "mange", "også",
    "slik", "vært", "båe", "begge", "siden", "dykk", "dykkar", "dei",
    "deira", "deires", "deim", "di", "då", "eg", "ein", "eit", "eitt",
    "elles", "honom", "hjå", "ho", "hoe", "henne", "hennar", "hennes",
    "hoss", "hossen", "ingi", "inkje", "korleis", "korso", "kva", "kvar",
    "kvarhelst", "kven", "kvi", "kvifor", "me", "medan", "mi", "mine",
    "mykje", "no", "nokon", "noka", "nokor", "noko", "nokre", "sia",
    "sidan", "so", "somt", "somme", "um", "upp", "vere", "vore", "verte",
    "vort", "varte", "vart",
))


SWEDISH_STOP_WORDS = frozenset((
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
    "den", "med", "var", "sig", "för", "så", "till", "är", "men", "ett",
    "om", "hade", "de", "av", "icke", "mig", "du", "henne", "då", "sin",
    "nu", "har", "inte", "hans", "honom", "skulle", "hennes", "där", "min",
    "man", "ej", "vid", "kunde", "något", "från", "ut", "när", "efter",
    "upp", "vi", "dem", "vara", "vad", "över", "än", "dig", "kan", "sina",
    "här", "ha", "mot", "alla", "under", "någon", "eller", "allt",
    "mycket", "sedan", "ju", "denna", "själv", "detta", "åt", "utan",
    "varit", "hur", "ingen", "mitt", "ni", "bli", "blev", "oss", "din",
    "dessa", "några", "deras", "blir", "mina", "samma", "vilken", "er",
    "sådan", "vår", "blivit", "dess", "inom", "mellan", "sådant", "varför",
    "varje", "vilka", "ditt", "vem", "vilket", "sitt", "sådana", "vart",
    "dina", "vars", "vårt", "våra", "ert", "era", "vilkas",
))



def _mark_r1(word: str, vowels: frozenset) -> int:
    """Snowball mark_regions: p1 after the first non-vowel following a vowel,
    never before offset 3 (no R1 at all for words shorter than 3)."""
    n = len(word)
    if n < 3:
        return n
    fv = next((i for i, c in enumerate(word) if c in vowels), None)
    if fv is None:
        return n
    k = next((i for i in range(fv + 1, n) if word[i] not in vowels), None)
    if k is None:
        return n
    return max(k + 1, 3)


def _longest_in_r1(word: str, p1: int, table) -> str | None:
    """Longest table suffix that matches word and starts at/after p1."""
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx) \
                and len(word) - len(sfx) >= p1:
            best = sfx
    return best


# ---------------------------------------------------------------- danish

_DA_VOWELS = frozenset("aeiouy\u00e6\u00e5\u00f8")
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyz\u00e5")
_DA_UNDOUBLE = frozenset("bcdfghjklmnpqrstvwxz")
_DA_MAIN = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "s", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "erets", "et", "eret",
)
_DA_CP = ("gd", "dt", "gt", "kt")
_DA_OTHER = ("ig", "lig", "elig", "els", "l\u00f8st")


def _da_consonant_pair(word: str, p1: int) -> str:
    if _longest_in_r1(word, p1, _DA_CP) and word:
        return word[:-1]
    return word


def danish_snowball_stem(word: str) -> str:
    """Snowball danish: main_suffix, consonant_pair, other_suffix, undouble."""
    p1 = _mark_r1(word, _DA_VOWELS)
    m = _longest_in_r1(word, p1, _DA_MAIN)
    if m == "s":
        if len(word) >= 2 and word[-2] in _DA_S_ENDING:
            word = word[:-1]
    elif m:
        word = word[: -len(m)]
    word = _da_consonant_pair(word, p1)
    if word.endswith("igst"):
        word = word[:-2]
    m = _longest_in_r1(word, p1, _DA_OTHER)
    if m == "l\u00f8st":
        word = word[:-1]
    elif m:
        word = word[: -len(m)]
        word = _da_consonant_pair(word, p1)
    if (len(word) >= 2 and word[-1] in _DA_UNDOUBLE
            and len(word) - 1 >= p1 and word[-2] == word[-1]):
        word = word[:-1]
    return word


# ---------------------------------------------------------------- norwegian

_NO_VOWELS = _DA_VOWELS
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")
_NO_MAIN = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "erte", "en",
    "heten", "ar", "er", "heter", "s", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ert", "ast",
)
_NO_ER_REPLACE = frozenset(("erte", "ert"))
_NO_CP = ("dt", "vt")
_NO_OTHER = (
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov", "slov",
    "hetslov",
)


def norwegian_snowball_stem(word: str) -> str:
    """Snowball norwegian: main_suffix, consonant_pair, other_suffix."""
    p1 = _mark_r1(word, _NO_VOWELS)
    m = _longest_in_r1(word, p1, _NO_MAIN)
    if m == "s":
        prev = word[-2] if len(word) >= 2 else ""
        if prev in _NO_S_ENDING or (
            prev == "k" and len(word) >= 3 and word[-3] not in _NO_VOWELS
        ):
            word = word[:-1]
    elif m in _NO_ER_REPLACE:
        word = word[: -len(m)] + "er"
    elif m:
        word = word[: -len(m)]
    if _longest_in_r1(word, p1, _NO_CP) and word:
        word = word[:-1]
    m = _longest_in_r1(word, p1, _NO_OTHER)
    if m:
        word = word[: -len(m)]
    return word


# ---------------------------------------------------------------- swedish

_SV_VOWELS = frozenset("aeiouy\u00e4\u00e5\u00f6")
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_OST_ENDING = frozenset("iklnprtuv")
_SV_MAIN = (
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande", "arne",
    "are", "aste", "en", "anden", "aren", "heten", "ern", "ar", "er", "heter",
    "or", "s", "as", "arnas", "ernas", "ornas", "es", "ades", "andes", "ens",
    "arens", "hetens", "erns", "at", "andet", "het", "ast",
)
_SV_CP = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OTHER = ("ig", "lig", "els", "fullt", "\u00f6st")


def swedish_snowball_stem(word: str) -> str:
    """Snowball swedish: main_suffix, consonant_pair, other_suffix."""
    p1 = _mark_r1(word, _SV_VOWELS)
    m = _longest_in_r1(word, p1, _SV_MAIN)
    if m == "s":
        if len(word) >= 2 and word[-2] in _SV_S_ENDING:
            word = word[:-1]
    elif m:
        word = word[: -len(m)]
    if _longest_in_r1(word, p1, _SV_CP) and word:
        word = word[:-1]
    m = _longest_in_r1(word, p1, _SV_OTHER)
    if m == "\u00f6st":
        if len(word) >= 4 and word[-4] in _SV_OST_ENDING:
            word = word[:-1]  # öst -> ös
    elif m == "fullt":
        word = word[:-1]  # fullt -> full
    elif m:
        word = word[: -len(m)]
    return word


# ---------------------------------------------------------------- analyzers

def _scand_analyzer(stop, excl, stem, max_token_length):
    stop = frozenset(stop) if stop else frozenset()
    excl = frozenset(excl)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(t.term)
            if term in stop:
                continue
            if term not in excl:
                term = stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run


def danish_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """DanishAnalyzer.createComponents (DanishAnalyzer.kt:44-53)."""
    stop = DANISH_STOP_WORDS if stop_words is None else stop_words
    return _scand_analyzer(stop, stem_exclusions, danish_snowball_stem,
                           max_token_length)


def norwegian_analyzer(stop_words=None, stem_exclusions=(),
                       max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """NorwegianAnalyzer.createComponents (NorwegianAnalyzer.kt:44-53)."""
    stop = NORWEGIAN_STOP_WORDS if stop_words is None else stop_words
    return _scand_analyzer(stop, stem_exclusions, norwegian_snowball_stem,
                           max_token_length)


def swedish_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """SwedishAnalyzer.createComponents (SwedishAnalyzer.kt:44-53)."""
    stop = SWEDISH_STOP_WORDS if stop_words is None else stop_words
    return _scand_analyzer(stop, stem_exclusions, swedish_snowball_stem,
                           max_token_length)
