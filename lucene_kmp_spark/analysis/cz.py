"""Czech analysis chain (``analysis/common/.../analysis/cz/``).

* ``czech_stem`` — ``cz/CzechStemmer.kt``: the light stemmer from
  Dolamic & Savoy, "Indexing and stemming approaches for the Czech
  language" (IP&M 2009): case-ending removal, possessive removal, then
  palatalization-undoing normalization. Input must already be lowercase
  (diacritics kept).
* ``czech_analyzer`` — ``cz/CzechAnalyzer.kt:44-53`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(czech) ->
  [SetKeywordMarkerFilter] -> CzechStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

CZECH_STOP_WORDS = frozenset((
    "a", "s", "k", "o", "i", "u", "v", "z", "dnes", "cz", "tímto", "budeš",
    "budem", "byli", "jseš", "můj", "svým", "ta", "tomto", "tohle", "tuto",
    "tyto", "jej", "zda", "proč", "máte", "tata", "kam", "tohoto", "kdo",
    "kteří", "mi", "nám", "tom", "tomuto", "mít", "nic", "proto", "kterou",
    "byla", "toho", "protože", "asi", "ho", "naši", "napište", "re", "což",
    "tím", "takže", "svých", "její", "svými", "jste", "aj", "tu", "tedy",
    "teto", "bylo", "kde", "ke", "pravé", "ji", "nad", "nejsou", "či",
    "pod", "téma", "mezi", "přes", "ty", "pak", "vám", "ani", "když",
    "však", "neg", "jsem", "tento", "článku", "články", "aby", "jsme",
    "před", "pta", "jejich", "byl", "ještě", "až", "bez", "také", "pouze",
    "první", "vaše", "která", "nás", "nový", "tipy", "pokud", "může",
    "strana", "jeho", "své", "jiné", "zprávy", "nové", "není", "vás",
    "jen", "podle", "zde", "už", "být", "více", "bude", "již", "než",
    "který", "by", "které", "co", "nebo", "ten", "tak", "má", "při", "od",
    "po", "jsou", "jak", "další", "ale", "si", "se", "ve", "to", "jako",
    "za", "zpět", "ze", "do", "pro", "je", "na", "atd", "atp", "jakmile",
    "přičemž", "já", "on", "ona", "ono", "oni", "ony", "my", "vy", "jí",
    "ji", "mě", "mne", "jemu", "tomu", "těm", "těmu", "němu", "němuž",
    "jehož", "jíž", "jelikož", "jež", "jakož", "načež",
))


_CZ_CASE_5 = (
    "ech", "ich", "\u00edch", "\u00e9ho", "\u011bmi", "emi", "\u00e9mu",
    "\u011bte", "ete", "\u011bti", "eti", "\u00edho", "iho", "\u00edmi",
    "\u00edmu", "imu", "\u00e1ch", "ata", "aty", "\u00fdch", "ama", "ami",
    "ov\u00e9", "ovi", "\u00fdmi",
)
_CZ_CASE_4 = (
    "em", "es", "\u00e9m", "\u00edm", "\u016fm", "at", "\u00e1m", "os",
    "us", "\u00fdm", "mi", "ou",
)
_CZ_FINAL_VOWELS = frozenset("aeiou\u016fy\u00e1\u00e9\u00ed\u00fd\u011b")


def _cz_remove_case(s: str) -> str:
    n = len(s)
    if n > 7 and s.endswith("atech"):
        return s[:-5]
    if n > 6 and (s.endswith("\u011btem") or s.endswith("etem")
                  or s.endswith("at\u016fm")):
        return s[:-4]
    if n > 5 and s.endswith(_CZ_CASE_5):
        return s[:-3]
    if n > 4 and s.endswith(_CZ_CASE_4):
        return s[:-2]
    if n > 3 and s[-1] in _CZ_FINAL_VOWELS:
        return s[:-1]
    return s


def _cz_remove_possessives(s: str) -> str:
    if len(s) > 5 and (s.endswith("ov") or s.endswith("in")
                       or s.endswith("\u016fv")):
        return s[:-2]
    return s


def _cz_normalize(s: str) -> str:
    if s.endswith("\u010dt"):        # čt -> ck
        return s[:-2] + "ck"
    if s.endswith("\u0161t"):        # št -> sk
        return s[:-2] + "sk"
    last = s[-1]
    if last in ("c", "\u010d"):      # c/č -> k
        return s[:-1] + "k"
    if last in ("z", "\u017e"):      # z/ž -> h
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":   # eX -> X
        return s[:-2] + last
    if len(s) > 2 and s[-2] == "\u016f":  # ůX -> oX
        return s[:-2] + "o" + last
    return s


def czech_stem(term: str) -> str:
    """CzechStemmer.stem (CzechStemmer.kt:17-24)."""
    s = _cz_remove_case(term)
    s = _cz_remove_possessives(s)
    if s:
        s = _cz_normalize(s)
    return s


def czech_analyzer(stop_words=None, stem_exclusions=(),
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """CzechAnalyzer.createComponents (CzechAnalyzer.kt:44-53)."""
    stop = CZECH_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = czech_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
