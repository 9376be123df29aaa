"""Italian analysis chain (``analysis/common/.../analysis/it/``).

* ``italian_light_stem`` — ``it/ItalianLightStemmer.kt``: the CLEF-2001
  light stemmer (Savoy): accent fold then final-vowel strip with the
  -ie/-he/-hi/-ii/-ia/-io plural handling.
* ``italian_analyzer`` — ``it/ItalianAnalyzer.kt:35-44`` chain:
  StandardTokenizer -> ElisionFilter(ITALIAN_ARTICLES) -> LowerCaseFilter ->
  StopFilter(italian) -> [SetKeywordMarkerFilter] -> ItalianLightStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.fr import elision_strip
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

# ItalianAnalyzer.DEFAULT_ARTICLES (ItalianAnalyzer.kt:58-80), ignoreCase=true
ITALIAN_ARTICLES = frozenset((
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s", "v", "d",
))

# italian_stop.txt (snowball) as embedded in ItalianAnalyzer
ITALIAN_STOP_WORDS = frozenset((
    "ad", "al", "allo", "ai", "agli", "all", "agl", "alla",
    "alle", "con", "col", "coi", "da", "dal", "dallo", "dai",
    "dagli", "dall", "dagl", "dalla", "dalle", "di", "del", "dello",
    "dei", "degli", "dell", "degl", "della", "delle", "in", "nel",
    "nello", "nei", "negli", "nell", "negl", "nella", "nelle", "su",
    "sul", "sullo", "sui", "sugli", "sull", "sugl", "sulla", "sulle",
    "per", "tra", "contro", "io", "tu", "lui", "lei", "noi",
    "voi", "loro", "mio", "mia", "miei", "mie", "tuo", "tua",
    "tuoi", "tue", "suo", "sua", "suoi", "sue", "nostro", "nostra",
    "nostri", "nostre", "vostro", "vostra", "vostri", "vostre", "mi", "ti",
    "ci", "vi", "lo", "la", "li", "le", "gli", "ne",
    "il", "un", "uno", "una", "ma", "ed", "se", "perché",
    "anche", "come", "dov", "dove", "che", "chi", "cui", "non",
    "più", "quale", "quanto", "quanti", "quanta", "quante", "quello", "quelli",
    "quella", "quelle", "questo", "questi", "questa", "queste", "si", "tutto",
    "tutti", "a", "c", "e", "i", "l", "o", "ho",
    "hai", "ha", "abbiamo", "avete", "hanno", "abbia", "abbiate", "abbiano",
    "avrò", "avrai", "avrà", "avremo", "avrete", "avranno", "avrei", "avresti",
    "avrebbe", "avremmo", "avreste", "avrebbero", "avevo", "avevi", "aveva", "avevamo",
    "avevate", "avevano", "ebbi", "avesti", "ebbe", "avemmo", "aveste", "ebbero",
    "avessi", "avesse", "avessimo", "avessero", "avendo", "avuto", "avuta", "avuti",
    "avute", "sono", "sei", "è", "siamo", "siete", "sia", "siate",
    "siano", "sarò", "sarai", "sarà", "saremo", "sarete", "saranno", "sarei",
    "saresti", "sarebbe", "saremmo", "sareste", "sarebbero", "ero", "eri", "era",
    "eravamo", "eravate", "erano", "fui", "fosti", "fu", "fummo", "foste",
    "furono", "fossi", "fosse", "fossimo", "fossero", "essendo", "faccio", "fai",
    "facciamo", "fanno", "faccia", "facciate", "facciano", "farò", "farai", "farà",
    "faremo", "farete", "faranno", "farei", "faresti", "farebbe", "faremmo", "fareste",
    "farebbero", "facevo", "facevi", "faceva", "facevamo", "facevate", "facevano", "feci",
    "facesti", "fece", "facemmo", "faceste", "fecero", "facessi", "facesse", "facessimo",
    "facessero", "facendo", "sto", "stai", "sta", "stiamo", "stanno", "stia",
    "stiate", "stiano", "starò", "starai", "starà", "staremo", "starete", "staranno",
    "starei", "staresti", "starebbe", "staremmo", "stareste", "starebbero", "stavo", "stavi",
    "stava", "stavamo", "stavate", "stavano", "stetti", "stesti", "stette", "stemmo",
    "steste", "stettero", "stessi", "stesse", "stessimo", "stessero", "stando",
))

_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def italian_light_stem(term: str) -> str:
    """ItalianLightStemmer.stem (ItalianLightStemmer.kt:10-30)."""
    if len(term) < 6:
        return term
    s = term.translate(_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in ("i", "h") else s[:-1]
    if last == "i":
        return s[:-2] if prev in ("h", "i") else s[:-1]
    if last in ("a", "o"):
        return s[:-2] if prev == "i" else s[:-1]
    return s


def italian_analyzer(
    stop_words=ITALIAN_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """ItalianAnalyzer.createComponents (ItalianAnalyzer.kt:35-44)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(elision_strip(t.term, ITALIAN_ARTICLES))
            if term in stop:
                continue
            if term not in excl:
                term = italian_light_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
