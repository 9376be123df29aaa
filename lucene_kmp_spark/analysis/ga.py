"""Irish analysis chain (``analysis/common/.../analysis/ga/``).

* ``irish_lowercase`` — ``ga/IrishLowerCaseFilter.kt``: n/t before an
  uppercase vowel becomes ``n-``/``t-`` (undoing tokenizer-stripped
  hyphenation), then lowercase.
* ``irish_snowball_stem`` — the published Snowball irish algorithm
  (snowballstem.org; generated reference: ``snowball/ext/IrishStemmer.kt``):
  initial-mutation prefix undoing, RV/R1/R2 regions, noun / derivational /
  verb suffix removal.
* ``irish_analyzer`` — ``ga/IrishAnalyzer.kt:51-59`` chain:
  StandardTokenizer -> StopFilter(h/n/t hyphenation artifacts) ->
  ElisionFilter(d/m/b) -> IrishLowerCaseFilter -> StopFilter(irish) ->
  [SetKeywordMarkerFilter] -> SnowballFilter(IrishStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.fr import elision_strip
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    standard_tokenize,
)

IRISH_STOP_WORDS = frozenset((
    "a", "ach", "ag", "agus", "an", "aon", "ar", "arna", "as", "b'", "ba",
    "beirt", "bhúr", "caoga", "ceathair", "ceathrar", "chomh", "chtó",
    "chuig", "chun", "cois", "céad", "cúig", "cúigear", "d'", "daichead",
    "dar", "de", "deich", "deichniúr", "den", "dhá", "do", "don", "dtí",
    "dá", "dár", "dó", "faoi", "faoin", "faoina", "faoinár", "fara",
    "fiche", "gach", "gan", "go", "gur", "haon", "hocht", "i", "iad",
    "idir", "in", "ina", "ins", "inár", "is", "le", "leis", "lena",
    "lenár", "m'", "mar", "mo", "mé", "na", "nach", "naoi", "naonúr", "ná",
    "ní", "níor", "nó", "nócha", "ocht", "ochtar", "os", "roimh", "sa",
    "seacht", "seachtar", "seachtó", "seasca", "seisear", "siad", "sibh",
    "sinn", "sna", "sé", "sí", "tar", "thar", "thú", "triúr", "trí",
    "trína", "trínár", "tríocha", "tú", "um", "ár", "é", "éis", "í", "ó",
    "ón", "óna", "ónár",
))


# IrishAnalyzer.DEFAULT_ARTICLES / HYPHENATIONS (IrishAnalyzer.kt:72-81)
IRISH_ARTICLES = frozenset(("d", "m", "b"))
IRISH_HYPHENATIONS = frozenset(("h", "n", "t"))

_GA_VOWELS = frozenset("aeiou\u00e1\u00e9\u00ed\u00f3\u00fa")
_GA_UPPER_VOWELS = frozenset("AEIOU\u00c1\u00c9\u00cd\u00d3\u00da")

# initial mutations, longest prefix first (snowball/ext/IrishStemmer.kt a_0)
_GA_INITIAL = (
    ("d'fh", "f"), ("bhf", "f"), ("b'", ""), ("d'", ""), ("h-", ""),
    ("m'", ""), ("n-", ""), ("t-", ""), ("fh", "f"), ("sh", "s"),
    ("ts", "s"), ("bh", "b"), ("mb", "b"), ("ch", "c"), ("gc", "c"),
    ("dh", "d"), ("nd", "d"), ("gh", "g"), ("ng", "g"), ("bp", "p"),
    ("ph", "p"), ("dt", "t"), ("th", "t"), ("mh", "m"),
)
# noun suffixes: R1-checked and R2-checked groups (a_1)
_GA_NOUN_R1 = ("a\u00edochta", "\u00edochta", "a\u00edocht",
               "\u00edocht", "eabh", "aibh", "eamh", "aimh", "abh", "ibh",
               "amh", "imh")
_GA_NOUN_R2 = ("aire", "air\u00ed", "ire", "ir\u00ed")
# derivational suffixes (a_2): delete-in-R2 or rewrite
_GA_DERIV_R2 = ("eacht\u00fail", "acht\u00fail", "eachta", "achta",
                "eacht", "acht", "each", "ach")
_GA_DERIV_REWRITE = (
    ("grafa\u00edochta\u00ed", "graf"), ("grafa\u00edochta", "graf"),
    ("grafa\u00edocht", "graf"), ("grafa\u00edoch", "graf"),
    ("arcachta\u00ed", "arc"), ("arcachta", "arc"), ("arcacht", "arc"),
    ("\u00f3ideacha", "\u00f3id"), ("\u00f3ideach", "\u00f3id"),
    ("\u00f3idigh", "\u00f3id"), ("gineach", "gin"), ("gineas", "gin"),
    ("ginis", "gin"), ("patacha", "paite"), ("patach", "paite"),
    ("pataigh", "paite"), ("paite", "paite"),
)
# verb suffixes (a_3): RV-checked and R1-checked groups
_GA_VERB_RV = ("aimid", "a\u00edmid", "imid", "\u00edmid", "faidh",
               "fidh")
_GA_VERB_R1 = ("eadh", "adh", "\u00e1il", "ain", "tear", "tar")


def irish_lowercase(term: str) -> str:
    """IrishLowerCaseFilter.incrementToken (IrishLowerCaseFilter.kt:31-44)."""
    if len(term) > 1 and term[0] in ("n", "t") and term[1] in _GA_UPPER_VOWELS:
        return term[0] + "-" + term[1:].lower()
    return term.lower()


def _ga_regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    i = 0
    while i < n and word[i] not in _GA_VOWELS:
        i += 1
    if i >= n:
        return n, n, n
    pv = i + 1
    j = pv
    while j < n and word[j] in _GA_VOWELS:
        j += 1
    if j >= n:
        return pv, n, n
    p1 = j + 1
    k = p1
    while k < n and word[k] not in _GA_VOWELS:
        k += 1
    if k >= n:
        return pv, p1, n
    k += 1
    while k < n and word[k] in _GA_VOWELS:
        k += 1
    if k >= n:
        return pv, p1, n
    return pv, p1, k + 1


def _ga_longest(word: str, table) -> str | None:
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx):
            best = sfx
    return best


def irish_snowball_stem(word: str) -> str:
    for pre, repl in _GA_INITIAL:
        if word.startswith(pre):
            word = repl + word[len(pre):]
            break
    pv, p1, p2 = _ga_regions(word)

    # noun suffixes — longest across both groups, then region check
    m = _ga_longest(word, _GA_NOUN_R1 + _GA_NOUN_R2)
    if m:
        start = len(word) - len(m)
        if (m in _GA_NOUN_R2 and start >= p2) or \
                (m in _GA_NOUN_R1 and start >= p1):
            word = word[:start]

    # derivational suffixes
    m = _ga_longest(word, _GA_DERIV_R2 + tuple(s for s, _ in _GA_DERIV_REWRITE))
    if m:
        start = len(word) - len(m)
        if m in _GA_DERIV_R2:
            if start >= p2:
                word = word[:start]
        else:
            repl = dict(_GA_DERIV_REWRITE)[m]
            word = word[:start] + repl

    # verb suffixes
    m = _ga_longest(word, _GA_VERB_RV + _GA_VERB_R1)
    if m:
        start = len(word) - len(m)
        if (m in _GA_VERB_RV and start >= pv) or \
                (m in _GA_VERB_R1 and start >= p1):
            word = word[:start]
    return word


def irish_analyzer(stop_words=None, stem_exclusions=(),
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """IrishAnalyzer.createComponents (IrishAnalyzer.kt:51-59)."""
    stop = IRISH_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            raw = t.term
            if raw.lower() in IRISH_HYPHENATIONS:
                continue  # hyphenation artifact stop (ignoreCase=true)
            term = elision_strip(raw, IRISH_ARTICLES)
            term = irish_lowercase(term)
            if term in stop:
                continue
            if term not in excl:
                term = irish_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
