"""Estonian analysis chain (``analysis/common/.../analysis/et/``).

* ``estonian_snowball_stem`` — the published Snowball estonian algorithm
  (snowballstem.org; generated reference: ``snowball/ext/EstonianStemmer.kt``):
  whole-word verb exceptions short-circuit everything; otherwise emphasis
  (gi/ki) removal, then verb endings OR the substantive cascade
  (special noun endings, case endings, first-three plural cases, degrees,
  i-plural, nu-forms), then kk/pp/tt undoubling before a final vowel.
* ``estonian_analyzer`` — ``et/EstonianAnalyzer.kt:51-59`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(estonian) ->
  [SetKeywordMarkerFilter] -> SnowballFilter(EstonianStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

ESTONIAN_STOP_WORDS = frozenset(("alla", "all", "alt"))


_ET_VERB_DEL = (
    "mata", "ksid", "nuksid", "sime", "ksime", "nuksime", "dakse",
    "takse", "site", "ksite", "nuksite", "sin", "ksin", "nuksin",
    "daks", "taks",
)

_ET_VERB_VOWEL = (
    "da", "b", "me", "n",
)

_ET_VERB_EXCEPTIONS = {
    "joob": "joo", "jood": "joo", "joodakse": "joo", "jooma": "joo",
    "joomata": "joo", "joome": "joo", "joon": "joo", "joote": "joo",
    "joovad": "joo", "juua": "joo", "juuakse": "joo", "jäi": "jääma",
    "jäid": "jääma", "jäime": "jääma", "jäin": "jääma",
    "jäite": "jääma", "jääb": "jääma", "jääd": "jääma",
    "jääda": "jääma", "jäädakse": "jääma", "jäädi": "jääma",
    "jääks": "jääma", "jääksid": "jääma", "jääksime": "jääma",
    "jääksin": "jääma", "jääksite": "jääma", "jääma": "jääma",
    "jäämata": "jääma", "jääme": "jääma", "jään": "jääma",
    "jääte": "jääma", "jäävad": "jääma", "jõi": "joo", "jõid": "joo",
    "jõime": "joo", "jõin": "joo", "jõite": "joo", "keeb": "keesi",
    "keed": "keesi", "keedakse": "keesi", "keeks": "keesi",
    "keeksid": "keesi", "keeksime": "keesi", "keeksin": "keesi",
    "keeksite": "keesi", "keema": "keesi", "keemata": "keesi",
    "keeme": "keesi", "keen": "keesi", "kees": "keesi",
    "keeta": "keesi", "keete": "keesi", "keevad": "keesi",
    "käia": "käisi", "käiakse": "käisi", "käib": "käisi",
    "käid": "käisi", "käidi": "käisi", "käiks": "käisi",
    "käiksid": "käisi", "käiksime": "käisi", "käiksin": "käisi",
    "käiksite": "käisi", "käima": "käisi", "käimata": "käisi",
    "käime": "käisi", "käin": "käisi", "käis": "käisi",
    "käite": "käisi", "käivad": "käisi", "laob": "ladu",
    "laod": "ladu", "laoks": "ladu", "laoksid": "ladu",
    "laoksime": "ladu", "laoksin": "ladu", "laoksite": "ladu",
    "laome": "ladu", "laon": "ladu", "laote": "ladu", "laovad": "ladu",
    "loeb": "luge", "loed": "luge", "loeks": "luge", "loeksid": "luge",
    "loeksime": "luge", "loeksin": "luge", "loeksite": "luge",
    "loeme": "luge", "loen": "luge", "loete": "luge", "loevad": "luge",
    "loob": "loo", "lood": "loo", "loodi": "loo", "looks": "loo",
    "looksid": "loo", "looksime": "loo", "looksin": "loo",
    "looksite": "loo", "looma": "loo", "loomata": "loo",
    "loome": "loo", "loon": "loo", "loote": "loo", "loovad": "loo",
    "luua": "loo", "luuakse": "loo", "lõi": "lõi", "lõid": "lõi",
    "lõime": "lõi", "lõin": "lõi", "lõite": "lõi", "lööb": "löö",
    "lööd": "löö", "löödakse": "löö", "löödi": "löö", "lööks": "löö",
    "lööksid": "löö", "lööksime": "löö", "lööksin": "löö",
    "lööksite": "löö", "lööma": "löö", "löömata": "löö",
    "lööme": "löö", "löön": "löö", "lööte": "löö", "löövad": "löö",
    "lüüa": "löö", "lüüakse": "löö", "müüa": "müüsi",
    "müüakse": "müüsi", "müüb": "müüsi", "müüd": "müüsi",
    "müüdi": "müüsi", "müüks": "müüsi", "müüksid": "müüsi",
    "müüksime": "müüsi", "müüksin": "müüsi", "müüksite": "müüsi",
    "müüma": "müüsi", "müümata": "müüsi", "müüme": "müüsi",
    "müün": "müüsi", "müüs": "müüsi", "müüte": "müüsi",
    "müüvad": "müüsi", "näeb": "nägi", "näed": "nägi", "näeks": "nägi",
    "näeksid": "nägi", "näeksime": "nägi", "näeksin": "nägi",
    "näeksite": "nägi", "näeme": "nägi", "näen": "nägi",
    "näete": "nägi", "näevad": "nägi", "nägema": "nägi",
    "nägemata": "nägi", "näha": "nägi", "nähakse": "nägi",
    "nähti": "nägi", "põeb": "põde", "põed": "põde", "põeks": "põde",
    "põeksid": "põde", "põeksime": "põde", "põeksin": "põde",
    "põeksite": "põde", "põeme": "põde", "põen": "põde",
    "põete": "põde", "põevad": "põde", "saab": "saa", "saad": "saa",
    "saada": "saa", "saadakse": "saa", "saadi": "saa", "saaks": "saa",
    "saaksid": "saa", "saaksime": "saa", "saaksin": "saa",
    "saaksite": "saa", "saama": "saa", "saamata": "saa",
    "saame": "saa", "saan": "saa", "saate": "saa", "saavad": "saa",
    "sai": "saa", "said": "saa", "saime": "saa", "sain": "saa",
    "saite": "saa", "sõi": "söö", "sõid": "söö", "sõime": "söö",
    "sõin": "söö", "sõite": "söö", "sööb": "söö", "sööd": "söö",
    "söödakse": "söö", "söödi": "söö", "sööks": "söö",
    "sööksid": "söö", "sööksime": "söö", "sööksin": "söö",
    "sööksite": "söö", "sööma": "söö", "söömata": "söö",
    "sööme": "söö", "söön": "söö", "sööte": "söö", "söövad": "söö",
    "süüa": "söö", "süüakse": "söö", "teeb": "tegi", "teed": "tegi",
    "teeks": "tegi", "teeksid": "tegi", "teeksime": "tegi",
    "teeksin": "tegi", "teeksite": "tegi", "teeme": "tegi",
    "teen": "tegi", "teete": "tegi", "teevad": "tegi",
    "tegema": "tegi", "tegemata": "tegi", "teha": "tegi",
    "tehakse": "tegi", "tehti": "tegi", "toob": "too", "tood": "too",
    "toodi": "too", "tooks": "too", "tooksid": "too",
    "tooksime": "too", "tooksin": "too", "tooksite": "too",
    "tooma": "too", "toomata": "too", "toome": "too", "toon": "too",
    "toote": "too", "toovad": "too", "tuua": "too", "tuuakse": "too",
    "tõi": "too", "tõid": "too", "tõime": "too", "tõin": "too",
    "tõite": "too", "viia": "viima", "viiakse": "viima",
    "viib": "viima", "viid": "viima", "viidi": "viima",
    "viiks": "viima", "viiksid": "viima", "viiksime": "viima",
    "viiksin": "viima", "viiksite": "viima", "viima": "viima",
    "viimata": "viima", "viime": "viima", "viin": "viima",
    "viisime": "viima", "viisin": "viima", "viisite": "viima",
    "viite": "viima", "viivad": "viima", "võib": "võisi",
    "võid": "võisi", "võida": "võisi", "võidakse": "võisi",
    "võidi": "võisi", "võiks": "võisi", "võiksid": "võisi",
    "võiksime": "võisi", "võiksin": "võisi", "võiksite": "võisi",
    "võima": "võisi", "võimata": "võisi", "võime": "võisi",
    "võin": "võisi", "võis": "võisi", "võite": "võisi",
    "võivad": "võisi",
}

_ET_V1 = frozenset("aeiou\u00e4\u00f5\u00f6\u00fc")
_ET_RV = frozenset("aeiou")
_ET_KI = frozenset("bdfghkpstz\u0161\u017e")
_ET_GI = frozenset("aceijlmnoqruvwx\u00e4\u00f5\u00f6\u00fc")
_ET_LONGV = ("aa", "ee", "ii", "oo", "uu", "\u00e4\u00e4",
             "\u00f5\u00f5", "\u00f6\u00f6", "\u00fc\u00fc")

_ET_SPECIAL_NOUN = {
    "lasse": "lase", "lane": "lase", "lasi": "lase", "last": "lase",
    "misse": "mise", "mine": "mise", "misi": "mise", "mist": "mise",
    "lisse": "lise", "line": "lise", "lisi": "lise", "list": "lise",
}
_ET_CASE_RV = ("sse", "ga", "ta", "le", "ks", "lt", "st", "l", "s")
_ET_NU = ("va", "du", "nu", "tu")


def _et_p1(word: str) -> int:
    n = len(word)
    i = 0
    while i < n and word[i] not in _ET_V1:
        i += 1
    while i < n and word[i] in _ET_V1:
        i += 1
    return i + 1 if i < n else n


def _et_longest(word: str, table, p1: int) -> str | None:
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx) \
                and len(word) - len(sfx) >= p1:
            best = sfx
    return best


def _et_rv_or_longv(pre: str) -> bool:
    return (pre[-1:] in _ET_RV) or pre.endswith(_ET_LONGV)


def _et_substantive(word: str, p1: int) -> str:
    # special noun endings
    m = _et_longest(word, _ET_SPECIAL_NOUN, p1)
    if m:
        word = word[: -len(m)] + _ET_SPECIAL_NOUN[m]
    # case endings
    m = _et_longest(word, _ET_CASE_RV + ("t",), p1)
    if m == "t":
        if len(word) - 1 >= 4:
            word = word[:-1]
    elif m:
        if _et_rv_or_longv(word[: -len(m)]):
            word = word[: -len(m)]
    # plural, three first cases
    m = _et_longest(word, ("ikkude", "ikke", "ike", "sid", "te", "de",
                           "d"), p1)
    if m in ("ikkude", "ikke", "ike"):
        word = word[: -len(m)] + "iku"
    elif m == "sid":
        pre = word[:-3]
        if not pre.endswith(_ET_LONGV):
            word = pre
    elif m == "te":
        pre = word[:-2]
        if len(pre) >= 4:
            if pre.endswith(("las", "lis", "mis")):
                word = pre + "e"
            elif pre.endswith("t"):
                pass
            else:
                word = pre
        else:
            word = pre + "t"
    elif m in ("d", "de"):
        pre = word[: -len(m)]
        if _et_rv_or_longv(pre):
            word = pre
    # degrees
    m = _et_longest(word, ("mai", "ma", "m"), p1)
    if m == "ma":
        word = word[:-2]
    elif m:
        if word[: -len(m)][-1:] in _ET_RV:
            word = word[: -len(m)]
    # i plural
    if word.endswith("i") and len(word) - 1 >= p1 \
            and word[-2:-1] in _ET_RV:
        word = word[:-1]
    # nu forms
    m = _et_longest(word, _ET_NU, p1)
    if m:
        word = word[: -len(m)]
    return word


def estonian_snowball_stem(word: str) -> str:
    if word in _ET_VERB_EXCEPTIONS:
        return _ET_VERB_EXCEPTIONS[word]
    p1 = _et_p1(word)

    # emphasis: gi/ki (R1, and at least 4 chars before the suffix)
    m = _et_longest(word, ("gi", "ki"), p1)
    if m and len(word) - 2 >= 4:
        pre = word[:-2]
        if m == "gi":
            if pre[-1:] in _ET_GI and not pre.endswith(_ET_LONGV):
                word = pre
        else:
            if pre[-1:] in _ET_KI:
                word = pre
    # verb endings, else the substantive cascade
    m = _et_longest(word, _ET_VERB_DEL + _ET_VERB_VOWEL + ("akse",), p1)
    if m == "akse":
        word = word[:-4] + "a"
    elif m in _ET_VERB_VOWEL:
        if word[: -len(m)][-1:] in _ET_V1:
            word = word[: -len(m)]
        else:
            word = _et_substantive(word, p1)
    elif m:
        word = word[: -len(m)]
    else:
        word = _et_substantive(word, p1)

    # undouble kk/pp/tt before a final vowel
    if len(word) >= 3 and word[-1] in _ET_V1 and len(word) - 1 >= p1 \
            and word[-3:-1] in ("kk", "pp", "tt"):
        word = word[:-2] + word[-1]
    return word


def estonian_analyzer(stop_words=None, stem_exclusions=(),
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """EstonianAnalyzer.createComponents (EstonianAnalyzer.kt:51-59)."""
    stop = ESTONIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = estonian_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
