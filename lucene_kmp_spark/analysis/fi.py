"""Finnish analysis chain (``analysis/common/.../analysis/fi/``).

* ``finnish_snowball_stem`` — the published Snowball finnish algorithm
  (snowballstem.org; generated reference: ``snowball/ext/FinnishStemmer.kt``):
  R1/R2 regions; particle, possessive, case-ending, other-ending removal;
  i-plural (after a case ending) or t-plural; and the four-part tidy step
  (LONG-vowel shortening, AEI-after-consonant drop, oj/uj/jo fixes, final
  consonant undoubling).
* ``finnish_analyzer`` — ``fi/FinnishAnalyzer.kt:51-57`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(finnish) ->
  [SetKeywordMarkerFilter] -> SnowballFilter(FinnishStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

FINNISH_STOP_WORDS = frozenset((
    "olla", "olen", "olet", "on", "olemme", "olette", "ovat", "ole", "oli",
    "olisi", "olisit", "olisin", "olisimme", "olisitte", "olisivat",
    "olit", "olin", "olimme", "olitte", "olivat", "ollut", "olleet", "en",
    "et", "ei", "emme", "ette", "eivät", "minä", "sinä", "hän", "me", "te",
    "he", "tämä", "tuo", "se", "nämä", "nuo", "ne", "kuka", "ketkä",
    "mikä", "mitkä", "joka", "jotka", "että", "ja", "jos", "koska", "kuin",
    "mutta", "niin", "sekä", "sillä", "tai", "vaan", "vai", "vaikka",
    "kanssa", "mukaan", "noin", "poikki", "yli", "kun", "nyt", "itse",
))


_FI_V1 = frozenset("aeiouy\u00e4\u00f6")
_FI_V2 = frozenset("aeiou\u00e4\u00f6")
_FI_AEI = frozenset("aei\u00e4")
_FI_C = frozenset("bcdfghjklmnpqrstvwxz")
_FI_PARTICLE_END = frozenset("aeinotuy\u00e4\u00f6")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "\u00e4\u00e4",
            "\u00f6\u00f6")

_FI_PARTICLES_1 = ("k\u00e4\u00e4n", "kaan", "h\u00e4n", "han", "kin",
                   "k\u00f6", "ko", "p\u00e4", "pa")
_FI_CASE_PLAIN = ("lla", "na", "ssa", "ta", "lta", "sta", "lle", "ine",
                  "ksi", "ll\u00e4", "n\u00e4", "ss\u00e4",
                  "t\u00e4", "lt\u00e4", "st\u00e4")
_FI_CASE_H = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
              "h\u00e4n": "\u00e4", "h\u00f6n": "\u00f6"}
_FI_OTHER_COND = ("mma", "mpa", "mmi", "mpi", "mm\u00e4", "mp\u00e4")
_FI_OTHER_PLAIN = ("imma", "impa", "immi", "impi", "imm\u00e4",
                   "imp\u00e4", "eja", "ej\u00e4")


def _fi_regions(word: str) -> tuple[int, int]:
    n = len(word)

    def boundary(start: int) -> int:
        i = start
        while i < n and word[i] not in _FI_V1:
            i += 1
        while i < n and word[i] in _FI_V1:
            i += 1
        return i + 1 if i < n else n

    p1 = boundary(0)
    return p1, boundary(p1) if p1 < n else n


def _fi_longest(word: str, table, min_start: int) -> str | None:
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx) \
                and len(word) - len(sfx) >= min_start:
            best = sfx
    return best


def finnish_snowball_stem(word: str) -> str:
    p1, p2 = _fi_regions(word)
    ending_removed = False

    # particle_etc (R1)
    m = _fi_longest(word, _FI_PARTICLES_1 + ("sti",), p1)
    if m == "sti":
        if len(word) - 3 >= p2:
            word = word[:-3]
    elif m:
        pre = word[: -len(m)]
        if pre and pre[-1] in _FI_PARTICLE_END:
            word = pre

    # possessive (R1)
    m = _fi_longest(word, ("nsa", "ns\u00e4", "mme", "nne", "ni", "si",
                           "an", "\u00e4n", "en"), p1)
    if m == "si":
        if not word[: -2].endswith("k"):
            word = word[:-2]
    elif m == "ni":
        word = word[:-2]
        if word.endswith("kse"):
            word = word[:-3] + "ksi"
    elif m in ("nsa", "ns\u00e4", "mme", "nne"):
        word = word[: -len(m)]
    elif m == "an":
        if word[: -2].endswith(("lla", "na", "ssa", "ta", "lta", "sta")):
            word = word[:-2]
    elif m == "\u00e4n":
        if word[: -2].endswith(("ll\u00e4", "n\u00e4", "ss\u00e4",
                                "t\u00e4", "lt\u00e4", "st\u00e4")):
            word = word[:-2]
    elif m == "en":
        if word[: -2].endswith(("lle", "ine")):
            word = word[:-2]

    # case_ending (R1)
    case_all = (_FI_CASE_PLAIN + tuple(_FI_CASE_H) +
                ("tta", "tt\u00e4", "seen", "den", "tten", "siin",
                 "a", "\u00e4", "n"))
    m = _fi_longest(word, case_all, p1)
    if m:
        pre = word[: -len(m)]
        ok = False
        extra = 0
        if m in _FI_CASE_PLAIN:
            ok = True
        elif m in _FI_CASE_H:
            ok = pre.endswith(_FI_CASE_H[m])
        elif m in ("tta", "tt\u00e4"):
            ok = pre.endswith("e")
        elif m == "seen":
            ok = pre.endswith(_FI_LONG)
        elif m in ("den", "tten", "siin"):
            ok = len(pre) >= 2 and pre[-1] == "i" and pre[-2] in _FI_V2
        elif m in ("a", "\u00e4"):
            ok = len(pre) >= 2 and pre[-1] in _FI_V1 and pre[-2] in _FI_C
        elif m == "n":
            ok = True
            if pre.endswith(_FI_LONG) or pre.endswith("ie"):
                if pre:
                    extra = 1
        if ok:
            word = pre[: len(pre) - extra] if extra else pre
            ending_removed = True

    # other_endings (R2)
    m = _fi_longest(word, _FI_OTHER_COND + _FI_OTHER_PLAIN, p2)
    if m:
        pre = word[: -len(m)]
        if m in _FI_OTHER_PLAIN or not pre.endswith("po"):
            word = pre

    if ending_removed:
        # i_plural (R1)
        if (word.endswith("i") or word.endswith("j")) and len(word) - 1 >= p1:
            word = word[:-1]
    else:
        # t_plural (R1 then R2)
        if word.endswith("t") and len(word) - 1 >= p1 and len(word) >= 2 \
                and word[-2] in _FI_V1:
            word = word[:-1]
            m = _fi_longest(word, ("imma", "mma"), p2)
            if m == "imma":
                word = word[: -4]
            elif m == "mma" and not word[: -3].endswith("po"):
                word = word[:-3]

    # tidy (R1)
    if word.endswith(_FI_LONG) and len(word) - 1 >= p1:
        word = word[:-1]
    if len(word) >= 2 and word[-1] in _FI_AEI and word[-2] in _FI_C \
            and len(word) - 1 >= p1:
        word = word[:-1]
    if word.endswith(("oj", "uj")) and len(word) - 1 >= p1:
        word = word[:-1]
    if word.endswith("jo") and len(word) - 1 >= p1:
        word = word[:-1]
    # undouble final consonant pair that sits before any trailing vowels
    i = len(word)
    while i > 0 and word[i - 1] in _FI_V1:
        i -= 1
    if i >= 2 and word[i - 1] in _FI_C and word[i - 2] == word[i - 1]:
        word = word[: i - 1] + word[i:]
    return word


def finnish_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """FinnishAnalyzer.createComponents (FinnishAnalyzer.kt:51-57)."""
    stop = FINNISH_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = finnish_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
