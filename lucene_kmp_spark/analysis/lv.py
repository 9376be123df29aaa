"""Latvian analysis chain (``analysis/common/.../analysis/lv/``).

* ``latvian_stem`` — ``lv/LatvianStemmer.kt``: the light noun/adjective
  stemmer from Kreslins' "A stemming algorithm for Latvian" (light variant:
  primary inflectional suffixes only, vowel-count guards, palatalization
  undone only for declension II/V/VI endings).
* ``latvian_analyzer`` — ``lv/LatvianAnalyzer.kt:53-59`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(latvian) ->
  [SetKeywordMarkerFilter] -> LatvianStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

LATVIAN_STOP_WORDS = frozenset((
    "aiz", "ap", "ar", "apakš", "ārpus", "augšpus", "bez", "caur", "dēļ",
    "gar", "iekš", "iz", "kopš", "labad", "lejpus", "līdz", "no", "otrpus",
    "pa", "par", "pār", "pēc", "pie", "pirms", "pret", "priekš", "starp",
    "šaipus", "uz", "viņpus", "virs", "virspus", "zem", "apakšpus", "un",
    "bet", "jo", "ja", "ka", "lai", "tomēr", "tikko", "turpretī", "arī",
    "kaut", "gan", "tādēļ", "tā", "ne", "tikvien", "vien", "kā", "ir",
    "te", "vai", "kamēr", "ar", "diezin", "droši", "diemžēl", "nebūt",
    "ik", "it", "taču", "nu", "pat", "tiklab", "iekšpus", "nedz", "tik",
    "nevis", "turpretim", "jeb", "iekam", "iekām", "iekāms", "kolīdz",
    "līdzko", "tiklīdz", "jebšu", "tālab", "tāpēc", "nekā", "itin", "jā",
    "jau", "jel", "nē", "nezin", "tad", "tikai", "vis", "tak", "iekams",
    "vien", "būt", "biju", "biji", "bija", "bijām", "bijāt", "esmu", "esi",
    "esam", "esat", "būšu", "būsi", "būs", "būsim", "būsiet", "tikt",
    "tiku", "tiki", "tika", "tikām", "tikāt", "tieku", "tiec", "tiek",
    "tiekam", "tiekat", "tikšu", "tiks", "tiksim", "tiksiet", "tapt",
    "tapi", "tapāt", "topat", "tapšu", "tapsi", "taps", "tapsim",
    "tapsiet", "kļūt", "kļuvu", "kļuvi", "kļuva", "kļuvām", "kļuvāt",
    "kļūstu", "kļūsti", "kļūst", "kļūstam", "kļūstat", "kļūšu", "kļūsi",
    "kļūs", "kļūsim", "kļūsiet", "varēt", "varēju", "varējām", "varēšu",
    "varēsim", "var", "varēji", "varējāt", "varēsi", "varēsiet", "varat",
    "varēja", "varēs",
))

# (suffix, min vowel count in the ORIGINAL word, palatalizes) — first match
# wins; a match also needs len(word) >= len(suffix) + 3
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("aj\u0101m", 2, False), ("ajos", 2, False), ("aj\u0101s", 2, False),
    ("iem", 2, True), ("aj\u0101", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("\u0101m", 1, False),
    ("am", 1, False), ("\u0113m", 1, False), ("\u012bm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True), ("as", 1, False),
    ("\u0101s", 1, False), ("es", 1, False), ("os", 1, True),
    ("ij", 1, False), ("\u012bs", 1, False), ("\u0113s", 1, False),
    ("is", 1, False), ("ie", 1, False), ("u", 1, True), ("a", 1, True),
    ("i", 1, True), ("e", 1, False), ("\u0101", 1, False),
    ("\u0113", 1, False), ("\u012b", 1, False), ("\u016b", 1, False),
    ("o", 1, False), ("s", 0, False), ("\u0161", 0, False),
)
_LV_VOWELS = frozenset("aeiou\u0101\u012b\u0113\u016b")


def _lv_unpalatalize(stem: str, removed_first: str) -> str:
    """LatvianStemmer.unpalatalize: undo palatalization on the stem tail;
    ``removed_first`` is the first char of the removed affix (the ``s[len]``
    peek in the reference)."""
    if removed_first == "u":
        if stem.endswith("k\u0161"):           # kš -> kst
            return stem[:-1] + "st"
        if stem.endswith("\u0146\u0146"):     # ņņ -> nn
            return stem[:-2] + "nn"
    for sfx in ("pj", "bj", "mj", "vj"):        # labial consonant + j
        if stem.endswith(sfx):
            return stem[:-1]
    table = (
        ("\u0161\u0146", "sn"), ("\u017e\u0146", "zn"),
        ("\u0161\u013c", "sl"), ("\u017e\u013c", "zl"),
        ("\u013c\u0146", "ln"), ("\u013c\u013c", "ll"),
    )
    for old, new in table:
        if stem.endswith(old):
            return stem[:-2] + new
    last = stem[-1:] 
    if last == "\u010d":
        return stem[:-1] + "c"
    if last == "\u013c":
        return stem[:-1] + "l"
    if last == "\u0146":
        return stem[:-1] + "n"
    return stem


def latvian_stem(term: str) -> str:
    """LatvianStemmer.stem (LatvianStemmer.kt:19-31)."""
    n_vowels = sum(1 for c in term if c in _LV_VOWELS)
    for sfx, vc, palatalizes in _LV_AFFIXES:
        if n_vowels > vc and len(term) >= len(sfx) + 3 and term.endswith(sfx):
            stem = term[: -len(sfx)]
            return _lv_unpalatalize(stem, sfx[0]) if palatalizes else stem
    return term


def latvian_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """LatvianAnalyzer.createComponents (LatvianAnalyzer.kt:53-59)."""
    stop = LATVIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = latvian_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
