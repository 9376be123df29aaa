"""Lithuanian analysis chain (``analysis/common/.../analysis/lt/``).

* ``lithuanian_snowball_stem`` — the published Snowball lithuanian
  algorithm (snowballstem.org; generated reference:
  ``snowball/ext/LithuanianStemmer.kt``): R1 marked past an initial "a-"
  for words longer than 6 chars, conflict-fixing rewrites, one pass of
  case-ending removal (step1), repeated suffix removal (step2), and the
  č/dž/gd consonant restorations between steps.
* ``lithuanian_analyzer`` — ``lt/LithuanianAnalyzer.kt:47-55`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(lithuanian) ->
  [SetKeywordMarkerFilter] -> SnowballFilter(LithuanianStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

LITHUANIAN_STOP_WORDS = frozenset((
    "ant", "apie", "ar", "arba", "aš", "be", "bei", "bet", "bus", "būti",
    "būtų", "buvo", "dėl", "gali", "į", "iki", "ir", "iš", "ja", "ją",
    "jai", "jais", "jam", "jame", "jas", "jei", "ji", "jį", "jie", "jiedu",
    "jiedvi", "jiedviem", "jiedviese", "jiems", "jis", "jo", "jodviem",
    "jog", "joje", "jomis", "joms", "jos", "jose", "jų", "judu", "judvi",
    "judviejų", "jųdviejų", "judviem", "judviese", "jumis", "jums",
    "jumyse", "juo", "juodu", "juodviese", "juos", "juose", "jus", "jūs",
    "jūsų", "ką", "kad", "kai", "kaip", "kas", "kiek", "kol", "kur",
    "kurie", "kuris", "man", "mane", "manęs", "manimi", "mano", "manyje",
    "mes", "metu", "mudu", "mudvi", "mudviejų", "mudviem", "mudviese",
    "mumis", "mums", "mumyse", "mus", "mūsų", "nei", "nes", "net", "nors",
    "nuo", "o", "pat", "per", "po", "prie", "prieš", "sau", "save",
    "savęs", "savimi", "savo", "savyje", "su", "tačiau", "tada", "tai",
    "taip", "tas", "tau", "tave", "tavęs", "tavimi", "tavyje", "ten", "to",
    "todėl", "tu", "tuo", "už", "visi", "yra",
))

_LT_STEP1 = (
    "a", "ia", "eria", "osna", "iosna", "uosna", "iuosna", "ysna",
    "ėsna", "e", "ie", "enie", "erie", "oje", "ioje", "uje", "iuje",
    "yje", "enyje", "eryje", "ėje", "ame", "iame", "sime", "ome",
    "ėme", "tumėme", "ose", "iose", "uose", "iuose", "yse", "enyse",
    "eryse", "ėse", "ate", "iate", "ite", "kite", "site", "ote",
    "tute", "ėte", "tumėte", "i", "ai", "iai", "eriai", "ei", "tumei",
    "ki", "imi", "erimi", "umi", "iumi", "si", "asi", "iasi", "esi",
    "iesi", "siesi", "isi", "aisi", "eisi", "tumeisi", "uisi", "osi",
    "ėjosi", "uosi", "iuosi", "siuosi", "usi", "ausi", "čiausi", "ąsi",
    "ėsi", "ųsi", "tųsi", "ti", "enti", "inti", "oti", "ioti", "uoti",
    "iuoti", "auti", "iauti", "yti", "ėti", "telėti", "inėti",
    "terėti", "ui", "iui", "eniui", "oj", "ėj", "k", "am", "iam",
    "iem", "im", "sim", "om", "tum", "ėm", "tumėm", "an", "on", "ion",
    "un", "iun", "ėn", "o", "io", "enio", "ėjo", "uo", "s", "as",
    "ias", "es", "ies", "is", "ais", "iais", "tumeis", "imis",
    "enimis", "omis", "iomis", "umis", "ėmis", "enis", "asis", "ysis",
    "ams", "iams", "iems", "ims", "enims", "erims", "oms", "ioms",
    "ums", "ėms", "ens", "os", "ios", "uos", "iuos", "ers", "us",
    "aus", "iaus", "ius", "ys", "enys", "erys", "ąs", "iąs", "ės",
    "amės", "iamės", "imės", "kimės", "simės", "omės", "ėmės",
    "tumėmės", "atės", "iatės", "sitės", "otės", "ėtės", "tumėtės",
    "įs", "ūs", "tųs", "at", "iat", "it", "sit", "ot", "ėt", "tumėt",
    "u", "au", "iau", "čiau", "iu", "eniu", "siu", "y", "ą", "ią", "ė",
    "ę", "į", "enį", "erį", "ų", "ių", "erų",
)

_LT_STEP2 = (
    "ing", "aj", "iaj", "iej", "oj", "ioj", "uoj", "iuoj", "auj", "ąj",
    "iąj", "ėj", "ųj", "iųj", "ok", "iok", "iuk", "uliuk", "učiuk",
    "išk", "iul", "yl", "ėl", "am", "dam", "jam", "zgan", "ain", "esn",
    "op", "iop", "ias", "ies", "ais", "iais", "os", "ios", "uos",
    "iuos", "aus", "iaus", "ąs", "iąs", "ęs", "utėait", "ant", "iant",
    "siant", "int", "ot", "uot", "iuot", "yt", "ėt", "ykšt", "iau",
    "dav", "sv", "šv", "ykšč", "ę", "ėję",
)

# conflict rewrites (a_2): suffix -> replacement
_LT_CONFLICTS = (
    ("okat\u0117s", "okat\u0117"), ("ait\u0117s", "ait\u0117"),
    ("uot\u0117s", "uot\u0117"), ("asius", "asys"), ("ojime", "ojimas"),
    ("\u0117jime", "\u0117jimas"), ("avime", "avimas"),
    ("okate", "okat\u0117"), ("aite", "ait\u0117"),
    ("uote", "uot\u0117"), ("esiu", "esys"),
)
_LT_VOWELS = frozenset("aeiouy\u0105\u0117\u0119\u012f\u016b\u0173")


def _lt_p1(word: str) -> int:
    n = len(word)
    start = 1 if (word.startswith("a") and n > 6) else 0
    i = start
    while i < n and word[i] not in _LT_VOWELS:
        i += 1
    while i < n and word[i] in _LT_VOWELS:
        i += 1
    return i + 1 if i < n else n


def _lt_strip_r1(word: str, p1: int, table) -> str | None:
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx) \
                and len(word) - len(sfx) >= p1:
            best = sfx
    return word[: -len(best)] if best else None


def _lt_fix_chdz(word: str) -> str:
    if word.endswith("d\u017e"):             # dž -> d
        return word[:-2] + "d"
    if word.endswith("\u010d"):              # č -> t
        return word[:-1] + "t"
    return word


def lithuanian_snowball_stem(word: str) -> str:
    p1 = _lt_p1(word)
    for sfx, repl in _LT_CONFLICTS:
        if word.endswith(sfx):
            word = word[: -len(sfx)] + repl
            break
    out = _lt_strip_r1(word, p1, _LT_STEP1)
    if out is not None:
        word = out
    word = _lt_fix_chdz(word)
    while True:
        out = _lt_strip_r1(word, p1, _LT_STEP2)
        if out is None:
            break
        word = out
    word = _lt_fix_chdz(word)
    if word.endswith("gd"):                    # gd -> g
        word = word[:-1]
    return word


def lithuanian_analyzer(stop_words=None, stem_exclusions=(),
                        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """LithuanianAnalyzer.createComponents (LithuanianAnalyzer.kt:47-55)."""
    stop = LITHUANIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = lithuanian_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
