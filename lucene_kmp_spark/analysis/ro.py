"""Romanian analysis chain (``analysis/common/.../analysis/ro/``).

* ``romanian_normalize`` — ``ro/RomanianNormalizer.kt``: cedilla forms
  (ş U+015F / ţ U+0163 and capitals) folded to the comma-below forms
  (ș U+0219 / ț U+021B).
* ``romanian_snowball_stem`` — the published Snowball romanian algorithm
  (snowballstem.org; reference: ``snowball/ext/RomanianStemmer.kt``):
  cedilla norm, u/i-between-vowels marking, RV/R1/R2 regions, step_0
  plural/article removal, repeated combo-suffix reduction, standard-suffix
  removal in R2, verb-suffix removal in RV, final-vowel removal in RV,
  unmarking. Two spots follow the published algorithm (= the upstream
  Lucene generated stemmer) where the kmp port flattened Snowball control
  flow: ``repeat combo_suffix`` loops until failure, and verb_suffix runs
  only when no standard suffix was removed.
* ``romanian_analyzer`` — ``ro/RomanianAnalyzer.kt`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(romanian, both
  cedilla+comma spellings) -> RomanianNormalizationFilter ->
  [SetKeywordMarkerFilter] -> SnowballFilter(RomanianStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

ROMANIAN_STOP_WORDS = frozenset((
    "#", "#", "#", "#", "acea", "aceasta", "această", "aceea", "acei",
    "aceia", "acel", "acela", "acele", "acelea", "acest", "acesta",
    "aceste", "acestea", "acești", "aceşti", "aceștia", "aceştia", "acolo",
    "acum", "ai", "aia", "aibă", "aici", "al", "ăla", "ale", "alea",
    "ălea", "altceva", "altcineva", "am", "ar", "are", "aș", "aş",
    "așadar", "aşadar", "asemenea", "asta", "ăsta", "astăzi", "astea",
    "ăstea", "ăștia", "ăştia", "asupra", "ați", "aţi", "au", "avea",
    "avem", "aveți", "aveţi", "azi", "bine", "bucur", "bună", "ca", "că",
    "căci", "când", "care", "cărei", "căror", "cărui", "cât", "câte",
    "câți", "câţi", "către", "câtva", "ce", "cel", "ceva", "chiar", "cînd",
    "cine", "cineva", "cît", "cîte", "cîți", "cîţi", "cîtva", "contra",
    "cu", "cum", "cumva", "curând", "curînd", "da", "dă", "dacă", "dar",
    "datorită", "de", "deci", "deja", "deoarece", "departe", "deși",
    "deşi", "din", "dinaintea", "dintr", "dintre", "drept", "după", "ea",
    "ei", "el", "ele", "eram", "este", "ești", "eşti", "eu", "face",
    "fără", "fi", "fie", "fiecare", "fii", "fim", "fiți", "fiţi", "iar",
    "ieri", "îi", "îl", "îmi", "împotriva", "în", "înainte", "înaintea",
    "încât", "încît", "încotro", "între", "întrucât", "întrucît", "îți",
    "îţi", "la", "lângă", "le", "li", "lîngă", "lor", "lui", "mă", "mâine",
    "mea", "mei", "mele", "mereu", "meu", "mi", "mine", "mult", "multă",
    "mulți", "mulţi", "ne", "nicăieri", "nici", "nimeni", "niște", "nişte",
    "noastră", "noastre", "noi", "noștri", "noştri", "nostru", "nu", "ori",
    "oricând", "oricare", "oricât", "orice", "oricînd", "oricine",
    "oricît", "oricum", "oriunde", "până", "pe", "pentru", "peste", "pînă",
    "poate", "pot", "prea", "prima", "primul", "prin", "printr", "sa",
    "să", "săi", "sale", "sau", "său", "se", "și", "şi", "sînt", "sîntem",
    "sînteți", "sînteţi", "spre", "sub", "sunt", "suntem", "sunteți",
    "sunteţi", "ta", "tăi", "tale", "tău", "te", "ți", "ţi", "ție", "ţie",
    "tine", "toată", "toate", "tot", "toți", "toţi", "totuși", "totuşi",
    "tu", "un", "una", "unde", "undeva", "unei", "unele", "uneori", "unor",
    "vă", "vi", "voastră", "voastre", "voi", "voștri", "voştri", "vostru",
    "vouă", "vreo", "vreun",
))


_RO_STEP0 = {
    "ea": 3, "ația": 7, "aua": 2, "iua": 4, "ație": 7, "ele": 3, "ile": 5,
    "iile": 4, "iei": 4, "atei": 6, "ii": 4, "ului": 1, "ul": 1, "elor": 3,
    "ilor": 4, "iilor": 4,
}

_RO_COMBO = {
    "icala": 4, "iciva": 4, "ativa": 5, "itiva": 6, "icale": 4,
    "ațiune": 5, "ițiune": 6, "atoare": 5, "itoare": 6, "ătoare": 5,
    "icitate": 4, "abilitate": 1, "ibilitate": 2, "ivitate": 3, "icive": 4,
    "ative": 5, "itive": 6, "icali": 4, "atori": 5, "icatori": 4,
    "itori": 6, "ători": 5, "icitati": 4, "abilitati": 1, "ivitati": 3,
    "icivi": 4, "ativi": 5, "itivi": 6, "icităi": 4, "abilităi": 1,
    "ivităi": 3, "icități": 4, "abilități": 1, "ivități": 3, "ical": 4,
    "ator": 5, "icator": 4, "itor": 6, "ător": 5, "iciv": 4, "ativ": 5,
    "itiv": 6, "icală": 4, "icivă": 4, "ativă": 5, "itivă": 6,
}

_RO_STD = {
    "ica": 1, "abila": 1, "ibila": 1, "oasa": 1, "ata": 1, "ita": 1,
    "anta": 1, "ista": 3, "uta": 1, "iva": 1, "ic": 1, "ice": 1,
    "abile": 1, "ibile": 1, "isme": 3, "iune": 2, "oase": 1, "ate": 1,
    "itate": 1, "ite": 1, "ante": 1, "iste": 3, "ute": 1, "ive": 1,
    "ici": 1, "abili": 1, "ibili": 1, "iuni": 2, "atori": 1, "osi": 1,
    "ati": 1, "itati": 1, "iti": 1, "anti": 1, "isti": 3, "uti": 1,
    "iști": 3, "ivi": 1, "ităi": 1, "oși": 1, "ități": 1, "abil": 1,
    "ibil": 1, "ism": 3, "ator": 1, "os": 1, "at": 1, "it": 1, "ant": 1,
    "ist": 3, "ut": 1, "iv": 1, "ică": 1, "abilă": 1, "ibilă": 1,
    "oasă": 1, "ată": 1, "ită": 1, "antă": 1, "istă": 3, "ută": 1,
    "ivă": 1,
}

_RO_VERB = {
    "ea": 1, "ia": 1, "esc": 1, "ăsc": 1, "ind": 1, "ând": 1, "are": 1,
    "ere": 1, "ire": 1, "âre": 1, "se": 2, "ase": 1, "sese": 2, "ise": 1,
    "use": 1, "âse": 1, "ește": 1, "ăște": 1, "eze": 1, "ai": 1, "eai": 1,
    "iai": 1, "sei": 2, "ești": 1, "ăști": 1, "ui": 1, "ezi": 1, "âi": 1,
    "ași": 1, "seși": 2, "aseși": 1, "seseși": 2, "iseși": 1, "useși": 1,
    "âseși": 1, "iși": 1, "uși": 1, "âși": 1, "ați": 2, "eați": 1,
    "iați": 1, "eți": 2, "iți": 2, "âți": 2, "arăți": 1, "serăți": 2,
    "aserăți": 1, "seserăți": 2, "iserăți": 1, "userăți": 1, "âserăți": 1,
    "irăți": 1, "urăți": 1, "ârăți": 1, "am": 1, "eam": 1, "iam": 1,
    "em": 2, "asem": 1, "sesem": 2, "isem": 1, "usem": 1, "âsem": 1,
    "im": 2, "âm": 2, "ăm": 2, "arăm": 1, "serăm": 2, "aserăm": 1,
    "seserăm": 2, "iserăm": 1, "userăm": 1, "âserăm": 1, "irăm": 1,
    "urăm": 1, "ârăm": 1, "au": 1, "eau": 1, "iau": 1, "indu": 1,
    "ându": 1, "ez": 1, "ească": 1, "ară": 1, "seră": 2, "aseră": 1,
    "seseră": 2, "iseră": 1, "useră": 1, "âseră": 1, "iră": 1, "ură": 1,
    "âră": 1, "ează": 1,
}

_RO_VOWEL_SFX = {
    "a": 1, "e": 1, "ie": 1, "i": 1, "ă": 1,
}


_RO_VOWELS = frozenset("aeiou\u00e2\u00ee\u0103")
_RO_CEDILLA = str.maketrans({"\u015e": "\u0218", "\u015f": "\u0219",
                             "\u0162": "\u021a", "\u0163": "\u021b"})


def romanian_normalize(term: str) -> str:
    """RomanianNormalizer.normalize: cedilla -> comma-below forms."""
    return term.translate(_RO_CEDILLA)


def _ro_longest(word: str, table: dict,
                min_start: int = 0) -> tuple[str | None, int]:
    """Longest table suffix matching word. ``min_start`` emulates snowball's
    setlimit during matching (verb step): suffixes beginning before it are
    not candidates, so a shorter in-region entry can win."""
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx) \
                and len(word) - len(sfx) >= min_start:
            best = sfx
    return (best, table[best]) if best else (None, 0)


def _ro_prelude(word: str) -> str:
    """u/i between vowels -> U/I (consonantal marking)."""
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in ("u", "i") and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


def _ro_mark_rv(word: str) -> int:
    n = len(word)
    if n < 2:
        return n
    if word[0] in _RO_VOWELS:
        if word[1] not in _RO_VOWELS:
            # vowel consonant: to after the next vowel
            for j in range(2, n):
                if word[j] in _RO_VOWELS:
                    return j + 1
            return n
        # vowel vowel: to after the next consonant
        for j in range(2, n):
            if word[j] not in _RO_VOWELS:
                return j + 1
        return n
    if word[1] not in _RO_VOWELS:
        # consonant consonant: to after the next vowel
        for j in range(2, n):
            if word[j] in _RO_VOWELS:
                return j + 1
        return n
    return 3 if n > 2 else n  # consonant vowel: third letter


def _ro_r1(word: str, start: int = 0) -> int:
    n = len(word)
    i = start
    while i < n and word[i] not in _RO_VOWELS:
        i += 1
    while i < n and word[i] in _RO_VOWELS:
        i += 1
    return i + 1 if i < n else n


def romanian_snowball_stem(word: str) -> str:
    word = word.translate(_RO_CEDILLA)
    word = _ro_prelude(word)
    pv = _ro_mark_rv(word)
    p1 = _ro_r1(word)
    p2 = _ro_r1(word, p1)

    # step 0: plurals / articles (R1)
    m, act = _ro_longest(word, _RO_STEP0)
    if m and len(word) - len(m) >= p1:
        pre = word[: -len(m)]
        if act == 1:
            word = pre
        elif act == 2:
            word = pre + "a"
        elif act == 3:
            word = pre + "e"
        elif act == 4:
            word = pre + "i"
        elif act == 5:
            if not pre.endswith("ab"):
                word = pre + "i"
        elif act == 6:
            word = pre + "at"
        elif act == 7:
            word = pre + "a\u021bi"

    # standard suffixes: repeat combo reduction (R1), then removal (R2)
    removed = False
    while True:
        m, act = _ro_longest(word, _RO_COMBO)
        if not m or len(word) - len(m) < p1:
            break
        pre = word[: -len(m)]
        word = pre + {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at",
                      6: "it"}[act]
        removed = True
    m, act = _ro_longest(word, _RO_STD)
    if m and len(word) - len(m) >= p2:
        pre = word[: -len(m)]
        if act == 1:
            word = pre
            removed = True
        elif act == 2:
            if pre.endswith("\u021b"):      # țiune/țiuni -> t
                word = pre[:-1] + "t"
                removed = True
        elif act == 3:
            word = pre + "ist"
            removed = True

    # verb suffixes (RV) only when no standard suffix was removed
    if not removed:
        m, act = _ro_longest(word, _RO_VERB, min_start=pv)
        if m:
            pre = word[: -len(m)]
            if act == 1:
                k = len(pre) - 1
                if k >= pv and (pre[-1] not in _RO_VOWELS or pre[-1] == "u"):
                    word = pre
            elif act == 2:
                word = pre

    # final vowel (RV)
    m, _act = _ro_longest(word, _RO_VOWEL_SFX)
    if m and len(word) - len(m) >= pv:
        word = word[: -len(m)]

    return word.replace("I", "i").replace("U", "u")


def romanian_analyzer(stop_words=None, stem_exclusions=(),
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """RomanianAnalyzer.createComponents (RomanianAnalyzer.kt:47-58)."""
    stop = ROMANIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = _lower_simple(t.term)
            if term in stop:
                continue
            term = romanian_normalize(term)
            if term not in excl:
                term = romanian_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
