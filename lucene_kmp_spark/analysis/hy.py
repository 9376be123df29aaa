"""Armenian analysis chain (``analysis/common/.../analysis/hy/``).

* ``armenian_snowball_stem`` — the published Snowball armenian algorithm
  (snowballstem.org; generated reference: ``snowball/ext/ArmenianStemmer.kt``):
  RV/R2 regions, then within RV: ending (R2-checked) -> verb -> adjective ->
  noun suffix deletion, each longest-match.
* ``armenian_analyzer`` — ``hy/ArmenianAnalyzer.kt:55-61`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(armenian) ->
  [SetKeywordMarkerFilter] -> SnowballFilter(ArmenianStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

ARMENIAN_STOP_WORDS = frozenset((
    "#", "այդ", "այլ", "այն", "այս", "dու", "dուք", "եմ", "են", "ենք",
    "ես", "եք", "է", "էի", "էին", "էինք", "էիր", "էիք", "էր", "ըստ", "թ",
    "ի", "ին", "իսկ", "իր", "կամ", "համար", "հետ", "հետո", "մենք", "մեջ",
    "մի", "ն", "նա", "նաև", "նրա", "նրանք", "որ", "որը", "որոնք", "որպես",
    "ու", "ում", "պիտի", "վրա", "և",
))


_HY_ADJECTIVE = (
    "րորդ", "երորդ", "ալի", "ակի", "որակ", "եղ", "ական", "արան", "են",
    "եկեն", "երեն", "որէն", "ին", "գին", "ովին", "լայն", "վուն", "պես",
    "իվ", "ատ", "ավետ", "կոտ", "բար",
)

_HY_VERB = (
    "ա", "ացա", "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի", "ալ", "ըալ",
    "անալ", "ենալ", "ացնալ", "ել", "ըել", "նել", "ցնել", "եցնել",
    "չել", "վել", "ացվել", "եցվել", "տել", "ատել", "ոտել", "կոտել",
    "ված", "ում", "վում", "ան", "ցան", "ացան", "ացրին", "ացին", "եցին",
    "վեցին", "ալիս", "ելիս", "ավ", "ացավ", "եցավ", "ալով", "ելով",
    "ար", "ացար", "եցար", "ացրիր", "ացիր", "եցիր", "վեցիր", "աց", "եց",
    "ացրեց", "ալուց", "ելուց", "ալու", "ելու", "աք", "ցաք", "ացաք",
    "ացրիք", "ացիք", "եցիք", "վեցիք", "անք", "ցանք", "ացանք", "ացրինք",
    "ացինք", "եցինք", "վեցինք",
)

_HY_NOUN = (
    "որդ", "ույթ", "ուհի", "ցի", "իլ", "ակ", "յակ", "անակ", "իկ",
    "ուկ", "ան", "պան", "ստան", "արան", "եղէն", "յուն", "ություն",
    "ածո", "իչ", "ուս", "ուստ", "գար", "վոր", "ավոր", "ոց", "անօց",
    "ու", "ք", "չեք", "իք", "ալիք", "անիք", "վածք", "ույք", "ենք",
    "ոնք", "ունք", "մունք", "իչք", "արք",
)

_HY_ENDING = (
    "սա", "վա", "ամբ", "դ", "անդ", "ությանդ", "վանդ", "ոջդ", "երդ",
    "ներդ", "ուդ", "ը", "անը", "ությանը", "վանը", "ոջը", "երը", "ները",
    "ի", "վի", "երի", "ների", "անում", "երում", "ներում", "ն", "ան",
    "ության", "վան", "ին", "երին", "ներին", "ությանն", "երն", "ներն",
    "ուն", "ոջ", "ությանս", "վանս", "ոջս", "ով", "անով", "վով", "երով",
    "ներով", "եր", "ներ", "ց", "ից", "վանից", "ոջից", "վից", "երից",
    "ներից", "ցից", "ոց", "ուց",
)

# ա ե է ը ի ո ւ օ
_HY_VOWELS = frozenset("\u0561\u0565\u0567\u0568\u056b\u0578\u0582\u0585")


def _hy_regions(word: str) -> tuple[int, int]:
    n = len(word)
    i = 0
    while i < n and word[i] not in _HY_VOWELS:
        i += 1
    if i >= n:
        return n, n
    pv = i + 1                       # after the first vowel
    j = pv
    while j < n and word[j] in _HY_VOWELS:
        j += 1
    if j >= n:
        return pv, n
    j += 1                           # past the first consonant
    while j < n and word[j] not in _HY_VOWELS:
        j += 1
    if j >= n:
        return pv, n
    j += 1                           # past the second vowel
    while j < n and word[j] in _HY_VOWELS:
        j += 1
    if j >= n:
        return pv, n
    return pv, j + 1                 # past the following consonant


def _hy_strip(word: str, table, min_start: int) -> str:
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx) \
                and len(word) - len(sfx) >= min_start:
            best = sfx
    return word[: -len(best)] if best else word


def armenian_snowball_stem(word: str) -> str:
    pv, p2 = _hy_regions(word)
    if len(word) < pv:
        return word
    # ending requires R2 (match limited to RV)
    best = None
    for sfx in _HY_ENDING:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx) \
                and len(word) - len(sfx) >= pv:
            best = sfx
    if best and len(word) - len(best) >= p2:
        word = word[: -len(best)]
    word = _hy_strip(word, _HY_VERB, pv)
    word = _hy_strip(word, _HY_ADJECTIVE, pv)
    word = _hy_strip(word, _HY_NOUN, pv)
    return word


def armenian_analyzer(stop_words=None, stem_exclusions=(),
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """ArmenianAnalyzer.createComponents (ArmenianAnalyzer.kt:55-61)."""
    stop = ARMENIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = armenian_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
