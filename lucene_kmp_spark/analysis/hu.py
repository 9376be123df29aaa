"""Hungarian analysis chain (``analysis/common/.../analysis/hu/``).

* ``hungarian_light_stem`` — ``hu/HungarianLightStemmer.kt``: the UniNE
  light stemmer from Savoy, "Light Stemming Approaches for the French,
  Portuguese, German and Hungarian Languages" (SAC 2006): accent fold,
  case-ending removal, possessive removal, plural removal, final-vowel
  normalization.
* ``hungarian_analyzer`` — ``hu/HungarianAnalyzer.kt`` chain:
  StandardTokenizer -> LowerCaseFilter -> StopFilter(hungarian) ->
  [SetKeywordMarkerFilter] -> HungarianLightStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

HUNGARIAN_STOP_WORDS = frozenset((
    "a", "ahogy", "ahol", "aki", "akik", "akkor", "alatt", "által",
    "általában", "amely", "amelyek", "amelyekben", "amelyeket", "amelyet",
    "amelynek", "ami", "amit", "amolyan", "amíg", "amikor", "át", "abban",
    "ahhoz", "annak", "arra", "arról", "az", "azok", "azon", "azt",
    "azzal", "azért", "aztán", "azután", "azonban", "bár", "be", "belül",
    "benne", "cikk", "cikkek", "cikkeket", "csak", "de", "e", "eddig",
    "egész", "egy", "egyes", "egyetlen", "egyéb", "egyik", "egyre",
    "ekkor", "el", "elég", "ellen", "elő", "először", "előtt", "első",
    "én", "éppen", "ebben", "ehhez", "emilyen", "ennek", "erre", "ez",
    "ezt", "ezek", "ezen", "ezzel", "ezért", "és", "fel", "felé", "hanem",
    "hiszen", "hogy", "hogyan", "igen", "így", "illetve", "ill.", "ill",
    "ilyen", "ilyenkor", "ison", "ismét", "itt", "jó", "jól", "jobban",
    "kell", "kellett", "keresztül", "keressünk", "ki", "kívül", "között",
    "közül", "legalább", "lehet", "lehetett", "legyen", "lenne", "lenni",
    "lesz", "lett", "maga", "magát", "majd", "majd", "már", "más", "másik",
    "meg", "még", "mellett", "mert", "mely", "melyek", "mi", "mit", "míg",
    "miért", "milyen", "mikor", "minden", "mindent", "mindenki", "mindig",
    "mint", "mintha", "mivel", "most", "nagy", "nagyobb", "nagyon", "ne",
    "néha", "nekem", "neki", "nem", "néhány", "nélkül", "nincs", "olyan",
    "ott", "össze", "ő", "ők", "őket", "pedig", "persze", "rá", "s",
    "saját", "sem", "semmi", "sok", "sokat", "sokkal", "számára",
    "szemben", "szerint", "szinte", "talán", "tehát", "teljes", "tovább",
    "továbbá", "több", "úgy", "ugyanis", "új", "újabb", "újra", "után",
    "utána", "utolsó", "vagy", "vagyis", "valaki", "valami", "valamint",
    "való", "vagyok", "van", "vannak", "volt", "voltam", "voltak",
    "voltunk", "vissza", "vele", "viszont", "volna",
))


_HU_FOLD = str.maketrans({
    "\u00e1": "a",                       # á
    "\u00eb": "e", "\u00e9": "e",       # ë é
    "\u00ed": "i",                       # í
    "\u00f3": "o", "\u0151": "o", "\u00f5": "o", "\u00f6": "o",  # ó ő õ ö
    "\u00fa": "u", "\u0171": "u", "\u0169": "u", "\u00fb": "u", "\u00fc": "u",  # ú ű ũ û ü
})
_HU_VOWELS = frozenset("aeiouy")

_HU_CASE_3 = ("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben", "bol",
              "nal", "nel", "hoz", "hez", "tol")
_HU_CASE_2 = ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig")


def _hu_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s.endswith(_HU_CASE_3):
            return s[:-3]
        if s.endswith(("al", "el")) and s[-3] not in _HU_VOWELS \
                and s[-3] == s[-4]:
            return s[:-3]
    if n > 4:
        if s.endswith(_HU_CASE_2):
            return s[:-2]
        if s.endswith(("on", "en")) and s[-3] not in _HU_VOWELS:
            return s[:-2]
        last = s[-1]
        if last in ("t", "n"):
            return s[:-1]
        if last in ("a", "e") and s[-2] == s[-3] and s[-2] not in _HU_VOWELS:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWELS and s.endswith(("atok", "otok", "etek")):
            return s[:-4]
        if s.endswith(("itek", "itok")):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWELS and s.endswith(("unk", "tok", "tek")):
            return s[:-3]
        if s[-4] in _HU_VOWELS and s.endswith("juk"):
            return s[:-3]
        if s.endswith("ink"):
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWELS and s.endswith(
                ("am", "em", "om", "ad", "ed", "od", "uk")):
            return s[:-2]
        if s[-3] in _HU_VOWELS and s.endswith(("nk", "ja", "je")):
            return s[:-2]
        if s.endswith(("im", "id", "ik")):
            return s[:-2]
    if n > 3:
        last = s[-1]
        if last in ("a", "e") and s[-2] not in _HU_VOWELS:
            return s[:-1]
        if last in ("m", "d") and s[-2] in _HU_VOWELS:
            return s[:-1]
        if last == "i":
            return s[:-1]
    return s


def _hu_remove_plural(s: str) -> str:
    if len(s) > 3 and s[-1] == "k":
        if s[-2] in ("a", "o", "e"):
            return s[:-2] if len(s) > 4 else s[:-1]
        return s[:-1]
    return s


def _hu_normalize(s: str) -> str:
    if len(s) > 3 and s[-1] in ("a", "e", "i", "o"):
        return s[:-1]
    return s


def hungarian_light_stem(term: str) -> str:
    """HungarianLightStemmer.stem (HungarianLightStemmer.kt:48-66)."""
    s = term.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    s = _hu_remove_plural(s)
    return _hu_normalize(s)


def hungarian_analyzer(stop_words=None, stem_exclusions=(),
                       max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """HungarianAnalyzer.createComponents (HungarianAnalyzer.kt:44-53)."""
    stop = HUNGARIAN_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = hungarian_light_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
