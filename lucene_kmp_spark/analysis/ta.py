"""Tamil analysis chain (``analysis/common/.../analysis/ta/``).

* ``tamil_snowball_stem`` — the Snowball tamil algorithm (Damodharan's
  stemmer, snowballstem.org) as shipped by the reference (generated
  ``snowball/ext/TamilStemmer.kt``): ending normalization (fix_ending
  loops), question/pronoun prefix removal with va-start fixing, question /
  um / common-word / vetrumai-urupukal (case marker) / plural / command
  suffix removal, then repeated tense-suffix removal. Words of length
  <= 4 pass through untouched.
* ``tamil_analyzer`` — ``ta/TamilAnalyzer.kt:35-46`` chain:
  StandardTokenizer -> LowerCaseFilter -> DecimalDigitFilter ->
  [SetKeywordMarkerFilter] -> IndicNormalizationFilter (not
  keyword-aware) -> StopFilter(tamil) -> SnowballFilter(TamilStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

TAMIL_STOP_WORDS = frozenset((
    "#", "ஒரு", "என்று", "மற்றும்", "இந்த", "இது", "என்ற", "கொண்டு",
    "என்பது", "பல", "ஆகும்", "அல்லது", "அவர்", "நான்", "உள்ள", "அந்த",
    "இவர்", "என", "முதல்", "என்ன", "இருந்து", "சில", "என்", "போன்ற",
    "வேண்டும்", "வந்து", "இதன்", "அது", "அவன்", "தான்", "பலரும்",
    "என்னும்", "மேலும்", "பின்னர்", "கொண்ட", "இருக்கும்", "தனது", "உள்ளது",
    "போது", "என்றும்", "அதன்", "தன்", "பிறகு", "அவர்கள்", "வரை", "அவள்",
    "நீ", "ஆகிய", "இருந்தது", "உள்ளன", "வந்த", "இருந்த", "மிகவும்",
    "இங்கு", "மீது", "ஓர்", "இவை", "இந்தக்", "பற்றி", "வரும்", "வேறு",
    "இரு", "இதில்", "போல்", "இப்போது", "அவரது", "மட்டும்", "இந்தப்",
    "எனும்", "மேல்", "பின்", "சேர்ந்த", "ஆகியோர்", "எனக்கு", "இன்னும்",
    "அந்தப்", "அன்று", "ஒரே", "மிக", "அங்கு", "பல்வேறு", "விட்டு",
    "பெரும்", "அதை", "பற்றிய", "உன்", "அதிக", "அந்தக்", "பேர்", "இதனால்",
    "அவை", "அதே", "ஏன்", "முறை", "யார்", "என்பதை", "எல்லாம்", "மட்டுமே",
    "இங்கே", "அங்கே", "இடம்", "இடத்தில்", "அதில்", "நாம்", "அதற்கு",
    "எனவே", "பிற", "சிறு", "மற்ற", "விட", "எந்த", "எனவும்", "எனப்படும்",
    "எனினும்", "அடுத்த", "இதனை", "இதை", "கொள்ள", "இந்தத்", "இதற்கு",
    "அதனால்", "தவிர", "போல", "வரையில்", "சற்று", "எனக்",
))


_TA_VA_START = {
    "வு": 3, "வூ": 4, "வொ": 2, "வோ": 1,
}

_TA_CONSONANTS1 = (
    "க", "ங", "ச", "ஞ", "த", "ந", "ப", "ம", "ய", "வ",
)

_TA_IY_SIGNS = (
    "ி", "ீ", "ை",
)

_TA_VOWEL_SIGNS = (
    "ா", "ி", "ீ", "ு", "ூ", "ெ", "ே", "ை",
)

_TA_FIX = {
    "ந்த": 1, "ய": 1, "வ": 1, "னு": 8, "ுக்": 7, "ுக்க்": 7, "ட்க்": 3,
    "ற்க்": 4, "ங்": 9, "ட்ட்": 5, "த்த்": 6, "ந்த்": 1, "ந்": 1,
    "ட்ப்": 3, "ய்": 2, "ன்ற்": 4, "வ்": 1,
}

_TA_HARD = (
    "க", "ச", "ட", "த", "ப", "ற",
)

_TA_SOFT = (
    "ஞ", "ண", "ந", "ன", "ம", "ய", "ர", "ல", "ள", "ழ", "வ",
)

_TA_SIGNS_PULLI = (
    "ா", "ி", "ீ", "ு", "ூ", "ெ", "ே", "ை", "்",
)

_TA_INDEP_VOWELS_SHORT = (
    "அ", "இ", "உ",
)

_TA_PLURAL = {
    "கள்": 4, "ுங்கள்": 1, "ட்கள்": 3, "ற்கள்": 2,
}

_TA_QUESTION_SIGNS = (
    "ா", "ே", "ோ",
)

_TA_COMMAND = (
    "பி", "வி",
)

_TA_COMMON_END = {
    "பட்ட": 3, "பட்டண": 3, "தான": 3, "படிதான": 3, "ென": 1, "ாகிய": 1,
    "குரிய": 3, "ுடைய": 1, "ல்ல": 2, "ுள்ள": 1, "ாகி": 1, "படி": 3,
    "ின்றி": 1, "பற்றி": 3, "படு": 3, "விடு": 3, "பட்டு": 3,
    "விட்டு": 3, "பட்டது": 3, "ென்று": 1, "ுடை": 1, "ில்லை": 1,
    "ுடன்": 1, "ிடம்": 1, "ெல்லாம்": 3, "ெனும்": 1,
}

_TA_VETRUMAI = {
    "விட": 2, "ீ": 7, "ொடு": 2, "ோடு": 2, "து": 6, "ிருந்து": 2,
    "ின்று": 2, "ுடை": 2, "னை": 1, "கண்": 1, "ின்": 3, "முன்": 1,
    "ிடம்": 4, "ிற்": 2, "மேற்": 1, "ல்": 5, "ாமல்": 2, "ால்": 2,
    "ில்": 2, "மேல்": 1, "ுள்": 2, "கீழ்": 1,
}

_TA_INDEP_VOWELS = (
    "அ", "ஆ", "இ", "ஈ", "உ", "ஊ", "எ", "ஏ", "ஐ", "ஒ", "ஓ", "ஔ",
)

_TA_TENSE = {
    "க": 1, "த": 1, "ன": 1, "ப": 1, "ய": 1, "ா": 5, "கு": 6, "படு": 1,
    "து": 3, "ிற்று": 1, "னை": 1, "வை": 1, "னன்": 1, "பன்": 1,
    "வன்": 2, "ான்": 4, "னான்": 1, "மின்": 1, "னென்": 1, "ேன்": 5,
    "னம்": 1, "பம்": 1, "ாம்": 5, "கும்": 1, "டும்": 5, "தும்": 1,
    "றும்": 1, "ெம்": 5, "ேம்": 5, "ோம்": 5, "ாய்": 5, "னர்": 1,
    "பர்": 1, "ீயர்": 5, "வர்": 1, "ார்": 5, "னார்": 1, "மார்": 1,
    "கொண்டிர்": 1, "னிர்": 5, "ீர்": 5, "னள்": 1, "பள்": 1, "வள்": 1,
    "ாள்": 5, "னாள்": 1,
}

_TA_TENSE_PART = (
    "கிற", "கின்ற", "ாநின்ற", "கிற்", "கின்ற்", "ாநின்ற்",
)

_PULLI = "\u0bcd"      # ்
_AI = "\u0bc8"         # ை
_MA = "\u0bae"         # ம
_M_PULLI = "\u0bae\u0bcd"    # ம்
_IN = "\u0bbf\u0ba9\u0bcd"  # ின்
_UM = "\u0bc1\u0bae\u0bcd"  # ும்
_SA = "\u0b9a"         # ச


def _among(w: str, pos: int, table) -> tuple[str | None, int]:
    best = None
    head = w[:pos]
    for s in table:
        if (best is None or len(s) > len(best)) and head.endswith(s):
            best = s
    if best is None:
        return None, pos
    return best, pos - len(best)


def _fix_va_start(w: str) -> str:
    for pre, repl in _TA_VA_START.items():
        if w.startswith(pre):
            return {1: "\u0b93", 2: "\u0b92", 3: "\u0b89",
                    4: "\u0b8a"}[repl] + w[len(pre):]
    return w


def _fix_ending(w: str) -> tuple[str, bool]:
    """One fix_ending pass; returns (word, changed)."""
    if len(w) <= 3:
        return w, False
    m, p = _among(w, len(w), _TA_FIX)
    if m is not None:
        act = _TA_FIX[m]
        handled = True
        if act == 1:
            return w[:p], True
        if act == 2:
            if _among(w, p, _TA_IY_SIGNS)[0] is not None:
                return w[:p], True
            handled = False
        elif act == 3:
            return w[:p] + "\u0bb3\u0bcd", True       # -> ள்
        elif act == 4:
            return w[:p] + "\u0bb2\u0bcd", True       # -> ல்
        elif act == 5:
            return w[:p] + "\u0b9f\u0bc1", True       # -> டு
        elif act == 6:
            if _FLAGS["vetrumai"] and not w[:p].endswith(_AI):
                return w[:p] + _M_PULLI, True
            handled = False
        elif act == 7:
            return w[:p] + _PULLI, True
        elif act == 8:
            if _among(w, p, _TA_VOWEL_SIGNS)[0] is None:
                return w[:p], True
            handled = False
        elif act == 9:
            if w[:p].endswith((_AI, _PULLI)):
                return w[:p], True
            return w[:p] + _M_PULLI, True
        if handled:
            return w, False
    # final pulli cluster handling
    if not w.endswith(_PULLI):
        return w, False
    p = len(w) - 1
    m, q = _among(w, p, _TA_HARD)
    if m is not None:
        # optional second ்+hard-consonant
        if w[:q].endswith(_PULLI):
            m2, r = _among(w, q - 1, _TA_HARD)
            if m2 is not None:
                return w[:r], True
        return w[:q], True
    m, q = _among(w, p, _TA_SOFT)
    if m is not None and w[:q].endswith(_PULLI):
        return w[:q], True
    if _among(w, p, _TA_SIGNS_PULLI)[0] is not None:
        return w[:p], True
    return w, False


def _fix_endings(w: str) -> str:
    while True:
        w2, changed = _fix_ending(w)
        if not changed:
            return w
        w = w2


def _remove_question_prefixes(w: str) -> str:
    if w.startswith("\u0b8e") and len(w) >= 3 \
            and w[1] in _TA_CONSONANTS1 and w[2] == _PULLI:
        return _fix_va_start(w[3:])
    return w


def _remove_pronoun_prefixes(w: str) -> str:
    if len(w) >= 3 and w[0] in _TA_INDEP_VOWELS_SHORT \
            and w[1] in _TA_CONSONANTS1 and w[2] == _PULLI:
        return _fix_va_start(w[3:])
    return w


class _Flags(dict):
    pass


_FLAGS = {"vetrumai": False}


def tamil_snowball_stem(word: str) -> str:
    _FLAGS["vetrumai"] = False
    w, _ = _fix_ending(word)
    if len(w) <= 4:
        return w
    w = _remove_question_prefixes(w)
    w = _remove_pronoun_prefixes(w)

    # question suffixes
    if len(w) > 4:
        m, p = _among(w, len(w), _TA_QUESTION_SIGNS)
        if m is not None:
            w = w[:p] + _PULLI
        w = _fix_endings(w)

    # um
    if len(w) > 4 and w.endswith(_UM):
        w = w[:-3] + _PULLI
        w, _ = _fix_ending(w)

    # common word endings
    if len(w) > 4:
        m, p = _among(w, len(w), _TA_COMMON_END)
        if m is not None:
            act = _TA_COMMON_END[m]
            if act == 1:
                w = _fix_endings(w[:p] + _PULLI)
            elif act == 2:
                if _among(w, p, _TA_VOWEL_SIGNS)[0] is None:
                    w = _fix_endings(w[:p] + _PULLI)
            else:
                w = _fix_endings(w[:p])

    # vetrumai urupukal (case markers)
    if len(w) > 4:
        changed = False
        m, p = _among(w, len(w), _TA_VETRUMAI)
        if m is not None:
            act = _TA_VETRUMAI[m]
            if act == 1:
                w2, changed = w[:p], True
            elif act == 2:
                w2, changed = w[:p] + _PULLI, True
            elif act == 3:
                if not w[:p].endswith(_MA):
                    w2, changed = w[:p] + _PULLI, True
            elif act == 4:
                if len(w) >= 7:
                    w2, changed = w[:p] + _PULLI, True
            elif act == 5:
                if _among(w, p, _TA_VOWEL_SIGNS)[0] is None:
                    w2, changed = w[:p] + _PULLI, True
            elif act == 6:
                if _among(w, p, _TA_VOWEL_SIGNS)[0] is None:
                    w2, changed = w[:p], True
            elif act == 7:
                w2, changed = w[:p] + "\u0bbf", True
        if not changed and w.endswith(_AI):
            # ை -> ் unless a bare hard consonant precedes (a preceding
            # ்-stopped hard consonant is fine)
            p = len(w) - 1
            m, q = _among(w, p, _TA_HARD)
            if m is None or w[:q].endswith(_PULLI):
                w2, changed = w[:p] + _PULLI, True
        if changed:
            w = w2
            _FLAGS["vetrumai"] = True
            if w.endswith(_IN):
                w = w[:-3] + _PULLI
            w = _fix_endings(w)

    # plural suffix
    if True:
        m, p = _among(w, len(w), _TA_PLURAL)
        if m is not None:
            act = _TA_PLURAL[m]
            if act == 1:
                if _among(w, p, _TA_HARD)[0] is not None:
                    w = w[:p] + "\u0bc1\u0b99\u0bcd"
                else:
                    w = w[:p] + _PULLI
            elif act == 2:
                w = w[:p] + "\u0bb2\u0bcd"
            elif act == 3:
                w = w[:p] + "\u0bb3\u0bcd"
            else:
                w = w[:p]

    # command suffixes
    if len(w) > 4:
        m, p = _among(w, len(w), _TA_COMMAND)
        if m is not None:
            w = w[:p]

    # tense suffixes, repeated
    found = True
    while found:
        if len(w) <= 4:
            break
        found = False
        m, p = _among(w, len(w), _TA_TENSE)
        if m is not None:
            act = _TA_TENSE[m]
            if act == 1:
                w, found = w[:p], True
            elif act == 2:
                if _among(w, p, _TA_INDEP_VOWELS)[0] is None:
                    w, found = w[:p], True
            elif act == 3:
                if _among(w, p, _TA_VOWEL_SIGNS)[0] is None:
                    w, found = w[:p], True
            elif act == 4:
                if not w[:p].endswith(_SA):
                    w, found = w[:p] + _PULLI, True
            elif act == 5:
                w, found = w[:p] + _PULLI, True
            elif act == 6:
                if w[:p].endswith(_PULLI):
                    w, found = w[:p], True
        m, p = _among(w, len(w), _TA_TENSE_PART)
        if m is not None:
            w, found = w[:p], True
        w = _fix_endings(w)
    return w


def tamil_analyzer(stop_words=None, stem_exclusions=(),
                   max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """TamilAnalyzer.createComponents (TamilAnalyzer.kt:35-46)."""
    stop = TAMIL_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            term = indic_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = tamil_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
