"""Telugu analysis chain (``analysis/common/.../analysis/te/``).

* ``telugu_normalize`` — ``te/TeluguNormalizer.kt``: candrabindu -> bindu,
  visarga + ZWJ/ZWNJ deleted, long -> short vowels and matras, decomposed
  diphthongs/oo/au recomposed.
* ``telugu_stem`` — ``te/TeluguStemmer.kt``: longest-suffix-first strip over
  the published 4/2/1-char class lists, each guarded ``len > n+1``.
* ``telugu_analyzer`` — ``te/TeluguAnalyzer.kt:32-43`` chain (note: NO
  LowerCaseFilter): StandardTokenizer -> DecimalDigitFilter ->
  [SetKeywordMarkerFilter] -> IndicNormalizationFilter ->
  TeluguNormalizationFilter -> StopFilter(telugu) -> TeluguStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    standard_tokenize,
)

TELUGU_STOP_WORDS = frozenset((
    "చేయగలిగింది", "గురించి", "పై", "ప్రకారం", "అనుగుణంగా", "అడ్డంగా", "నిజంగా", "తర్వాత",
    "తర్వాత", "మళ్ళీ", "వ్యతిరేకంగా", "కాదు", "అందరూ", "అనుమతించు", "అనుమతిస్తుంది", "దాదాపు",
    "మాత్రమే", "వెంట", "ఇప్పటికే", "కూడా", "అయితే", "ఎప్పుడు", "వద్ద", "మధ్య",
    "మధ్య", "ఒక", "మరియు", "మరొక", "ఏ", "ఎవరో ఒకరు", "ఏమైనప్పటికి", "ఎవరైనా",
    "ఏదైనా", "ఏమైనప్పటికి", "ఎక్కడైనా", "వేరుగా", "కనిపిస్తాయి", "మెచ్చుకో", "తగిన", "ఉన్నారు",
    "కాదు", "చుట్టూ", "గా", "ఒక ప్రక్కన", "అడగండి", "అడగడం", "సంబంధం", "వద్ద",
    "అందుబాటులో", "దూరంగా",
))

_TE_SUFFIX_LEVELS = (
    (5, 4, (
        "\u0C33\u0C4D\u0C33\u0C41", "\u0C21\u0C4D\u0C32\u0C41",
    )),
    (3, 2, (
        "\u0C21\u0C41", "\u0C2E\u0C41", "\u0C35\u0C41", "\u0C32\u0C41",
        "\u0C28\u0C3F", "\u0C28\u0C41", "\u0C1A\u0C47", "\u0C15\u0C48",
        "\u0C32\u0C4B", "\u0C21\u0C41", "\u0C26\u0C3F", "\u0C15\u0C3F",
        "\u0C38\u0C41", "\u0C35\u0C48", "\u0C2A\u0C48",
    )),
    (2, 1, (
        "\u0C3F", "\u0C40", "\u0C41", "\u0C42",
        "\u0C46", "\u0C47", "\u0C4A", "\u0C4B",
        "\u0C3E",
    )),
)

_TE_MAP = {
    "\u0C00": "\u0C02", "\u0C01": "\u0C02",  # candrabindu -> bindu
    "\u0C14": "\u0C13", "\u0C10": "\u0C0F", "\u0C06": "\u0C05",  # long -> short
    "\u0C08": "\u0C07", "\u0C0A": "\u0C09",
    "\u0C40": "\u0C3F", "\u0C42": "\u0C41", "\u0C47": "\u0C46",  # matras
    "\u0C4B": "\u0C4A",
}
_TE_DELETE = frozenset(("\u0C03", "\u200D", "\u200C"))


def telugu_normalize(term: str) -> str:
    """TeluguNormalizer.kt:18-75 (single left-to-right pass; the two-char
    recompositions consume their second char)."""
    s = list(term)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in _TE_DELETE:
            del s[i]
            continue
        if ch == "\u0C46" and i + 1 < len(s) and s[i + 1] == "\u0C56":
            s[i] = "\u0C48"
            del s[i + 1]
        elif ch == "\u0C12" and i + 1 < len(s) and s[i + 1] == "\u0C55":
            s[i] = "\u0C13"
            del s[i + 1]
        elif ch == "\u0C12" and i + 1 < len(s) and s[i + 1] == "\u0C4C":
            s[i] = "\u0C14"
            del s[i + 1]
        else:
            s[i] = _TE_MAP.get(ch, ch)
        i += 1
    return "".join(s)


def telugu_stem(term: str) -> str:
    for guard, k, sufs in _TE_SUFFIX_LEVELS:
        if len(term) > guard:
            for suf in sufs:
                if term.endswith(suf):
                    return term[:-k]
    return term


def telugu_analyzer(
    stop_words=TELUGU_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """TeluguAnalyzer.createComponents (TeluguAnalyzer.kt:32-43)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(t.term)  # no LowerCaseFilter in chain
            is_keyword = term in excl
            term = indic_normalize(term)
            if not is_keyword:
                term = telugu_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = telugu_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
