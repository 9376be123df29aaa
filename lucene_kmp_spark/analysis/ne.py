"""Nepali analysis chain (``analysis/common/.../analysis/ne/``).

* ``nepali_snowball_stem`` — the published Snowball nepali algorithm
  (snowballstem.org; generated reference: ``snowball/ext/NepaliStemmer.kt``):
  one pass of postposition removal (category 1, with the ए/े guard on the
  क-postpositions), then a loop that conditionally strips noun/verb
  inflections (category 2: ँ/ं after यौ/छौ/नौ/थे, ै after त्र) and
  repeats while a category-3 suffix keeps matching.
* ``nepali_analyzer`` — ``ne/NepaliAnalyzer.kt:35-46`` chain:
  StandardTokenizer -> LowerCaseFilter -> DecimalDigitFilter ->
  [SetKeywordMarkerFilter] -> IndicNormalizationFilter (not keyword-aware)
  -> StopFilter(nepali) -> SnowballFilter(NepaliStemmer).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

NEPALI_STOP_WORDS = frozenset((
    "#", "छ", "र", "पनि", "छन्", "लागि", "भएको", "गरेको", "भने", "गर्न",
    "गर्ने", "हो", "तथा", "यो", "रहेको", "उनले", "थियो", "हुने", "गरेका",
    "थिए", "गर्दै", "तर", "नै", "को", "मा", "हुन्", "भन्ने", "हुन", "गरी",
    "त", "हुन्छ", "अब", "के", "रहेका", "गरेर", "छैन", "दिए", "भए", "यस",
    "ले", "गर्नु", "औं", "सो", "त्यो", "कि", "जुन", "यी", "का", "गरि",
    "ती", "न", "छु", "छौं", "लाई", "नि", "उप", "अक्सर", "आदि", "कसरी",
    "क्रमशः", "चाले", "अगाडी", "अझै", "अनुसार", "अन्तर्गत", "अन्य",
    "अन्यत्र", "अन्यथा", "अरु", "अरुलाई", "अर्को", "अर्थात", "अर्थात्",
    "अलग", "आए", "आजको", "ओठ", "आत्म", "आफू", "आफूलाई", "आफ्नै", "आफ्नो",
    "आयो", "उदाहरण", "उनको", "उहालाई", "एउटै", "एक", "एकदम", "कतै", "कम",
    "कसै", "कसैले", "कहाँबाट", "कहिलेकाहीं", "का", "किन", "किनभने", "कुनै",
    "कुरा", "कृपया", "केही", "कोही", "गए", "गरौं", "गर्छ", "गर्छु",
    "गर्नुपर्छ", "गयौ", "गैर", "चार", "चाहनुहुन्छ", "चाहन्छु", "चाहिए",
    "छू", "जताततै", "जब", "जबकि", "जसको", "जसबाट", "जसमा", "जसलाई", "जसले",
    "जस्तै", "जस्तो", "जस्तोसुकै", "जहाँ", "जान", "जाहिर", "जे", "जो",
    "ठीक", "तत्काल", "तदनुसार", "तपाईको", "तपाई", "पर्याप्त", "पहिले",
    "पहिलो", "पहिल्यै", "पाँच", "पाँचौं", "तल", "तापनी", "तिनी", "तिनीहरू",
    "तिनीहरुको", "तिनिहरुलाई", "तिमी", "तिर", "तीन", "तुरुन्तै", "तेस्रो",
    "तेस्कारण", "पूर्व", "प्रति", "प्रतेक", "प्लस", "फेरी", "बने",
    "त्सपछि", "त्सैले", "त्यहाँ", "थिएन", "दिनुभएको", "दिनुहुन्छ", "दुई",
    "देखि", "बरु", "बारे", "बाहिर", "देखिन्छ", "देखियो", "देखे", "देखेको",
    "देखेर", "दोस्रो", "धेरै", "नजिकै", "नत्र", "नयाँ", "निम्ति", "बाहेक",
    "बीच", "बीचमा", "भन", "निम्न", "निम्नानुसार", "निर्दिष्ट", "नौ",
    "पक्का", "पक्कै", "पछि", "पछिल्लो", "पटक", "पर्छ", "पर्थ्यो", "भन्छन्",
    "भन्", "भन्छु", "भन्दा", "भन्नुभयो", "भर", "भित्र", "भित्री", "म",
    "मलाई", "मात्र", "माथि", "मुख्य", "मेरो", "यति", "यथोचित", "यदि",
    "यद्यपि", "यसको", "यसपछि", "यसबाहेक", "यसरी", "यसो", "यस्तो", "यहाँ",
    "यहाँसम्म", "या", "रही", "राखे", "राख्छ", "राम्रो", "रूप", "लगभग",
    "वरीपरी", "वास्तवमा", "बिरुद्ध", "बिशेष", "सायद", "शायद", "संग",
    "संगै", "सक्छ", "सट्टा", "सधै", "सबै", "सबैलाई", "समय", "सम्भव",
    "सम्म", "सही", "साँच्चै", "सात", "साथ", "साथै", "सारा", "सोही",
    "स्पष्ट", "हरे", "हरेक",
))


_NE_CAT1_DELETE = (
    "लाइ", "लाई", "सँग", "संग", "मार्फत", "रत",
    "मा", "द्वारा", "पछि", "ले", "सँगै", "मै",
)

# postpositions का/कि/की/कै/को: stripped unless preceded by ए or े
_NE_CAT1_COND = (
    "का", "कि", "की", "कै", "को",
)

_NE_CAT3 = (
    "थिए", "छ", "इछ", "एछ", "िछ", "ेछ",
    "नेछ", "हुनेछ", "इन्छ", "िन्छ", "हुन्छ", "एका",
    "इएका", "िएका", "ेका", "नेका", "दा", "इदा",
    "िदा", "देखि", "माथि", "एकी", "इएकी", "िएकी",
    "ेकी", "देखी", "थी", "दी", "छु", "एछु",
    "ेछु", "नेछु", "नु", "हरु", "हरू", "छे",
    "थे", "ने", "एकै", "ेकै", "नेकै", "दै",
    "इदै", "िदै", "एको", "इएको", "िएको", "ेको",
    "नेको", "दो", "इदो", "िदो", "यो", "इयो",
    "भयो", "ियो", "थियो", "दियो", "थ्यो", "छौ",
    "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ", "यौ",
    "थियौ", "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्",
    "िछन्", "ेछन्", "नेछन्", "लान्", "छिन्", "थिन्",
    "पर्", "इस्", "थिइस्", "छस्", "इछस्", "एछस्",
    "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्", "छेस्",
    "होस्",
)


_NE_CAT1_ALL = _NE_CAT1_DELETE + _NE_CAT1_COND
_NE_CAT2_NASAL_PRE = ("\u092f\u094c", "\u091b\u094c", "\u0928\u094c",
                      "\u0925\u0947")  # यौ छौ नौ थे


def _longest_suffix(word: str, table) -> str | None:
    best = None
    for sfx in table:
        if (best is None or len(sfx) > len(best)) and word.endswith(sfx):
            best = sfx
    return best


def nepali_snowball_stem(word: str) -> str:
    """Snowball nepali: remove_category_1 once, then the category-2/3 loop."""
    m = _longest_suffix(word, _NE_CAT1_ALL)
    if m in _NE_CAT1_COND:
        pre = word[: -len(m)]
        if not pre.endswith(("\u090f", "\u0947")):  # ए / े guard
            word = pre
    elif m:
        word = word[: -len(m)]
    while True:
        last = word[-1:] if word else ""
        if last in ("\u0901", "\u0902"):            # ँ ं
            pre = word[:-1]
            if pre.endswith(_NE_CAT2_NASAL_PRE):
                word = pre
        elif last == "\u0948":                        # ै
            pre = word[:-1]
            if pre.endswith("\u0924\u094d\u0930"):  # त्र
                word = pre
        m = _longest_suffix(word, _NE_CAT3)
        if not m:
            break
        word = word[: -len(m)]
    return word


def nepali_analyzer(stop_words=None, stem_exclusions=(),
                    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """NepaliAnalyzer.createComponents (NepaliAnalyzer.kt:35-46)."""
    stop = NEPALI_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = nepali_snowball_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
