"""Hindi analysis chain (``analysis/common/.../analysis/hi/``).

* ``hindi_normalize`` — ``hi/HindiNormalizer.kt``: dead n -> bindu,
  candrabindu -> bindu, nukta forms folded (and bare nukta deleted),
  ZWJ/ZWNJ/virama deleted, candra/short vowels -> standard forms,
  long -> short independent and dependent vowels.
* ``hindi_stem`` — ``hi/HindiStemmer.kt`` (Ramanathan & Rao, "A Lightweight
  Stemmer for Hindi"): strip the LONGEST matching suffix from the published
  5/4/3/2/1-char lists, guarded so >=2 chars remain.
* ``hindi_analyzer`` — ``hi/HindiAnalyzer.kt:33-45`` chain:
  StandardTokenizer -> LowerCaseFilter -> DecimalDigitFilter ->
  [SetKeywordMarkerFilter] -> IndicNormalizationFilter ->
  HindiNormalizationFilter -> StopFilter(hindi) -> HindiStemFilter.
  (Stop check runs AFTER normalization, unlike Arabic.) Stopword data:
  the standard Lucene hindi stopword set.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

HINDI_STOP_WORDS = frozenset((
    "अंदर", "अत", "अपना", "अपनी", "अपने", "अभी", "आदि", "आप",
    "इत्यादि", "इन", "इनका", "इन्हीं", "इन्हें", "इन्हों", "इस", "इसका",
    "इसकी", "इसके", "इसमें", "इसी", "इसे", "उन", "उनका", "उनकी",
    "उनके", "उनको", "उन्हीं", "उन्हें", "उन्हों", "उस", "उसके", "उसी",
    "उसे", "एक", "एवं", "एस", "ऐसे", "और", "कई", "कर",
    "करता", "करते", "करना", "करने", "करें", "कहते", "कहा", "का",
    "काफ़ी", "कि", "कितना", "किन्हें", "किन्हों", "किया", "किर", "किस",
    "किसी", "किसे", "की", "कुछ", "कुल", "के", "को", "कोई",
    "कौन", "कौनसा", "गया", "घर", "जब", "जहाँ", "जा", "जितना",
    "जिन", "जिन्हें", "जिन्हों", "जिस", "जिसे", "जीधर", "जैसा", "जैसे",
    "जो", "तक", "तब", "तरह", "तिन", "तिन्हें", "तिन्हों", "तिस",
    "तिसे", "तो", "था", "थी", "थे", "दबारा", "दिया", "दुसरा",
    "दूसरे", "दो", "द्वारा", "न", "नहीं", "ना", "निहायत", "नीचे",
    "ने", "पर", "पहले", "पूरा", "पे", "फिर", "बनी", "बही",
    "बहुत", "बाद", "बाला", "बिलकुल", "भी", "भीतर", "मगर", "मानो",
    "मे", "में", "यदि", "यह", "यहाँ", "यही", "या", "यिह",
    "ये", "रखें", "रहा", "रहे", "ऱ्वासा", "लिए", "लिये", "लेकिन",
    "व", "वर्ग", "वह", "वहाँ", "वहीं", "वाले", "वुह", "वे",
    "वग़ैरह", "संग", "सकता", "सकते", "सबसे", "सभी", "साथ", "साबुत",
    "साभ", "सारा", "से", "सो", "ही", "हुआ", "हुई", "हुए",
    "है", "हैं", "हो", "होता", "होती", "होते", "होना", "होने",
    "अपनि", "जेसे", "होति", "सभि", "तिंहों", "इंहों", "दवारा", "इसि",
    "किंहें", "थि", "उंहों", "ओर", "जिंहें", "वहिं", "अभि", "बनि",
    "हि", "उंहिं", "उंहें", "हें", "वगेरह", "एसे", "रवासा", "कोन",
    "निचे", "काफि", "उसि", "पुरा", "भितर", "हे", "बहि", "वहां",
    "कोइ", "यहां", "जिंहों", "तिंहें", "किसि", "कइ", "यहि", "इंहिं",
    "जिधर", "इंहें", "अदि", "इतयादि", "हुइ", "कोनसा", "इसकि", "दुसरे",
    "जहां", "अप", "किंहों", "उनकि", "भि", "वरग", "हुअ", "जेसा",
    "नहिं",
))


_MAP = {
    "\u0901": "\u0902",  # candrabindu -> bindu
    "\u0929": "\u0928", "\u0931": "\u0930", "\u0934": "\u0933",  # nukta consonants
    "\u0958": "\u0915", "\u0959": "\u0916", "\u095A": "\u0917",
    "\u095B": "\u091C", "\u095C": "\u0921", "\u095D": "\u0922",
    "\u095E": "\u092B", "\u095F": "\u092F",
    "\u0945": "\u0947", "\u0946": "\u0947",  # chandra/short e
    "\u0949": "\u094B", "\u094A": "\u094B",
    "\u090D": "\u090F", "\u090E": "\u090F",
    "\u0911": "\u0913", "\u0912": "\u0913",
    "\u0972": "\u0905",
    "\u0906": "\u0905", "\u0908": "\u0907", "\u090A": "\u0909",  # long -> short ind.
    "\u0960": "\u090B", "\u0961": "\u090C",
    "\u0910": "\u090F", "\u0914": "\u0913",
    "\u0940": "\u093F", "\u0942": "\u0941", "\u0944": "\u0943",  # long -> short dep.
    "\u0963": "\u0962", "\u0948": "\u0947", "\u094C": "\u094B",
}
_DELETE = frozenset(("\u093C", "\u200D", "\u200C", "\u094D"))


def hindi_normalize(term: str) -> str:
    """HindiNormalizer.kt:20-84 (dead-n first, then map/delete per char)."""
    out = []
    i = 0
    while i < len(term):
        ch = term[i]
        if ch == "\u0928" and i + 1 < len(term) and term[i + 1] == "\u094D":
            out.append("\u0902")  # dead n -> bindu, virama consumed
            i += 2
            continue
        if ch in _DELETE:
            i += 1
            continue
        out.append(_MAP.get(ch, ch))
        i += 1
    return "".join(out)


# (suffix-length, min-surviving-guard len>) lists from HindiStemmer.kt
_SUF5 = ("\u093E\u090F\u0902\u0917\u0940", "\u093E\u090F\u0902\u0917\u0947",
         "\u093E\u090A\u0902\u0917\u0940", "\u093E\u090A\u0902\u0917\u093E",
         "\u093E\u0907\u092F\u093E\u0901", "\u093E\u0907\u092F\u094B\u0902",
         "\u093E\u0907\u092F\u093E\u0902")
_SUF4 = ("\u093E\u090F\u0917\u0940", "\u093E\u090F\u0917\u093E",
         "\u093E\u0913\u0917\u0940", "\u093E\u0913\u0917\u0947",
         "\u090F\u0902\u0917\u0940", "\u0947\u0902\u0917\u0940",
         "\u090F\u0902\u0917\u0947", "\u0947\u0902\u0917\u0947",
         "\u0942\u0902\u0917\u0940", "\u0942\u0902\u0917\u093E",
         "\u093E\u0924\u0940\u0902", "\u0928\u093E\u0913\u0902",
         "\u0928\u093E\u090F\u0902", "\u0924\u093E\u0913\u0902",
         "\u0924\u093E\u090F\u0902", "\u093F\u092F\u093E\u0901",
         "\u093F\u092F\u094B\u0902", "\u093F\u092F\u093E\u0902")
_SUF3 = ("\u093E\u0915\u0930", "\u093E\u0907\u090F", "\u093E\u0908\u0902",
         "\u093E\u092F\u093E", "\u0947\u0917\u0940", "\u0947\u0917\u093E",
         "\u094B\u0917\u0940", "\u094B\u0917\u0947", "\u093E\u0928\u0947",
         "\u093E\u0928\u093E", "\u093E\u0924\u0947", "\u093E\u0924\u0940",
         "\u093E\u0924\u093E", "\u0924\u0940\u0902", "\u093E\u0913\u0902",
         "\u093E\u090F\u0902", "\u0941\u0913\u0902", "\u0941\u090F\u0902",
         "\u0941\u0906\u0902")
_SUF2 = ("\u0915\u0930", "\u093E\u0913", "\u093F\u090F", "\u093E\u0908",
         "\u093E\u090F", "\u0928\u0947", "\u0928\u0940", "\u0928\u093E",
         "\u0924\u0947", "\u0940\u0902", "\u0924\u0940", "\u0924\u093E",
         "\u093E\u0901", "\u093E\u0902", "\u094B\u0902", "\u0947\u0902")
_SUF1 = ("\u094B", "\u0947", "\u0942", "\u0941", "\u0940", "\u093F", "\u093E")


def hindi_stem(term: str) -> str:
    """HindiStemmer.kt: longest suffix first (5..1), each guarded len > n+1."""
    for n, sufs in ((5, _SUF5), (4, _SUF4), (3, _SUF3), (2, _SUF2), (1, _SUF1)):
        if len(term) > n + 1:
            for s in sufs:
                if term.endswith(s):
                    return term[:-n]
    return term


def hindi_analyzer(
    stop_words=HINDI_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """HindiAnalyzer.createComponents (HindiAnalyzer.kt:33-45)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            # keyword marking happens BEFORE the normalizers in the chain;
            # IndicNormalizationFilter is NOT keyword-aware, Hindi
            # normalization + stemming are (HindiNormalizationFilter.kt:25,
            # HindiStemFilter.kt:18)
            is_keyword = term in excl
            term = indic_normalize(term)
            if not is_keyword:
                term = hindi_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = hindi_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
