"""Marathi analysis chain (``analysis/extra/.../analysis/mr/``).

* ``marathi_normalize`` — ``mr/MarathiNormalizer.kt``: dead-n -> bindu,
  candrabindu -> bindu, nukta folds, ZWJ/ZWNJ/virama removal,
  chandra/short vowel folds, long -> short vowel folds.
* ``marathi_stem`` — ``mr/MarathiStemmer.kt``: Hindi-style length-guarded
  ending groups (5..1 chars).
* ``marathi_analyzer`` — ``mr/MarathiAnalyzer.kt`` chain: StandardTokenizer
  -> LowerCase -> DecimalDigit -> [keyword] -> IndicNormalization ->
  MarathiNormalization -> Stop -> MarathiStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

MARATHI_STOP_WORDS = frozenset((
    "#", "अधिक", "अनेक", "अशी", "असलयाचे", "असलेल्या", "असा", "असून",
    "असे", "आज", "आणि", "आता", "आपल्या", "आला", "आली", "आले", "आहे",
    "आहेत", "एक", "एका", "कमी", "करणयात", "करून", "का", "काम", "काय",
    "काही", "किवा", "की", "केला", "केली", "केले", "कोटी", "गेल्या", "घेऊन",
    "जात", "झाला", "झाली", "झाले", "झालेल्या", "टा", "डॉ", "तर", "तरी",
    "तसेच", "ता", "ती", "तीन", "ते", "तो", "त्या", "त्याचा", "त्याची",
    "त्याच्या", "त्याना", "त्यानी", "त्यामुळे", "त्री", "दिली", "दोन", "न",
    "नाही", "निर्ण्य", "पण", "पम", "परयतन", "पाटील", "म", "मात्र",
    "माहिती", "मी", "मुबी", "म्हणजे", "म्हणाले", "म्हणून", "या", "याचा",
    "याची", "याच्या", "याना", "यानी", "येणार", "येत", "येथील", "येथे",
    "लाख", "व", "व्यकत", "सर्व", "सागित्ले", "सुरू", "हजार", "हा", "ही",
    "हे", "होणार", "होत", "होता", "होती", "होते",
))


_MR_GROUPS = (
    (6, ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां",
    ), 5),
    (5, ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", 
        "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", 
        "ियाँ", "ियों", "ियां",
    ), 4),
    (4, ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने", 
        "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", 
        "ुआं",
    ), 3),
    (3, ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं", 
        "ती", "ता", "ाँ", "ां", "ों", "ें",
    ), 2),
    (2, ("ो", "े", "ू", "ु", "ी", "ि", "ा",
    ), 1),
)

_MR_MAP = {
    "\u0901": "\u0902", "\u0929": "\u0928", "\u0931": "\u0930",
    "\u0934": "\u0933", "\u0958": "\u0915", "\u0959": "\u0916",
    "\u095a": "\u0917", "\u095b": "\u091c", "\u095c": "\u0921",
    "\u095d": "\u0922", "\u095e": "\u092b", "\u095f": "\u092f",
    "\u0945": "\u0947", "\u0946": "\u0947", "\u0949": "\u094b",
    "\u094a": "\u094b", "\u090d": "\u090f", "\u090e": "\u090f",
    "\u0911": "\u0913", "\u0912": "\u0913", "\u0972": "\u0905",
    "\u0906": "\u0905", "\u0908": "\u0907", "\u090a": "\u0909",
    "\u0960": "\u090b", "\u0961": "\u090c", "\u0910": "\u090f",
    "\u0914": "\u0913", "\u0940": "\u093f", "\u0942": "\u0941",
    "\u0944": "\u0943", "\u0963": "\u0962", "\u0948": "\u0947",
    "\u094c": "\u094b",
}
_MR_DELETE = frozenset(("\u093c", "\u200d", "\u200c", "\u094d"))


def marathi_normalize(term: str) -> str:
    out = []
    i = 0
    while i < len(term):
        c = term[i]
        if c == "\u0928" and i + 1 < len(term) and term[i + 1] == "\u094d":
            out.append("\u0902")          # dead n -> bindu
            i += 2
            continue
        if c in _MR_DELETE:
            i += 1
            continue
        out.append(_MR_MAP.get(c, c))
        i += 1
    return "".join(out)


def marathi_stem(word: str) -> str:
    for min_len, sfxs, cut in _MR_GROUPS:
        if len(word) > min_len and word.endswith(sfxs):
            return word[:-cut]
    return word


def marathi_analyzer(stop_words=None, stem_exclusions=(),
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = MARATHI_STOP_WORDS if stop_words is None else frozenset(stop_words)
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            term = indic_normalize(term)
            if not is_keyword:
                term = marathi_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = marathi_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
