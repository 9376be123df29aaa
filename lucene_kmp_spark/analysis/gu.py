"""Gujarati analysis chain (``analysis/extra/.../analysis/gu/``).

* ``gujarati_normalize`` — ``gu/GujaratiNormalizer.kt``: Gujarati dandas ->
  generic dandas, ':' after a Gujarati char -> visarga.
* ``gujarati_stem`` — ``gu/GujaratiStemmer.kt``: first-match suffix strip
  (match requires len >= suffix+2).
* ``gujarati_analyzer`` — ``gu/GujaratiAnalyzer.kt`` chain:
  StandardTokenizer -> LowerCase -> DecimalDigit -> [keyword] ->
  IndicNormalization -> GujaratiNormalization -> Stop -> GujaratiStem.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

GUJARATI_STOP_WORDS = frozenset((
    "#", "અંગે", "અંદર", "અથવા", "અને", "અમને", "અમારું", "અમે", "અહીં",
    "આ", "આગળ", "આથી", "આનું", "આને", "આપણને", "આપણું", "આપણે", "આપી",
    "આર", "આવી", "આવે", "ઉપર", "ઉભા", "ઊંચે", "ઊભું", "એ", "એક", "એન",
    "એના", "એનાં", "એની", "એનું", "એને", "એનો", "એમ", "એવા", "એવાં", "એવી",
    "એવું", "એવો", "ઓછું", "કંઈક", "કઈ", "કયું", "કયો", "કરતાં", "કરવું",
    "કરી", "કરીએ", "કરું", "કરે", "કરેલું", "કર્યા", "કર્યાં", "કર્યું",
    "કર્યો", "કાંઈ", "કે", "કેટલું", "કેમ", "કેવી", "કેવું", "કોઈ", "કોઈક",
    "કોણ", "કોણે", "કોને", "ક્યાં", "ક્યારે", "ખૂબ", "ગઈ", "ગયા", "ગયાં",
    "ગયું", "ગયો", "ઘણું", "છ", "છતાં", "છીએ", "છું", "છે", "છેક", "છો",
    "જ", "જાય", "જી", "જે", "જેટલું", "જેને", "જેમ", "જેવી", "જેવું",
    "જેવો", "જો", "જોઈએ", "જ્યાં", "જ્યારે", "ઝાઝું", "તને", "તમને",
    "તમારું", "તમે", "તા", "તારાથી", "તારામાં", "તારું", "તું", "તે",
    "તેં", "તેઓ", "તેણે", "તેથી", "તેના", "તેની", "તેનું", "તેને", "તેમ",
    "તેમનું", "તેમને", "તેવી", "તેવું", "તો", "ત્યાં", "ત્યારે", "થઇ",
    "થઈ", "થઈએ", "થતા", "થતાં", "થતી", "થતું", "થતો", "થયા", "થયાં",
    "થયું", "થયેલું", "થયો", "થવું", "થાઉં", "થાઓ", "થાય", "થી", "થોડું",
    "દરેક", "ન", "નં", "નં.", "નથી", "નહિ", "નહી", "નહીં", "ના", "ની",
    "નીચે", "નું", "ને", "નો", "પછી", "પણ", "પર", "પરંતુ", "પહેલાં",
    "પાછળ", "પાસે", "પોતાનું", "પ્રત્યેક", "ફક્ત", "ફરી", "ફરીથી", "બંને",
    "બધા", "બધું", "બની", "બહાર", "બહુ", "બાદ", "બે", "મને", "મા", "માં",
    "માટે", "માત્ર", "મારું", "મી", "મૂકવું", "મૂકી", "મૂક્યા", "મૂક્યાં",
    "મૂક્યું", "મેં", "રહી", "રહે", "રહેવું", "રહ્યા", "રહ્યાં", "રહ્યો",
    "રીતે", "રૂ.", "રૂા", "લેતા", "લેતું", "લેવા", "વગેરે", "વધુ", "શકે",
    "શા", "શું", "સરખું", "સામે", "સુધી", "હતા", "હતાં", "હતી", "હતું",
    "હવે", "હશે", "હશો", "હા", "હું", "હો", "હોઈ", "હોઈશ", "હોઈશું", "હોય",
    "હોવા",
))


_GU_SUFFIXES = (
    "માંથી", "પરથી", "માં", "થી", "પર", "નો", "ની", "નું", "ના", "ને",
    "નાં", "ઓ", "એ", "આં", "આ", "ઈ", "ું",
)


def gujarati_normalize(term: str) -> str:
    out = []
    prev_gu = False
    for c in term:
        mapped = c
        if c == "\u0ae4":
            mapped = "\u0964"
        elif c == "\u0ae5":
            mapped = "\u0965"
        elif c == ":" and prev_gu:
            mapped = "\u0a83"
        out.append(mapped)
        # the reference tracks the ORIGINAL char for the visarga context
        prev_gu = "\u0a80" <= c <= "\u0aff"
    return "".join(out)


def gujarati_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    for sfx in _GU_SUFFIXES:
        if len(word) >= len(sfx) + 2 and word.endswith(sfx):
            return word[: -len(sfx)]
    return word


def gujarati_analyzer(stop_words=None, stem_exclusions=(),
                      max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    stop = GUJARATI_STOP_WORDS if stop_words is None else frozenset(stop_words)
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
                term = gujarati_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = gujarati_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
