"""Bengali analysis chain (``analysis/common/.../analysis/bn/``).

* ``bengali_normalize`` — ``bn/BengaliNormalizer.kt``: chandrabindu deleted,
  long i/u kars shortened, khio recomposition, nga -> anusvara, ja/ba phala
  rewrites, visarga resolution (position-dependent), sh variants -> sa,
  murdhanya na -> dental na, rra variants -> ra, khanda ta -> ta. Ported
  statement-for-statement including the index rewinds.
* ``bengali_stem`` — ``bn/BengaliStemmer.kt``: longest-suffix-first strip
  over the published 8..1-char class lists, each guarded ``len > n+1``.
* ``bengali_analyzer`` — ``bn/BengaliAnalyzer.kt:33-45`` chain:
  StandardTokenizer -> LowerCaseFilter -> DecimalDigitFilter ->
  [SetKeywordMarkerFilter] -> IndicNormalizationFilter ->
  BengaliNormalizationFilter -> StopFilter(bengali) -> BengaliStemFilter.
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.ar import decimal_digit_fold
from lucene_kmp_spark.analysis.indic import indic_normalize
from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    _lower_simple,
    standard_tokenize,
)

BENGALI_STOP_WORDS = frozenset((
    "এই", "ও", "থেকে", "করে", "এ", "না", "ওই", "এক্",
    "নিয়ে", "করা", "বলেন", "সঙ্গে", "যে", "এব", "তা", "আর",
    "কোনো", "বলে", "সেই", "দিন", "হয়", "কি", "দু", "পরে",
    "সব", "দেওয়া", "মধ্যে", "এর", "সি", "শুরু", "কাজ", "কিছু",
    "কাছে", "সে", "তবে", "বা", "বন", "আগে", "জ্নজন", "পি",
    "পর", "তো", "ছিল", "এখন", "আমরা", "প্রায়", "দুই", "আমাদের",
    "তাই", "অন্য", "গিয়ে", "প্রযন্ত", "মনে", "নতুন", "মতো", "কেখা",
    "প্রথম", "আজ", "টি", "ধামার", "অনেক", "বিভিন্ন", "র", "হাজার",
    "জানা", "নয়", "অবশ্য", "বেশি", "এস", "করে", "কে", "হতে",
    "বি", "কয়েক", "সহ", "বেশ", "এমন", "এমনি", "কেন", "কেউ",
    "নেওয়া", "চেষ্টা", "লক্ষ", "বলা", "কারণ", "আছে", "শুধু", "তখন",
    "যা", "এসে", "চার", "ছিল", "যদি", "আবার", "কোটি", "উত্তর",
    "সামনে", "উপর", "বক্তব্য", "এত", "প্রাথমিক", "উপরে", "আছে", "প্রতি",
    "কাজে", "যখন", "খুব", "বহু", "গেল", "পেয়্র্", "চালু", "ই",
    "নাগাদ", "থাকা", "পাচ", "যাওয়া", "রকম", "সাধারণ", "কমনে",
))

_BN_SUFFIX_LEVELS = (
    # len > 9 -> strip 8
    (9, 8, (
        "\u09BF\u09DF\u09BE\u099B\u09BF\u09B2\u09BE\u09AE", "\u09BF\u09A4\u09C7\u099B\u09BF\u09B2\u09BE\u09AE", "\u09BF\u09A4\u09C7\u099B\u09BF\u09B2\u09C7\u09A8",
        "\u0987\u09A4\u09C7\u099B\u09BF\u09B2\u09C7\u09A8", "\u09BF\u09DF\u09BE\u099B\u09BF\u09B2\u09C7\u09A8", "\u0987\u09DF\u09BE\u099B\u09BF\u09B2\u09C7\u09A8",
    )),
    # len > 8 -> strip 7
    (8, 7, (
        "\u09BF\u09A4\u09C7\u099B\u09BF\u09B2\u09BF", "\u09BF\u09A4\u09C7\u099B\u09BF\u09B2\u09C7", "\u09BF\u09DF\u09BE\u099B\u09BF\u09B2\u09BE",
        "\u09BF\u09DF\u09BE\u099B\u09BF\u09B2\u09C7", "\u09BF\u09A4\u09C7\u099B\u09BF\u09B2\u09BE", "\u09BF\u09DF\u09BE\u099B\u09BF\u09B2\u09BF",
        "\u09DF\u09C7\u09A6\u09C7\u09B0\u0995\u09C7",
    )),
    # len > 7 -> strip 6
    (7, 6, (
        "\u09BF\u09A4\u09C7\u099B\u09BF\u09B8", "\u09BF\u09A4\u09C7\u099B\u09C7\u09A8", "\u09BF\u09DF\u09BE\u099B\u09BF\u09B8",
        "\u09BF\u09DF\u09BE\u099B\u09C7\u09A8", "\u09C7\u099B\u09BF\u09B2\u09BE\u09AE", "\u09C7\u099B\u09BF\u09B2\u09C7\u09A8",
        "\u09C7\u09A6\u09C7\u09B0\u0995\u09C7",
    )),
    # len > 6 -> strip 5
    (6, 5, (
        "\u09BF\u09A4\u09C7\u099B\u09BF", "\u09BF\u09A4\u09C7\u099B\u09BE", "\u09BF\u09A4\u09C7\u099B\u09C7",
        "\u099B\u09BF\u09B2\u09BE\u09AE", "\u099B\u09BF\u09B2\u09C7\u09A8", "\u09BF\u09DF\u09BE\u099B\u09BF",
        "\u09BF\u09DF\u09BE\u099B\u09BE", "\u09BF\u09DF\u09BE\u099B\u09C7", "\u09C7\u099B\u09BF\u09B2\u09C7",
        "\u09C7\u099B\u09BF\u09B2\u09BE", "\u09DF\u09C7\u09A6\u09C7\u09B0", "\u09A6\u09C7\u09B0\u0995\u09C7",
    )),
    # len > 5 -> strip 4
    (5, 4, (
        "\u09BF\u09B2\u09BE\u09AE", "\u09BF\u09B2\u09C7\u09A8", "\u09BF\u09A4\u09BE\u09AE",
        "\u09BF\u09A4\u09C7\u09A8", "\u09BF\u09AC\u09C7\u09A8", "\u099B\u09BF\u09B2\u09BF",
        "\u099B\u09BF\u09B2\u09C7", "\u099B\u09BF\u09B2\u09BE", "\u09A4\u09C7\u099B\u09C7",
        "\u09BF\u09A4\u09C7\u099B", "\u0996\u09BE\u09A8\u09BE", "\u0996\u09BE\u09A8\u09BF",
        "\u0997\u09C1\u09B2\u09CB", "\u0997\u09C1\u09B2\u09BF", "\u09DF\u09C7\u09B0\u09BE",
        "\u09C7\u09A6\u09C7\u09B0",
    )),
    # len > 4 -> strip 3
    (4, 3, (
        "\u09B2\u09BE\u09AE", "\u09BF\u09B2\u09BF", "\u0987\u09B2\u09BF",
        "\u09BF\u09B2\u09C7", "\u0987\u09B2\u09C7", "\u09B2\u09C7\u09A8",
        "\u09BF\u09B2\u09BE", "\u0987\u09B2\u09BE", "\u09A4\u09BE\u09AE",
        "\u09BF\u09A4\u09BF", "\u0987\u09A4\u09BF", "\u09BF\u09A4\u09C7",
        "\u0987\u09A4\u09C7", "\u09A4\u09C7\u09A8", "\u09BF\u09A4\u09BE",
        "\u09BF\u09AC\u09BE", "\u0987\u09AC\u09BE", "\u09BF\u09AC\u09BF",
        "\u0987\u09AC\u09BF", "\u09AC\u09C7\u09A8", "\u09BF\u09AC\u09C7",
        "\u0987\u09AC\u09C7", "\u099B\u09C7\u09A8", "\u09DF\u09CB\u09A8",
        "\u09DF\u09C7\u09B0", "\u09C7\u09B0\u09BE", "\u09A6\u09C7\u09B0",
    )),
    # len > 3 -> strip 2
    (3, 2, (
        "\u09BF\u09B8", "\u09C7\u09A8", "\u09B2\u09BF",
        "\u09B2\u09C7", "\u09B2\u09BE", "\u09A4\u09BF",
        "\u09A4\u09C7", "\u09A4\u09BE", "\u09AC\u09BF",
        "\u09AC\u09C7", "\u09AC\u09BE", "\u099B\u09BF",
        "\u099B\u09BE", "\u099B\u09C7", "\u09C1\u09A8",
        "\u09C1\u0995", "\u099F\u09BE", "\u099F\u09BF",
        "\u09A8\u09BF", "\u09C7\u09B0", "\u09A4\u09C7",
        "\u09B0\u09BE", "\u0995\u09C7",
    )),
    # len > 2 -> strip 1
    (2, 1, (
        "\u09BF", "\u09C0", "\u09BE",
        "\u09CB", "\u09C7", "\u09AC",
        "\u09A4",
    )),
)


def bengali_normalize(term: str) -> str:
    """BengaliNormalizer.kt:19-117 (list port of the char-array walk)."""
    s = list(term)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\u0981":  # chandrabindu: delete
            del s[i]
            continue
        elif ch == "\u09C0":  # dirgho i kar -> rossho i kar
            s[i] = "\u09BF"
        elif ch == "\u09C2":  # dirgho u kar -> rossho u kar
            s[i] = "\u09C1"
        elif ch == "\u0995":  # khio (BengaliNormalizer.kt:37-48)
            if i + 2 < len(s) and s[i + 1] == "\u09CD" and s[i + 2] == "\u09BF":
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
        elif ch == "\u0999":  # nga -> anusvara
            s[i] = "\u0982"
        elif ch == "\u09AF":  # ja phala
            if i - 2 == 0 and s[i - 1] == "\u09CD":
                s[i - 1] = "\u09C7"
                if i + 1 < len(s) and s[i + 1] == "\u09BE":
                    del s[i + 1]
                del s[i]
                continue
            elif i - 1 >= 0 and s[i - 1] == "\u09CD":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif ch == "\u09AC":  # ba phala
            if (i >= 1 and s[i - 1] != "\u09CD") or i == 0:
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 5 >= 0 and s[i - 3] == "\u09CD":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif ch == "\u0983":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "\u09B9"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif ch in ("\u09B6", "\u09B7"):  # sh variants -> sa
            s[i] = "\u09B8"
        elif ch == "\u09A3":  # murdhanya na -> dental na
            s[i] = "\u09A8"
        elif ch in ("\u09DC", "\u09DD"):  # rra -> ra
            s[i] = "\u09B0"
        elif ch == "\u09CE":  # khanda ta -> ta
            s[i] = "\u09A4"
        i += 1
    return "".join(s)


def bengali_stem(term: str) -> str:
    for guard, k, sufs in _BN_SUFFIX_LEVELS:
        if len(term) > guard:
            for suf in sufs:
                if term.endswith(suf):
                    return term[:-k]
    return term


def bengali_analyzer(
    stop_words=BENGALI_STOP_WORDS,
    stem_exclusions=(),
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """BengaliAnalyzer.createComponents (BengaliAnalyzer.kt:33-45)."""
    stop = frozenset(stop_words) if stop_words else frozenset()
    excl = frozenset(stem_exclusions)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in standard_tokenize(text, max_token_length):
            term = decimal_digit_fold(_lower_simple(t.term))
            is_keyword = term in excl
            term = indic_normalize(term)  # not keyword-aware
            if not is_keyword:
                term = bengali_normalize(term)
            if term in stop:
                continue
            if not is_keyword:
                term = bengali_stem(term)
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
