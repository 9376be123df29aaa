"""CJK analysis chain (``analysis/common/.../analysis/cjk/``) — the
reference's default path for Chinese (and mixed CJK) text.

* ``cjk_width_fold`` — ``cjk/CJKWidthFilter.kt``: folds fullwidth ASCII
  variants (U+FF01-FF5E) to basic latin and halfwidth katakana
  (U+FF65-FF9F) to standard kana, composing halfwidth voice marks
  (U+FF9E/FF9F) onto the preceding kana via the KANA_COMBINE tables.
* ``cjk_bigrams`` — ``cjk/CJKBigramFilter.kt`` with the default flags
  (HAN | HIRAGANA | KATAKANA | HANGUL, outputUnigrams=false): codepoints of
  offset-contiguous CJK-type tokens are joined into overlapping bigrams
  (ABC -> AB, BC); an isolated CJK codepoint is emitted as a unigram; every
  other token passes through unchanged. Each emitted token advances the
  position by 1 (the filter's clearAttributes default).
* ``cjk_analyzer`` — ``cjk/CJKAnalyzer.kt:35-42`` chain: StandardTokenizer
  -> CJKWidthFilter -> LowerCaseFilter -> CJKBigramFilter ->
  StopFilter(CJK_STOP_WORDS).  Note the stop filter runs AFTER bigramming
  (its set is english-ish particles that survive as whole tokens).
"""

from __future__ import annotations

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    HANGUL,
    HIRAGANA,
    IDEOGRAPHIC,
    KATAKANA,
    _lower_simple,
    standard_tokenize,
)

# stopwords.txt as embedded in CJKAnalyzer.DEFAULT_STOPWORD_DATA
CJK_STOP_WORDS = frozenset((
    "a", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "s",
    "such", "t", "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with", "www",
))

# token types the default CJKBigramFilter n-grams (CJKBigramFilter.kt:71)
_CJK_TYPES = frozenset((IDEOGRAPHIC, HIRAGANA, KATAKANA, HANGUL))

# halfwidth kana -> kana, index = cp - 0xFF65 (CJKWidthFilter.kt KANA_NORM)
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]

# kana combining deltas, index = cp - 0x30A6 (CJKWidthFilter.kt KANA_COMBINE_*)
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [0] * 88
for _i in (41, 44, 47, 50, 53):
    _KANA_COMBINE_HALF_VOICED[_i] = 2


def cjk_width_fold(term: str) -> str:
    """CJKWidthFilter.incrementToken (CJKWidthFilter.kt:26-52)."""
    out: list[str] = []
    for ch in term:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out and 0x30A6 <= ord(out[-1]) <= 0x30FD:
                prev = ord(out[-1])
                table = (
                    _KANA_COMBINE_HALF_VOICED if cp == 0xFF9F else _KANA_COMBINE_VOICED
                )
                delta = table[prev - 0x30A6]
                if delta:
                    out[-1] = chr(prev + delta)
                else:
                    out.append(chr(_KANA_NORM[cp - 0xFF65]))
            else:
                out.append(chr(_KANA_NORM[cp - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


def cjk_bigrams(tokens):
    """CJKBigramFilter default mode over ``standard_tokenize`` output:
    yields term strings in emission order (every emission advances the
    position by 1). ``tokens`` is an iterable of Token(term, type, position,
    start, end); terms must already be width-folded + lowercased."""
    out: list[str] = []
    buf: list[str] = []  # codepoints of offset-contiguous CJK tokens
    last_end = None

    def flush():
        if len(buf) >= 2:
            out.extend(buf[i] + buf[i + 1] for i in range(len(buf) - 1))
        elif buf:
            out.append(buf[0])
        buf.clear()

    for t in tokens:
        if t.type in _CJK_TYPES:
            if buf and t.start != last_end:
                flush()
            buf.extend(t.term)
            last_end = t.end
        else:
            flush()
            out.append(t.term)
    flush()
    return out


def cjk_analyzer(
    stop_words=CJK_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
):
    """CJKAnalyzer.createComponents (CJKAnalyzer.kt:35-42) as a picklable
    ``text -> (terms, positions, length)`` analyzer. Bigram/unigram/pass
    emissions take sequential positions; the post-bigram stop filter leaves
    position holes, exactly like StopFilter after CJKBigramFilter."""
    stop = frozenset(stop_words) if stop_words else frozenset()

    def run(text: str):
        if not text:
            return [], [], 0
        toks = standard_tokenize(text, max_token_length)
        folded = [
            type(t)(_lower_simple(cjk_width_fold(t.term)), t.type, t.position, t.start, t.end)
            for t in toks
        ]
        terms, positions = [], []
        for pos, term in enumerate(cjk_bigrams(folded)):
            if term in stop:
                continue
            terms.append(term)
            positions.append(pos)
        return terms, positions, len(terms)

    return run
