"""CJK numeral normalization + iteration-mark expansion.

Ported semantics:

* ``analysis/kuromoji/.../ja/JapaneseNumberFilter.kt`` — kansūji →
  Arabic normalization via the large/medium/basic recursive grammar
  (:138-220: parseNumber = Σ parseLargePair, large pair = medium ×
  10^{4,8,12,16,20}, medium pair = basic × 10^{1,2,3}), numeral character
  tables (:290-323), token-run composition (:58-99: a maximal run of
  numeral tokens — punctuation ,/． allowed mid-run — becomes ONE token),
  fallback to the raw string when parsing fails.
* ``analysis/nori/.../ko/KoreanNumberFilter.kt`` — identical grammar with
  the hangul tables (영일이삼사오육칠팔구, 십백천만억조경해).
* ``analysis/kuromoji/.../ja/JapaneseIterationMarkCharFilter.kt`` —
  odoriji 々ゝゞヽヾ expansion: a run of N marks repeats the N source
  chars before it, voiced marks add dakuten via the h2d/k2d tables
  (:35-89), unvoiced marks strip it; marks never source from an earlier
  mark span (:166-177), 。resets the span state.

Arithmetic runs in ``decimal.Decimal`` (exact, like the reference's
BigDecimal); output is the plain string with trailing fractional zeros
removed (removeTrailingZeroes + toPlainString).
"""

from __future__ import annotations

from decimal import Decimal, InvalidOperation

# ---------------------------------------------------------------- tables
_JA_NUMERALS = {"〇": 0, "一": 1, "二": 2, "三": 3, "四": 4,
                "五": 5, "六": 6, "七": 7, "八": 8, "九": 9}
_JA_EXPONENTS = {"十": 1, "百": 2, "千": 3, "万": 4, "億": 8,
                 "兆": 12, "京": 16, "垓": 20}
_KO_NUMERALS = {"영": 0, "일": 1, "이": 2, "삼": 3, "사": 4,
                "오": 5, "육": 6, "칠": 7, "팔": 8, "구": 9}
_KO_EXPONENTS = {"십": 1, "백": 2, "천": 3, "만": 4, "억": 8,
                 "조": 12, "경": 16, "해": 20}


class _Grammar:
    def __init__(self, numerals: dict, exponents: dict):
        self.numerals = numerals
        self.exponents = exponents

    # character classes (JapaneseNumberFilter.kt:246-283)
    def is_arabic(self, c: str) -> bool:
        return "0" <= c <= "9" or "０" <= c <= "９"

    def arabic_value(self, c: str) -> int:
        return ord(c) - (ord("0") if "0" <= c <= "9" else ord("０"))

    def is_decimal_point(self, c: str) -> bool:
        return c in (".", "．")

    def is_thousand_sep(self, c: str) -> bool:
        return c in (",", "，")

    def is_numeral_char(self, c: str) -> bool:
        return (self.is_arabic(c) or c in self.numerals
                or self.exponents.get(c, 0) > 0)

    def is_numeral(self, s: str) -> bool:
        return bool(s) and all(self.is_numeral_char(c) for c in s)

    def is_numeral_punct(self, s: str) -> bool:
        return bool(s) and all(
            self.is_decimal_point(c) or self.is_thousand_sep(c) for c in s)

    # ---------------------------------------------------------- the parser
    def normalize(self, number: str) -> str:
        """normalizeNumber (:128-136): parse or return the input verbatim."""
        try:
            val = self._parse_number(number, [0])
            if val is None:
                return number
        except (InvalidOperation, ValueError):
            return number
        s = format(val, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return s or "0"

    def _parse_number(self, s: str, pos: list) -> Decimal | None:
        total = Decimal(0)
        result = self._parse_large_pair(s, pos)
        if result is None:
            return None
        while result is not None:
            total += result
            result = self._parse_large_pair(s, pos)
        if pos[0] != len(s):
            raise ValueError("trailing junk")  # exception -> verbatim input
        return total

    def _parse_large_pair(self, s, pos):
        first = self._parse_medium_number(s, pos)
        second = self._parse_power(s, pos, lambda p: p > 3)
        if first is None and second is None:
            return None
        if second is None:
            return first
        if first is None:
            return second
        return first * second

    def _parse_medium_number(self, s, pos):
        total = Decimal(0)
        result = self._parse_medium_pair(s, pos)
        if result is None:
            return None
        while result is not None:
            total += result
            result = self._parse_medium_pair(s, pos)
        return total

    def _parse_medium_pair(self, s, pos):
        first = self._parse_basic_number(s, pos)
        second = self._parse_power(s, pos, lambda p: 1 <= p <= 3)
        if first is None and second is None:
            return None
        if second is None:
            return first
        if first is None:
            return second
        return first * second

    def _parse_basic_number(self, s, pos):
        out = []
        i = pos[0]
        while i < len(s):
            c = s[i]
            if self.is_arabic(c):
                out.append(str(self.arabic_value(c)))
            elif c in self.numerals:
                out.append(str(self.numerals[c]))
            elif self.is_decimal_point(c):
                out.append(".")
            elif self.is_thousand_sep(c):
                pass
            else:
                break
            i += 1
            pos[0] = i
        if not out:
            return None
        return Decimal("".join(out))

    def _parse_power(self, s, pos, pred):
        i = pos[0]
        if i >= len(s):
            return None
        power = self.exponents.get(s[i], 0)
        if power and pred(power):
            pos[0] = i + 1
            return Decimal(1).scaleb(power)
        return None


_JA = _Grammar(_JA_NUMERALS, _JA_EXPONENTS)
_KO = _Grammar(_KO_NUMERALS, _KO_EXPONENTS)


def normalize_japanese_number(s: str) -> str:
    return _JA.normalize(s)


def normalize_korean_number(s: str) -> str:
    return _KO.normalize(s)


def number_filter_tokens(tokens, grammar: _Grammar):
    """Token-run composition (JapaneseNumberFilter.incrementToken:58-99)
    over a linear MorphToken list: a maximal run starting with a numeral
    token, continuing through numeral or numeral-punctuation tokens,
    collapses into one normalized token spanning the run's offsets."""
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if not grammar.is_numeral(t.surface):
            out.append(t)
            i += 1
            continue
        j = i + 1
        parts = [t.surface]
        end = t.end
        while j < n and (grammar.is_numeral(tokens[j].surface)
                         or grammar.is_numeral_punct(tokens[j].surface)):
            parts.append(tokens[j].surface)
            end = tokens[j].end
            j += 1
        merged = type(t)(grammar.normalize("".join(parts)), t.start, end,
                         t.type, t.entry)
        out.append(merged)
        i = j
    return out


def japanese_number_filter(tokens):
    return number_filter_tokens(tokens, _JA)


def korean_number_filter(tokens):
    return number_filter_tokens(tokens, _KO)


# ------------------------------------------- iteration marks (odoriji)
_KANJI_MARK = "々"
_HIRA_MARK, _HIRA_VOICED = "ゝ", "ゞ"
_KATA_MARK, _KATA_VOICED = "ヽ", "ヾ"
_FULL_STOP = "。"

# hiragana base->dakuten (index = cp - 0x304B か; the reference's h2d,
# JapaneseIterationMarkCharFilter.kt:35-84)
_H2D = [
    0x304C, 0x304C, 0x304E, 0x304E, 0x3050, 0x3050, 0x3052, 0x3052, 0x3054,
    0x3054, 0x3056, 0x3056, 0x3058, 0x3058, 0x305A, 0x305A, 0x305C, 0x305C,
    0x305E, 0x305E, 0x3060, 0x3060, 0x3062, 0x3062, 0x3063, 0x3065, 0x3065,
    0x3067, 0x3067, 0x3069, 0x3069, 0x306A, 0x306B, 0x306C, 0x306D, 0x306E,
    0x3070, 0x3070, 0x3071, 0x3073, 0x3073, 0x3074, 0x3076, 0x3076, 0x3077,
    0x3079, 0x3079, 0x307A, 0x307C, 0x307C,
]
_KATA_DELTA = 0x30AB - 0x304B


def _lookup(c: str, offset: int) -> str:
    idx = ord(c) - offset
    if 0 <= idx < len(_H2D):
        return chr(_H2D[idx] + (offset - 0x304B))
    return c


def _is_dakuten(c: str, offset: int) -> bool:
    idx = ord(c) - offset
    return 0 <= idx < len(_H2D) and c == _lookup(c, offset)


def iteration_mark_fold(
    text: str, normalize_kanji: bool = True, normalize_kana: bool = True
) -> str:
    """JapaneseIterationMarkCharFilter over a whole string: each run of N
    iteration marks replays the N input chars before the run; voiced kana
    marks (ゞヾ) voice the source, unvoiced (ゝヽ) devoice it, 々 copies.
    Marks never source earlier marks; 。and surrogates reset the span."""

    def is_mark(c: str) -> bool:
        if normalize_kanji and c == _KANJI_MARK:
            return True
        if normalize_kana and c in (_HIRA_MARK, _HIRA_VOICED, _KATA_MARK, _KATA_VOICED):
            return True
        return False

    out = []
    span_end = 0  # iterationMarkSpanEndPosition
    span_size = 0
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if 0xD800 <= ord(c) <= 0xDFFF or c == _FULL_STOP:
            span_end = i + 1
            out.append(c)
            i += 1
            continue
        if is_mark(c):
            if i < span_end:
                src = text[i - span_size]
            elif i == span_end:
                # a mark with no source char available passes through
                span_end += 1
                out.append(c)
                i += 1
                continue
            else:
                size = 0
                j = i
                while j < n and is_mark(text[j]):
                    size += 1
                    j += 1
                if i - size < span_end:
                    size = i - span_end
                span_size = size
                span_end = i + size
                src = text[i - size]
            if c == _HIRA_MARK:
                out.append(chr(ord(src) - 1) if _is_dakuten(src, 0x304B) else src)
            elif c == _HIRA_VOICED:
                out.append(_lookup(src, 0x304B))
            elif c == _KATA_MARK:
                out.append(chr(ord(src) - 1) if _is_dakuten(src, 0x30AB) else src)
            elif c == _KATA_VOICED:
                out.append(_lookup(src, 0x30AB))
            else:  # kanji mark
                out.append(src)
        else:
            out.append(c)
        i += 1
    return "".join(out)
