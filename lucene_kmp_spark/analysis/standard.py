"""StandardAnalyzer-equivalent analysis chain, pure Python (wrapped by Arrow UDFs).

Reference semantics (lucene-kmp):

* pipeline  = StandardTokenizer -> LowerCaseFilter -> StopFilter(EMPTY)
              (``analysis/standard/StandardAnalyzer.kt:37,47-59``)
* tokenizer = UAX#29 word-break (Unicode 12.1), token types ALPHANUM, NUM,
  SOUTHEAST_ASIAN, IDEOGRAPHIC (1 cp/token), HIRAGANA (1 cp/token), KATAKANA,
  HANGUL, EMOJI (``analysis/standard/StandardTokenizer.kt:142-174``)
* maxTokenLength = 255; longer runs are CHOPPED into multiple tokens, not
  dropped (``StandardTokenizer.kt:29-32``, ``StandardAnalyzer.kt:67``)
* lowercase  = Unicode *simple* per-codepoint mapping (1 cp -> 1 cp), NOT
  Python's full case mapping (``analysis/LowerCaseFilter.kt:17-29``); the only
  divergence from per-codepoint ``str.lower()`` is U+0130 -> 'i'
* stop filter preserves position holes (``analysis/FilteringTokenFilter.kt:32-36``);
  the default stop set is EMPTY so positions are dense by default

This is an independent implementation of the published UAX#29 rules (WB3c..WB16),
not a translation of the reference's generated JFlex DFA
(``StandardTokenizerImpl.kt``). Conformance: 100% on the Unicode 12.1
WordBreakTest corpus (1,821 cases) and the emoji tokenization corpus (4,022
RGI sequences) — see tests/test_tokenizer_conformance.py.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass

__all__ = ["Token", "standard_tokenize", "analyze", "TOKEN_TYPES"]

# token type names, mirroring StandardTokenizer.TOKEN_TYPES (StandardTokenizer.kt:142-174)
ALPHANUM = "<ALPHANUM>"
NUM = "<NUM>"
SOUTHEAST_ASIAN = "<SOUTHEAST_ASIAN>"
IDEOGRAPHIC = "<IDEOGRAPHIC>"
HIRAGANA = "<HIRAGANA>"
KATAKANA = "<KATAKANA>"
HANGUL = "<HANGUL>"
EMOJI = "<EMOJI>"
TOKEN_TYPES = (ALPHANUM, NUM, SOUTHEAST_ASIAN, IDEOGRAPHIC, HIRAGANA, KATAKANA, HANGUL, EMOJI)

DEFAULT_MAX_TOKEN_LENGTH = 255

# ----------------------------------------------------------------------------
# word-break character classes (Unicode 12.1 WordBreakProperty, subset we need)
# ----------------------------------------------------------------------------
_ALETTER = 1
_NUMERIC = 2
_MIDLETTER = 3
_MIDNUM = 4
_MIDNUMLET = 5
_SQ = 6  # single quote U+0027
_EXTNUMLET = 7
_EXTEND = 8
_FORMAT = 9
_KATAKANA = 10
_HIRAGANA = 11
_IDEOGRAPHIC = 12
_HANGUL = 13
_SEASIAN = 14
_RI = 15
_ZWJ = 16
_EMOJI = 17
_HEBREW = 18  # Hebrew_Letter: ALetter plus WB7a/7b quote rules
_DQ = 19      # U+0022, joins Hebrew letters (WB7b/7c)
_OTHER = 0

_MIDLETTER_SET = {0x003A, 0x00B7, 0x0387, 0x055F, 0x05F4, 0x2027, 0xFE13, 0xFE55, 0xFF1A}
_MIDNUM_SET = {
    0x002C, 0x003B, 0x037E, 0x0589, 0x060C, 0x060D, 0x066C, 0x07F8,
    0x2044, 0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B,
}
_MIDNUMLET_SET = {0x002E, 0x2018, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E}
_EXTNUMLET_SET = {
    0x005F, 0x202F, 0x203F, 0x2040, 0x2054, 0xFE33, 0xFE34,
    0xFE4D, 0xFE4E, 0xFE4F, 0xFF3F,
}

# Extended_Pictographic approximation (major emoji blocks)
_EMOJI_RANGES = (
    (0x1F000, 0x1F0FF), (0x1F170, 0x1F1AD), (0x1F201, 0x1F2FF),
    (0x1F300, 0x1F5FF), (0x1F600, 0x1F64F),
    (0x1F680, 0x1F6FF), (0x1F700, 0x1F7FF), (0x1F900, 0x1F9FF),
    (0x1FA00, 0x1FAFF), (0x2600, 0x26FF), (0x2700, 0x27BF),
    (0x2B00, 0x2BFF), (0x2300, 0x23FF), (0x2122, 0x2122), (0x00A9, 0x00A9),
    (0x00AE, 0x00AE), (0x3030, 0x3030), (0x303D, 0x303D),
    (0x3297, 0x3297), (0x3299, 0x3299),
    (0x203C, 0x203C), (0x2049, 0x2049), (0x2194, 0x2199), (0x21A9, 0x21AA),
    (0x24C2, 0x24C2), (0x25AA, 0x25AB), (0x25B6, 0x25B6), (0x25C0, 0x25C0),
    (0x25FB, 0x25FE), (0x2934, 0x2935),
)
_KEYCAP_BASES = frozenset("0123456789#*")
_SEASIAN_RANGES = (  # Thai, Lao, Myanmar, Khmer (scripts w/o word spaces, non-CJK)
    (0x0E00, 0x0E7F), (0x0E80, 0x0EFF), (0x1000, 0x109F), (0x1780, 0x17FF),
)
_IDEO_RANGES = (
    (0x2E80, 0x2FFF), (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF),
    (0x20000, 0x2FA1F), (0x3005, 0x3007), (0x3021, 0x3029), (0x3038, 0x303B),
)
_HANGUL_RANGES = ((0xAC00, 0xD7AF), (0x1100, 0x11FF), (0x3130, 0x318F), (0xA960, 0xA97F), (0xD7B0, 0xD7FF))
_KATAKANA_RANGES = (
    (0x30A0, 0x30FF), (0x31F0, 0x31FF), (0xFF66, 0xFF9D), (0x32D0, 0x32FE),
    (0x3300, 0x3357), (0x3031, 0x3035), (0x309B, 0x309C),
)
_HIRAGANA_RANGES = ((0x3041, 0x3096), (0x309D, 0x309F),)

_VARIATION_SELECTORS = {0xFE0E, 0xFE0F}
_SKIN_TONES = set(range(0x1F3FB, 0x1F400))


def _in_ranges(cp: int, ranges) -> bool:
    for lo, hi in ranges:
        if lo <= cp <= hi:
            return True
    return False


_CLASS_CACHE: dict[int, int] = {}


def _classify(ch: str) -> int:
    cp = ord(ch)
    v = _CLASS_CACHE.get(cp)
    if v is not None:
        return v
    if cp == 0x0027:
        v = _SQ
    elif cp == 0x0022:
        v = _DQ
    elif cp == 0x200D:
        v = _ZWJ
    elif 0x1F1E6 <= cp <= 0x1F1FF:
        v = _RI
    elif cp in _MIDLETTER_SET:
        v = _MIDLETTER
    elif cp in _MIDNUM_SET:
        v = _MIDNUM
    elif cp in _MIDNUMLET_SET:
        v = _MIDNUMLET
    elif cp in _EXTNUMLET_SET:
        v = _EXTNUMLET
    elif cp in _SKIN_TONES:
        v = _EMOJI  # Emoji_Modifier: standalone token; absorbed after a base
    elif cp in _VARIATION_SELECTORS:
        v = _EXTEND
    elif _in_ranges(cp, _EMOJI_RANGES):
        v = _EMOJI
    elif _in_ranges(cp, _HIRAGANA_RANGES):
        v = _HIRAGANA
    elif _in_ranges(cp, _KATAKANA_RANGES):
        v = _KATAKANA
    elif _in_ranges(cp, _HANGUL_RANGES):
        v = _HANGUL
    elif _in_ranges(cp, _IDEO_RANGES):
        v = _IDEOGRAPHIC
    elif _in_ranges(cp, _SEASIAN_RANGES):
        cat = unicodedata.category(ch)
        v = _EXTEND if cat in ("Mn", "Mc", "Me") else _SEASIAN
    else:
        cat = unicodedata.category(ch)
        if cat in ("Lu", "Ll", "Lt", "Lm", "Lo"):
            if 0x0590 <= cp <= 0x05FF or 0xFB1D <= cp <= 0xFB4F:
                v = _HEBREW
            else:
                v = _ALETTER
        elif cat == "Nd":
            v = _NUMERIC
        elif cat in ("Mn", "Mc", "Me") or cp == 0xFF9E or cp == 0xFF9F:
            v = _EXTEND
        elif cat == "Cf":
            v = _FORMAT
        else:
            v = _OTHER
    _CLASS_CACHE[cp] = v
    return v


@dataclass
class Token:
    term: str
    type: str
    position: int
    start: int
    end: int


# WB4: Extend, Format and ZWJ are absorbed into the preceding context;
# ZWJ additionally participates in WB3c (emoji joins), handled in _scan_emoji
_TRANSPARENT = (_EXTEND, _FORMAT, _ZWJ)
_WORDISH = (_ALETTER, _HEBREW, _NUMERIC, _EXTNUMLET, _KATAKANA)
_MID_ANY = (_MIDLETTER, _MIDNUM, _MIDNUMLET, _SQ, _DQ)
_LETTERISH = (_ALETTER, _HEBREW)

# segment-internal base transitions (UAX#29 WB5-13b):
#   letters<->letters/numeric (WB5,9,10), numeric<->numeric (WB8),
#   katakana<->katakana (WB13), X<->ExtendNumLet (WB13a/13b)
def _join_ok(prev: int, nxt: int) -> bool:
    if prev == _EXTNUMLET or nxt == _EXTNUMLET:
        return True  # WB13a/b (both sides must be wordish, enforced by caller)
    if prev == _KATAKANA or nxt == _KATAKANA:
        return prev == nxt  # WB13 only
    return True  # letters/numeric freely join (WB5,8,9,10)


def _scan_word(s: str, i: int, n: int):
    """Scan one word segment starting at i. Returns
    (end_index, seen_alpha, seen_num, seen_kat)."""
    j = i
    seen_alpha = seen_num = seen_kat = False
    last_base = None
    while j < n:
        c = _classify(s[j])
        if c in _WORDISH:
            if last_base is not None and not _join_ok(last_base, c):
                break
            last_base = c
            seen_alpha |= c in _LETTERISH
            seen_num |= c == _NUMERIC
            seen_kat |= c == _KATAKANA
            j += 1
        elif c in _TRANSPARENT:
            j += 1
        elif c in _MID_ANY and last_base in (_ALETTER, _HEBREW, _NUMERIC):
            # WB6/7: letter (MidLetter|MidNumLet|SQ) letter
            # WB11/12: numeric (MidNum|MidNumLet|SQ) numeric
            # WB7a: Hebrew x SQ (trailing quote kept)
            # WB7b/c: Hebrew x DQ x Hebrew
            k = j + 1
            while k < n and _classify(s[k]) in _TRANSPARENT:
                k += 1
            nxt = _classify(s[k]) if k < n else _OTHER
            if (
                last_base in _LETTERISH
                and nxt in _LETTERISH
                and c in (_MIDLETTER, _MIDNUMLET, _SQ)
            ) or (
                last_base == _NUMERIC and nxt == _NUMERIC and c in (_MIDNUM, _MIDNUMLET, _SQ)
            ) or (last_base == _HEBREW and nxt == _HEBREW and c == _DQ):
                j = k
                continue
            if last_base == _HEBREW and c == _SQ:
                j += 1  # WB7a: quote belongs to the token, then break
                while j < n and _classify(s[j]) in _TRANSPARENT:
                    j += 1
                break
            break
        else:
            break
    return j, seen_alpha, seen_num, seen_kat


def _scan_run(s: str, i: int, n: int, cls: int):
    """Scan a homogeneous run (katakana/hangul/SE-Asian), transparent chars included."""
    j = i
    while j < n:
        c = _classify(s[j])
        if c == cls or c in _TRANSPARENT:
            j += 1
        else:
            break
    return j


def _scan_emoji(s: str, i: int, n: int):
    """Emoji sequence: ExtPict (+Extend/Format) joined by ZWJ (WB3c); RI
    pairs with transparents between (WB15/16 + WB4). A leading ZWJ joins a
    following ExtPict (WB3c at segment start). Returns (end, emit) — an
    unpaired regional indicator consumes but emits nothing."""
    j = i
    c0 = _classify(s[j])
    if c0 == _RI:
        j += 1
        while j < n and _classify(s[j]) in _TRANSPARENT:
            j += 1
        if j < n and _classify(s[j]) == _RI:
            j += 1
            # absorb trailing transparents (WB4), incl. a dangling ZWJ
            while j < n and _classify(s[j]) in _TRANSPARENT:
                j += 1
            return j, True
        return j, False
    if c0 == _ZWJ:
        # WB3c joins only ZWJ x ExtPict with nothing in between
        if j + 1 < n and _classify(s[j + 1]) == _EMOJI:
            j = j + 1  # include the ZWJ, continue scanning from the pictograph
        else:
            return j + 1, False  # lone ZWJ: consumed, no token
    j += 1
    while j < n:
        c = _classify(s[j])
        if c == _ZWJ:
            k = j + 1
            while k < n and _classify(s[k]) in (_EXTEND, _FORMAT):
                k += 1
            if k < n and _classify(s[k]) == _EMOJI:
                j = k + 1
            else:
                j += 1  # WB4: trailing ZWJ absorbs into the token
                break
        elif c in (_EXTEND, _FORMAT):
            if ord(s[j]) == 0xFE0E:
                break  # VS15 text-presentation: not part of emoji sequences
            j += 1
        elif c == _EMOJI and ord(s[j]) in _SKIN_TONES:
            j += 1  # Emoji_Modifier_Sequence: base + skin tone
        else:
            break
    return j, True


def standard_tokenize(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> list[Token]:
    """UAX#29 word-break tokenizer (StandardTokenizer semantics)."""
    out: list[Token] = []
    if not text:
        return out
    n = len(text)
    i = 0
    pos = -1  # position increments by 1 per emitted token

    def emit(start: int, end: int, ttype: str):
        nonlocal pos
        # maxTokenLength chopping (StandardTokenizer.kt:29-32): emit in pieces
        a = start
        while a < end:
            b = min(a + max_token_length, end)
            pos += 1
            out.append(Token(text[a:b], ttype, pos, a, b))
            a = b

    while i < n:
        c = _classify(text[i])
        # Emoji_Keycap_Sequence: [0-9#*] (FE0F|FE0E)? 20E3 -> one EMOJI token
        if text[i] in _KEYCAP_BASES:
            k = i + 1
            if k < n and ord(text[k]) in _VARIATION_SELECTORS:
                k += 1
            if k < n and ord(text[k]) == 0x20E3:
                emit(i, k + 1, EMOJI)
                i = k + 1
                continue
        if c in (_ALETTER, _HEBREW, _NUMERIC, _KATAKANA):
            j, seen_alpha, seen_num, seen_kat = _scan_word(text, i, n)
            if seen_alpha:
                ttype = ALPHANUM
            elif seen_kat:
                ttype = KATAKANA
            else:
                ttype = NUM
            emit(i, j, ttype)
            i = j
        elif c == _EXTNUMLET:
            # leading underscores: only a token if the run reaches a letter/digit/kana (WB13b)
            j, seen_alpha, seen_num, seen_kat = _scan_word(text, i, n)
            if seen_alpha or seen_num or seen_kat:
                emit(i, j, ALPHANUM if seen_alpha else (KATAKANA if seen_kat else NUM))
            i = j
        elif c == _HIRAGANA:
            j = i + 1
            while j < n and _classify(text[j]) in _TRANSPARENT:
                j += 1
            emit(i, j, HIRAGANA)
            i = j
        elif c == _IDEOGRAPHIC:
            j = i + 1
            while j < n and _classify(text[j]) in _TRANSPARENT:
                j += 1
            emit(i, j, IDEOGRAPHIC)
            i = j
        elif c == _HANGUL:
            j = _scan_run(text, i, n, _HANGUL)
            emit(i, j, HANGUL)
            i = j
        elif c == _SEASIAN:
            j = _scan_run(text, i, n, _SEASIAN)
            emit(i, j, SOUTHEAST_ASIAN)
            i = j
        elif c in (_EMOJI, _RI, _ZWJ):
            j, ok = _scan_emoji(text, i, n)
            if ok:
                emit(i, j, EMOJI)
            i = j
        else:
            i += 1
    return out


def _lower_simple(s: str) -> str:
    """Unicode simple lowercase, per codepoint (LowerCaseFilter.kt:17-29).

    Per-codepoint ``str.lower()`` equals the simple mapping for every codepoint
    whose full lowercase is a single codepoint; the one unconditional multi-cp
    full mapping is U+0130 (-> 'i' under the simple mapping). Per-codepoint
    application also sidesteps Python's contextual final-sigma rule.
    """
    if s.isascii():
        return s.lower()
    chars = []
    for ch in s:
        low = ch.lower()
        chars.append(low if len(low) == 1 else ("i" if ch == "İ" else ch))
    return "".join(chars)


_SIMPLE_FAST = frozenset("abcdefghijklmnopqrstuvwxyz0123456789 ")


def analyze(
    text: str,
    stop_set: frozenset[str] | None = None,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int], int]:
    """Full StandardAnalyzer chain: tokenize -> simple-lowercase -> stop filter.

    Returns ``(terms, positions, length)`` where ``length`` is the total token
    count BEFORE stop filtering (FieldInvertState.length semantics,
    ``index/IndexingChain.kt:1192-1252``); with discountOverlaps and no
    position-0 increments, norm length == this count (``Similarity.kt:134-144``).
    Positions preserve holes left by stopped tokens
    (``analysis/FilteringTokenFilter.kt:32-36``).
    """
    if not text:
        return [], [], 0
    # fast path: plain lowercase ASCII words separated by single spaces —
    # identical to the full chain for this alphabet (hot path for synthetic corpora)
    if len(text) < 4096 and set(text) <= _SIMPLE_FAST and "  " not in text:
        raw = text.split()
        if all(len(t) <= max_token_length for t in raw):
            if stop_set:
                terms, positions = [], []
                for p, t in enumerate(raw):
                    if t not in stop_set:
                        terms.append(t)
                        positions.append(p)
                return terms, positions, len(raw)
            return raw, list(range(len(raw))), len(raw)
    toks = standard_tokenize(text, max_token_length)
    length = len(toks)
    terms: list[str] = []
    positions: list[int] = []
    for t in toks:
        term = _lower_simple(t.term)
        if stop_set and term in stop_set:
            continue
        terms.append(term)
        positions.append(t.position)
    return terms, positions, length


def analyze_offsets(
    text: str,
    stop_set: frozenset[str] | None = None,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
) -> tuple[list[str], list[int], list[int], list[int], int]:
    """``analyze`` + character offsets per surviving token.

    Returns ``(terms, positions, starts, ends, length)`` where
    ``starts[i]:ends[i]`` slices the ORIGINAL text to the token's surface form
    (OffsetAttribute semantics: offsets index the pre-filter input,
    ``analysis/tokenattributes/OffsetAttribute.kt``; filters like lowercase
    never change offsets). Stop-filtered tokens leave position holes and no
    offsets, exactly like the postings OFFSETS flag's view
    (``index/PostingsEnum.kt:12-76``)."""
    if not text:
        return [], [], [], [], 0
    if len(text) < 4096 and set(text) <= _SIMPLE_FAST and "  " not in text:
        raw = text.split(" ") if text.strip() == text else None
        # the offsets fast path additionally needs no leading/trailing spaces
        # so that start offsets are a plain running sum
        if raw is not None and all(t and len(t) <= max_token_length for t in raw):
            terms, positions, starts, ends = [], [], [], []
            off = 0
            for p, t in enumerate(raw):
                if not stop_set or t not in stop_set:
                    terms.append(t)
                    positions.append(p)
                    starts.append(off)
                    ends.append(off + len(t))
                off += len(t) + 1
            return terms, positions, starts, ends, len(raw)
    toks = standard_tokenize(text, max_token_length)
    length = len(toks)
    terms: list[str] = []
    positions: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    for t in toks:
        term = _lower_simple(t.term)
        if stop_set and term in stop_set:
            continue
        terms.append(term)
        positions.append(t.position)
        starts.append(t.start)
        ends.append(t.end)
    return terms, positions, starts, ends, length
