"""IndicNormalizer (``analysis/in/IndicNormalizer.kt``): canonical
composition of two/three-char sequences in Indian-script Unicode blocks,
following Unicode 5.2 ch.6 (South Asian Scripts I) and the LDC graphical
decompositions — the published data the reference's table transcribes.

Each rule is (ch0, ch1, ch2, result, scripts): when codepoints
``base+ch0, base+ch1[, base+ch2]`` appear in a word of script ``s`` (base =
that script's block start), they compose to ``base+result``. ch2 = -1 means
a two-char rule; ch2 = 0xFF matches ZERO WIDTH JOINER (U+200D)."""

from __future__ import annotations

_BLOCKS = {
    "DEVANAGARI": (0x0900, 0x097F), "BENGALI": (0x0980, 0x09FF),
    "GURMUKHI": (0x0A00, 0x0A7F), "GUJARATI": (0x0A80, 0x0AFF),
    "ORIYA": (0x0B00, 0x0B7F), "TAMIL": (0x0B80, 0x0BFF),
    "TELUGU": (0x0C00, 0x0C7F), "KANNADA": (0x0C80, 0x0CFF),
    "MALAYALAM": (0x0D00, 0x0D7F),
}

_RULES = (
    (0x05, 0x3E, 0x45, 0x11, frozenset(('DEVANAGARI',))),
    (0x05, 0x3E, 0x46, 0x12, frozenset(('DEVANAGARI',))),
    (0x05, 0x3E, 0x47, 0x13, frozenset(('DEVANAGARI',))),
    (0x05, 0x3E, 0x48, 0x14, frozenset(('DEVANAGARI',))),
    (0x05, 0x3E, -1, 0x06, frozenset(('DEVANAGARI',))),
    (0x05, 0x45, -1, 0x72, frozenset(('DEVANAGARI',))),
    (0x05, 0x45, -1, 0x0D, frozenset(('GUJARATI',))),
    (0x05, 0x46, -1, 0x04, frozenset(('DEVANAGARI',))),
    (0x05, 0x47, -1, 0x0F, frozenset(('GUJARATI',))),
    (0x05, 0x48, -1, 0x10, frozenset(('GURMUKHI',))),
    (0x05, 0x49, -1, 0x11, frozenset(('DEVANAGARI',))),
    (0x05, 0x4A, -1, 0x12, frozenset(('DEVANAGARI',))),
    (0x05, 0x4B, -1, 0x13, frozenset(('DEVANAGARI',))),
    (0x05, 0x4C, -1, 0x14, frozenset(('DEVANAGARI',))),
    (0x06, 0x45, -1, 0x11, frozenset(('DEVANAGARI',))),
    (0x06, 0x46, -1, 0x12, frozenset(('DEVANAGARI',))),
    (0x06, 0x47, -1, 0x13, frozenset(('DEVANAGARI',))),
    (0x06, 0x48, -1, 0x14, frozenset(('DEVANAGARI',))),
    (0x07, 0x57, -1, 0x08, frozenset(('MALAYALAM',))),
    (0x09, 0x41, -1, 0x0A, frozenset(('DEVANAGARI',))),
    (0x09, 0x57, -1, 0x0A, frozenset(('TAMIL',))),
    (0x0E, 0x46, -1, 0x10, frozenset(('MALAYALAM',))),
    (0x0F, 0x45, -1, 0x0D, frozenset(('DEVANAGARI',))),
    (0x0F, 0x46, -1, 0x0E, frozenset(('DEVANAGARI',))),
    (0x0F, 0x47, -1, 0x10, frozenset(('DEVANAGARI',))),
    (0x0F, 0x57, -1, 0x10, frozenset(('ORIYA',))),
    (0x12, 0x3E, -1, 0x13, frozenset(('MALAYALAM',))),
    (0x12, 0x4C, -1, 0x14, frozenset(('TELUGU',))),
    (0x12, 0x55, -1, 0x13, frozenset(('TELUGU',))),
    (0x12, 0x57, -1, 0x14, frozenset(('TAMIL',))),
    (0x13, 0x57, -1, 0x14, frozenset(('ORIYA',))),
    (0x15, 0x3C, -1, 0x58, frozenset(('DEVANAGARI',))),
    (0x16, 0x3C, -1, 0x59, frozenset(('DEVANAGARI',))),
    (0x17, 0x3C, -1, 0x5A, frozenset(('DEVANAGARI',))),
    (0x1C, 0x3C, -1, 0x5B, frozenset(('DEVANAGARI',))),
    (0x21, 0x3C, -1, 0x5C, frozenset(('DEVANAGARI',))),
    (0x22, 0x3C, -1, 0x5D, frozenset(('DEVANAGARI',))),
    (0x23, 0x4D, 0xFF, 0x7A, frozenset(('MALAYALAM',))),
    (0x24, 0x4D, 0xFF, 0x4E, frozenset(('BENGALI',))),
    (0x28, 0x3C, -1, 0x29, frozenset(('DEVANAGARI',))),
    (0x28, 0x4D, 0xFF, 0x7B, frozenset(('MALAYALAM',))),
    (0x2B, 0x3C, -1, 0x5E, frozenset(('DEVANAGARI',))),
    (0x2F, 0x3C, -1, 0x5F, frozenset(('DEVANAGARI',))),
    (0x2C, 0x41, 0x41, 0x0B, frozenset(('TELUGU',))),
    (0x30, 0x3C, -1, 0x31, frozenset(('DEVANAGARI',))),
    (0x30, 0x4D, 0xFF, 0x7C, frozenset(('MALAYALAM',))),
    (0x32, 0x4D, 0xFF, 0x7D, frozenset(('MALAYALAM',))),
    (0x33, 0x3C, -1, 0x34, frozenset(('DEVANAGARI',))),
    (0x33, 0x4D, 0xFF, 0x7E, frozenset(('MALAYALAM',))),
    (0x35, 0x41, -1, 0x2E, frozenset(('TELUGU',))),
    (0x3E, 0x45, -1, 0x49, frozenset(('DEVANAGARI',))),
    (0x3E, 0x46, -1, 0x4A, frozenset(('DEVANAGARI',))),
    (0x3E, 0x47, -1, 0x4B, frozenset(('DEVANAGARI',))),
    (0x3E, 0x48, -1, 0x4C, frozenset(('DEVANAGARI',))),
    (0x3F, 0x55, -1, 0x40, frozenset(('KANNADA',))),
    (0x41, 0x41, -1, 0x42, frozenset(('GURMUKHI',))),
    (0x46, 0x3E, -1, 0x4A, frozenset(('TAMIL',))),
    (0x46, 0x42, 0x55, 0x4B, frozenset(('KANNADA',))),
    (0x46, 0x42, -1, 0x4A, frozenset(('KANNADA',))),
    (0x46, 0x46, -1, 0x48, frozenset(('MALAYALAM',))),
    (0x46, 0x55, -1, 0x47, frozenset(('TELUGU',))),
    (0x46, 0x56, -1, 0x48, frozenset(('TELUGU',))),
    (0x46, 0x57, -1, 0x4C, frozenset(('TAMIL',))),
    (0x47, 0x3E, -1, 0x4B, frozenset(('BENGALI',))),
    (0x47, 0x57, -1, 0x4C, frozenset(('BENGALI',))),
    (0x4A, 0x55, -1, 0x4B, frozenset(('KANNADA',))),
    (0x72, 0x3F, -1, 0x07, frozenset(('GURMUKHI',))),
    (0x72, 0x40, -1, 0x08, frozenset(('GURMUKHI',))),
    (0x72, 0x47, -1, 0x0F, frozenset(('GURMUKHI',))),
    (0x73, 0x41, -1, 0x09, frozenset(('GURMUKHI',))),
    (0x73, 0x42, -1, 0x0A, frozenset(('GURMUKHI',))),
    (0x73, 0x4B, -1, 0x13, frozenset(('GURMUKHI',))),
)

_DECOMP_FIRST = {}
for _r in _RULES:
    for _s in _r[4]:
        _DECOMP_FIRST.setdefault(_s, set()).add(_r[0])


def _block_of(ch: str):
    cp = ord(ch)
    for name, (lo, hi) in _BLOCKS.items():
        if lo <= cp <= hi:
            return name
    return None


def indic_normalize(term: str) -> str:
    """IndicNormalizer.normalize/compose (IndicNormalizer.kt:250-297)."""
    text = list(term)
    i = 0
    while i < len(text):
        block = _block_of(text[i])
        if block is None:
            i += 1
            continue
        base = _BLOCKS[block][0]
        ch0 = ord(text[i]) - base
        if ch0 not in _DECOMP_FIRST.get(block, ()):  # decompMask
            i += 1
            continue
        if i + 1 >= len(text) or _block_of(text[i + 1]) != block:
            i += 1
            continue
        ch1 = ord(text[i + 1]) - base
        ch2 = -1
        if i + 2 < len(text):
            if text[i + 2] == "\u200D":
                ch2 = 0xFF
            elif _block_of(text[i + 2]) == block:
                ch2 = ord(text[i + 2]) - base
        for r0, r1, r2, res, scripts in _RULES:
            if r0 == ch0 and block in scripts and r1 == ch1 and (r2 < 0 or r2 == ch2):
                text[i] = chr(base + res)
                del text[i + 1]
                if r2 >= 0:
                    del text[i + 1]
                break
        else:
            i += 1
            continue
        # recheck the same position (the reference's loop index also stays on
        # a composed char only when later rules re-match; it advances i — match that)
        i += 1
    return "".join(text)
