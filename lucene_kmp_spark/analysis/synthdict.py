"""Deterministic mecab-scale synthetic dictionaries for lattice validation.

The demo dictionaries in ``ja.py`` / ``ko.py`` prove the reference's
dictionary-independent behaviors on hand-derivable lattices (the same
contract as the reference, which embeds no dictionaries either — its build
downloads mecab-ipadic / mecab-ko-dic).  What they cannot exercise is
lattice behavior under *dictionary pressure*: ipadic carries ~392k surfaces
over a 1316x1316 connection matrix, so real decoding faces dozens of
candidate arcs per position, homograph entries with distinct context ids,
compound-vs-parts segmentation ambiguity, and unknown runs interleaved with
dense dictionary coverage.

This module generates dictionaries of that SHAPE at >=10k-entry scale,
fully deterministically (seeded PRNG; no wall clock), so tests can verify
Viterbi optimality against an independent shortest-path oracle and
benchmarks can price the per-document tokenize cost honestly
(reference shape to match: ``analysis/kuromoji/.../ja/JapaneseTokenizer.kt``
lattice behavior under mecab-ipadic-scale data).

Nothing here is extracted from ipadic/mecab-ko-dic: surfaces are composed
from Unicode block inventories, costs and context ids are PRNG draws in
mecab-plausible ranges.
"""

from __future__ import annotations

import random

from lucene_kmp_spark.analysis.morph import (
    CharacterDefinition,
    ConnectionCosts,
    MorphEntry,
    UnknownDictionary,
)

# Curated syllabary inventories (full standard sets, not dictionary data).
_KATAKANA = (
    "アイウエオカキクケコサシスセソタチツテトナニヌネノ"
    "ハヒフヘホマミムメモヤユヨラリルレロワヲンガギグゲゴ"
    "ザジズゼゾダヂヅデドバビブベボパピプペポ"
)
_HIRAGANA_ENDINGS = ("る", "く", "す", "む", "ぐ", "つ", "ぶ", "う")
_JA_PARTICLES = ("の", "に", "は", "を", "が", "と", "で", "も", "へ", "や")
_KO_PARTICLES = ("은", "는", "이", "가", "을", "를", "의", "에", "로", "와")
_KO_ENDINGS = ("다", "고", "서", "며", "면")


def _matrix(n: int, rng: random.Random) -> list[list[int]]:
    """Full n x n connection matrix with mecab-plausible costs: mostly
    positive in the low thousands, a minority of negative (attractive)
    transitions, BOS/EOS row+col kept moderate."""
    m = [[0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            v = rng.randint(-800, 3000)
            if i == 0 or j == 0:
                v = rng.randint(0, 1500)
            m[i][j] = v
    m[0][0] = 0
    return m


def _kanji_pool(count: int) -> list[str]:
    # CJK Unified Ideographs are contiguous from U+4E00; every codepoint in
    # the taken range is an assigned ideograph.
    return [chr(cp) for cp in range(0x4E00, 0x4E00 + count)]


def _hangul_pool(count: int) -> list[str]:
    # Precomposed Hangul syllables from U+AC00, stride chosen to spread
    # over initial consonants (588 syllables per initial).
    return [chr(0xAC00 + (i * 97) % 11172) for i in range(count)]


def synth_japanese_dictionary(
    n_entries: int = 12000, n_context: int = 316, seed: int = 0x5EED
):
    """(entries, ConnectionCosts, UnknownDictionary, CharacterDefinition)
    with ipadic's shape: >=10k surfaces, full context matrix, homographs,
    compound/parts ambiguity, multi-entry unknown classes."""
    rng = random.Random(seed)
    # surfaces compose from a 220-char core pool: 12k entries over short
    # strings of 220 chars give dense substring overlap — several candidate
    # arcs per lattice position, the ipadic-like ambiguity regime (ipadic
    # packs ~392k surfaces over ~3k common kanji)
    kanji = _kanji_pool(220)
    entries: list[MorphEntry] = []
    nouns: list[str] = []
    seen: set[str] = set()

    # context ids are POS-banded like real mecab matrices (ipadic: 1316
    # contexts for 392k surfaces — dozens of entries share every id):
    # nouns [1, n/3), particles [n/3, n/2), verbs [n/2, 2n/3), rest above
    third, half, two3 = n_context // 3, n_context // 2, 2 * n_context // 3

    def ctx(band: str = "other") -> int:
        if band == "noun":
            return rng.randint(1, third - 1)
        if band == "particle":
            return rng.randint(third, half - 1)
        if band == "verb":
            return rng.randint(half, two3 - 1)
        return rng.randint(two3, n_context - 1)

    def cost(lo: int = 2500, hi: int = 9000) -> int:
        return rng.randint(lo, hi)

    # closed-class particles first, two context-id variants each (homograph
    # pressure on the highest-frequency surfaces, like ipadic)
    for p in _JA_PARTICLES:
        entries.append(MorphEntry(p, ctx("particle"), ctx("particle"),
                                  cost(400, 1500), "助詞-格助詞-一般"))
        entries.append(MorphEntry(p, ctx("particle"), ctx("particle"),
                                  cost(400, 1800), "助詞-係助詞"))
    while len(entries) < n_entries:
        r = rng.random()
        if r < 0.58:  # kanji noun, 1-3 chars
            ln = rng.choice((1, 2, 2, 2, 3))
            s = "".join(rng.choice(kanji) for _ in range(ln))
            if s in seen and rng.random() > 0.08:
                continue  # ~8% of collisions kept as homographs
            seen.add(s)
            nouns.append(s)
            entries.append(MorphEntry(s, ctx("noun"), ctx("noun"), cost(),
                                      "名詞-一般"))
        elif r < 0.70:  # katakana noun, 2-5 chars
            ln = rng.randint(2, 5)
            s = "".join(rng.choice(_KATAKANA) for _ in range(ln))
            if s in seen:
                continue
            seen.add(s)
            nouns.append(s)
            entries.append(MorphEntry(s, ctx("noun"), ctx("noun"),
                                      cost(3000, 9500), "名詞-一般"))
        elif r < 0.78 and nouns:  # compound of two existing nouns
            a, b = rng.choice(nouns), rng.choice(nouns)
            s = a + b
            if s in seen:
                continue
            seen.add(s)
            # cost near the parts' range: connection costs decide per
            # sentence whether the compound or the parts win
            entries.append(MorphEntry(s, ctx("noun"), ctx("noun"),
                                      cost(5000, 14000), "名詞-固有名詞-一般"))
        elif r < 0.86:  # verb: kanji stem + okurigana, base_form = surface
            stem = rng.choice(kanji)
            end = rng.choice(_HIRAGANA_ENDINGS)
            s = stem + end
            if s in seen:
                continue
            seen.add(s)
            entries.append(MorphEntry(s, ctx("verb"), ctx("verb"),
                                      cost(3500, 9000), "動詞-自立",
                                      base_form=s))
        else:  # rare-reading homograph of an existing noun
            if not nouns:
                continue
            s = rng.choice(nouns)
            entries.append(MorphEntry(s, ctx("noun"), ctx("noun"),
                                      cost(4000, 12000), "名詞-固有名詞-地域"))
    unknowns = UnknownDictionary({
        cls: [MorphEntry("*", ctx(), ctx(), cost(6000, 14000), pos)
              for _ in range(3)]
        for cls, pos in (
            ("KANJI", "名詞-一般"), ("KATAKANA", "名詞-一般"),
            ("HIRAGANA", "助詞"), ("ALPHA", "名詞-一般"),
            ("NUMERIC", "名詞-数"), ("DEFAULT", "記号-一般"),
        )
    })
    char_def = CharacterDefinition(
        classes={
            "KANJI": (False, False),
            "KATAKANA": (True, True),
            "HIRAGANA": (True, True),
            "ALPHA": (True, True),
            "NUMERIC": (True, True),
            "DEFAULT": (True, True),
        },
        ranges=[
            (0x4E00, 0x9FFF, "KANJI"),
            (0x30A0, 0x30FF, "KATAKANA"),
            (0x3040, 0x309F, "HIRAGANA"),
            (ord("a"), ord("z"), "ALPHA"),
            (ord("A"), ord("Z"), "ALPHA"),
            (ord("0"), ord("9"), "NUMERIC"),
        ],
    )
    return entries, ConnectionCosts(_matrix(n_context, rng)), unknowns, char_def


def synth_korean_dictionary(
    n_entries: int = 10000, n_context: int = 316, seed: int = 0xC0FFEE
):
    """mecab-ko-dic-shaped tables: Hangul nouns, particle homographs,
    COMPOUND entries decomposing into in-dictionary parts, INFLECT verb
    entries with morpheme arrays."""
    rng = random.Random(seed)
    # same density argument as ja: a 160-syllable core pool makes substring
    # overlap (and thus lattice ambiguity) dense at 10k entries
    syll = _hangul_pool(160)
    entries: list[MorphEntry] = []
    nouns: list[str] = []
    seen: set[str] = set()

    # POS-banded context ids (see the ja generator's note)
    third, half, two3 = n_context // 3, n_context // 2, 2 * n_context // 3

    def ctx(band: str = "other") -> int:
        if band == "noun":
            return rng.randint(1, third - 1)
        if band == "particle":
            return rng.randint(third, half - 1)
        if band == "verb":
            return rng.randint(half, two3 - 1)
        return rng.randint(two3, n_context - 1)

    def cost(lo: int = 2500, hi: int = 9000) -> int:
        return rng.randint(lo, hi)

    for p in _KO_PARTICLES:
        entries.append(MorphEntry(p, ctx("particle"), ctx("particle"),
                                  cost(300, 1200), "JX"))
        entries.append(MorphEntry(p, ctx("particle"), ctx("particle"),
                                  cost(300, 1500), "JKS"))
    while len(entries) < n_entries:
        r = rng.random()
        if r < 0.62:  # noun, 1-3 syllables
            ln = rng.choice((1, 2, 2, 2, 3))
            s = "".join(rng.choice(syll) for _ in range(ln))
            if s in seen and rng.random() > 0.08:
                continue
            seen.add(s)
            nouns.append(s)
            entries.append(MorphEntry(s, ctx("noun"), ctx("noun"), cost(),
                                      "NNG"))
        elif r < 0.76 and len(nouns) >= 2:  # COMPOUND of two nouns
            a, b = rng.choice(nouns), rng.choice(nouns)
            s = a + b
            if s in seen:
                continue
            seen.add(s)
            entries.append(MorphEntry(
                s, ctx("noun"), ctx("noun"), cost(4500, 13000), "NNG",
                pos_type="COMPOUND",
                morphemes=(("NNG", a), ("NNG", b)),
            ))
        elif r < 0.88:  # INFLECT verb form: stem + ending, morpheme array
            stem = "".join(rng.choice(syll) for _ in range(rng.randint(1, 2)))
            end = rng.choice(_KO_ENDINGS)
            s = stem + end
            if s in seen:
                continue
            seen.add(s)
            entries.append(MorphEntry(
                s, ctx("verb"), ctx("verb"), cost(3500, 10000), "VV+EF",
                pos_type="INFLECT",
                morphemes=(("VV", stem), ("EF", end)),
            ))
        else:  # homograph of an existing noun (proper-noun reading)
            if not nouns:
                continue
            s = rng.choice(nouns)
            entries.append(MorphEntry(s, ctx("noun"), ctx("noun"),
                                      cost(4000, 12000), "NNP"))
    unknowns = UnknownDictionary({
        "HANGUL": [MorphEntry("*", ctx(), ctx(), cost(8000, 14000), "NNG")
                   for _ in range(2)],
        "ALPHA": [MorphEntry("*", ctx(), ctx(), cost(5000, 8000), "SL")],
        "NUMERIC": [MorphEntry("*", ctx(), ctx(), cost(5000, 8000), "SN")],
        "HANJA": [MorphEntry("*", ctx(), ctx(), cost(7000, 11000), "NNG")],
        "SPACE": [MorphEntry(" ", 0, 0, 0, "SP")],
        "DEFAULT": [MorphEntry("*", ctx(), ctx(), cost(9000, 14000), "SY")],
    })
    char_def = CharacterDefinition(
        classes={
            "HANGUL": (False, True),
            "ALPHA": (True, True),
            "NUMERIC": (True, True),
            "HANJA": (False, False),
            "SPACE": (False, True),
            "DEFAULT": (True, True),
        },
        ranges=[
            (0xAC00, 0xD7AF, "HANGUL"),
            (0x4E00, 0x9FFF, "HANJA"),
            (ord("a"), ord("z"), "ALPHA"),
            (ord("A"), ord("Z"), "ALPHA"),
            (ord("0"), ord("9"), "NUMERIC"),
            (0x20, 0x20, "SPACE"),
        ],
    )
    return entries, ConnectionCosts(_matrix(n_context, rng)), unknowns, char_def


def synth_sentences_ja(
    entries: list[MorphEntry], n: int = 100, seed: int = 7,
    words_lo: int = 4, words_hi: int = 12, oov_rate: float = 0.15,
) -> list[str]:
    """Deterministic test sentences: dictionary surfaces concatenated in a
    noun-particle-noun-... rhythm (no spaces), with ``oov_rate`` of the
    sentences carrying an out-of-dictionary kanji/latin run mid-sentence."""
    rng = random.Random(seed)
    surfaces = [e.surface for e in entries]
    particles = [e.surface for e in entries if e.pos.startswith("助詞")]
    # OOV kanji: beyond the generator's core pool, still real ideographs
    oov_pool = [chr(cp) for cp in range(0x4E00 + 1600, 0x4E00 + 1700)]
    out = []
    for i in range(n):
        k = rng.randint(words_lo, words_hi)
        words = []
        for j in range(k):
            if j % 2 == 1 and particles and rng.random() < 0.6:
                words.append(rng.choice(particles))
            else:
                words.append(rng.choice(surfaces))
        if rng.random() < oov_rate:
            run = "".join(rng.choice(oov_pool) for _ in range(rng.randint(1, 3)))
            words.insert(rng.randint(0, len(words)), run)
        out.append("".join(words))
    return out


def synth_sentences_ko(
    entries: list[MorphEntry], n: int = 100, seed: int = 11,
    words_lo: int = 3, words_hi: int = 9, oov_rate: float = 0.15,
) -> list[str]:
    """Korean sentences: eojeol = noun(+particle) joined by spaces, some
    with OOV Hangul runs or latin tokens."""
    rng = random.Random(seed)
    nouns = [e.surface for e in entries if e.pos.startswith("NN")]
    parts = [e.surface for e in entries if e.pos.startswith("J")]
    verbs = [e.surface for e in entries if e.pos.startswith("VV")]
    oov_pool = [chr(0xAC00 + 11171 - i * 13) for i in range(80)]
    out = []
    for i in range(n):
        k = rng.randint(words_lo, words_hi)
        eojeols = []
        for j in range(k):
            w = rng.choice(nouns)
            if parts and rng.random() < 0.7:
                w += rng.choice(parts)
            eojeols.append(w)
        if verbs and rng.random() < 0.5:
            eojeols.append(rng.choice(verbs))
        if rng.random() < oov_rate:
            run = "".join(rng.choice(oov_pool) for _ in range(rng.randint(1, 3)))
            eojeols.insert(rng.randint(0, len(eojeols)), run)
        out.append(" ".join(eojeols))
    return out
