"""Randomized differential fuzz for the compiled Viterbi kernels.

Unlike test_cmorph_parity.py (structured dictionaries), this drives the
C kernels with RANDOM dictionaries — random surfaces over a small
alphabet (dense homograph/prefix collisions), random connection
matrices, random char-class tables, degenerate unknown tables — and
random texts, asserting token-stream parity with the Python reference
on every sample.  Also forces the arc-capacity retry path (-2) via
homograph counts above the initial 24*n+128 arc estimate per position.
Deterministic seeds: failures reproduce."""

from __future__ import annotations

import random

import pytest

import lucene_kmp_spark.analysis.cmorph as cmorph
import lucene_kmp_spark.analysis.ja as ja_mod
import lucene_kmp_spark.analysis.ko as ko_mod
import lucene_kmp_spark.analysis.morph as morph_mod
from lucene_kmp_spark.analysis.ja import JapaneseViterbi
from lucene_kmp_spark.analysis.ko import KoreanViterbi
from lucene_kmp_spark.analysis.morph import (
    CharacterDefinition,
    ConnectionCosts,
    MorphEntry,
    PrefixDictionary,
    UnknownDictionary,
)

pytestmark = pytest.mark.skipif(
    cmorph._load() is None, reason="native morph kernel unavailable")

# a compact alphabet spanning the interesting classes: kanji-ish, kana,
# latin, digits, space, punctuation, a combining mark, an astral char
_ALPHA = "猫犬鳥魚かきくカキク abc019、。!゙𝟘"


def _tok_key(tokens):
    return [(t.surface, t.start, t.end, t.type, t.position_increment,
             t.position_length) for t in tokens]


def _rand_dict(rng, n_entries, n_ctx, homographs=1):
    entries = []
    for _ in range(n_entries):
        ln = rng.randint(1, 4)
        surf = "".join(rng.choice(_ALPHA[:14]) for _ in range(ln))
        for _ in range(rng.randint(1, homographs)):
            entries.append(MorphEntry(
                surf, rng.randrange(n_ctx), rng.randrange(n_ctx),
                rng.randint(-2000, 9000),
                pos=rng.choice(["NNG", "VV", "J", "E+VV"])))
    matrix = [[rng.randint(-500, 1500) for _ in range(n_ctx)]
              for _ in range(n_ctx)]
    classes = {
        "KANJI": (rng.random() < 0.5, rng.random() < 0.5),
        "KANA": (True, True),
        "ALPHA": (True, True),
        "NUM": (True, True),
        "DEFAULT": (True, rng.random() < 0.5),
    }
    ranges = [
        (0x4E00, 0x9FFF, "KANJI"),
        (0x3040, 0x30FF, "KANA"),
        (ord("a"), ord("z"), "ALPHA"),
        (ord("0"), ord("9"), "NUM"),
    ]
    unknowns = UnknownDictionary({
        cls: [MorphEntry("*", rng.randrange(n_ctx), rng.randrange(n_ctx),
                         rng.randint(0, 12000), pos="UNK")
              for _ in range(rng.randint(0, 3))]
        for cls in ("KANJI", "KANA", "ALPHA", "NUM", "DEFAULT")
    })
    return entries, ConnectionCosts(matrix), unknowns, CharacterDefinition(
        classes, ranges)


def _rand_texts(rng, n):
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(_ALPHA)
                           for _ in range(rng.randint(0, 60))))
    return out


def _check(v, texts, label):
    nat = [v.tokenize(t) for t in texts]
    ja_mod._NATIVE_TOK = False
    ko_mod._NATIVE_TOK = False
    morph_mod._NATIVE = False
    try:
        py = [v.tokenize(t) for t in texts]
    finally:
        ja_mod._NATIVE_TOK = None
        ko_mod._NATIVE_TOK = None
        morph_mod._NATIVE = None
    for t, a, b in zip(texts, nat, py):
        assert _tok_key(a) == _tok_key(b), (label, repr(t))


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_ja_random_dictionaries(seed):
    rng = random.Random(1000 + seed)
    entries, conn, unk, cd = _rand_dict(rng, rng.randint(5, 120),
                                        rng.choice([3, 7, 16]),
                                        homographs=3)
    v = JapaneseViterbi(
        PrefixDictionary(entries), conn, unk, cd,
        search_mode=rng.random() < 0.7,
        extended_mode=rng.random() < 0.3,
        discard_punctuation=rng.random() < 0.7)
    _check(v, _rand_texts(rng, 40), f"ja seed={seed}")


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_ko_random_dictionaries(seed):
    rng = random.Random(2000 + seed)
    entries, conn, unk, cd = _rand_dict(rng, rng.randint(5, 120),
                                        rng.choice([3, 7, 16]),
                                        homographs=3)
    v = KoreanViterbi(
        PrefixDictionary(entries), conn, unk, cd,
        discard_punctuation=rng.random() < 0.7,
        output_unknown_unigrams=rng.random() < 0.3)
    _check(v, _rand_texts(rng, 40), f"ko seed={seed}")


def test_fuzz_capacity_retry():
    # >24 arcs per position on average forces the -2 grow-and-retry path:
    # 40 homographs of each single char over a long text
    rng = random.Random(77)
    n_ctx = 4
    entries = []
    for ch in "猫犬か":
        for _ in range(40):
            entries.append(MorphEntry(ch, rng.randrange(n_ctx),
                                      rng.randrange(n_ctx),
                                      rng.randint(0, 5000), pos="NNG"))
    matrix = [[rng.randint(0, 100) for _ in range(n_ctx)]
              for _ in range(n_ctx)]
    unk = UnknownDictionary({"DEFAULT": [MorphEntry("*", 0, 0, 8000)]})
    cd = CharacterDefinition({"DEFAULT": (True, True)}, [])
    v = JapaneseViterbi(PrefixDictionary(entries), ConnectionCosts(matrix),
                        unk, cd, search_mode=True)
    text = "猫犬か" * 30
    _check(v, [text], "capacity")


def test_fuzz_user_dictionaries():
    rng = random.Random(99)
    entries, conn, unk, cd = _rand_dict(rng, 60, 7, homographs=2)
    n_ctx = 7
    user = [
        MorphEntry("猫犬鳥", rng.randrange(n_ctx), rng.randrange(n_ctx),
                   -5000, pos="NNG", segmentation=(1, 2)),
        MorphEntry("かき", rng.randrange(n_ctx), rng.randrange(n_ctx),
                   -5000, pos="NNG"),
        MorphEntry("猫", rng.randrange(n_ctx), rng.randrange(n_ctx),
                   -5000, pos="NNG"),
    ]
    for longest in (False, True):
        v = JapaneseViterbi(
            PrefixDictionary(entries), conn, unk, cd,
            user_dictionary=PrefixDictionary(user),
            output_longest_user_only=longest, search_mode=True)
        _check(v, _rand_texts(rng, 40) + ["猫犬鳥かき猫", "゙猫犬鳥 かき"],
               f"user longest={longest}")


def test_fuzz_empty_and_degenerate():
    rng = random.Random(5)
    # dictionary with zero entries for some unknown classes, 1x1 matrix
    entries = [MorphEntry("猫", 0, 0, 100, pos="NNG")]
    conn = ConnectionCosts([[0]])
    unk = UnknownDictionary({"DEFAULT": [MorphEntry("*", 0, 0, 500)]})
    cd = CharacterDefinition({"DEFAULT": (True, True)}, [])
    for cls in (JapaneseViterbi, KoreanViterbi):
        v = cls(PrefixDictionary(entries), conn, unk, cd)
        _check(v, ["", "猫", "猫猫猫", "x", " ", "猫 x 猫",
                   "".join(rng.choice("猫x ") for _ in range(50))],
               cls.__name__)
