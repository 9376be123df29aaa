"""Differential parity for the compiled Viterbi kernels (analysis/cmorph).

Every test tokenizes the same inputs through the native C path and the
pure-Python path and asserts the token streams (surface, offsets, type,
posIncr, posLength) — and, for forward, the raw lattices arc by arc —
are IDENTICAL.  The native path is the default when gcc is available;
these tests are what licenses that default."""

from __future__ import annotations

import random

import pytest

import lucene_kmp_spark.analysis.cmorph as cmorph
import lucene_kmp_spark.analysis.ja as ja_mod
import lucene_kmp_spark.analysis.ko as ko_mod
import lucene_kmp_spark.analysis.morph as morph_mod
from lucene_kmp_spark.analysis.ja import (
    EXTENDED, NORMAL, SEARCH, JapaneseViterbi, demo_japanese_dictionary,
)
from lucene_kmp_spark.analysis.ja import (
    parse_user_dictionary as ja_user_dict,
)
from lucene_kmp_spark.analysis.ko import (
    DISCARD, MIXED, NONE, KoreanViterbi, demo_korean_dictionary,
)
from lucene_kmp_spark.analysis.ko import (
    parse_user_dictionary as ko_user_dict,
)
from lucene_kmp_spark.analysis.morph import PrefixDictionary
from lucene_kmp_spark.analysis.synthdict import (
    synth_japanese_dictionary,
    synth_korean_dictionary,
    synth_sentences_ja,
    synth_sentences_ko,
)

pytestmark = pytest.mark.skipif(
    cmorph._load() is None, reason="native morph kernel unavailable")


def _tok_key(tokens):
    return [(t.surface, t.start, t.end, t.type, t.position_increment,
             t.position_length) for t in tokens]


def _pos_key(positions, n):
    out = []
    for p in range(n + 1):
        pd = positions.get(p)
        if pd is None or pd.count == 0:
            continue
        out.append((p, pd.costs, pd.last_right, pd.back_pos,
                    pd.back_word_pos, pd.back_index, pd.back_id,
                    pd.back_type))
    return out


def _both_tokenize(v, text):
    nat = v.tokenize(text)
    ja_mod._NATIVE_TOK = False
    ko_mod._NATIVE_TOK = False
    morph_mod._NATIVE = False
    try:
        py = v.tokenize(text)
    finally:
        ja_mod._NATIVE_TOK = None
        ko_mod._NATIVE_TOK = None
        morph_mod._NATIVE = None
    return nat, py


def _both_forward(v, text):
    assert cmorph.run_forward(v, text), "native forward refused to run"
    nat = _pos_key(v.positions, len(text))
    morph_mod._NATIVE = False
    try:
        v.forward(text)
    finally:
        morph_mod._NATIVE = None
    return nat, _pos_key(v.positions, len(text))


def _mixed_texts(seed, base):
    """Deterministic mixed-script stress texts: dictionary sentences
    interleaved with spaces, punctuation, digits, latin, unknown scripts,
    combining marks, astral chars, and long single-class runs."""
    rng = random.Random(seed)
    extras = [" ", "  ", "、", "。", "...", "42", "２０", "abc", "XYZ",
              "한글", "ελλην", "कखग", "゙か", "🍣🍺", "ー", "〜",
              "ｱｲｳ", "カタカナ" * 20, "x" * 300]
    texts = ["", " ", "。", "゙", "🍣"]
    for _ in range(60):
        parts = []
        for _ in range(rng.randint(1, 6)):
            parts.append(rng.choice(base))
            if rng.random() < 0.6:
                parts.append(rng.choice(extras))
        texts.append("".join(parts))
    return texts


# ----------------------------------------------------------------- Japanese
@pytest.fixture(scope="module")
def ja_synth():
    entries, conn, unk, cd = synth_japanese_dictionary(n_entries=4000)
    return entries, conn, unk, cd, synth_sentences_ja(entries, n=120, seed=11)


@pytest.mark.parametrize("mode", [NORMAL, SEARCH, EXTENDED])
@pytest.mark.parametrize("discard_punct", [True, False])
def test_ja_tokenize_parity_modes(ja_synth, mode, discard_punct):
    entries, conn, unk, cd, sents = ja_synth
    v = JapaneseViterbi(
        PrefixDictionary(entries), conn, unk, cd,
        search_mode=mode in (SEARCH, EXTENDED),
        extended_mode=mode == EXTENDED,
        discard_punctuation=discard_punct)
    for text in _mixed_texts(3, sents):
        nat, py = _both_tokenize(v, text)
        assert _tok_key(nat) == _tok_key(py), repr(text)


def test_ja_tokenize_parity_output_compounds():
    entries, conn, unk, cd = demo_japanese_dictionary()
    v = JapaneseViterbi(PrefixDictionary(entries), conn, unk, cd,
                        search_mode=True, output_compounds=True)
    for text in ["関西国際空港に行きます", "日本経済新聞を読む",
                 "関西国際空港と日本経済新聞", "すもももももももものうち"]:
        nat, py = _both_tokenize(v, text)
        assert _tok_key(nat) == _tok_key(py), repr(text)


@pytest.mark.parametrize("longest_only", [False, True])
def test_ja_tokenize_parity_user_dict(longest_only):
    entries, conn, unk, cd = demo_japanese_dictionary()
    user = ja_user_dict(
        "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,カスタム名詞\n"
        "日本経済新聞,日本経済新聞,ニホンケイザイシンブン,カスタム名詞\n",
        left_id=1, right_id=1)
    v = JapaneseViterbi(PrefixDictionary(entries), conn, unk, cd,
                        user_dictionary=PrefixDictionary(user),
                        output_longest_user_only=longest_only,
                        search_mode=True)
    for text in ["関西国際空港に行きます", "日本経済新聞と関西国際空港、",
                 "未知語と関西国際空港"]:
        nat, py = _both_tokenize(v, text)
        assert _tok_key(nat) == _tok_key(py), repr(text)


def test_ja_forward_lattice_identical(ja_synth):
    entries, conn, unk, cd, sents = ja_synth
    v = JapaneseViterbi(PrefixDictionary(entries), conn, unk, cd)
    for text in _mixed_texts(5, sents)[:30]:
        nat, py = _both_forward(v, text)
        assert nat == py, repr(text)


def test_ja_nbest_parity(ja_synth):
    entries, conn, unk, cd, sents = ja_synth
    v = JapaneseViterbi(PrefixDictionary(entries), conn, unk, cd,
                        search_mode=True)
    for text in sents[:25]:
        nat = v.tokenize_nbest(text, 2000)  # native forward + lazy lattice
        ja_mod._NATIVE_TOK = False
        morph_mod._NATIVE = False
        try:
            py = v.tokenize_nbest(text, 2000)
        finally:
            ja_mod._NATIVE_TOK = None
            morph_mod._NATIVE = None
        assert _tok_key(nat) == _tok_key(py), repr(text)


# ------------------------------------------------------------------- Korean
@pytest.fixture(scope="module")
def ko_synth():
    entries, conn, unk, cd = synth_korean_dictionary(n_entries=4000)
    return entries, conn, unk, cd, synth_sentences_ko(entries, n=120, seed=13)


@pytest.mark.parametrize("mode", [NONE, DISCARD, MIXED])
@pytest.mark.parametrize("discard_punct", [True, False])
def test_ko_tokenize_parity_modes(ko_synth, mode, discard_punct):
    entries, conn, unk, cd, sents = ko_synth
    v = KoreanViterbi(PrefixDictionary(entries), conn, unk, cd,
                      mode=mode, discard_punctuation=discard_punct)
    for text in _mixed_texts(7, sents):
        nat, py = _both_tokenize(v, text)
        assert _tok_key(nat) == _tok_key(py), repr(text)


def test_ko_tokenize_parity_unigrams_and_user():
    entries, conn, unk, cd = demo_korean_dictionary()
    user = ko_user_dict("세종시 세종 시\nc++\n")
    v = KoreanViterbi(PrefixDictionary(entries), conn, unk, cd,
                      user_dictionary=PrefixDictionary(user),
                      output_unknown_unigrams=True)
    for text in ["세종시에 살다", "c++ 프로그래밍", "모르는말 세종시",
                 "가락지나물은 한국 ", "한국  호주 "]:
        nat, py = _both_tokenize(v, text)
        assert _tok_key(nat) == _tok_key(py), repr(text)


def test_ko_forward_lattice_identical(ko_synth):
    entries, conn, unk, cd, sents = ko_synth
    v = KoreanViterbi(PrefixDictionary(entries), conn, unk, cd)
    for text in _mixed_texts(9, sents)[:30]:
        nat, py = _both_forward(v, text)
        assert nat == py, repr(text)


def test_inherited_mark_run_parity():
    # ADVICE r4 regression surface: unknown runs starting on combining
    # marks must adopt the following script identically on both paths
    entries, conn, unk, cd = demo_korean_dictionary()
    v = KoreanViterbi(PrefixDictionary(entries), conn, unk, cd)
    for text in ["゙カタカナ", "゙゚カナ", "・ㆍ마늘",
                 "́abc한국"]:
        nat, py = _both_tokenize(v, text)
        assert _tok_key(nat) == _tok_key(py), repr(text)


def test_ja_hybrid_forward_only_parity(ja_synth):
    # native forward + PYTHON backtrace (the combination that engages
    # whenever run_tokenize_ja bails but run_forward doesn't): the
    # search-mode prune-and-rescore must mutate the lazily materialised
    # lattice exactly like the eager Python one
    entries, conn, unk, cd, sents = ja_synth
    v = JapaneseViterbi(PrefixDictionary(entries), conn, unk, cd,
                        search_mode=True)
    texts = _mixed_texts(21, sents)
    ja_mod._NATIVE_TOK = False          # keep morph_mod._NATIVE active
    try:
        hybrid = [v.tokenize(t) for t in texts]
    finally:
        ja_mod._NATIVE_TOK = None
    ja_mod._NATIVE_TOK = False
    ko_mod._NATIVE_TOK = False
    morph_mod._NATIVE = False
    try:
        py = [v.tokenize(t) for t in texts]
    finally:
        ja_mod._NATIVE_TOK = None
        ko_mod._NATIVE_TOK = None
        morph_mod._NATIVE = None
    for t, a, b in zip(texts, hybrid, py):
        assert _tok_key(a) == _tok_key(b), repr(t)


def test_native_disabled_by_env(monkeypatch):
    # LKS_MORPH_NATIVE=0 must force the Python path (fresh load check)
    monkeypatch.setenv("LKS_MORPH_NATIVE", "0")
    monkeypatch.setattr(cmorph, "_LIB", None)
    assert cmorph._load() is None
    entries, conn, unk, cd = demo_japanese_dictionary()
    v = JapaneseViterbi(PrefixDictionary(entries), conn, unk, cd)
    assert cmorph.run_tokenize_ja(v, "関西国際空港") is None
    assert not cmorph.run_forward(v, "関西国際空港")
    monkeypatch.setattr(cmorph, "_LIB", None)  # re-enable for other tests
