"""Dictionary-based CJK tokenization machinery (kuromoji/nori/smartcn
analogs — analysis/morph.py, ja.py, ko.py, smartcn.py).

Goldens mirror the REFERENCE'S OWN test shapes wherever they are
dictionary-independent:

* kuromoji TestJapaneseTokenizer testDecomposition — 関西国際空港 stays one
  token in NORMAL mode, splits 関西/国際/空港 in SEARCH mode (the
  second-best backtrace rescore, KuromojiViterbiNBest.kt:136-316).
* nori TestKoreanTokenizer decompound — 가락지나물은 한국, 중국, 일본 across
  NONE/DISCARD/MIXED (Viterbi.kt:173-215), with the exact arrays the
  reference asserts (modulo its dictionary's vocabulary).
* smartcn TestSmartChineseAnalyzer shapes — dictionary words beat per-char
  splits via the bigram shortest path; mixed latin/digits; sentence split.

The full-size system dictionaries are caller-supplied (the reference
downloads mecab-ipadic / mecab-ko-dic / smartcn data at BUILD time — none
are embedded in its repo either); tests run on the embedded demo tables.
"""

import pytest

from lucene_kmp_spark.analysis.ja import (
    EXTENDED,
    NORMAL,
    SEARCH,
    demo_japanese_dictionary,
    japanese_analyzer,
    japanese_tokenizer,
    katakana_stem,
)
from lucene_kmp_spark.analysis.ko import (
    DISCARD,
    MIXED,
    NONE,
    demo_korean_dictionary,
    korean_analyzer,
    korean_tokenizer,
)
from lucene_kmp_spark.analysis.morph import (
    MorphEntry,
    assign_positions,
    is_punctuation,
)
from lucene_kmp_spark.analysis.smartcn import (
    demo_chinese_dictionary,
    get_char_type,
    segment_sentence,
    smart_chinese_analyzer,
    split_sentences,
)


@pytest.fixture(scope="module")
def ja_dict():
    return demo_japanese_dictionary()


@pytest.fixture(scope="module")
def ko_dict():
    return demo_korean_dictionary()


# ------------------------------------------------------------------ Japanese
def test_ja_normal_keeps_compound(ja_dict):
    tok = japanese_tokenizer(*ja_dict, mode=NORMAL)
    assert [t.surface for t in tok("関西国際空港")] == ["関西国際空港"]


def test_ja_search_decomposes_long_kanji(ja_dict):
    """testDecomposition shape: the (len-2)*3000 kanji penalty makes the
    rescored backtrace pick the split path."""
    tok = japanese_tokenizer(*ja_dict, mode=SEARCH)
    assert [t.surface for t in tok("関西国際空港")] == ["関西", "国際", "空港"]
    assert [t.surface for t in tok("日本経済新聞")] == ["日本", "経済", "新聞"]


def test_ja_search_offsets_contiguous(ja_dict):
    tok = japanese_tokenizer(*ja_dict, mode=SEARCH)
    toks = tok("関西国際空港に行きます")
    assert [t.surface for t in toks] == ["関西", "国際", "空港", "に", "行き", "ます"]
    assert [(t.start, t.end) for t in toks] == [
        (0, 2), (2, 4), (4, 6), (6, 7), (7, 9), (9, 11)]


def test_ja_short_words_not_penalized(ja_dict):
    """2-kanji dictionary words are below SEARCH_MODE_KANJI_LENGTH: no
    decomposition pressure."""
    tok = japanese_tokenizer(*ja_dict, mode=SEARCH)
    assert [t.surface for t in tok("空港の検索")] == ["空港", "の", "検索"]


def test_ja_unknown_katakana_grouping(ja_dict):
    """Unknown words group by (char class, punctuation) runs
    (KuromojiViterbiNBest.kt:95-131): unseen katakana becomes ONE token."""
    tok = japanese_tokenizer(*ja_dict, mode=SEARCH)
    assert [t.surface for t in tok("パイナップル")] == ["パイナップル"]


def test_ja_extended_unigrams_unknown(ja_dict):
    """EXTENDED mode unigrams unknown spans (:263-289)."""
    tok = japanese_tokenizer(*ja_dict, mode=EXTENDED)
    out = [t.surface for t in tok("関西国際空港へようこそ")]
    assert out[:3] == ["関西", "国際", "空港"]
    assert out[3:] == ["へ", "よ", "う", "こ", "そ"]


def test_ja_punctuation_discarded(ja_dict):
    tok = japanese_tokenizer(*ja_dict, mode=SEARCH)
    assert [t.surface for t in tok("空港、検索。")] == ["空港", "検索"]
    tok_keep = japanese_tokenizer(*ja_dict, mode=SEARCH, discard_punctuation=False)
    assert [t.surface for t in tok_keep("空港、検索。")] == ["空港", "、", "検索", "。"]


def test_ja_user_dictionary_segmentation(ja_dict):
    """UserDictionary compound entries split per their recorded
    segmentation (KuromojiViterbiNBest.kt:238-262) and beat the system
    lattice (user matches suppress KNOWN lookup at the position)."""
    entries, costs, unk, cd = ja_dict
    user = [MorphEntry("関西国際空港", 1, 1, -100000, "カスタム名詞",
                       segmentation=(2, 2, 2))]
    tok = japanese_tokenizer(entries, costs, unk, cd, user_entries=user,
                             mode=NORMAL)
    toks = tok("関西国際空港")
    assert [t.surface for t in toks] == ["関西", "国際", "空港"]
    assert all(t.type == "USER" for t in toks)


def test_ja_base_form_and_katakana_stem(ja_dict):
    an = japanese_analyzer(mode=SEARCH)
    terms, positions, length = an("サーバーに行きます")
    # サーバー stems to サーバ (>=4 katakana chars, trailing U+30FC);
    # 行き lemmatizes to 行く (JapaneseBaseFormFilter)
    assert terms == ["サーバ", "に", "行く", "ます"]
    assert positions == [0, 1, 2, 3] and length == 4
    assert katakana_stem("サーバー") == "サーバ"
    assert katakana_stem("ソー") == "ソー"  # below min length 4
    assert katakana_stem("みかんー") == "みかんー"  # not katakana


def test_ja_pos_stop_tags(ja_dict):
    an = japanese_analyzer(mode=SEARCH, stop_tags=("助詞-格助詞-一般", "助動詞"))
    terms, positions, _ = an("空港に行きます")
    assert terms == ["空港", "行く"]
    # position holes preserved across the stopped particles
    assert positions == [0, 2]


def test_ja_analyzer_width_fold(ja_dict):
    """CJKWidthCharFilter runs before the tokenizer (JapaneseAnalyzer
    initReader): fullwidth ASCII folds to latin."""
    an = japanese_analyzer(mode=SEARCH)
    terms, _, _ = an("ＡＢＣ空港")
    assert terms == ["abc", "空港"]


# ------------------------------------------------------------------- Korean
KO_SENT = "가락지나물은 한국, 중국, 일본"


def test_ko_decompound_none(ko_dict):
    tok = korean_tokenizer(*ko_dict, mode=NONE)
    assert [t.surface for t in tok(KO_SENT)] == [
        "가락지나물", "은", "한국", "중국", "일본"]


def test_ko_decompound_discard(ko_dict):
    """The reference's exact expected array (TestKoreanTokenizer:232)."""
    tok = korean_tokenizer(*ko_dict, mode=DISCARD)
    assert [t.surface for t in tok(KO_SENT)] == [
        "가락지", "나물", "은", "한국", "중국", "일본"]


def test_ko_decompound_mixed(ko_dict):
    """MIXED emits compound + parts, first part at posIncr 0, compound
    posLength = #parts (TestKoreanTokenizer:241)."""
    tok = korean_tokenizer(*ko_dict, mode=MIXED)
    toks = tok(KO_SENT)
    assert [t.surface for t in toks] == [
        "가락지나물", "가락지", "나물", "은", "한국", "중국", "일본"]
    assert toks[0].position_length == 2
    assert toks[1].position_increment == 0
    assert toks[2].position_increment == 1


def test_ko_inflect_decompound(ko_dict):
    """INFLECT entries decompose to morphemes sharing the whole-token
    offsets (nori Viterbi.kt:194-202)."""
    tok = korean_tokenizer(*ko_dict, mode=DISCARD)
    toks = tok("나물을 먹었다")
    assert [t.surface for t in toks] == ["나물", "을", "먹", "었", "다"]
    assert (toks[2].start, toks[2].end) == (toks[4].start, toks[4].end)


def test_ko_pos_stop_filter(ko_dict):
    """DEFAULT_STOP_TAGS drop particles/endings by LEFT pos."""
    an = korean_analyzer(mode=DISCARD)
    terms, positions, _ = an(KO_SENT)
    assert terms == ["가락지", "나물", "한국", "중국", "일본"]
    assert positions == [0, 1, 3, 4, 5]  # hole where 은 (JX) was


def test_ko_reading_form(ko_dict):
    an = korean_analyzer(mode=DISCARD)
    terms, _, _ = an("中國은")
    assert terms == ["중국"]  # Hanja surface replaced by its reading


def test_ko_unknown_script_run(ko_dict):
    tok = korean_tokenizer(*ko_dict, mode=DISCARD)
    assert [t.surface for t in tok("spark 데이터")] == ["spark", "데이터"]


def test_ko_space_penalty_prefers_attached_particle(ko_dict):
    """A particle AFTER whitespace pays 3000 (nori Viterbi.kt:244-271):
    the lattice still parses, and the attached form never splits across
    the space."""
    tok = korean_tokenizer(*ko_dict, mode=DISCARD)
    toks = tok("나물 은 한국")
    assert [t.surface for t in toks] == ["나물", "은", "한국"]
    # offsets skip the spaces
    assert [(t.start, t.end) for t in toks] == [(0, 2), (3, 4), (5, 7)]


def test_ko_exotic_script_runs_group_by_script(ko_dict):
    """Unknown runs in scripts beyond the char-class table group at script
    boundaries, matching Character.UnicodeScript.of (nori
    KoreanTokenizer.kt unknown grouping; closes DEVIATIONS ex-#28):
    adjacent same-script chars form ONE unknown token, a script change
    splits the run."""
    tok = korean_tokenizer(*ko_dict, mode=DISCARD)
    thai, arabic, deva = "สวัสดี", "مرحبا", "नमस्ते"
    # each run, embedded in Korean with spaces, is one unknown token
    for run in (thai, arabic, deva):
        toks = tok(f"한국 {run} 나물")
        assert [t.surface for t in toks] == ["한국", run, "나물"], run
        assert toks[1].type == "UNKNOWN"
    # ADJACENT different-script runs split at the script boundary (the old
    # COMMON-fallback classifier merged them into one run)
    toks = tok(f"한국 {thai}{arabic} 나물")
    assert [t.surface for t in toks] == ["한국", thai, arabic, "나물"]
    toks = tok(f"{deva}{thai}")
    assert [t.surface for t in toks] == [deva, thai]
    # combining marks are joinable (Mn never breaks a run): ja voiced mark
    # after Hiragana stays attached — use an INHERITED-class mark U+0301
    toks = tok("한국 ab́c 나물")
    assert [t.surface for t in toks] == ["한국", "ab́c", "나물"]


def test_ko_script_of_major_scripts():
    from lucene_kmp_spark.analysis.ko import _script_of

    assert _script_of("ก") == "THAI"
    assert _script_of("م") == "ARABIC"
    assert _script_of("न") == "DEVANAGARI"
    assert _script_of("א") == "HEBREW"
    assert _script_of("ა") == "GEORGIAN"
    assert _script_of("Ա") == "ARMENIAN"
    assert _script_of("ቀ") == "ETHIOPIC"
    assert _script_of("த") == "TAMIL"
    assert _script_of("ල") == "SINHALA"
    assert _script_of("ᠠ") == "MONGOLIAN"
    assert _script_of("ན") == "TIBETAN"
    assert _script_of("から"[0]) == "HIRAGANA"
    assert _script_of("A") == "LATIN"
    assert _script_of("한") == "HANGUL"
    assert _script_of("漢") == "HAN"
    assert _script_of("1") == "COMMON"
    assert _script_of(".") == "COMMON"
    assert _script_of("́") == "INHERITED"  # combining acute
    assert _script_of("฿") == "COMMON"     # Thai baht sign = Common
    # ADVICE r4: voiced-sound marks are NOT Hiragana per Scripts.txt —
    # U+3099/309A (combining) are Inherited, U+309B/309C (spacing) Common,
    # while the iteration marks/digraph U+309D-309F stay Hiragana
    assert _script_of("゙") == "INHERITED"
    assert _script_of("゚") == "INHERITED"
    assert _script_of("゛") == "COMMON"
    assert _script_of("゜") == "COMMON"
    assert _script_of("ゝ") == "HIRAGANA"
    assert _script_of("ゟ") == "HIRAGANA"
    assert _script_of("ゖ") == "HIRAGANA"


def test_ko_trailing_space_reaches_eos(ko_dict):
    """A single trailing space must not leave EOS unreachable: the reference
    resets pos to posData.pos at EOF (Viterbi.kt:139-141) so the space itself
    is matched as an unknown arc. Regression for the forward() early-break."""
    an = korean_analyzer(mode=DISCARD)
    base = an("가락지나물은 한국")
    assert an("가락지나물은 한국 ") == base
    assert an("가락지나물은 한국  ") == base
    assert base[0]  # sanity: non-empty
    tok = korean_tokenizer(*ko_dict, mode=DISCARD)
    assert [t.surface for t in tok("나물 ")] == ["나물"]
    assert [t.surface for t in tok(" ")] == []


# ------------------------------------------------------------------ Chinese
def test_zh_dictionary_words_win():
    d = demo_chinese_dictionary()
    assert [t.word for t in segment_sentence("我是中国人", d)] == ["我", "是", "中国人"]
    assert [t.word for t in segment_sentence("我喜欢北京大学生", d)] == [
        "我", "喜欢", "北京", "大学生"]


def test_zh_mixed_latin_digits():
    d = demo_chinese_dictionary()
    assert [t.word for t in segment_sentence("Hello world 123 中国", d)] == [
        "hello", "world", "123", "中国"]


def test_zh_delimiter_normalized():
    d = demo_chinese_dictionary()
    out = [t.word for t in segment_sentence("今天天气很好。", d)]
    assert out[-1] == ","  # SegTokenFilter folds every delimiter to ','


def test_zh_sentence_split():
    assert [s for _, s in split_sentences("我是中国人。搜索引擎很好!末尾")] == [
        "我是中国人。", "搜索引擎很好!", "末尾"]


def test_zh_analyzer_chain():
    an = smart_chinese_analyzer()
    terms, positions, length = an("我是中国人。Searching 搜索引擎!")
    # porter stem on the latin token, punctuation stopwords dropped
    assert terms == ["我", "是", "中国人", "search", "搜索", "引擎"]
    assert length == 6
    assert positions == sorted(positions)


def test_zh_char_types():
    assert get_char_type("中") == "HANZI"
    assert get_char_type("a") == "LETTER"
    assert get_char_type("７") == "FW_DIGIT"
    assert get_char_type("，") == "DELIM"
    assert get_char_type(" ") == "SPACE"


# ------------------------------------------------------------------- shared
def test_is_punctuation_matches_reference_categories():
    assert is_punctuation("、") and is_punctuation(".") and is_punctuation("ㆍ")
    assert not is_punctuation("あ") and not is_punctuation("a")


def test_assign_positions_overlaps():
    from lucene_kmp_spark.analysis.morph import MorphToken

    e = MorphEntry("x", 0, 0, 0)
    toks = [MorphToken("a", 0, 1, "KNOWN", e),
            MorphToken("b", 0, 1, "KNOWN", e, position_increment=0),
            MorphToken("c", 1, 2, "KNOWN", e)]
    terms, positions, length = assign_positions(toks)
    assert positions == [0, 0, 1]
    assert length == 2  # numTerms = length - numOverlap


def test_registry_exposes_dict_analyzers():
    from lucene_kmp_spark.analysis.registry import analyzer_for

    assert analyzer_for("ja-dict")("関西国際空港")[0] == ["関西", "国際", "空港"]
    assert analyzer_for("ko-dict")(KO_SENT)[0][:2] == ["가락지", "나물"]
    assert analyzer_for("zh-smart")("我是中国人")[0] == ["我", "是", "中国人"]


def test_cjk_oracle_maps_match_analyzers():
    """The inline CASE token maps the DuckDB oracles use must equal the
    actual analyzer output for every sentence in the closed set (the
    _ML_PRELUDE guard pattern)."""
    from lucene_kmp_spark.contrib.oracle_queries import (
        _JA_SENTS, _JA_TOKENS, _KO_SENTS, _KO_TOKENS, _ZH_SENTS, _ZH_TOKENS)
    from lucene_kmp_spark.analysis.smartcn import smart_chinese_analyzer

    ja = japanese_analyzer()
    for sent, toks in zip(_JA_SENTS, _JA_TOKENS):
        assert ja(sent)[0] == toks.split(), sent
    ko = korean_analyzer()
    for sent, toks in zip(_KO_SENTS, _KO_TOKENS):
        assert ko(sent)[0] == toks.split(), sent
    zh = smart_chinese_analyzer()
    for sent, toks in zip(_ZH_SENTS, _ZH_TOKENS):
        assert zh(sent)[0] == toks.split(), sent


def test_cjk_reading_and_userdict_oracle_maps_match():
    """Round-4 rows: romaji / katakana reading-form and user-dictionary
    token maps must equal the analyzer output (same guard pattern)."""
    from lucene_kmp_spark.contrib.oracle_queries import (
        _JA_KATA_TOKENS,
        _JA_ROMAJI_TOKENS,
        _JA_SENTS,
        _JA_UD_SENTS,
        _JA_UD_TOKENS,
        _JA_USER_DICT_TEXT,
    )
    from lucene_kmp_spark.analysis.ja import (
        demo_japanese_dictionary_with_readings,
        parse_user_dictionary,
    )

    rom = japanese_analyzer(*demo_japanese_dictionary_with_readings(),
                            reading_form="romaji")
    for sent, toks in zip(_JA_SENTS, _JA_ROMAJI_TOKENS):
        assert rom(sent)[0] == toks.split(), sent
    kata = japanese_analyzer(*demo_japanese_dictionary_with_readings(),
                             reading_form="katakana")
    for sent, toks in zip(_JA_SENTS, _JA_KATA_TOKENS):
        assert kata(sent)[0] == toks.split(), sent
    ud = parse_user_dictionary(_JA_USER_DICT_TEXT, left_id=1, right_id=1)
    an = japanese_analyzer(user_entries=ud)
    for sent, toks in zip(_JA_UD_SENTS, _JA_UD_TOKENS):
        assert an(sent)[0] == toks.split(), sent


def test_ja_nbest_outputs_alternatives(ja_dict):
    """setNBestCost semantics (ViterbiNBest.backtraceNBest): alternatives
    within the cost budget of the best path emit as overlapping tokens —
    the reference's testNormalModeNbest shape (compound at posIncr 0 with
    positionLength spanning its parts)."""
    from lucene_kmp_spark.analysis.ja import japanese_tokenizer

    entries, costs, unk, cd = ja_dict
    tok0 = japanese_tokenizer(entries, costs, unk, cd, mode=NORMAL)
    base = [t.surface for t in tok0("関西国際空港に行きます")]
    assert base == ["関西国際空港", "に", "行き", "ます"]

    # tiny budget: n-best == best path
    tok1 = japanese_tokenizer(entries, costs, unk, cd, mode=NORMAL, nbest_cost=1)
    assert [t.surface for t in tok1("関西国際空港に行きます")] == base

    # generous budget: the split alternatives surface, graph-shaped
    tokn = japanese_tokenizer(entries, costs, unk, cd, mode=NORMAL, nbest_cost=20000)
    toks = tokn("関西国際空港に行きます")
    surfaces = [t.surface for t in toks]
    assert surfaces == ["関西", "関西国際空港", "国際", "空港", "に", "行き", "ます"]
    compound = toks[1]
    assert compound.position_increment == 0  # shares 関西's position
    assert compound.position_length == 3     # spans the three parts
    # offsets stay true to the text for every token
    for t in toks:
        assert "関西国際空港に行きます"[t.start:t.end] == t.surface


def test_ja_nbest_deduplicates_spans(ja_dict):
    """A span on both the best path and an alternative emits once
    (fixupPendingList dedup)."""
    from lucene_kmp_spark.analysis.ja import japanese_tokenizer

    entries, costs, unk, cd = ja_dict
    tokn = japanese_tokenizer(entries, costs, unk, cd, mode=NORMAL, nbest_cost=50000)
    toks = tokn("検索エンジン")
    spans = [(t.start, t.end) for t in toks]
    assert len(spans) == len(set(spans))


def test_cjk_graph_oracle_maps_match_analyzers():
    """The term:position maps behind the graph-mode oracle rows
    (japanese_nbest_term / korean_mixed_term) must equal the analyzer
    output, and the oracle's dl (distinct positions) must equal the
    analyzer's overlap-discounted length."""
    from lucene_kmp_spark.analysis.ja import NORMAL as JA_NORMAL
    from lucene_kmp_spark.analysis.ja import japanese_analyzer
    from lucene_kmp_spark.analysis.ko import MIXED as KO_MIXED
    from lucene_kmp_spark.analysis.ko import korean_analyzer
    from lucene_kmp_spark.contrib.oracle_queries import (
        _JA_NBEST_MAP, _JA_SENTS, _KO_MIXED_MAP, _KO_SENTS)

    ja = japanese_analyzer(mode=JA_NORMAL, nbest_cost=20000)
    for sent, mapped in zip(_JA_SENTS, _JA_NBEST_MAP):
        terms, positions, length = ja(sent)
        assert " ".join(f"{t}:{p}" for t, p in zip(terms, positions)) == mapped, sent
        assert length == len(set(positions))
    ko = korean_analyzer(mode=KO_MIXED)
    for sent, mapped in zip(_KO_SENTS, _KO_MIXED_MAP):
        terms, positions, length = ko(sent)
        assert " ".join(f"{t}:{p}" for t, p in zip(terms, positions)) == mapped, sent
        assert length == len(set(positions))


def test_ko_user_dictionary_longest_only(ko_dict):
    """nori's outputLongestUserEntryOnly (Viterbi.kt:48): when user entries
    overlap, only the longest at a position enters the lattice."""
    from lucene_kmp_spark.analysis.ko import korean_tokenizer
    from lucene_kmp_spark.analysis.morph import MorphEntry

    entries, costs, unk, cd = ko_dict
    user = [
        MorphEntry("데이터", 1, 1, -5000, "NNG"),
        MorphEntry("데이터검색", 1, 1, -20000, "NNG"),
    ]
    tok = korean_tokenizer(entries, costs, unk, cd, user_entries=user, mode=DISCARD)
    toks = tok("데이터검색 엔진")
    assert toks[0].surface == "데이터검색" and toks[0].type == "USER"
    assert [t.surface for t in toks] == ["데이터검색", "엔진"]


def test_ja_user_dictionary_csv_format(ja_dict):
    """kuromoji userdict.txt parsing (UserDictionary.kt): CSV entries with
    segmentation/readings validation, comments, whitespace; parsed entries
    drive the tokenizer's USER path end-to-end."""
    from lucene_kmp_spark.analysis.ja import japanese_tokenizer, parse_user_dictionary

    text = (
        "# custom nouns\n"
        "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,カスタム名詞\n"
        "\n"
        "朝青龍,朝青龍,アサショウリュウ,カスタム人名  # inline comment\n"
    )
    entries, costs, unk, cd = ja_dict
    # ids 5/5 are the reference's ipadic defaults; the demo matrix is 4x4
    user = parse_user_dictionary(text, left_id=1, right_id=1)
    assert len(user) == 2
    assert user[0].segmentation == (2, 2, 2)
    assert user[1].reading == "アサショウリュウ"
    tok = japanese_tokenizer(entries, costs, unk, cd, user_entries=user, mode=NORMAL)
    toks = tok("関西国際空港")
    assert [t.surface for t in toks] == ["関西", "国際", "空港"]
    assert all(t.type == "USER" for t in toks)

    with pytest.raises(ValueError, match="number of readings"):
        parse_user_dictionary("ab,a b,ア,名詞\n")
    with pytest.raises(ValueError, match="concatenated segmentation"):
        parse_user_dictionary("abc,a b,ア イ,名詞\n")


def test_ko_user_dictionary_format(ko_dict):
    """nori userdict.txt parsing: bare surfaces and compound lines."""
    from lucene_kmp_spark.analysis.ko import korean_tokenizer, parse_user_dictionary

    text = "# entries\nc++\n세종\n세종시 세종 시\n"
    user = parse_user_dictionary(text)
    assert [e.surface for e in user] == ["c++", "세종", "세종시"]
    assert user[2].pos_type == "COMPOUND"
    assert user[2].morphemes == (("NNG", "세종"), ("NNG", "시"))
    entries, costs, unk, cd = ko_dict
    tok = korean_tokenizer(entries, costs, unk, cd, user_entries=user, mode=DISCARD)
    assert [t.surface for t in tok("세종시")] == ["세종", "시"]
    tok_n = korean_tokenizer(entries, costs, unk, cd, user_entries=user, mode=NONE)
    assert [t.surface for t in tok_n("세종시")] == ["세종시"]
    with pytest.raises(ValueError, match="concatenated"):
        parse_user_dictionary("세종시 세종 수\n")


def test_sentence_breaks_match_jdk_goldens():
    """JDK BreakIterator.getSentenceInstance(Locale.ROOT) parity — the
    reference builds its sentence DFA from the same JDK rules at build time
    (gradle/generateBreakIteratorData + jdkport/RuleBasedBreakIterator), so
    the installed JDK IS the parity oracle. Goldens frozen from a live
    java.text.BreakIterator run (164 cases: curated adversarial + fuzz);
    the port matched 16,000/16,000 random punctuation-soup cases at freeze
    time. Closes DEVIATIONS ex-#29 (terminator-only split)."""
    import json
    import os

    from lucene_kmp_spark.analysis.smartcn import sentence_breaks

    path = os.path.join(os.path.dirname(__file__), "data",
                        "sentence_break_goldens.json")
    with open(path) as f:
        goldens = json.load(f)
    assert len(goldens) >= 150
    for text, jb in goldens:
        ours = sorted(set(sentence_breaks(text) + ([len(text)] if text else [])))
        assert ours == jb, (text, ours, jb)


def test_ko_unknown_run_starting_on_inherited_mark(ko_dict):
    """ADVICE r4: an unknown run STARTING on U+3099 (combining voiced mark,
    script Inherited) must not lock its script to HIRAGANA — inherited
    adopts the following script, so the mark joins the next run as in
    nori's Character.UnicodeScript behavior."""
    from lucene_kmp_spark.analysis.ko import DISCARD, korean_tokenizer

    tok = korean_tokenizer(*ko_dict, mode=DISCARD)
    # mark leads an unknown run followed by hiragana: one joined run
    toks = tok("한국 ゙あか 나물")
    assert [t.surface for t in toks] == ["한국", "゙あか", "나물"]
    # and followed by a DIFFERENT script (latin): still joins — inherited
    # locks nothing (the old range table split here by claiming HIRAGANA)
    toks = tok("한국 ゙abc 나물")
    assert [t.surface for t in toks] == ["한국", "゙abc", "나물"]
    # the SPACING voiced mark U+309B is Common AND category Sk — nori's
    # isPunctuation covers modifier symbols, so discard_punctuation drops
    # it; the following hiragana still tokenizes on its own
    toks = tok("゛あ")
    assert "".join(t.surface for t in toks) == "あ"
