"""StandardAnalyzer-equivalence goldens.

Expected values derived from Lucene's documented StandardTokenizer behavior
(reference golden assertions live in
core/src/commonTest/.../analysis/standard/TestStandardAnalyzer.kt and
TestStandardFactories; the UAX#29 rules are the public spec).
"""

from lucene_kmp_spark.analysis import analyze, standard_tokenize


def terms(text, **kw):
    return analyze(text, **kw)[0]


def types(text):
    return [t.type for t in standard_tokenize(text)]


def test_basic_words():
    assert terms("Hello World") == ["hello", "world"]


def test_alphanumeric():
    assert terms("B2B") == ["b2b"]
    assert terms("2B") == ["2b"]


def test_punct_splits():
    assert terms("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert terms("quoted 'word'") == ["quoted", "word"]


def test_apostrophe_kept_inside_word():
    # WB6/WB7 with single quote: don't -> don't
    assert terms("don't break") == ["don't", "break"]
    assert terms("O'Neil's") == ["o'neil's"]


def test_numbers_with_separators():
    # MidNum , and MidNumLet . join digits (WB11/12)
    assert terms("3.1415") == ["3.1415"]
    assert terms("1,000,000") == ["1,000,000"]
    # but not at edges
    assert terms("1.") == ["1"]
    assert terms(",5") == ["5"]


def test_underscore_joins():
    # ExtendNumLet (WB13a/b)
    assert terms("foo_bar") == ["foo_bar"]
    assert terms("foo_bar_123") == ["foo_bar_123"]


def test_colon_midletter():
    # U+003A is MidLetter in UAX#29 (Unicode 12)
    assert terms("foo:bar") == ["foo:bar"]
    assert terms("foo: bar") == ["foo", "bar"]


def test_email_like_splits():
    # @ and / are not word chars
    assert terms("dev@example.com") == ["dev", "example.com"]
    assert terms("a/b") == ["a", "b"]


def test_ideographic_one_per_token():
    assert terms("我是中国人") == ["我", "是", "中", "国", "人"]
    assert types("我是") == ["<IDEOGRAPHIC>", "<IDEOGRAPHIC>"]


def test_hiragana_one_per_token():
    assert terms("それは") == ["そ", "れ", "は"]
    assert types("それ") == ["<HIRAGANA>", "<HIRAGANA>"]


def test_katakana_run():
    assert terms("カタカナ") == ["カタカナ"]
    assert types("カタカナ") == ["<KATAKANA>"]


def test_hangul_run():
    assert types("안녕하세요") == ["<HANGUL>"]


def test_mixed_cjk_latin():
    assert terms("C++や C#は 使ってます") == ["c", "や", "c", "は", "使", "っ", "て", "ま", "す"]


def test_thai():
    assert types("ภาษาไทย") == ["<SOUTHEAST_ASIAN>"]


def test_emoji_basic():
    assert types("💩 💩💩") == ["<EMOJI>", "<EMOJI>", "<EMOJI>"]
    assert terms("😂 smile") == ["😂", "smile"]


def test_emoji_zwj_sequence():
    # family emoji: single token via ZWJ joins
    fam = "👩‍❤️‍👩"
    assert types(fam) == ["<EMOJI>"]
    assert terms(fam) == [fam]


def test_regional_indicator_flag():
    flag = "🇺🇸"
    assert types(flag) == ["<EMOJI>"]


def test_max_token_length_chopping():
    # StandardTokenizer.kt:29-32 — oversized runs chopped, not dropped
    long = "a" * 600
    got = terms(long)
    assert got == ["a" * 255, "a" * 255, "a" * 90]
    # positions advance per chop
    _, pos, n = analyze(long)
    assert pos == [0, 1, 2]
    assert n == 3


def test_empty_and_whitespace():
    assert analyze("") == ([], [], 0)
    assert analyze("   \t\n ") == ([], [], 0)


def test_huge_doc_leading_whitespace():
    # TestStandardAnalyzer.testHugeDoc analog
    text = " " * 4094 + "testing 1234"
    assert terms(text) == ["testing", "1234"]


def test_lowercase_simple_mapping():
    # U+0130 lowercases to 'i' under the simple mapping (not 'i' + combining dot)
    assert terms("İstanbul") == ["istanbul"]
    # final sigma must NOT apply (per-codepoint mapping)
    assert terms("ΒΟΛΟΣ") == ["βολοσ"]


def test_positions_with_stopwords():
    # stop filter leaves holes (FilteringTokenFilter.kt:32-36)
    t, pos, n = analyze("the quick the fox", stop_set=frozenset(["the"]))
    assert t == ["quick", "fox"]
    assert pos == [1, 3]
    assert n == 4


def test_fast_path_equals_slow_path():
    text = "the quick brown fox 123 jumps"
    fast = analyze(text)
    # force slow path by disabling via a char outside the fast alphabet
    slow = analyze(text + " Z")
    assert fast[0] == slow[0][:-1]
    assert fast[1] == slow[1][:-1]


def test_numbers_type():
    toks = standard_tokenize("1234 abc a1")
    assert [t.type for t in toks] == ["<NUM>", "<ALPHANUM>", "<ALPHANUM>"]
