"""CJK numeral normalization + iteration-mark expansion
(analysis/cjk_numbers.py). Goldens ported VERBATIM from the reference's
TestJapaneseNumberFilter.kt (testVariants/testLargeVariants/testNegative)
and TestJapaneseIterationMarkCharFilter.kt — both are dictionary-
independent, so the reference's own expected arrays apply directly."""

import pytest

from lucene_kmp_spark.analysis.cjk_numbers import (
    iteration_mark_fold,
    japanese_number_filter,
    normalize_japanese_number,
    normalize_korean_number,
)

JA_GOLDENS = [
    # TestJapaneseNumberFilter.testVariants
    ("3", "3"), ("３", "3"), ("三", "3"),
    ("03", "3"), ("０３", "3"), ("〇三", "3"),
    ("003", "3"), ("００３", "3"), ("〇〇三", "3"),
    ("千", "1000"), ("1千", "1000"), ("１千", "1000"), ("一千", "1000"),
    ("一〇〇〇", "1000"), ("１０百", "1000"),
    # testLargeVariants
    ("三五七八九", "35789"),
    ("六百二万五千一", "6025001"),
    ("兆六百万五千一", "1000006005001"),
    ("十兆六百万五千一", "10000006005001"),
    ("一京一", "10000000000000001"),
    ("十京十", "100000000000000010"),
    ("垓京兆億万千百十一", "100010001000100011111"),
    # decimals / separators / passthrough
    ("3.2千", "3200"),
    ("3,000", "3000"),
    ("２，０００", "2000"),
    ("0.5", "0.5"),
    ("not-a-number", "not-a-number"),
    ("一二三四五六七八九〇壱", "一二三四五六七八九〇壱"),  # unsupported char -> verbatim
]


@pytest.mark.parametrize("raw,expected", JA_GOLDENS)
def test_japanese_number_goldens(raw, expected):
    assert normalize_japanese_number(raw) == expected


def test_korean_number_goldens():
    # the nori grammar with the hangul tables
    assert normalize_korean_number("삼") == "3"
    assert normalize_korean_number("일천") == "1000"
    assert normalize_korean_number("천") == "1000"
    assert normalize_korean_number("조육백만오천일") == "1000006005001"
    assert normalize_korean_number("십조육백만오천일") == "10000006005001"
    assert normalize_korean_number("영영삼") == "3"
    assert normalize_korean_number("한국") == "한국"  # non-numeral verbatim


ITER_GOLDENS = [
    # TestJapaneseIterationMarkCharFilter goldens, verbatim
    ("時々", "時時"),
    ("馬鹿々々しい", "馬鹿馬鹿しい"),
    ("ミスヾ", "ミスズ"),
    ("おゝの", "おおの"),
    ("みすゞ", "みすず"),
    ("じゞ", "じじ"),
    ("じゝ", "じし"),
    ("こゝろ", "こころ"),
    ("学問のすゝめ", "学問のすすめ"),
    ("いすゞ", "いすず"),
    ("ねやぽゞつむぴ", "ねやぽぽつむぴ"),
    ("ねやぽゝつむぴ", "ねやぽぽつむぴ"),
    ("。", "。"), ("。。", "。。"), ("。。。", "。。。"),
    ("。。ゝゝ", "。。ゝゝ"),   # marks may not source punctuation spans
    ("？ゝ", "？？"),
    (
        "時々、おゝのさんと一緒にお寿司が食べたいです。abcところゞゝゝ。",
        "時時、おおのさんと一緒にお寿司が食べたいです。abcところどころ。",
    ),
    (
        "時々、おゝのさんと一緒にお寿司を食べに行きます。",
        "時時、おおのさんと一緒にお寿司を食べに行きます。",
    ),
    # full unvoiced/voiced hiragana tables
    (
        "かゝがゝきゝぎゝくゝぐゝけゝげゝこゝごゝさゝざゝしゝじゝすゝずゝせゝぜゝそゝぞゝたゝだゝちゝぢゝつゝづゝてゝでゝとゝどゝはゝばゝひゝびゝふゝぶゝへゝべゝほゝぼゝ",
        "かかがかききぎきくくぐくけけげけここごこささざさししじしすすずすせせぜせそそぞそたただたちちぢちつつづつててでてととどとははばはひひびひふふぶふへへべへほほぼほ",
    ),
    (
        "かゞがゞきゞぎゞくゞぐゞけゞげゞこゞごゞさゞざゞしゞじゞすゞずゞせゞぜゞそゞぞゞたゞだゞちゞぢゞつゞづゞてゞでゞとゞどゞはゞばゞひゞびゞふゞぶゞへゞべゞほゞぼゞ",
        "かがががきぎぎぎくぐぐぐけげげげこごごごさざざざしじじじすずずずせぜぜぜそぞぞぞただだだちぢぢぢつづづづてでででとどどどはばばばひびびびふぶぶぶへべべべほぼぼぼ",
    ),
    # full katakana tables
    (
        "カヽガヽキヽギヽクヽグヽケヽゲヽコヽゴヽサヽザヽシヽジヽスヽズヽセヽゼヽソヽゾヽタヽダヽチヽヂヽツヽヅヽテヽデヽトヽドヽハヽバヽヒヽビヽフヽブヽヘヽベヽホヽボヽ",
        "カカガカキキギキククグクケケゲケココゴコササザサシシジシススズスセセゼセソソゾソタタダタチチヂチツツヅツテテデテトトドトハハバハヒヒビヒフフブフヘヘベヘホホボホ",
    ),
    (
        "カヾガヾキヾギヾクヾグヾケヾゲヾコヾゴヾサヾザヾシヾジヾスヾズヾセヾゼヾソヾゾヾタヾダヾチヾヂヾツヾヅヾテヾデヾトヾドヾハヾバヾヒヾビヾフヾブヾヘヾベヾホヾボヾ",
        "カガガガキギギギクグググケゲゲゲコゴゴゴサザザザシジジジスズズズセゼゼゼソゾゾゾタダダダチヂヂヂツヅヅヅテデデデトドドドハバババヒビビビフブブブヘベベベホボボボ",
    ),
]


@pytest.mark.parametrize("raw,expected", ITER_GOLDENS)
def test_iteration_mark_goldens(raw, expected):
    assert iteration_mark_fold(raw) == expected


def test_iteration_mark_flags():
    assert iteration_mark_fold("時々", normalize_kanji=False) == "時々"
    assert iteration_mark_fold("こゝろ", normalize_kana=False) == "こゝろ"
    assert iteration_mark_fold("時々", normalize_kana=False) == "時時"


def test_number_filter_token_runs():
    """Runs of numeral tokens (punctuation mid-run) compose into one
    normalized token spanning the run (JapaneseNumberFilter:58-99)."""
    from lucene_kmp_spark.analysis.morph import MorphEntry, MorphToken

    e = MorphEntry("*", 0, 0, 0, "名詞-数")

    def tk(surface, start):
        return MorphToken(surface, start, start + len(surface), "KNOWN", e)

    toks = [tk("まだ", 0), tk("２０", 2), tk("万", 4), tk("円", 5), tk("だ", 6)]
    out = japanese_number_filter(toks)
    assert [t.surface for t in out] == ["まだ", "200000", "円", "だ"]
    assert (out[1].start, out[1].end) == (2, 5)

    # decimal + separator tokens join the run
    toks = [tk("３", 0), tk("．", 1), tk("２", 2), tk("千", 3)]
    out = japanese_number_filter(toks)
    assert [t.surface for t in out] == ["3200"]


def test_analyzer_integration():
    from lucene_kmp_spark.analysis.ja import japanese_analyzer
    from lucene_kmp_spark.analysis.ko import korean_analyzer

    ja = japanese_analyzer(normalize_numbers=True, iteration_marks=True)
    terms, _, _ = ja("時々２０万の空港")
    assert "時時" in "".join(terms) or "時" in terms  # folded before tokenize
    assert "200000" in terms
    ko = korean_analyzer(normalize_numbers=True)
    terms, _, _ = ko("나물 천")
    assert terms == ["나물", "1000"]
