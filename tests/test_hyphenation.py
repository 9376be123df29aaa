"""HyphenationCompoundWordTokenFilter goldens
(TestCompoundWordTokenFilter.kt; tests/data/da_UTF8.xml is the published
Apache FOP Danish pattern file the reference tests use)."""
import pathlib

import pytest

from lucene_kmp_spark.analysis.hyphenation import (
    HyphenationTree, hyphenation_compound_filter)

DATA = pathlib.Path(__file__).parent / "data" / "da_UTF8.xml"


@pytest.fixture(scope="module")
def tree():
    return HyphenationTree.from_xml(DATA.read_text())


def test_tree_loads(tree):
    assert len(tree.patterns) == 1144
    assert tree.classes["Æ"] == "æ"


def test_hyphenation_compound_da(tree):
    f = hyphenation_compound_filter(tree, dictionary=("læse", "hest"))
    words = "min veninde som er lidt af en læsehest".split()
    t, p = f(words, list(range(len(words))))
    assert t == ["min", "veninde", "som", "er", "lidt", "af", "en",
                 "læsehest", "læse", "hest"]
    assert p[-2:] == [7, 7]                  # subwords share the position


def test_hyphenation_longest_match(tree):
    f = hyphenation_compound_filter(
        tree, dictionary=("basketball", "basket", "ball", "kurv"),
        max_subword_size=40, only_longest_match=True)
    t, p = f(["basketballkurv"], [0])
    # 'basket' skipped by longest-match, per the reference comment
    assert t == ["basketballkurv", "basketball", "ball", "kurv"]
    assert p == [0, 0, 0, 0]


def test_hyphenation_only_no_dictionary(tree):
    f = hyphenation_compound_filter(tree, min_subword_size=2,
                                    max_subword_size=4)
    assert f(["basketballkurv"], [0])[0] == \
        ["basketballkurv", "ba", "sket", "ball", "bal", "kurv"]
    f = hyphenation_compound_filter(tree, min_subword_size=4,
                                    max_subword_size=6)
    assert f(["basketballkurv"], [0])[0] == \
        ["basketballkurv", "basket", "sket", "ball", "lkurv", "kurv"]


def test_short_and_unhyphenatable_tokens_pass(tree):
    f = hyphenation_compound_filter(tree, dictionary=("hest",))
    assert f(["af", "x9!z"], [0, 1]) == (["af", "x9!z"], [0, 1])
