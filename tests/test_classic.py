"""ClassicTokenizer/Analyzer goldens (TestClassicAnalyzer.kt)."""
from lucene_kmp_spark.analysis.classic import (
    classic_analyzer, classic_tokenize)


def test_classic_analyzer_goldens():
    a = classic_analyzer()
    for text, exp in [
        ("B2B", ["b2b"]), ("2B", ["2b"]),
        ("word_having_underscore", ["word", "having", "underscore"]),
        ("some-dashed-phrase", ["some", "dashed", "phrase"]),
        ("dogs,chase,cats", ["dogs", "chase", "cats"]),
        ("ac/dc", ["ac", "dc"]),
        ("O'Reilly", ["o'reilly"]), ("you're", ["you're"]),
        ("she's", ["she"]), ("Jim's", ["jim"]), ("don't", ["don't"]),
        ("O'Reilly's", ["o'reilly"]),
        ("s-class", ["s", "class"]), ("t-com", ["t", "com"]),
        ("a-class", ["class"]),                     # 'a' is a stopword
        ("AT&T", ["at&t"]), ("Excite@Home", ["excite@home"]),
        ("www.nutch.org.", ["www.nutch.org"]),
        ("test@example.com", ["test@example.com"]),
        ("first.lastname@example.com", ["first.lastname@example.com"]),
        ("first_lastname@example.com", ["first_lastname@example.com"]),
        ("21.35", ["21.35"]), ("R2D2 C3PO", ["r2d2", "c3po"]),
        ("216.239.63.104", ["216.239.63.104"]),
        ("1-2-3", ["1-2-3"]), ("a1-b2-c3", ["a1-b2-c3"]),
        ("a1-b-c3", ["a1-b-c3"]),
        ("David has 5000 bones", ["david", "has", "5000", "bones"]),
        ("C embedded developers wanted",
         ["c", "embedded", "developers", "wanted"]),
        ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
        ('"QUOTED" word', ["quoted", "word"]),
        ("U.S.A.", ["usa"]), ("C++", ["c"]), ("C#", ["c"]),
        ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
        ("2004.jpg", ["2004.jpg"]), ("62.46", ["62.46"]),
        ("978-0-94045043-1", ["978-0-94045043-1"]),
        ("78academyawards/rules/rule02.html",
         ["78academyawards/rules/rule02.html"]),
        ("mid-20th", ["mid-20th"]),
        ("testˆtest", ["test", "test"]),            # Lm splits (classic)
    ]:
        assert a(text)[0] == exp, (text, a(text)[0], exp)


def test_classic_token_types():
    assert classic_tokenize("www.nutch.org.") == \
        [("www.nutch.org", "<HOST>", 0)]
    assert classic_tokenize("978-0-94045043-1") == \
        [("978-0-94045043-1", "<NUM>", 0)]
    assert [(t, ty) for t, ty, _ in classic_tokenize("我是中国人")] == \
        [("我", "<CJ>"), ("是", "<CJ>"), ("中", "<CJ>"),
         ("国", "<CJ>"), ("人", "<CJ>")]
    got = [(t, ty) for t, ty, _ in classic_tokenize(
        "money.cnn.com magazines archive/2007/03/19/8402357 "
        "safari-0-sheikh mosque.jpg")]
    assert got == [("money.cnn.com", "<HOST>"), ("magazines", "<ALPHANUM>"),
                   ("archive/2007/03/19/8402357", "<NUM>"),
                   ("safari-0-sheikh", "<NUM>"), ("mosque.jpg", "<HOST>")]


def test_classic_max_token_length_hole():
    # TestClassicAnalyzer.testMaxTermLength: dropped token leaves a hole
    a = classic_analyzer(max_token_length=5)
    terms, positions, n = a("ab cd toolong xy z")
    assert terms == ["ab", "cd", "xy", "z"]
    assert positions == [0, 1, 3, 4]
