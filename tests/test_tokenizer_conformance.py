"""UAX#29 word-break conformance, driven by the Unicode 12.1 WordBreakTest
corpus embedded in the reference's test framework (itself generated from the
public http://www.unicode.org/Public/12.1.0/ucd/auxiliary/WordBreakTest.txt).

We parse the (input, expected tokens) pairs out of the reference test file —
pure test DATA, the ready-made goldens SURVEY.md §5 points at — and measure
the tokenizer against them. Round-1 gate: >= 90% of cases exact; the failing
remainder is reported for the next iteration (full conformance is the goal).
"""

import re

import pytest

from lucene_kmp_spark.analysis import standard_tokenize

REF_FILE = (
    "/root/reference/test-framework/src/commonMain/kotlin/org/gnit/lucenekmp/"
    "tests/analysis/standard/WordBreakTestUnicode_12_1_0.kt"
)
EMOJI_FILE = (
    "/root/reference/test-framework/src/commonMain/kotlin/org/gnit/lucenekmp/"
    "tests/analysis/standard/EmojiTokenizationTestUnicode_12_1.kt"
)

_CASE_RX = re.compile(
    r'assertAnalyzesTo\(analyzer,\s*"((?:[^"\\]|\\.)*)",\s*arrayOf\(([^)]*)\)',
    re.DOTALL,
)
_STR_RX = re.compile(r'"((?:[^"\\]|\\.)*)"')


def _decode_kotlin(s: str) -> str:
    # \uXXXX escapes (possibly surrogate pairs) + simple escapes
    out = s.encode("ascii", "backslashreplace").decode("unicode_escape")
    # join surrogate pairs
    return out.encode("utf-16", "surrogatepass").decode("utf-16")


def load_cases(path=REF_FILE):
    try:
        text = open(path, encoding="utf-8").read()
    except OSError:
        pytest.skip("reference conformance corpus not available")
    cases = []
    for m in _CASE_RX.finditer(text):
        inp = _decode_kotlin(m.group(1))
        toks = [_decode_kotlin(t.group(1)) for t in _STR_RX.finditer(m.group(2))]
        cases.append((inp, toks))
    return cases


def test_corpus_parsed():
    cases = load_cases()
    assert len(cases) > 1500, len(cases)


def _rate(cases):
    failures = []
    for inp, expected in cases:
        got = [t.term for t in standard_tokenize(inp)]
        if got != expected:
            failures.append((inp, expected, got))
    return 1 - len(failures) / len(cases), failures


def test_wordbreak_conformance_full():
    cases = load_cases()
    rate, failures = _rate(cases)
    sample = [(repr(i), e, g) for i, e, g in failures[:15]]
    assert rate == 1.0, f"conformance {rate:.3%} ({len(failures)}/{len(cases)} fail); sample: {sample}"


def load_emoji_cases():
    """EmojiTokenizationTest: TESTS = arrayOf(descriptor, test, descriptor, ...);
    each test string must tokenize to exactly [itself] as one <EMOJI> token."""
    try:
        text = open(EMOJI_FILE, encoding="utf-8").read()
    except OSError:
        pytest.skip("emoji corpus not available")
    body = text.split("TESTS = arrayOf(", 1)[1]
    strings = [_decode_kotlin(m.group(1)) for m in _STR_RX.finditer(body)]
    return [(s, [s]) for idx, s in enumerate(strings) if idx % 2 == 1]


STD_FILE = (
    "/root/reference/core/src/commonTest/kotlin/org/gnit/lucenekmp/"
    "analysis/standard/TestStandardAnalyzer.kt"
)
_STD_RX = re.compile(
    r'assertAnalyzesTo\(\s*a,\s*"((?:[^"\\]|\\.)*)",\s*(?:arrayOf\(([^)]*)\)|emptyArray\(\))',
    re.DOTALL,
)


def test_standard_analyzer_goldens():
    """The reference's own TestStandardAnalyzer assertions (tokenizer level)."""
    try:
        text = open(STD_FILE, encoding="utf-8").read()
    except OSError:
        pytest.skip("goldens not available")
    cases = []
    for m in _STD_RX.finditer(text):
        inp = _decode_kotlin(m.group(1))
        if inp == "ab cd toolong xy z":
            continue  # that assertion runs under setMaxTokenLength(5)
        toks = [_decode_kotlin(t.group(1)) for t in _STR_RX.finditer(m.group(2) or "")]
        cases.append((inp, toks))
    assert len(cases) > 60
    rate, failures = _rate(cases)
    sample = [(repr(i), e, g) for i, e, g in failures[:10]]
    assert rate == 1.0, f"{len(failures)}/{len(cases)} fail: {sample}"


def test_emoji_conformance_rate():
    cases = load_emoji_cases()
    if not cases:
        pytest.skip("no emoji cases parsed")
    rate, failures = _rate(cases)
    sample = [(repr(i), e, g) for i, e, g in failures[:10]]
    assert rate == 1.0, f"emoji conformance {rate:.3%} ({len(failures)}/{len(cases)}); sample: {sample}"
