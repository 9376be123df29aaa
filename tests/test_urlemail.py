"""UAX29URLEmailTokenizer conformance vs the reference corpora.

Reference: analysis/common/.../email/UAX29URLEmailTokenizerImpl.kt
(generated RFC 3986/5321/5322 DFA) + TestUAX29URLEmailTokenizer.kt; the
corpora under tests/data/urlemail are the published Lucene test
resources the reference validates against.
"""
import pathlib

import pytest

from lucene_kmp_spark.analysis.urlemail import (
    EMAIL_TYPE, URL_TYPE, uax29_url_email_tokenize, url_email_analyzer)

DATA = pathlib.Path(__file__).parent / "data" / "urlemail"


def _terms(s):
    return [t.term for t in uax29_url_email_tokenize(s)]


def _typed(s, ty):
    return [t.term for t in uax29_url_email_tokenize(s) if t.type == ty]


@pytest.mark.parametrize("text_file,expected_file,ty", [
    ("random.text.with.urls.txt", "urls.from.random.text.with.urls.txt",
     URL_TYPE),
    ("LuceneResourcesWikiPage.html", "LuceneResourcesWikiPageURLs.txt",
     URL_TYPE),
    ("random.text.with.email.addresses.txt",
     "email.addresses.from.random.text.with.email.addresses.txt",
     EMAIL_TYPE),
])
def test_conformance_corpora(text_file, expected_file, ty):
    text = (DATA / text_file).read_text()
    expected = [l for l in (DATA / expected_file).read_text().split("\n") if l]
    assert _typed(text, ty) == expected


def test_mailto_goldens():
    toks = uax29_url_email_tokenize("mailto:test@example.org")
    assert [t.term for t in toks] == ["mailto", "test@example.org"]
    assert [t.type for t in toks] == ["<ALPHANUM>", EMAIL_TYPE]
    got = _terms("mailto:personA@example.com,personB@example.com"
                 "?cc=personC@example.com&subject=Subjectivity"
                 "&body=Corpusivity%20or%20something%20like%20that")
    assert got == ["mailto", "personA@example.com", ",personB@example.com",
                   "?cc=personC@example.com", "subject", "Subjectivity",
                   "body", "Corpusivity", "20or", "20something", "20like",
                   "20that"]


def test_standard_behavior_preserved():
    assert _terms("testing 1234") == ["testing", "1234"]
    assert _terms("David has 5000 bones") == ["David", "has", "5000", "bones"]
    assert _terms("O'Reilly's") == ["O'Reilly's"]
    assert _terms("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert _terms("21.35") == ["21.35"]
    assert _terms("") == []
    assert _terms(".") == []
    assert _terms(" ") == []
    # bare IPv4 becomes a URL token (strict host)
    toks = uax29_url_email_tokenize("216.239.63.104")
    assert [t.term for t in toks] == ["216.239.63.104"]
    assert toks[0].type == URL_TYPE


def test_tld_rejection_no_backtrack():
    # maximal host with unknown TLD fails whole rule (…jp.jpg corpus case)
    assert _typed("IntroductionToApacheLucene.jp.jpg", URL_TYPE) == []
    assert _typed("a@b.invalidtld9", EMAIL_TYPE) == []


def test_url_email_analyzer_chain():
    a = url_email_analyzer()
    terms, positions, length = a(
        "Visit https://lucene.apache.org/core/ or email Dev@Example.ORG")
    assert terms == ["visit", "https://lucene.apache.org/core/",
                     "email", "dev@example.org"]
    assert length == 4
