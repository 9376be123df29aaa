"""ClassicTokenizer / ClassicFilter / ClassicAnalyzer
(``analysis/common/.../analysis/classic/``).

The reference ships the generated ``ClassicTokenizerImpl`` DFA; here the
published ClassicTokenizerImpl.jflex grammar rules are compiled to one
regex per rule and resolved with true maximal-munch (all rules tried at
each position, longest wins, grammar order breaks ties) — ALPHANUM,
APOSTROPHE (O'Reilly), ACRONYM (U.S.A.), COMPANY (AT&T), EMAIL, HOST
(www.nutch.org), NUM (serial numbers like 978-0-94045043-1), CJ
(single-codepoint CJK). ClassicFilter strips possessive ``'s`` from
APOSTROPHE tokens and dots from ACRONYM tokens. ClassicAnalyzer chains
tokenizer -> ClassicFilter -> LowerCase -> Stop(English).

LETTER approximates JFlex ``[:letter:]`` minus CJ: Unicode letters
excluding modifier letters (the spacing-modifier block splits tokens, per
the ``test\\u02C6test`` golden) and the CJ/Korean ranges.
"""
from __future__ import annotations

import re

from lucene_kmp_spark.analysis.standard import _lower_simple

# character classes from ClassicTokenizerImpl.jflex
_CJ = (r"㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
       r"㌀-㍿㐀-䶿一-鿿豈-﫿･-ﾟ")
_KOREAN = r"가-힯ᄀ-ᇿ"
_THAI = r"฀-๙"
_LM = r"ʰ-˿ᴬ-ᵪᶛ-ᶿ⁰-ₜ꜀-ꜟ"
_L = r"(?:(?![" + _CJ + _KOREAN + _LM + r"0-9_])[^\W\d])"
_AN_CH = r"(?:[" + _KOREAN + _THAI + r"0-9]|" + _L + r")"
_ALPHANUM = _AN_CH + r"+"
_ALPHA = _L + r"+"
_P = r"[_\-/.,]"
_HD = r"(?:" + _AN_CH + r"*[0-9]" + _AN_CH + r"*)"

_RULES = [
    ("<ALPHANUM>", _ALPHANUM),
    ("<APOSTROPHE>", _ALPHA + r"(?:'" + _ALPHA + r")+"),
    ("<ACRONYM>", _L + r"\.(?:" + _L + r"\.)+"),
    ("<COMPANY>", _ALPHA + r"[&@]" + _ALPHA),
    ("<EMAIL>", _ALPHANUM + r"(?:[._-]" + _ALPHANUM + r")*@"
     + _ALPHANUM + r"(?:[.-]" + _ALPHANUM + r")+"),
    ("<HOST>", _ALPHANUM + r"(?:\." + _ALPHANUM + r")+"),
    # the six NUM alternatives, each its own longest-match candidate
    ("<NUM>", _ALPHANUM + _P + _HD),
    ("<NUM>", _HD + _P + _ALPHANUM),
    ("<NUM>", _ALPHANUM + r"(?:" + _P + _HD + _P + _ALPHANUM + r")+"),
    ("<NUM>", _HD + r"(?:" + _P + _ALPHANUM + _P + _HD + r")+"),
    ("<NUM>", _ALPHANUM + _P + _HD
     + r"(?:" + _P + _ALPHANUM + _P + _HD + r")*"),
    ("<NUM>", _HD + _P + _ALPHANUM
     + r"(?:" + _P + _HD + _P + _ALPHANUM + r")*"),
    ("<CJ>", r"[" + _CJ + r"]"),
]
_COMPILED = [(ty, re.compile(rx)) for ty, rx in _RULES]
_SKIP = re.compile(r"[^0-9@&'._\-/,\s]|[0-9]")   # chars that can start a rule


def classic_tokenize(text: str, max_token_length: int = 255):
    """(term, type, position) triples; overlong tokens are dropped leaving
    a position hole, like the reference's maxTokenLength handling."""
    out = []
    i, n = 0, len(text)
    pos = 0
    while i < n:
        best_len = 0
        best_type = None
        for ty, rx in _COMPILED:
            m = rx.match(text, i)
            if m and m.end() - i > best_len:
                best_len = m.end() - i
                best_type = ty
        if best_type is None:
            i += 1
            continue
        term = text[i:i + best_len]
        if best_len <= max_token_length:
            out.append((term, best_type, pos))
        pos += 1                       # dropped overlong token leaves hole
        i += best_len
    return out


def classic_filter(term: str, token_type: str) -> str:
    """ClassicFilter.kt: 's off APOSTROPHE tokens, dots out of ACRONYM."""
    if token_type == "<APOSTROPHE>" and (term.endswith("'s")
                                         or term.endswith("'S")):
        return term[:-2]
    if token_type == "<ACRONYM>":
        return term.replace(".", "")
    return term


def classic_analyzer(stop_words=None, max_token_length: int = 255):
    """ClassicAnalyzer.kt: ClassicTokenizer -> ClassicFilter -> LowerCase
    -> Stop (English default set)."""
    from lucene_kmp_spark.analysis.en import ENGLISH_STOP_WORDS
    stop = ENGLISH_STOP_WORDS if stop_words is None else frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for term, ty, pos in classic_tokenize(text, max_token_length):
            term = _lower_simple(classic_filter(term, ty))
            if term in stop:
                continue
            terms.append(term)
            positions.append(pos)
        return terms, positions, len(terms)

    return run
