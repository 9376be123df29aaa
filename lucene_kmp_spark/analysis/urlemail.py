"""UAX29URLEmailTokenizer (``analysis/common/.../analysis/email/``).

The reference compiles RFC 3986 (URL) and RFC 5321/5322 (email) grammars
into a generated DFA layered over the UAX#29 word-break rules
(``email/UAX29URLEmailTokenizerImpl.kt``). Here the same published
grammars are expressed as anchored regexes tried at every word-break
token start (plus ``"``/``[`` gap starts for quoted local parts and
IP-literal hosts); everything between recognized URL/EMAIL spans is
tokenized by the repo's UAX#29 engine, so all StandardTokenizer behavior
carries over unchanged.

Validated against the reference's conformance corpora
(``random.text.with.urls.txt`` 643/643 URLs,
``LuceneResourcesWikiPage.html`` 105/105,
``random.text.with.email.addresses.txt`` 265/265 emails — see
``tests/test_urlemail.py``). Schemeless hosts and strict email domains
require an IANA TLD (vendored ``tld_data.py``), mirroring the generated
ASCIITLD macro; invalid trailing labels are trimmed exactly like the
DFA's backtracking.
"""
from __future__ import annotations

import re

from lucene_kmp_spark.analysis.standard import (
    DEFAULT_MAX_TOKEN_LENGTH,
    Token,
    _lower_simple,
    standard_tokenize,
)
from lucene_kmp_spark.analysis.tld_data import TLDS

# --- RFC 3986 pieces -------------------------------------------------------
_PCT = r"%[0-9A-Fa-f]{2}"
_UNRES = r"A-Za-z0-9\-._~"
_SUB = r"!$&'()*+,;="
_IPV4 = r"(?:[0-9]{1,3}(?:\.[0-9]{1,3}){3})"
_IPV6 = r"\[[0-9A-Fa-f]*:[0-9A-Fa-f:.]*\]"
_REG = r"(?:[" + _UNRES + _SUB + r"]|" + _PCT + r")+"
_HOST = r"(?:" + _IPV6 + r"|" + _IPV4 + r"|" + _REG + r")"
_USERINFO = r"(?:[" + _UNRES + _SUB + r":]|" + _PCT + r")*"
_PORT = r"(?::[0-9]*)?"
_PCHAR = r"(?:[" + _UNRES + _SUB + r":@]|" + _PCT + r")"
_PATH = r"(?:/" + _PCHAR + r"*)*"
_QUERY = r"(?:\?(?:" + _PCHAR + r"|[/?])*)?"
_FRAG = r"(?:#(?:" + _PCHAR + r"|[/?])*)?"
_SCHEME_URL = (r"(?:(?:[hH][tT][tT][pP][sS]?|[fF][tT][pP])://(?:" + _USERINFO
               + r"@)?" + _HOST + _PORT + _PATH + _QUERY + _FRAG + r")")
_FILE_URL = (r"(?:[fF][iI][lL][eE]://(?:" + _HOST + r")?" + _PATH + _QUERY
             + _FRAG + r")")
_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?"
_DOTTED = _LABEL + r"(?:\." + _LABEL + r")+"
_SCHEMELESS = (r"(?:" + _DOTTED + r"|" + _IPV4 + r"|" + _IPV6 + r")" + _PORT
               + r"(?:" + _PATH + r"|/)?" + _QUERY + _FRAG)
URL_RE = re.compile("(?:" + _SCHEME_URL + "|" + _FILE_URL + "|"
                    + _SCHEMELESS + ")")

# --- RFC 5321/5322 pieces (incl. obs- forms the reference accepts). The
# reference's EMAILatomText char class uses the range +-/ which pulls in
# ',' '.' '/' — reproduced deliberately (see the mailto golden). ----------
_ATEXT = r"A-Za-z0-9!#$%&'*+,./=?^_`{|}~\-"
_ATOM = "[" + _ATEXT + "]+"
_QS = r'"(?:[^"\\\r\n]|\\.)*"'
_WORD = "(?:" + _ATOM + "|" + _QS + ")"
_LOCAL = _WORD + r"(?:\." + _WORD + ")*"
_BRACKET = r"\[(?:[^\]\[\\\r\n]|\\.)*\]"
EMAIL_RE = re.compile(_LOCAL + "@" + "(?:" + _BRACKET + "|" + _DOTTED + ")")

_IPV4_FULL = re.compile(_IPV4 + r"\Z")
# gap characters a URL/EMAIL may begin with that never start a UAX#29
# token: quoted local parts, IP literals, and the atext specials
_GAP_START = re.compile(r'["\[!#$%&\'*+,./=?^_`{|}~-]')

URL_TYPE = "<URL>"
EMAIL_TYPE = "<EMAIL>"


def _host_tld_ok(host: str) -> bool:
    if host.startswith("["):
        return True
    labels = host.split(".")
    if all(p.isdigit() for p in labels):
        return bool(_IPV4_FULL.match(host))
    return labels[-1].lower() in TLDS


def _email_valid_end(match: re.Match) -> int | None:
    """Strict-domain validation. The DFA matches the maximal dotted host
    and fails the whole rule when its TLD is unknown (no label
    backtracking — corpus-verified on e.g. ``....jp.jpg``)."""
    domain = match.group(0).rsplit("@", 1)[1]
    if domain.startswith("[") or domain.split(".")[-1].lower() in TLDS:
        return match.end()
    return None


def _url_valid_end(match: re.Match) -> int | None:
    u = match.group(0)
    if "://" in u:
        return match.end()
    host = u.split("/")[0].split("?")[0].split("#")[0]
    if not host.startswith("["):
        host = host.split(":")[0]
    return match.end() if _host_tld_ok(host) else None


def uax29_url_email_tokenize(
    text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
) -> list[Token]:
    """UAX#29 tokens plus single-token URLs/emails (maximal munch at each
    candidate start, URL preferred on equal length like the rule order)."""
    if not text:
        return []
    # The URL/email grammar drops ':' from MidLetter (it delimits schemes
    # and mailto:), so colon-joined UAX#29 words split here.
    base = []
    for t in standard_tokenize(text, max_token_length):
        if ":" in t.term:
            off = t.start
            for piece in t.term.split(":"):
                if piece:
                    base.append(Token(piece, t.type, t.position,
                                      off, off + len(piece)))
                off += len(piece) + 1
        else:
            base.append(t)
    starts = sorted(
        {t.start for t in base}
        | {m.start() for m in _GAP_START.finditer(text)}
    )
    spans: list[tuple[int, int, str]] = []   # (start, end, type)
    cursor = 0
    for pos in starts:
        if pos < cursor:
            continue
        best_end, best_type = -1, None
        m = URL_RE.match(text, pos)
        if m and m.end() > pos:
            end = _url_valid_end(m)
            if end is not None and end > pos:
                best_end, best_type = end, URL_TYPE
        m = EMAIL_RE.match(text, pos)
        if m and m.end() > pos:
            end = _email_valid_end(m)
            if end is not None and end - pos > best_end - pos:
                best_end, best_type = end, EMAIL_TYPE
        if best_type is not None:
            spans.append((pos, best_end, best_type))
            cursor = best_end
    out: list[Token] = []
    si = 0
    pos_idx = 0
    for t in base:
        while si < len(spans) and spans[si][1] <= t.start:
            s, e, ty = spans[si]
            out.append(Token(text[s:e], ty, pos_idx, s, e))
            pos_idx += 1
            si += 1
        if si < len(spans) and spans[si][0] <= t.start < spans[si][1]:
            continue                        # absorbed into the URL/email
        out.append(Token(t.term, t.type, pos_idx, t.start, t.end))
        pos_idx += 1
    while si < len(spans):
        s, e, ty = spans[si]
        out.append(Token(text[s:e], ty, pos_idx, s, e))
        pos_idx += 1
        si += 1
    out.sort(key=lambda t: t.start)
    return [Token(t.term, t.type, i, t.start, t.end)
            for i, t in enumerate(out)]


def url_email_analyzer(stop_words=None,
                       max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """UAX29URLEmailAnalyzer.kt chain: tokenizer -> LowerCase -> Stop
    (English default set)."""
    from lucene_kmp_spark.analysis.en import ENGLISH_STOP_WORDS
    stop = ENGLISH_STOP_WORDS if stop_words is None else frozenset(stop_words)

    def run(text: str):
        if not text:
            return [], [], 0
        terms, positions = [], []
        for t in uax29_url_email_tokenize(text, max_token_length):
            term = _lower_simple(t.term)
            if term in stop:
                continue
            terms.append(term)
            positions.append(t.position)
        return terms, positions, len(terms)

    return run
