"""Faithful port of Lucene's classic QueryParser (JavaCC grammar + QueryBuilder).

Reference files (semantics reproduced, not translated):

* ``queryparser/classic/QueryParser.kt`` — the generated JavaCC LL(2) grammar:
  ``Query ::= (MultiTerm | Conjunction Modifiers Clause)*``,
  ``Clause ::= [TERM ":" | "*" ":"] (Term | "(" Query ")" ["^" NUMBER])``,
  the MultiTerm lookahead (two consecutive TERM tokens whose follower is not
  COLON/STAR/FUZZY_SLOP/CARAT/AND/OR, QueryParser.kt:1089-1101), and the
  splitOnWhitespace=false path that joins adjacent TERM images for one
  analysis pass (QueryParser.kt:625-678).
* ``queryparser/classic/QueryParserBase.kt`` — addClause conjunction
  semantics (:272), addMultiTermClauses flattening (:341), discardEscapeChar
  with ``\\uXXXX`` (:878), escape() (:988), handleBareFuzzy float/edits
  validation (:811), analyzeWildcard chunk normalization (:652), range/date
  handling (:446).
* ``queryparser/classic/QueryParserTokenManager.kt`` / the published
  QueryParser.jj token rules — TERM/PREFIXTERM/WILDTERM/QUOTED/REGEXPTERM/
  FUZZY_SLOP/BAREOPER and the Boost / Range lexer states.
* ``core/util/QueryBuilder.kt`` — createFieldQuery dispatch (:263-346),
  analyzeTerm/Boolean/MultiBoolean/Phrase/MultiPhrase, and the token-graph
  handling (analyzeGraphBoolean :523 / analyzeGraphPhrase :596) for
  multi-word synonyms (posLength > 1).

The AST here carries a ``field`` per leaf (the classic parser's field-scoped
query trees) and renders with Lucene's exact ``Query.toString(field)``
formats so the reference test goldens (QueryParserTestBase.kt,
TestQueryParser.kt) can be asserted verbatim. ``to_engine_query`` bridges a
single-text-field tree onto the distributed engine's Query classes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone


class ParseException(Exception):
    """queryparser/classic/ParseException.kt analog."""


# make it settable like IndexSearcher.maxClauseCount (tests flip it)
max_clause_count = 1024


class TooManyClauses(Exception):
    pass


# --------------------------------------------------------------------- lexer

# token kinds
EOF = "EOF"
AND, OR, NOT, PLUS, MINUS, BAREOPER = "AND", "OR", "NOT", "PLUS", "MINUS", "BAREOPER"
LPAREN, RPAREN, COLON, STAR, CARAT = "LPAREN", "RPAREN", "COLON", "STAR", "CARAT"
QUOTED, TERM, FUZZY_SLOP, PREFIXTERM, WILDTERM, REGEXPTERM = (
    "QUOTED",
    "TERM",
    "FUZZY_SLOP",
    "PREFIXTERM",
    "WILDTERM",
    "REGEXPTERM",
)
RANGEIN_START, RANGEEX_START = "RANGEIN_START", "RANGEEX_START"
RANGE_TO, RANGEIN_END, RANGEEX_END = "RANGE_TO", "RANGEIN_END", "RANGEEX_END"
RANGE_QUOTED, RANGE_GOOP = "RANGE_QUOTED", "RANGE_GOOP"
NUMBER = "NUMBER"

_WS = " \t\n\r\u3000"
# _TERM_START_CHAR: anything not whitespace/syntax, or an escaped pair
_TS = r'(?:[^ \t\n\r\u3000+\-!():^\[\]"{}~*?\\/]|\\.)'
# _TERM_CHAR: _TERM_START_CHAR | "-" | "+"
_TC = r'(?:[^ \t\n\r\u3000!():^\[\]"{}~*?\\/]|\\.)'

# (kind, regex) in declaration order — longest match wins, ties break by order
_DEFAULT_TOKENS = [
    (AND, re.compile(r"AND|&&")),
    (OR, re.compile(r"OR|\|\|")),
    (NOT, re.compile(r"NOT|!")),
    (PLUS, re.compile(r"\+")),
    (MINUS, re.compile(r"-")),
    (BAREOPER, re.compile(r"[+\-!][ \t\n\r\u3000]")),
    (LPAREN, re.compile(r"\(")),
    (RPAREN, re.compile(r"\)")),
    (COLON, re.compile(r":")),
    (STAR, re.compile(r"\*")),
    (CARAT, re.compile(r"\^")),
    (QUOTED, re.compile(r'"(?:[^"\\]|\\.)*"', re.DOTALL)),
    (TERM, re.compile(_TS + _TC + "*", re.DOTALL)),
    (FUZZY_SLOP, re.compile(r"~" + _TC + "*", re.DOTALL)),
    (PREFIXTERM, re.compile(r"\*|" + _TS + _TC + r"*\*", re.DOTALL)),
    (WILDTERM, re.compile(r"(?:" + _TS + r"|[*?])(?:" + _TC + r"|[*?])*", re.DOTALL)),
    (REGEXPTERM, re.compile(r"/(?:[^/\\]|\\.)*/", re.DOTALL)),
    (RANGEIN_START, re.compile(r"\[")),
    (RANGEEX_START, re.compile(r"\{")),
]
_RANGE_TOKENS = [
    (RANGE_TO, re.compile(r"TO")),
    (RANGEIN_END, re.compile(r"\]")),
    (RANGEEX_END, re.compile(r"\}")),
    (RANGE_QUOTED, re.compile(r'"(?:\\"|[^"])+"', re.DOTALL)),
    (RANGE_GOOP, re.compile(r"[^ \t\n\r\u3000\]\}]+")),
]
_NUMBER_RX = re.compile(r"-?[0-9]+(?:\.[0-9]+)?")


@dataclass
class _Tok:
    kind: str
    image: str


def _lex(s: str) -> list[_Tok]:
    """Tokenize the whole input (the JavaCC token manager is parser-independent:
    lexer states are driven only by tokens — CARAT opens Boost for one NUMBER,
    [ / { open Range until ] / })."""
    out: list[_Tok] = []
    i, n = 0, len(s)
    state = "DEFAULT"
    while i < n:
        if s[i] in _WS:
            i += 1
            continue
        if state == "Boost":
            m = _NUMBER_RX.match(s, i)
            if not m:
                raise ParseException(f"Expected a number after '^' at {i}")
            out.append(_Tok(NUMBER, m.group()))
            i = m.end()
            state = "DEFAULT"
            continue
        table = _RANGE_TOKENS if state == "Range" else _DEFAULT_TOKENS
        best = None  # (length, order, kind, image)
        for order, (kind, rx) in enumerate(table):
            m = rx.match(s, i)
            if m and m.end() > i:
                cand = (-(m.end() - i), order)
                if best is None or cand < best[0]:
                    best = (cand, kind, m.group())
        if best is None:
            raise ParseException(f"Lexical error at position {i} in {s!r}")
        _, kind, image = best
        out.append(_Tok(kind, image))
        i += len(image)
        if kind == CARAT:
            state = "Boost"
        elif kind in (RANGEIN_START, RANGEEX_START):
            state = "Range"
        elif kind in (RANGEIN_END, RANGEEX_END):
            state = "DEFAULT"
    out.append(_Tok(EOF, ""))
    return out


# ----------------------------------------------------------------- AST types

def _jfloat(f: float) -> str:
    """Java Float.toString for the simple values boosts take (2.0 -> "2.0")."""
    f = float(f)
    if f == int(f):
        return f"{int(f)}.0"
    return repr(f)


def _fld(field: str, default: str) -> str:
    return "" if field == default else field + ":"


class QPQuery:
    def to_string(self, default_field: str = "") -> str:  # pragma: no cover
        raise NotImplementedError

    def __str__(self):
        return self.to_string("")


@dataclass(frozen=True)
class QPTerm(QPQuery):
    field: str
    text: str

    def to_string(self, default_field: str = "") -> str:
        return _fld(self.field, default_field) + self.text


@dataclass(frozen=True)
class QPSynonym(QPQuery):
    """SynonymQuery.kt — terms sorted at build (SynonymQuery.Builder.build)."""

    field: str
    terms: tuple[str, ...]

    def __post_init__(self):
        object.__setattr__(self, "terms", tuple(sorted(self.terms)))

    def to_string(self, default_field: str = "") -> str:
        inner = " ".join(_fld(self.field, default_field) + t for t in self.terms)
        return f"Synonym({inner})"


@dataclass(frozen=True)
class QPBool(QPQuery):
    clauses: tuple[tuple[str, QPQuery], ...]  # (occur in {MUST,SHOULD,MUST_NOT}, q)
    min_should_match: int = 0

    def to_string(self, default_field: str = "") -> str:
        parts = []
        for occur, q in self.clauses:
            sign = {"MUST": "+", "MUST_NOT": "-", "SHOULD": ""}[occur]
            body = q.to_string(default_field)
            if isinstance(q, QPBool):
                body = "(" + body + ")"
            parts.append(sign + body)
        s = " ".join(parts)
        if self.min_should_match > 0:
            s = "(" + s + f")~{self.min_should_match}"
        return s


@dataclass(frozen=True)
class QPPhrase(QPQuery):
    field: str
    terms: tuple[str, ...]
    positions: tuple[int, ...]
    slop: int = 0

    def to_string(self, default_field: str = "") -> str:
        # PhraseQuery.toString: positions rendered with "?" holes
        by_pos = dict(zip(self.positions, self.terms))
        max_pos = max(self.positions) if self.positions else -1
        body = " ".join(by_pos.get(p, "?") for p in range(max_pos + 1))
        s = _fld(self.field, default_field) + '"' + body + '"'
        if self.slop != 0:
            s += f"~{self.slop}"
        return s


@dataclass(frozen=True)
class QPMultiPhrase(QPQuery):
    field: str
    slots: tuple[tuple[str, ...], ...]
    positions: tuple[int, ...]
    slop: int = 0

    def to_string(self, default_field: str = "") -> str:
        parts = []
        last = -1
        for slot, pos in zip(self.slots, self.positions):
            for _ in range(pos - last - 1):
                parts.append("?")
            last = pos
            parts.append(slot[0] if len(slot) == 1 else "(" + " ".join(slot) + ")")
        s = _fld(self.field, default_field) + '"' + " ".join(parts) + '"'
        if self.slop != 0:
            s += f"~{self.slop}"
        return s


@dataclass(frozen=True)
class QPBoost(QPQuery):
    query: QPQuery
    boost: float

    def to_string(self, default_field: str = "") -> str:
        return "(" + self.query.to_string(default_field) + ")^" + _jfloat(self.boost)


@dataclass(frozen=True)
class QPPrefix(QPQuery):
    field: str
    prefix: str
    rewrite: str = "CONSTANT_SCORE_BLENDED_REWRITE"

    def to_string(self, default_field: str = "") -> str:
        return _fld(self.field, default_field) + self.prefix + "*"


@dataclass(frozen=True)
class QPWildcard(QPQuery):
    field: str
    pattern: str
    rewrite: str = "CONSTANT_SCORE_BLENDED_REWRITE"

    def to_string(self, default_field: str = "") -> str:
        return _fld(self.field, default_field) + self.pattern


@dataclass(frozen=True)
class QPFuzzy(QPQuery):
    field: str
    term: str
    max_edits: int = 2
    prefix_length: int = 0

    def to_string(self, default_field: str = "") -> str:
        return _fld(self.field, default_field) + self.term + f"~{self.max_edits}"


@dataclass(frozen=True)
class QPRegexp(QPQuery):
    field: str
    pattern: str
    rewrite: str = "CONSTANT_SCORE_BLENDED_REWRITE"

    def to_string(self, default_field: str = "") -> str:
        return _fld(self.field, default_field) + "/" + self.pattern + "/"


def _range_endpoint(s: str | None) -> str:
    if s is None:
        return "*"
    return "\\*" if s == "*" else s


@dataclass(frozen=True)
class QPRange(QPQuery):
    field: str
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    rewrite: str = "CONSTANT_SCORE_BLENDED_REWRITE"

    def to_string(self, default_field: str = "") -> str:
        return (
            _fld(self.field, default_field)
            + ("[" if self.include_lower else "{")
            + _range_endpoint(self.lower)
            + " TO "
            + _range_endpoint(self.upper)
            + ("]" if self.include_upper else "}")
        )


@dataclass(frozen=True)
class QPMatchAll(QPQuery):
    def to_string(self, default_field: str = "") -> str:
        return "*:*"


# ----------------------------------------------------- analyzer protocol

@dataclass(frozen=True)
class QPTok:
    term: str
    pos_incr: int = 1
    pos_len: int = 1


class QPAnalyzer:
    """Minimal analyzer protocol the parser consumes (driver-side, tiny texts).

    ``tokens`` is the indexing chain (Analyzer.tokenStream); ``normalize`` is
    Analyzer.normalize — applied to wildcard/prefix/regexp/range/fuzzy text
    which never goes through the full chain (QueryParserBase.kt:648-756).
    """

    def tokens(self, field: str, text: str) -> list[QPTok]:  # pragma: no cover
        raise NotImplementedError

    def normalize(self, field: str, text: str) -> str:
        return text


class EngineAnalyzer(QPAnalyzer):
    """Adapts the engine's ``analyze``-style callable
    (text -> (terms, positions, length)) to the parser protocol."""

    def __init__(self, analyze_fn=None):
        if analyze_fn is None:
            from lucene_kmp_spark.analysis import analyze as analyze_fn
        self._fn = analyze_fn

    def tokens(self, field: str, text: str) -> list[QPTok]:
        terms, positions, _ = self._fn(text)
        out, last = [], -1
        for t, p in zip(terms, positions):
            out.append(QPTok(t, p - last, 1))
            last = p
        return out

    def normalize(self, field: str, text: str) -> str:
        terms, _, _ = self._fn(text)
        return terms[0] if terms else text.lower()


# ----------------------------------------------------------- escape helpers

def discard_escape_char(s: str) -> str:
    """QueryParserBase.discardEscapeChar (:878) incl. \\uXXXX sequences."""
    out = []
    code_point_mult = 0
    code_point = 0
    last_was_escape = False
    for ch in s:
        if code_point_mult > 0:
            code_point += _hex_to_int(ch) * code_point_mult
            code_point_mult >>= 4
            if code_point_mult == 0:
                out.append(chr(code_point))
                code_point = 0
        elif last_was_escape:
            if ch == "u":
                code_point_mult = 16 * 16 * 16
            else:
                out.append(ch)
            last_was_escape = False
        elif ch == "\\":
            last_was_escape = True
        else:
            out.append(ch)
    if code_point_mult > 0:
        raise ParseException("Truncated Unicode escape sequence.")
    if last_was_escape:
        raise ParseException("Term can not end with escape character.")
    return "".join(out)


def _hex_to_int(c: str) -> int:
    if "0" <= c <= "9":
        return ord(c) - ord("0")
    if "a" <= c <= "f":
        return ord(c) - ord("a") + 10
    if "A" <= c <= "F":
        return ord(c) - ord("A") + 10
    raise ParseException(f"Non-hex character in Unicode escape sequence: {c}")


_ESCAPE_CHARS = set('\\+-!():^[]"{}~*?|&/')


def escape(s: str) -> str:
    """QueryParserBase.escape (:988)."""
    return "".join("\\" + c if c in _ESCAPE_CHARS else c for c in s)


def float_to_edits(min_similarity: float, term_len: int) -> int:
    """FuzzyQuery.floatToEdits: similarity in [0,1) scales by term length;
    values >= 1 are whole edit counts (FuzzyQuery.kt)."""
    if min_similarity >= 1.0:
        return int(min(min_similarity, 2.0))
    return int(min((1.0 - min_similarity) * term_len, 2.0))


# ------------------------------------------------------------- DateTools lite

_DATE_FORMATS = {
    "YEAR": "%Y",
    "MONTH": "%Y%m",
    "DAY": "%Y%m%d",
    "HOUR": "%Y%m%d%H",
    "MINUTE": "%Y%m%d%H%M",
    "SECOND": "%Y%m%d%H%M%S",
}


def date_to_string(dt: datetime, resolution: str) -> str:
    """document/DateTools.kt dateToString — UTC, resolution-truncated."""
    dt = dt.astimezone(timezone.utc)
    if resolution == "MILLISECOND":
        return dt.strftime("%Y%m%d%H%M%S") + f"{dt.microsecond // 1000:03d}"
    return dt.strftime(_DATE_FORMATS[resolution])


def _parse_date(value: str) -> datetime:
    """QueryParserBase.parseDate — m/d/yy in the parser's (UTC) zone."""
    parts = value.split("/")
    if len(parts) != 3:
        raise ValueError(f"Unsupported date format: {value}")
    month, day, year = int(parts[0]), int(parts[1]), int(parts[2])
    if 0 <= year <= 99:
        year = 1900 + year if year >= 70 else 2000 + year
    return datetime(year, month, day, tzinfo=timezone.utc)


# ----------------------------------------------------------------- the parser

CONJ_NONE, CONJ_AND, CONJ_OR = 0, 1, 2
MOD_NONE, MOD_NOT, MOD_REQ = 0, 10, 11

_DISALLOWED_POST_MULTITERM = {COLON, STAR, FUZZY_SLOP, CARAT, AND, OR}

_CLAUSE_START = {
    BAREOPER, LPAREN, STAR, QUOTED, TERM, PREFIXTERM, WILDTERM, REGEXPTERM,
    RANGEIN_START, RANGEEX_START, NUMBER,
}
_QUERY_START = _CLAUSE_START | {NOT, PLUS, MINUS}
_LOOP_SET = _QUERY_START | {AND, OR}


class ClassicQueryParser:
    """queryparser/classic/QueryParser.kt + QueryParserBase.kt port."""

    OR_OPERATOR = "OR"
    AND_OPERATOR = "AND"
    DEFAULT_SPLIT_ON_WHITESPACE = False

    def __init__(self, field: str, analyzer: QPAnalyzer):
        self.field = field
        self.analyzer = analyzer
        self.operator = self.OR_OPERATOR
        self.allow_leading_wildcard = False
        self.phrase_slop = 0
        self.fuzzy_min_sim = 2.0
        self.fuzzy_prefix_length = 0
        self.enable_position_increments = True
        self.enable_graph_queries = True
        self.auto_generate_multi_term_synonyms_phrase_query = False
        self.multi_term_rewrite_method = "CONSTANT_SCORE_BLENDED_REWRITE"
        self._split_on_whitespace = self.DEFAULT_SPLIT_ON_WHITESPACE
        self._auto_generate_phrase_queries = False
        self.date_resolution: str | None = None
        self._field_date_resolution: dict[str, str] = {}
        # parse state
        self._toks: list[_Tok] = []
        self._i = 0

    # -- configuration surface (CommonQueryParserConfiguration analog)
    def set_default_operator(self, op: str) -> None:
        self.operator = op

    def get_split_on_whitespace(self) -> bool:
        return self._split_on_whitespace

    def set_split_on_whitespace(self, v: bool) -> None:
        if not v and self._auto_generate_phrase_queries:
            raise ValueError(
                "setSplitOnWhitespace(false) is disallowed when getAutoGeneratePhraseQueries() == true"
            )
        self._split_on_whitespace = v

    @property
    def auto_generate_phrase_queries(self) -> bool:
        return self._auto_generate_phrase_queries

    @auto_generate_phrase_queries.setter
    def auto_generate_phrase_queries(self, v: bool) -> None:
        if v and not self._split_on_whitespace:
            raise ValueError(
                "setAutoGeneratePhraseQueries(true) is disallowed when getSplitOnWhitespace() == false"
            )
        self._auto_generate_phrase_queries = v

    def set_date_resolution(self, field: str, resolution: str) -> None:
        self._field_date_resolution[field] = resolution

    def get_date_resolution(self, field: str) -> str | None:
        return self._field_date_resolution.get(field, self.date_resolution)

    # -- entry point
    def parse(self, query: str) -> QPQuery:
        try:
            self._toks = _lex(query)
            self._i = 0
            res = self._query(self.field)
            self._consume(EOF)
            return res if res is not None else QPBool(())
        except ParseException as e:
            raise ParseException(f"Cannot parse '{query}': {e}") from e
        except TooManyClauses as e:
            raise ParseException(f"Cannot parse '{query}': too many boolean clauses") from e

    # -- token plumbing
    def _peek(self, ahead: int = 0) -> _Tok:
        j = self._i + ahead
        return self._toks[j] if j < len(self._toks) else self._toks[-1]

    def _consume(self, kind: str) -> _Tok:
        t = self._peek()
        if t.kind != kind:
            raise ParseException(f"Encountered {t.kind} '{t.image}' — expected {kind}")
        self._i += 1
        return t

    def _multiterm_lookahead(self) -> bool:
        return (
            self._peek().kind == TERM
            and self._peek(1).kind == TERM
            and self._peek(2).kind not in _DISALLOWED_POST_MULTITERM
        )

    # -- grammar
    def _conjunction(self) -> int:
        k = self._peek().kind
        if k == AND:
            self._i += 1
            return CONJ_AND
        if k == OR:
            self._i += 1
            return CONJ_OR
        return CONJ_NONE

    def _modifiers(self) -> int:
        k = self._peek().kind
        if k == PLUS:
            self._i += 1
            return MOD_REQ
        if k in (MINUS, NOT):
            self._i += 1
            return MOD_NOT
        return MOD_NONE

    def _query(self, field: str) -> QPQuery | None:
        clauses: list[tuple[str, QPQuery]] = []
        first_query: QPQuery | None = None
        if self._multiterm_lookahead():
            first_query = self._multi_term(field, clauses)
        else:
            if self._peek().kind not in _QUERY_START:
                raise ParseException(f"Unexpected token {self._peek().kind}")
            mods = self._modifiers()
            q = self._clause(field)
            self._add_clause(clauses, CONJ_NONE, mods, q)
            if mods == MOD_NONE:
                first_query = q
        while self._peek().kind in _LOOP_SET:
            if self._multiterm_lookahead():
                self._multi_term(field, clauses)
            else:
                conj = self._conjunction()
                mods = self._modifiers()
                q = self._clause(field)
                self._add_clause(clauses, conj, mods, q)
        if len(clauses) == 1 and first_query is not None:
            return first_query
        return self._get_boolean_query(clauses)

    def _clause(self, field: str) -> QPQuery | None:
        # LOOKAHEAD(2): [TERM ":" | "*" ":"]
        if self._peek().kind == TERM and self._peek(1).kind == COLON:
            field = discard_escape_char(self._consume(TERM).image)
            self._consume(COLON)
        elif self._peek().kind == STAR and self._peek(1).kind == COLON:
            self._consume(STAR)
            self._consume(COLON)
            field = "*"
        k = self._peek().kind
        if k == LPAREN:
            self._consume(LPAREN)
            q = self._query(field)
            self._consume(RPAREN)
            boost = None
            if self._peek().kind == CARAT:
                self._consume(CARAT)
                boost = self._consume(NUMBER)
            return self._handle_boost(q, boost)
        if k in _CLAUSE_START:
            return self._term(field)
        raise ParseException(f"Unexpected token {k}")

    def _term(self, field: str) -> QPQuery | None:
        k = self._peek().kind
        boost = None
        fuzzy_slop = None
        if k in (TERM, STAR, PREFIXTERM, WILDTERM, REGEXPTERM, NUMBER, BAREOPER):
            term = self._consume(k)
            image = term.image
            prefix = k == PREFIXTERM
            wildcard = k in (WILDTERM, STAR)
            regexp = k == REGEXPTERM
            fuzzy = False
            if k == BAREOPER:
                image = image[:1]
            if self._peek().kind == CARAT:
                self._consume(CARAT)
                boost = self._consume(NUMBER)
                if self._peek().kind == FUZZY_SLOP:
                    fuzzy_slop = self._consume(FUZZY_SLOP)
                    fuzzy = True
            elif self._peek().kind == FUZZY_SLOP:
                fuzzy_slop = self._consume(FUZZY_SLOP)
                fuzzy = True
                if self._peek().kind == CARAT:
                    self._consume(CARAT)
                    boost = self._consume(NUMBER)
            q = self._handle_bare_token_query(field, image, fuzzy_slop, prefix, wildcard, fuzzy, regexp)
        elif k in (RANGEIN_START, RANGEEX_START):
            start_inc = k == RANGEIN_START
            self._i += 1
            goop1 = self._range_goop()
            self._consume(RANGE_TO)
            goop2 = self._range_goop()
            end_k = self._peek().kind
            if end_k == RANGEIN_END:
                end_inc = True
            elif end_k == RANGEEX_END:
                end_inc = False
            else:
                raise ParseException(f"Unexpected token {end_k} in range")
            self._i += 1
            if self._peek().kind == CARAT:
                self._consume(CARAT)
                boost = self._consume(NUMBER)
            lo = self._range_part(goop1)
            hi = self._range_part(goop2)
            q = self.get_range_query(field, lo, hi, start_inc, end_inc)
        elif k == QUOTED:
            term = self._consume(QUOTED)
            if self._peek().kind == CARAT:
                self._consume(CARAT)
                boost = self._consume(NUMBER)
                if self._peek().kind == FUZZY_SLOP:
                    fuzzy_slop = self._consume(FUZZY_SLOP)
            elif self._peek().kind == FUZZY_SLOP:
                fuzzy_slop = self._consume(FUZZY_SLOP)
                if self._peek().kind == CARAT:
                    self._consume(CARAT)
                    boost = self._consume(NUMBER)
            q = self._handle_quoted_term(field, term.image, fuzzy_slop)
        else:
            raise ParseException(f"Unexpected token {k}")
        return self._handle_boost(q, boost)

    def _range_goop(self) -> _Tok:
        k = self._peek().kind
        if k in (RANGE_GOOP, RANGE_QUOTED, RANGE_TO):
            return self._consume(k)
        raise ParseException(f"Unexpected token {k} in range")

    @staticmethod
    def _range_part(goop: _Tok) -> str | None:
        image = goop.image
        if goop.kind == RANGE_QUOTED:
            image = image[1:-1]
        elif image == "*":
            return None
        return discard_escape_char(image)

    def _multi_term(self, field: str, clauses: list) -> QPQuery | None:
        text = self._consume(TERM).image
        first_query: QPQuery | None = None
        if self._split_on_whitespace:
            first_query = self.get_field_query(field, discard_escape_char(text), False)
            self._add_clause(clauses, CONJ_NONE, MOD_NONE, first_query)
        if not (self._peek().kind == TERM and self._peek(1).kind not in _DISALLOWED_POST_MULTITERM):
            raise ParseException("MultiTerm lookahead violated")
        while True:
            following = self._consume(TERM)
            if self._split_on_whitespace:
                q = self.get_field_query(field, discard_escape_char(following.image), False)
                self._add_clause(clauses, CONJ_NONE, MOD_NONE, q)
            else:
                text += " " + following.image
            if not (self._peek().kind == TERM and self._peek(1).kind not in _DISALLOWED_POST_MULTITERM):
                break
        if not self._split_on_whitespace:
            first_query = self.get_field_query(field, discard_escape_char(text), False)
            self._add_multi_term_clauses(clauses, first_query)
        return first_query

    # -- clause assembly (QueryParserBase.addClause :272)
    def _add_clause(self, clauses: list, conj: int, mods: int, q: QPQuery | None) -> None:
        if clauses and conj == CONJ_AND:
            occur, prev = clauses[-1]
            if occur != "MUST_NOT":
                clauses[-1] = ("MUST", prev)
        if clauses and self.operator == self.AND_OPERATOR and conj == CONJ_OR:
            occur, prev = clauses[-1]
            if occur != "MUST_NOT":
                clauses[-1] = ("SHOULD", prev)
        if q is None:
            return
        if self.operator == self.OR_OPERATOR:
            prohibited = mods == MOD_NOT
            required = mods == MOD_REQ
            if conj == CONJ_AND and not prohibited:
                required = True
        else:
            prohibited = mods == MOD_NOT
            required = not prohibited and conj != CONJ_OR
        if required and not prohibited:
            clauses.append(("MUST", q))
        elif not required and not prohibited:
            clauses.append(("SHOULD", q))
        else:
            clauses.append(("MUST_NOT", q))

    def _add_multi_term_clauses(self, clauses: list, q: QPQuery | None) -> None:
        """QueryParserBase.addMultiTermClauses (:341)."""
        if q is None:
            return
        all_term_queries = isinstance(q, QPBool) and all(
            isinstance(sub, QPTerm) for _, sub in q.clauses
        )
        if all_term_queries:
            clauses.extend(q.clauses)
            return
        occur = "SHOULD" if self.operator == self.OR_OPERATOR else "MUST"
        if isinstance(q, QPBool):
            for _, sub in q.clauses:
                clauses.append((occur, sub))
        else:
            clauses.append((occur, q))

    def _get_boolean_query(self, clauses: list) -> QPQuery | None:
        if not clauses:
            return None
        if len(clauses) > max_clause_count:
            raise TooManyClauses()
        return QPBool(tuple(clauses))

    # -- term handlers (QueryParserBase handleBareTokenQuery etc.)
    def _handle_bare_token_query(
        self, field, image, fuzzy_slop, prefix, wildcard, fuzzy, regexp
    ) -> QPQuery | None:
        term_image = discard_escape_char(image)
        if wildcard:
            return self.get_wildcard_query(field, image)
        if prefix:
            return self.get_prefix_query(field, discard_escape_char(image[:-1]))
        if regexp:
            return self.get_regexp_query(field, image[1:-1])
        if fuzzy:
            return self.handle_bare_fuzzy(field, fuzzy_slop, term_image)
        return self.get_field_query(field, term_image, False)

    def get_fuzzy_distance(self, fuzzy_image: str, term_str: str) -> float:
        try:
            return float(fuzzy_image[1:])
        except ValueError:
            return self.fuzzy_min_sim

    def handle_bare_fuzzy(self, field: str, fuzzy_slop: _Tok, term_image: str) -> QPQuery:
        fms = self.get_fuzzy_distance(fuzzy_slop.image, term_image)
        if fms < 0.0:
            raise ParseException("Minimum similarity for a FuzzyQuery has to be between 0.0f and 1.0f !")
        if fms >= 1.0 and fms != float(int(fms)):
            raise ParseException("Fractional edit distances are not allowed!")
        return self.get_fuzzy_query(field, term_image, fms)

    def _handle_quoted_term(self, field: str, image: str, fuzzy_slop: _Tok | None) -> QPQuery | None:
        slop = self.phrase_slop
        if fuzzy_slop is not None:
            try:
                slop = int(float(fuzzy_slop.image[1:]))
            except ValueError:
                pass
        return self.get_field_query_slop(field, discard_escape_char(image[1:-1]), slop)

    def _handle_boost(self, q: QPQuery | None, boost: _Tok | None) -> QPQuery | None:
        if boost is not None and q is not None:
            try:
                f = float(boost.image)
            except ValueError:
                f = 1.0
            return QPBoost(q, f)
        return q

    # -- factory methods (override points mirroring the reference)
    def get_field_query(self, field: str, query_text: str, quoted: bool) -> QPQuery | None:
        return self.new_field_query(self.analyzer, field, query_text, quoted)

    def new_field_query(self, analyzer: QPAnalyzer, field: str, query_text: str, quoted: bool) -> QPQuery | None:
        occur = "MUST" if self.operator == self.AND_OPERATOR else "SHOULD"
        return self._create_field_query(
            analyzer, occur, field, query_text,
            quoted or self._auto_generate_phrase_queries, self.phrase_slop,
        )

    def get_field_query_slop(self, field: str, query_text: str, slop: int) -> QPQuery | None:
        """getFieldQuery(field, text, slop) — slop applied only to (Multi)PhraseQuery."""
        query = self.get_field_query(field, query_text, True)
        if query is None:
            return None
        if isinstance(query, QPPhrase) and slop != query.slop:
            return QPPhrase(query.field, query.terms, query.positions, slop)
        if isinstance(query, QPMultiPhrase) and slop != query.slop:
            return QPMultiPhrase(query.field, query.slots, query.positions, slop)
        return query

    def get_range_query(self, field, part1, part2, start_inclusive, end_inclusive) -> QPQuery:
        resolution = self.get_date_resolution(field)
        if resolution is not None and part1 is not None:
            try:
                part1 = date_to_string(_parse_date(part1), resolution)
            except Exception:
                pass
        if resolution is not None and part2 is not None:
            try:
                d2 = _parse_date(part2)
                if end_inclusive:
                    d2 = d2 + timedelta(hours=23, minutes=59, seconds=59, milliseconds=999)
                part2 = date_to_string(d2, resolution)
            except Exception:
                pass
        lo = None if part1 is None else self.analyzer.normalize(field, part1)
        hi = None if part2 is None else self.analyzer.normalize(field, part2)
        return QPRange(field, lo, hi, start_inclusive, end_inclusive, self.multi_term_rewrite_method)

    def get_wildcard_query(self, field: str, term_str: str) -> QPQuery:
        if field == "*" and term_str == "*":
            return QPMatchAll()
        if not self.allow_leading_wildcard and (term_str.startswith("*") or term_str.startswith("?")):
            raise ParseException("'*' or '?' not allowed as first character in WildcardQuery")
        return QPWildcard(field, self._analyze_wildcard(field, term_str), self.multi_term_rewrite_method)

    _WILDCARD_CHUNK = re.compile(r"(\\.)|([?*]+)", re.DOTALL)

    def _analyze_wildcard(self, field: str, term_str: str) -> str:
        """analyzeWildcard (:652): normalize chunks but never wildcards or escapes."""
        out = []
        last = 0
        for m in self._WILDCARD_CHUNK.finditer(term_str):
            if m.start() > last:
                out.append(self.analyzer.normalize(field, term_str[last : m.start()]))
            out.append(m.group())
            last = m.end()
        if last < len(term_str):
            out.append(self.analyzer.normalize(field, term_str[last:]))
        return "".join(out)

    def get_regexp_query(self, field: str, term_str: str) -> QPQuery:
        return QPRegexp(field, self.analyzer.normalize(field, term_str), self.multi_term_rewrite_method)

    def get_prefix_query(self, field: str, term_str: str) -> QPQuery:
        if not self.allow_leading_wildcard and term_str.startswith("*"):
            raise ParseException("'*' not allowed as first character in PrefixQuery")
        return QPPrefix(field, self.analyzer.normalize(field, term_str), self.multi_term_rewrite_method)

    def get_fuzzy_query(self, field: str, term_str: str, min_similarity: float) -> QPQuery:
        text = self.analyzer.normalize(field, term_str)
        num_edits = float_to_edits(min_similarity, len(text))
        return QPFuzzy(field, text, num_edits, self.fuzzy_prefix_length)

    # -- QueryBuilder port (util/QueryBuilder.kt)
    def _create_field_query(
        self, analyzer: QPAnalyzer, operator: str, field: str, query_text: str,
        quoted: bool, phrase_slop: int,
    ) -> QPQuery | None:
        toks = analyzer.tokens(field, query_text)
        return self._create_field_query_tokens(toks, operator, field, quoted, phrase_slop)

    def _create_field_query_tokens(
        self, toks: list[QPTok], operator: str, field: str, quoted: bool, phrase_slop: int
    ) -> QPQuery | None:
        num_tokens = len(toks)
        position_count = sum(t.pos_incr for t in toks if t.pos_incr != 0)
        has_synonyms = any(t.pos_incr == 0 for t in toks)
        is_graph = self.enable_graph_queries and any(t.pos_len > 1 for t in toks)
        if num_tokens == 0:
            return None
        if num_tokens == 1:
            return QPTerm(field, toks[0].term)
        if is_graph:
            if quoted:
                return self._analyze_graph_phrase(field, toks, phrase_slop)
            return self._analyze_graph_boolean(field, toks, operator)
        if quoted and position_count > 1:
            if has_synonyms:
                return self._analyze_multi_phrase(field, toks, phrase_slop)
            return self._analyze_phrase(field, toks, phrase_slop)
        if position_count == 1:
            return self._analyze_boolean(field, toks)
        return self._analyze_multi_boolean(field, toks, operator)

    def _analyze_boolean(self, field: str, toks: list[QPTok]) -> QPQuery:
        return QPSynonym(field, tuple(t.term for t in toks))

    @staticmethod
    def _add_position_group(field, clauses, current, operator):
        if not current:
            return
        if len(current) == 1:
            clauses.append((operator, QPTerm(field, current[0])))
        else:
            clauses.append((operator, QPSynonym(field, tuple(current))))

    def _analyze_multi_boolean(self, field: str, toks: list[QPTok], operator: str) -> QPQuery:
        clauses: list = []
        current: list[str] = []
        for t in toks:
            if t.pos_incr != 0:
                self._add_position_group(field, clauses, current, operator)
                current = []
            current.append(t.term)
        self._add_position_group(field, clauses, current, operator)
        if len(clauses) > max_clause_count:
            raise TooManyClauses()
        return QPBool(tuple(clauses))

    def _analyze_phrase(self, field: str, toks: list[QPTok], slop: int) -> QPQuery:
        position = -1
        terms, positions = [], []
        for t in toks:
            position += t.pos_incr if self.enable_position_increments else 1
            terms.append(t.term)
            positions.append(position)
        return QPPhrase(field, tuple(terms), tuple(positions), slop)

    def _analyze_multi_phrase(self, field: str, toks: list[QPTok], slop: int) -> QPQuery:
        slots: list[tuple[str, ...]] = []
        positions: list[int] = []
        position = -1
        multi: list[str] = []
        for t in toks:
            if t.pos_incr > 0 and multi:
                slots.append(tuple(multi))
                positions.append(position if self.enable_position_increments else len(slots) - 1)
                multi = []
            position += t.pos_incr
            multi.append(t.term)
        slots.append(tuple(multi))
        positions.append(position if self.enable_position_increments else len(slots) - 1)
        return QPMultiPhrase(field, tuple(slots), tuple(positions), slop)

    # graph handling (GraphTokenStreamFiniteStrings analog over position states)
    @staticmethod
    def _graph_edges(toks: list[QPTok]) -> tuple[list[tuple[int, int, str]], int]:
        """Tokens -> DAG edges (start_state, end_state, term)."""
        edges = []
        pos = 0
        first = True
        for t in toks:
            if first:
                first = False
            else:
                pos += t.pos_incr
            edges.append((pos, pos + t.pos_len, t.term))
        final = max(e for _, e, _ in edges)
        return edges, final

    def _analyze_graph_boolean(self, field: str, toks: list[QPTok], operator: str) -> QPQuery:
        edges, final = self._graph_edges(toks)
        # articulation points: states not crossed by any edge (QueryBuilder
        # visits them in order, building one positional query per interval)
        aps = [s for s in range(1, final) if not any(a < s < b for a, b, _ in edges)]
        boundaries = aps + [final]
        clauses: list = []
        start = 0
        for end in boundaries:
            region_edges = [(a, b, t) for a, b, t in edges if start <= a < end]
            if end - start > 1:  # side path: enumerate finite strings
                paths = self._finite_strings(region_edges, start, end)
                path_queries = []
                for p in paths:
                    q = self._create_field_query_tokens(
                        [QPTok(t, 1, 1) for t in p], "MUST", field,
                        self.auto_generate_multi_term_synonyms_phrase_query, 0,
                    )
                    if q is not None:
                        path_queries.append(q)
                # newGraphSynonymQuery: SHOULD disjunction, single clause unwrapped
                if len(path_queries) == 1:
                    positional = path_queries[0]
                else:
                    positional = QPBool(tuple(("SHOULD", q) for q in path_queries))
            else:
                terms = [t for a, _, t in region_edges if a == start]
                positional = (
                    QPTerm(field, terms[0]) if len(terms) == 1 else QPSynonym(field, tuple(terms))
                )
            clauses.append((operator, positional))
            start = end
        if len(clauses) > max_clause_count:
            raise TooManyClauses()
        return QPBool(tuple(clauses))

    def _analyze_graph_phrase(self, field: str, toks: list[QPTok], phrase_slop: int) -> QPQuery:
        edges, final = self._graph_edges(toks)
        paths = self._finite_strings(edges, 0, final)
        clauses = []
        for p in paths:
            q = self._create_field_query_tokens(
                [QPTok(t, 1, 1) for t in p], "MUST", field, True, phrase_slop
            )
            if q is not None:
                clauses.append(("SHOULD", q))
        return QPBool(tuple(clauses))

    @staticmethod
    def _finite_strings(edges, start: int, end: int) -> list[list[str]]:
        by_start: dict[int, list[tuple[int, str]]] = {}
        for a, b, t in edges:
            by_start.setdefault(a, []).append((b, t))
        paths: list[list[str]] = []

        def walk(state: int, acc: list[str]):
            if state == end:
                paths.append(list(acc))
                return
            for b, t in by_start.get(state, ()):
                acc.append(t)
                walk(b, acc)
                acc.pop()

        walk(start, [])
        return paths


# ------------------------------------------------- MultiFieldQueryParser

class MultiFieldQueryParser(ClassicQueryParser):
    """queryparser/classic/MultiFieldQueryParser.kt — clauses with no explicit
    field fan out across ``fields``. Analyzed text is TRANSPOSED per term
    (getFieldQuery :115-175): each per-field sub-query's term-position clauses
    are zipped into cross-field SHOULD groups, so ``one two`` over (b, t)
    becomes ``(b:one t:one) (b:two t:two)`` — the default operator then binds
    per TERM, not per field. Unanalyzed forms (prefix/wildcard/fuzzy/regexp/
    range) replicate directly; ``boosts`` wraps each per-field replica."""

    NULL_FIELD = ""

    def __init__(self, fields: list[str], analyzer: QPAnalyzer, boosts: dict[str, float] | None = None):
        super().__init__(self.NULL_FIELD, analyzer)
        self.fields = list(fields)
        self.boosts = dict(boosts or {})

    def _boost_wrap(self, q: QPQuery | None, field: str) -> QPQuery | None:
        if q is None:
            return None
        b = self.boosts.get(field)
        if b is not None:
            return QPBoost(q, b)
        return q

    @staticmethod
    def _apply_slop(q: QPQuery | None, slop: int) -> QPQuery | None:
        if isinstance(q, QPPhrase):
            return QPPhrase(q.field, q.terms, q.positions, slop)
        if isinstance(q, QPMultiPhrase) and slop != q.slop:
            return QPMultiPhrase(q.field, q.slots, q.positions, slop)
        if isinstance(q, QPBoost):
            return QPBoost(MultiFieldQueryParser._apply_slop(q.query, slop), q.boost)
        return q

    @staticmethod
    def _get_multi_field_query(queries: list[QPQuery]) -> QPQuery | None:
        if not queries:
            return None
        return QPBool(tuple(("SHOULD", q) for q in queries))

    def get_field_query_slop(self, field: str, query_text: str, slop: int) -> QPQuery | None:
        if field == self.NULL_FIELD:
            clauses = []
            for f in self.fields:
                q = ClassicQueryParser.get_field_query(self, f, query_text, True)
                if q is not None:
                    q = self._boost_wrap(q, f)
                    clauses.append(self._apply_slop(q, slop))
            return self._get_multi_field_query(clauses)
        q = ClassicQueryParser.get_field_query(self, field, query_text, True)
        return self._apply_slop(q, slop)

    def get_field_query(self, field: str, query_text: str, quoted: bool) -> QPQuery | None:
        if field != self.NULL_FIELD:
            return ClassicQueryParser.get_field_query(self, field, query_text, quoted)
        field_queries: list[QPQuery | None] = []
        max_terms = 0
        for f in self.fields:
            q = ClassicQueryParser.get_field_query(self, f, query_text, quoted)
            if q is not None:
                max_terms = max(max_terms, len(q.clauses) if isinstance(q, QPBool) else 1)
            field_queries.append(q)
        clauses: list[QPQuery] = []
        for term_num in range(max_terms):
            term_clauses: list[QPQuery] = []
            for i, f in enumerate(self.fields):
                fq = field_queries[i]
                if fq is None:
                    continue
                q = None
                if isinstance(fq, QPBool):
                    if term_num < len(fq.clauses):
                        q = fq.clauses[term_num][1]
                elif term_num == 0:
                    q = fq
                if q is not None:
                    term_clauses.append(self._boost_wrap(q, f))
            if max_terms > 1:
                if term_clauses:
                    clauses.append(QPBool(tuple(("SHOULD", tc) for tc in term_clauses)))
            else:
                clauses.extend(term_clauses)
        return self._get_multi_field_query(clauses)

    def _fan_out(self, make) -> QPQuery:
        return self._get_multi_field_query([make(f) for f in self.fields])

    def get_fuzzy_query(self, field, term_str, min_similarity):
        if field == self.NULL_FIELD:
            return self._fan_out(lambda f: self.get_fuzzy_query(f, term_str, min_similarity))
        return self._boost_wrap(ClassicQueryParser.get_fuzzy_query(self, field, term_str, min_similarity), field)

    def get_prefix_query(self, field, term_str):
        if field == self.NULL_FIELD:
            return self._fan_out(lambda f: self.get_prefix_query(f, term_str))
        return self._boost_wrap(ClassicQueryParser.get_prefix_query(self, field, term_str), field)

    def get_wildcard_query(self, field, term_str):
        if field == self.NULL_FIELD:
            return self._fan_out(lambda f: self.get_wildcard_query(f, term_str))
        return self._boost_wrap(ClassicQueryParser.get_wildcard_query(self, field, term_str), field)

    def get_range_query(self, field, part1, part2, start_inclusive, end_inclusive):
        if field == self.NULL_FIELD:
            return self._fan_out(
                lambda f: self.get_range_query(f, part1, part2, start_inclusive, end_inclusive)
            )
        return self._boost_wrap(
            ClassicQueryParser.get_range_query(self, field, part1, part2, start_inclusive, end_inclusive),
            field,
        )

    def get_regexp_query(self, field, term_str):
        if field == self.NULL_FIELD:
            return self._fan_out(lambda f: self.get_regexp_query(f, term_str))
        return self._boost_wrap(ClassicQueryParser.get_regexp_query(self, field, term_str), field)


def multifield_parse(queries: list[str], fields: list[str], analyzer: QPAnalyzer,
                     flags: list[str] | None = None) -> QPQuery:
    """MultiFieldQueryParser.parse(String[], String[], ...) static forms:
    query i against field i, SHOULD/MUST/MUST_NOT per flags (default SHOULD)."""
    if flags is not None and len(queries) != len(flags):
        raise ValueError("queries and flags array have have different length")
    if len(queries) != len(fields):
        raise ValueError("queries, fields array have have different length")
    clauses = []
    for i, (qs, f) in enumerate(zip(queries, fields)):
        qp = ClassicQueryParser(f, analyzer)
        q = qp.parse(qs)
        if q is not None and (not isinstance(q, QPBool) or q.clauses):
            clauses.append((flags[i] if flags else "SHOULD", q))
    return QPBool(tuple(clauses))


# ---------------------------------------------------------- engine bridge

def multifield_parse_one(qtxt: str, fields: list[str], flags: list[str],
                         analyzer: QPAnalyzer) -> QPQuery:
    """MultiFieldQueryParser.parse(String, String[], Occur[], Analyzer): the
    ONE query text parsed against each field, combined with that field's flag."""
    if len(fields) != len(flags):
        raise ValueError("fields and flags array have have different length")
    clauses = []
    for f, flag in zip(fields, flags):
        qp = ClassicQueryParser(f, analyzer)
        q = qp.parse(qtxt)
        if q is not None and (not isinstance(q, QPBool) or q.clauses):
            clauses.append((flag, q))
    return QPBool(tuple(clauses))


def to_engine_query(q: QPQuery, default_field: str, structured_fields: tuple[str, ...] = ()):
    """Compile a parsed tree onto the distributed engine's Query classes.

    Leaves on ``default_field`` become the engine's text queries; leaves on a
    structured column become Catalyst-pushdown ColumnFilterQuery predicates
    (the role/ts/conv_id axis). Cross-field full-text leaves raise — use
    MultiFieldSearcher for that surface."""
    from lucene_kmp_spark.search import query as eq

    def conv(node: QPQuery, boost: float = 1.0):
        if isinstance(node, QPBoost):
            return conv(node.query, boost * node.boost)
        if isinstance(node, QPTerm):
            if node.field in structured_fields:
                safe = node.text.replace("'", "''")
                return eq.ColumnFilterQuery(f"{node.field} = '{safe}'")
            _check_field(node.field)
            return eq.TermQuery(node.text, boost=boost)
        if isinstance(node, QPSynonym):
            _check_field(node.field)
            return eq.SynonymQuery(tuple(node.terms), boost=boost)
        if isinstance(node, QPPhrase):
            _check_field(node.field)
            # engine phrases are consecutive-position; stop-filter holes widen
            # into slop the way QueryParser users expect at this surface
            extra = (node.positions[-1] - node.positions[0] + 1 - len(node.terms)) if node.positions else 0
            return eq.PhraseQuery(tuple(node.terms), slop=node.slop + max(0, extra), boost=boost)
        if isinstance(node, QPMultiPhrase):
            _check_field(node.field)
            return eq.MultiPhraseQuery(tuple(node.slots), slop=node.slop, boost=boost)
        if isinstance(node, QPPrefix):
            _check_field(node.field)
            return eq.PrefixQuery(node.prefix, boost=boost)
        if isinstance(node, QPWildcard):
            _check_field(node.field)
            if "\\*" in node.pattern or "\\?" in node.pattern:
                raise ParseException(
                    "escaped wildcards are not supported by the engine WildcardQuery"
                )
            return eq.WildcardQuery(discard_escape_char(node.pattern), boost=boost)
        if isinstance(node, QPFuzzy):
            _check_field(node.field)
            return eq.FuzzyQuery(node.term, max_edits=node.max_edits,
                                 prefix_length=node.prefix_length, boost=boost)
        if isinstance(node, QPRegexp):
            _check_field(node.field)
            return eq.RegexpQuery(node.pattern, boost=boost)  # positional arg: regexp
        if isinstance(node, QPRange):
            if node.field in structured_fields:
                parts = []
                if node.lower is not None:
                    parts.append(f"{node.field} >{'=' if node.include_lower else ''} '{node.lower}'")
                if node.upper is not None:
                    parts.append(f"{node.field} <{'=' if node.include_upper else ''} '{node.upper}'")
                return eq.ColumnFilterQuery(" AND ".join(parts) or "TRUE")
            _check_field(node.field)
            return eq.TermRangeQuery(node.lower, node.upper, node.include_lower,
                                     node.include_upper, boost=boost)
        if isinstance(node, QPMatchAll):
            return eq.MatchAllDocsQuery(boost=boost)
        if isinstance(node, QPBool):
            must, should, must_not = [], [], []
            for occur, sub in node.clauses:
                c = conv(sub)
                if occur == "MUST":
                    must.append(c)
                elif occur == "MUST_NOT":
                    must_not.append(c)
                else:
                    should.append(c)
            return eq.BooleanQuery.build(
                must=tuple(must), should=tuple(should), must_not=tuple(must_not),
                minimum_should_match=node.min_should_match, boost=boost,
            )
        raise ParseException(f"No engine mapping for {type(node).__name__}")

    def _check_field(f):
        if f not in (default_field, "*"):
            raise ParseException(
                f"field '{f}' is neither the text field nor a structured column; "
                "use MultiFieldSearcher for cross-field text queries"
            )

    return conv(q)
