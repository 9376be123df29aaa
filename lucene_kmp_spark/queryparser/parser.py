"""Classic query-parser syntax -> Query AST (driver-side, single string).

Reference: ``queryparser/classic/QueryParser.kt:18-41`` (JavaCC LL grammar) and
``QueryParserBase.kt`` (default operator OR, :57; terms analyzed with the same
analyzer used at index time). This is a small hand-written recursive-descent
parser over the same surface syntax:

    query    := clause+                        # default operator OR
    clause   := [+|-|NOT] [field ':'] atom [^boost]
    atom     := '(' query ')' | '"' phrase '"' [~slop] | '/' regexp '/' | range | termish
    termish  := word [~edits] | prefix* | wild?card
    range    := '[' a TO b ']' | '{' a TO b '}'
    AND/&&, OR/||ĕ infix operators bind adjacent clauses

Non-default fields map to structured-column predicates (ColumnFilterQuery) —
the Catalyst-pushdown path for role/ts/conv_id filters.
"""

from __future__ import annotations

import re

from lucene_kmp_spark.analysis import analyze
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ColumnFilterQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<and>AND\b|&&) | (?P<or>OR\b|\|\|) | (?P<not>NOT\b|!) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<slop>\d+))?) |
        (?P<regex>/(?P<regex_body>[^/]*)/) |
        (?P<lbracket>[\[\{])\s*(?P<lo>[^\s\]]+)\s+TO\s+(?P<hi>[^\s\]]+)\s*(?P<rbracket>[\]\}]) |
        (?P<word>[^\s()"^]+)
    )""",
    re.VERBOSE,
)
_BOOST_RX = re.compile(r"\^(\d+(?:\.\d+)?)")


class QueryParser:
    """``QueryParser(default_field, structured_fields)``; ``parse(s) -> Query``."""

    def __init__(self, default_field: str = "text", structured_fields: tuple[str, ...] = ()):
        self.default_field = default_field
        self.structured_fields = set(structured_fields)

    def parse(self, s: str) -> Query:
        toks = self._lex(s)
        q, rest = self._parse_query(toks)
        return q

    # --------------------------------------------------------------- lexing
    def _lex(self, s: str):
        out = []
        i = 0
        while i < len(s):
            m = _TOKEN_RX.match(s, i)
            if not m or m.end() == i:
                i += 1
                continue
            i = m.end()
            # trailing boost applies to the previous atom: capture here
            boost = 1.0
            bm = _BOOST_RX.match(s, i)
            if bm:
                boost = float(bm.group(1))
                i = bm.end()
            kind = m.lastgroup
            for k in ("lparen", "rparen", "and", "or", "not", "plus", "minus"):
                if m.group(k):
                    kind = k
                    break
            else:
                if m.group("phrase") is not None:
                    out.append(("phrase", (m.group("phrase_body"), int(m.group("slop") or 0)), boost))
                    continue
                if m.group("regex") is not None:
                    out.append(("regex", m.group("regex_body"), boost))
                    continue
                if m.group("lbracket"):
                    out.append(
                        (
                            "range",
                            (
                                m.group("lo"),
                                m.group("hi"),
                                m.group("lbracket") == "[",
                                m.group("rbracket") == "]",
                            ),
                            boost,
                        )
                    )
                    continue
                out.append(("word", m.group("word"), boost))
                continue
            out.append((kind, m.group(0).strip(), boost))
        return out

    # -------------------------------------------------------------- parsing
    def _parse_query(self, toks, depth: int = 0) -> tuple[Query, list]:
        must, should, must_not = [], [], []
        pending_op = None  # 'and' | 'or'
        exit_boost = 1.0  # boost attached to the closing paren: (a b)^2
        while toks:
            kind, val, boost = toks[0]
            if kind == "rparen":
                exit_boost = boost
                toks = toks[1:]
                break
            if kind in ("and", "or"):
                pending_op = kind
                toks = toks[1:]
                continue
            occur = None
            if kind == "plus":
                occur = "+"
                toks = toks[1:]
                kind, val, boost = toks[0] if toks else ("", "", 1.0)
            elif kind in ("minus", "not"):
                occur = "-"
                toks = toks[1:]
                kind, val, boost = toks[0] if toks else ("", "", 1.0)
            if not toks:
                break
            q, toks = self._parse_atom(toks, depth)
            if q is None:
                continue
            if boost != 1.0:
                import dataclasses

                q = dataclasses.replace(q, boost=q.boost * boost)
            if occur == "-":
                must_not.append(q)
            elif occur == "+":
                must.append(q)
            elif pending_op == "and":
                # AND binds the previous SHOULD clause too (classic behavior)
                if should:
                    must.append(should.pop())
                must.append(q)
            else:
                should.append(q)
            pending_op = None
        if len(should) == 1 and not must and not must_not:
            q = should[0]
        elif not should and not must and not must_not:
            q = MatchAllDocsQuery()
        else:
            q = BooleanQuery.build(
                must=tuple(must), should=tuple(should), must_not=tuple(must_not)
            )
        if exit_boost != 1.0:
            import dataclasses

            q = dataclasses.replace(q, boost=q.boost * exit_boost)
        return q, toks

    def _parse_atom(self, toks, depth) -> tuple[Query | None, list]:
        kind, val, boost = toks[0]
        toks = toks[1:]
        if kind == "lparen":
            return self._parse_query(toks, depth + 1)
        if kind == "phrase":
            body, slop = val
            terms, _, _ = analyze(body)
            if not terms:
                return None, toks
            if len(terms) == 1:
                return TermQuery(terms[0]), toks
            return PhraseQuery(tuple(terms), slop=slop), toks
        if kind == "regex":
            from lucene_kmp_spark.search.query import RegexpQuery

            return RegexpQuery(val), toks
        if kind == "range":
            lo, hi, inc_lo, inc_hi = val
            lo = None if lo == "*" else _norm_term(lo)
            hi = None if hi == "*" else _norm_term(hi)
            return TermRangeQuery(lo, hi, inc_lo, inc_hi), toks
        if kind == "word":
            field = None
            body = val
            if ":" in body:
                maybe_field, rest = body.split(":", 1)
                if maybe_field in self.structured_fields or maybe_field == self.default_field:
                    field, body = maybe_field, rest
            if field and field in self.structured_fields:
                safe = body.replace("'", "''")
                return ColumnFilterQuery(f"{field} = '{safe}'"), toks
            # fuzzy?
            m = re.fullmatch(r"(.+?)~(\d?)", body)
            if m:
                term = _norm_term(m.group(1))
                edits = int(m.group(2)) if m.group(2) else 2
                return FuzzyQuery(term, max_edits=edits), toks
            if body.endswith("*") and "*" not in body[:-1] and "?" not in body:
                return PrefixQuery(_norm_term(body[:-1])), toks
            if "*" in body or "?" in body:
                return WildcardQuery(_norm_term(body, keep="*?")), toks
            terms, _, _ = analyze(body)
            if not terms:
                return None, toks
            if len(terms) == 1:
                return TermQuery(terms[0]), toks
            # multi-token word (e.g. "full-text") -> phrase, classic default
            return PhraseQuery(tuple(terms)), toks
        return None, toks


def _norm_term(s: str, keep: str = "") -> str:
    """Lowercase-normalize a term the way the analyzer would (single token).

    Wildcard/range endpoints are NOT analyzed in the classic parser, only
    lowercased (QueryParserBase ``lowercaseExpandedTerms`` behavior)."""
    if keep:
        return s.lower()
    terms, _, _ = analyze(s)
    return terms[0] if terms else s.lower()


def parse(s: str, default_field: str = "text", structured_fields: tuple[str, ...] = ("role", "tool", "conv_id")) -> Query:
    return QueryParser(default_field, structured_fields).parse(s)
