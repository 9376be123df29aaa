"""ComplexPhraseQueryParser — quoted phrases that may embed wildcards,
prefixes, fuzzy terms, ranges and boolean groups, compiled onto the span
algebra.

Reference: ``queryparser/complexPhrase/ComplexPhraseQueryParser.kt`` (parse
pass collects ComplexPhraseQuery placeholders; pass 2 re-parses each phrase
body with SCORING_BOOLEAN_REWRITE and ``ComplexPhraseQuery.rewrite`` converts
the clause list to SpanNear/SpanOr/SpanNot). Because our Query AST defers
multi-term expansion to the executor (``SpanMultiTermWrapper`` expands against
the term dictionary at search time, SpanMultiTermQueryWrapper.kt analog), the
two passes collapse into one eager compile:

* phrase contents parse clause-by-clause IN APPEARANCE ORDER (the reference
  walks ``BooleanQuery.clauses()`` which preserves insertion order);
* a single-clause phrase returns the plain query directly — TermQuery /
  multi-term with the SCORING_BOOLEAN rewrite / SynonymQuery — exactly the
  ``contents is TermQuery || MultiTermQuery || SynonymQuery`` early-out in
  ComplexPhraseQuery.rewrite (ComplexPhraseQueryParser.kt:158-161);
* multi-clause phrases become ``SpanNearQuery(clauses, slop, in_order)``;
* top-level MUST_NOT clauses use the reference's widen-and-subtract shape:
  ``SpanNot(SpanNear(positives, slop + numNegatives), SpanNear(all, slop))``
  (ComplexPhraseQueryParser.kt:204-223);
* parenthesised groups map through ``addComplexPhraseClause``: OR side ->
  SpanOr, NOT side -> SpanNot(SpanOr(ors), SpanOr(nots))
  (ComplexPhraseQueryParser.kt:234-268);
* a clause that can never match (e.g. a prefix with no expansions) becomes a
  dummy never-matching span term, like the reference's "Dummy clause because
  no terms found" SpanTermQuery — it keeps the SpanNear unsatisfiable instead
  of silently dropping the clause.

Fielded phrases (``role:"p* manager"``) compile against that field and are
wrapped in :class:`FieldedQuery`; :class:`ComplexPhraseSearcher` executes a
boolean tree whose clauses live on different per-field indexes
(``build_field_indexes`` doc-ID space).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, replace

from lucene_kmp_spark.analysis import analyze
from lucene_kmp_spark.queryparser.parser import QueryParser, _norm_term
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ColumnFilterQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SpanMultiTermWrapper,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    SynonymQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

# a term no analyzer can produce (analyzers never emit NUL) — the reference's
# "Dummy clause because no terms found - must match nothing" span term
_NO_MATCH = SpanTermQuery("\x00nomatch\x00")


@dataclass(frozen=True)
class FieldedQuery(Query):
    """A clause that must execute against a specific text field's index
    (the enclosing parser's non-default field case). Executed by
    ComplexPhraseSearcher; IndexSearcher itself is single-field."""

    field: str
    query: Query
    boost: float = 1.0


class ComplexPhraseParseError(ValueError):
    """ParseException analog (field nested in phrase, unbalanced quotes)."""


class ComplexPhraseQueryParser(QueryParser):
    """``ComplexPhraseQueryParser(default_field, text_fields=..., in_order=...)``.

    ``text_fields`` are additional per-field indexed columns (phrases and
    term-ish atoms on them compile to :class:`FieldedQuery`);
    ``structured_fields`` keep the classic parser's Catalyst-pushdown
    equality mapping. ``analyzer`` overrides the phrase-content analyzer
    (``(text) -> (terms, positions, length)``), e.g. a synonym analyzer.
    """

    def __init__(
        self,
        default_field: str = "text",
        structured_fields: tuple[str, ...] = (),
        text_fields: tuple[str, ...] = (),
        in_order: bool = True,
        analyzer=None,
        fuzzy_prefix_length: int = 0,
    ):
        super().__init__(default_field, structured_fields)
        self.text_fields = set(text_fields)
        self.in_order = in_order
        self.analyzer = analyzer
        # QueryParserBase.fuzzyPrefixLength (default 0; the reference test
        # harness runs with 1)
        self.fuzzy_prefix_length = fuzzy_prefix_length

    def set_in_order(self, in_order: bool) -> None:
        """setInOrder (ComplexPhraseQueryParser.kt:36-38)."""
        self.in_order = in_order

    # ------------------------------------------------------------ analysis
    def _analyze(self, text: str) -> tuple[list[str], list[int]]:
        if self.analyzer is not None:
            terms, positions, _ = self.analyzer(text)
            return list(terms), list(positions)
        terms, positions, _ = analyze(text)
        return terms, positions

    # ------------------------------------------------------------- parsing
    def _parse_atom(self, toks, depth):
        kind, val, boost = toks[0]
        if kind == "word" and val.endswith(":") and len(toks) > 1 and toks[1][0] == "phrase":
            # fielded phrase: the lexer splits `f:"..."` into word `f:` + phrase
            field = val[:-1]
            body, slop = toks[1][1]
            q = self._compile_phrase(field, body, slop)
            if field != self.default_field:
                q = FieldedQuery(field, q)
            return q, toks[2:]
        if kind == "phrase":
            body, slop = val
            return self._compile_phrase(self.default_field, body, slop), toks[1:]
        if kind == "word" and ":" in val:
            field, body = val.split(":", 1)
            if field in self.text_fields and field != self.default_field:
                sub, rest = super()._parse_atom([("word", body, boost)] + list(toks[1:]), depth)
                return (FieldedQuery(field, sub) if sub is not None else None), rest
        return super()._parse_atom(toks, depth)

    # ---------------------------------------------------- phrase compiling
    def _compile_phrase(self, field: str, body: str, slop: int) -> Query:
        """getFieldQuery -> parsePhraseElements -> ComplexPhraseQuery.rewrite,
        collapsed: clause list in appearance order -> span tree."""
        if '"' in body:
            raise ComplexPhraseParseError(f"unbalanced quote in phrase: {body!r}")
        toks = self._lex(body)
        clauses = self._phrase_clauses(field, toks)
        if not clauses:
            return MatchAllDocsQuery()  # empty phrase analyzes to nothing
        if len(clauses) == 1 and clauses[0][0] != "-":
            node = clauses[0][1]
            # the TermQuery / MultiTermQuery / SynonymQuery early-out: plain
            # queries score as themselves, not as spans
            # (ComplexPhraseQueryParser.kt:158-161)
            if isinstance(node, (TermQuery, SynonymQuery)):
                return node
            if isinstance(node, (PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery)):
                # pass 2 parses with SCORING_BOOLEAN_REWRITE in force
                return replace(node, rewrite_method="scoring_boolean")
            if isinstance(node, FuzzyQuery):
                return node  # FuzzyQuery already scores as a boosted disjunction
        spans = [self._to_span(occur_node[1]) for occur_node in clauses]
        num_neg = sum(1 for o, _n in clauses if o == "-")
        if num_neg == 0:
            return SpanNearQuery(tuple(spans), slop=slop, in_order=self.in_order)
        positives = [s for (o, _n), s in zip(clauses, spans) if o != "-"]
        if not positives:
            return SpanOrQuery(())  # purely negative phrase matches nothing
        include = (
            positives[0]
            if len(positives) == 1
            else SpanNearQuery(tuple(positives), slop=slop + num_neg, in_order=self.in_order)
        )
        exclude = SpanNearQuery(tuple(spans), slop=slop, in_order=self.in_order)
        return SpanNotQuery(include, exclude)

    def _phrase_clauses(self, field: str, toks) -> list[tuple[str, Query]]:
        """Top-level phrase elements as (occur, node) in appearance order.
        AND/OR connectives between top-level elements are inert — the
        reference's pass-2 BooleanQuery flattens them into the same ordered
        clause list that rewrite() walks."""
        out: list[tuple[str, Query]] = []
        occur = ""
        i = 0
        toks = list(toks)
        while i < len(toks):
            kind, val, _boost = toks[i]
            if kind in ("and", "or"):
                i += 1
                continue
            if kind == "plus":
                occur = "+"
                i += 1
                continue
            if kind in ("minus", "not"):
                occur = "-"
                i += 1
                continue
            if kind == "lparen":
                group, i = self._collect_group(toks, i + 1)
                node = self._group_to_span(field, group)
                out.append((occur, node if node is not None else _NO_MATCH))
                occur = ""
                continue
            if kind == "phrase":
                raise ComplexPhraseParseError("nested quotes inside a complex phrase")
            if kind == "range":
                lo, hi, inc_lo, inc_hi = val
                lo = None if lo == "*" else lo.lower()
                hi = None if hi == "*" else hi.lower()
                out.append((occur, TermRangeQuery(lo, hi, inc_lo, inc_hi)))
                occur = ""
                i += 1
                continue
            if kind == "regex":
                out.append((occur, RegexpQuery(val)))
                occur = ""
                i += 1
                continue
            if kind == "word":
                out.append((occur, self._word_node(field, val)))
                occur = ""
                i += 1
                continue
            i += 1
        return out

    def _collect_group(self, toks, i: int):
        """Tokens inside a balanced paren group, returning (group, next_i)."""
        depth = 1
        group = []
        while i < len(toks):
            kind = toks[i][0]
            if kind == "lparen":
                depth += 1
            elif kind == "rparen":
                depth -= 1
                if depth == 0:
                    return group, i + 1
            group.append(toks[i])
            i += 1
        return group, i

    def _word_node(self, field: str, body: str) -> Query:
        """One whitespace word inside a phrase -> plain/multiterm/synonym
        query node (the same atoms QueryParserBase produces in pass 2)."""
        if ":" in body:
            maybe_field = body.split(":", 1)[0]
            if (
                maybe_field in self.structured_fields
                or maybe_field in self.text_fields
                or maybe_field == self.default_field
            ):
                # checkPhraseClauseIsForSameField (ComplexPhraseQueryParser.kt:88-92)
                raise ComplexPhraseParseError(
                    f'cannot have clause for field "{maybe_field}" nested in a'
                    f' phrase for field "{field}"'
                )
        m = re.fullmatch(r"(.+?)~(\d?)", body)
        if m:
            term = _norm_term(m.group(1))
            edits = int(m.group(2)) if m.group(2) else 2
            return FuzzyQuery(term, max_edits=edits, prefix_length=self.fuzzy_prefix_length)
        if body.endswith("*") and "*" not in body[:-1] and "?" not in body:
            return PrefixQuery(_norm_term(body[:-1]))
        if "*" in body or "?" in body:
            return WildcardQuery(_norm_term(body, keep="*?"))
        terms, positions = self._analyze(body)
        if not terms:
            return SpanOrQuery(())  # analyzes to nothing -> never matches
        if len(terms) == 1:
            return TermQuery(terms[0])
        if len(set(positions)) == 1:
            # synonym overlap: one position, several terms -> SynonymQuery
            # (QueryBuilder.analyzeBoolean via the graph path)
            return SynonymQuery(tuple(terms))
        # multi-position single word (e.g. decompounding): ordered exact near
        return SpanNearQuery(tuple(SpanTermQuery(t) for t in terms), slop=0, in_order=True)

    def _group_to_span(self, field: str, toks) -> Query | None:
        """addComplexPhraseClause (ComplexPhraseQueryParser.kt:234-268):
        group members split into OR/NOT sides; nested groups recurse."""
        ors: list[Query] = []
        nots: list[Query] = []
        occur = ""
        i = 0
        while i < len(toks):
            kind, val, _boost = toks[i]
            if kind in ("and", "or"):
                i += 1
                continue
            if kind == "plus":
                occur = "+"
                i += 1
                continue
            if kind in ("minus", "not"):
                occur = "-"
                i += 1
                continue
            target = nots if occur == "-" else ors
            if kind == "lparen":
                group, i = self._collect_group(toks, i + 1)
                nested = self._group_to_span(field, group)
                if nested is not None:
                    target.append(nested)
                occur = ""
                continue
            if kind == "range":
                lo, hi, inc_lo, inc_hi = val
                lo = None if lo == "*" else lo.lower()
                hi = None if hi == "*" else hi.lower()
                target.append(self._to_span(TermRangeQuery(lo, hi, inc_lo, inc_hi)))
                occur = ""
                i += 1
                continue
            if kind == "word":
                target.append(self._to_span(self._word_node(field, val)))
                occur = ""
                i += 1
                continue
            i += 1
        if not ors:
            return None
        soq = ors[0] if len(ors) == 1 else SpanOrQuery(tuple(ors))
        if not nots:
            return soq
        snqs = nots[0] if len(nots) == 1 else SpanOrQuery(tuple(nots))
        return SpanNotQuery(soq, snqs)

    def _to_span(self, node: Query) -> Query:
        """Convert a phrase-element node to its span clause."""
        if isinstance(node, TermQuery):
            return SpanTermQuery(node.term)
        if isinstance(node, SynonymQuery):
            return SpanOrQuery(tuple(SpanTermQuery(t) for t in node.terms))
        if isinstance(node, (PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery, FuzzyQuery)):
            return SpanMultiTermWrapper(node)
        # already a span node (group result / dummy / nested near)
        return node


class ComplexPhraseSearcher:
    """Execute a parsed tree whose clauses may target different per-field
    indexes (``build_field_indexes`` searchers share one doc-ID space).

    Single-field trees delegate wholesale to that field's IndexSearcher;
    cross-field BooleanQuery combines per-clause score frames with joins —
    MUST = inner join (scores summed), SHOULD = union-aggregate, MUST_NOT =
    anti join, matching ``IndexSearcher._exec_boolean`` combination
    semantics one level up.
    """

    def __init__(self, searchers: dict, default_field: str = "text"):
        self.searchers = searchers
        self.default_field = default_field

    def _default(self):
        return self.searchers[self.default_field]

    def execute(self, q: Query):
        from pyspark.sql import functions as F

        if isinstance(q, FieldedQuery):
            return self.searchers[q.field].execute(q.query)
        if isinstance(q, BooleanQuery) and any(
            isinstance(c.query, FieldedQuery) for c in q.clauses
        ):
            from lucene_kmp_spark.search.query import Occur

            must = [c.query for c in q.clauses if c.occur in (Occur.MUST, Occur.FILTER)]
            should = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
            must_not = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]
            acc = None
            for sub in must:
                sdf = self.execute(sub).select("doc_id", "score")
                acc = (
                    sdf
                    if acc is None
                    else acc.join(sdf.withColumnRenamed("score", "_s"), "doc_id").select(
                        "doc_id", (F.col("score") + F.col("_s")).alias("score")
                    )
                )
            if should:
                sh = None
                for sub in should:
                    sdf = self.execute(sub).select("doc_id", "score")
                    sh = sdf if sh is None else sh.unionByName(sdf)
                sh = sh.groupBy("doc_id").agg(F.sum("score").alias("_sh"))
                if acc is None:
                    acc = sh.withColumnRenamed("_sh", "score")
                else:
                    acc = acc.join(sh, "doc_id", "left").select(
                        "doc_id",
                        (F.col("score") + F.coalesce(F.col("_sh"), F.lit(0.0))).alias("score"),
                    )
            if acc is None:
                return self._default().index.spark.createDataFrame(
                    [], schema="doc_id long, score double"
                )
            for sub in must_not:
                acc = acc.join(
                    self.execute(sub).select("doc_id"), "doc_id", "left_anti"
                )
            return acc
        return self._default().execute(q)

    def top_k(self, q: Query, k: int = 10):
        from pyspark.sql import functions as F

        scored = self.execute(q).select(
            "doc_id", F.col("score").cast("float").alias("score")
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def parse_complex(
    s: str,
    default_field: str = "text",
    structured_fields: tuple[str, ...] = ("role", "tool", "conv_id"),
    text_fields: tuple[str, ...] = (),
    in_order: bool = True,
    analyzer=None,
) -> Query:
    return ComplexPhraseQueryParser(
        default_field, structured_fields, text_fields, in_order, analyzer
    ).parse(s)
