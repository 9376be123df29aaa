"""Query AST ("logical plan") + rewrite rules.

Mirrors the reference's Query tree and ``Query.rewrite`` fixpoint
(``search/IndexSearcher.kt:699-712``; rules in ``search/BooleanQuery.kt:170-470``).
Occur flags per ``search/BooleanClause.kt``: MUST (AND, scores), FILTER (AND,
no score), SHOULD (OR), MUST_NOT (ANDNOT).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum


class Occur(Enum):
    MUST = "MUST"
    FILTER = "FILTER"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"


class Query:
    boost: float = 1.0

    def rewrite(self) -> "Query":
        return self


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0

    def rewrite(self) -> Query:
        if len(self.terms) == 1:  # PhraseQuery.kt rewrite: 1-term phrase -> TermQuery
            return TermQuery(self.terms[0], boost=self.boost)
        return self


@dataclass(frozen=True)
class NGramPhraseQuery(Query):
    """Phrase over n-gram analyzed terms (search/NGramPhraseQuery.kt:27).

    In the reference this is a PhraseQuery subclass whose rewrite drops
    redundant overlapping grams purely to reduce the number of posting
    iterators — match set and scores are defined to be those of the full
    phrase. Our rewrite delegates to the full PhraseQuery: the IO-reduction
    role of the gram-dropping optimization is already played by the single
    term-pruned positions scan (executor._pivoted_positions)."""

    n: int
    terms: tuple[str, ...]
    boost: float = 1.0

    def rewrite(self) -> Query:
        return PhraseQuery(self.terms, slop=0, boost=self.boost)


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    boost: float = 1.0
    # MultiTermQuery.RewriteMethod (MultiTermQuery.kt:247 CONSTANT_SCORE_BLENDED
    # default; ScoringRewrite.kt:152 SCORING_BOOLEAN; TopTermsRewrite.kt;
    # DocValuesRewriteMethod.kt):
    # "constant_score" | "scoring_boolean" | "constant_score_boolean" |
    # "top_terms_scoring_boolean" | "top_terms_blended_freqs" |
    # "top_terms_boost" | "doc_values" (needs term_vectors=True at build)
    rewrite_method: str = "constant_score"
    rewrite_size: int = 50  # top-terms PQ size (capped at MAX_CLAUSE_COUNT)


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # `*` any run, `?` single char (WildcardQuery.kt:24)
    boost: float = 1.0
    rewrite_method: str = "constant_score"
    rewrite_size: int = 50


@dataclass(frozen=True)
class RegexpQuery(Query):
    """Lucene-syntax regexp (RegExp.kt, NOT Java regex): `|` union, `&`
    intersection, `<n-m>` numeric interval, `@` anystring, `#` empty,
    `"..."` quoted literal, `~` complement only with DEPRECATED_COMPLEMENT.
    syntax_flags defaults to RegExp.ALL like RegexpQuery.kt."""

    regexp: str
    boost: float = 1.0
    syntax_flags: int = 0xFF   # regexp_util.ALL
    match_flags: int = 0
    rewrite_method: str = "constant_score"
    rewrite_size: int = 50


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2           # FuzzyQuery.kt:159-162 defaults
    prefix_length: int = 0
    max_expansions: int = 50
    transpositions: bool = True  # Damerau (OSA) distance, the reference default
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0
    rewrite_method: str = "constant_score"
    rewrite_size: int = 50


@dataclass(frozen=True)
class TermInSetQuery(Query):
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Several terms scored as if one term: df = max, freq summed
    (search/SynonymQuery.kt:40)."""
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class IndexOrDocValuesQuery(Query):
    """search/IndexOrDocValuesQuery.kt: wraps two queries the CALLER
    guarantees match the same docs — ``index_query`` with a good iterator
    (postings/points form, costly to initialize) and ``dv_query`` cheap to
    initialize but linear to verify per candidate (doc-values form).

    Reference semantics preserved: standalone / bulk scoring always runs
    the index form (``bulkScorer()`` override); inside a conjunction the dv
    form is chosen exactly when ``leadCost < indexCost >>> 3`` (the 8x dv
    penalty, IndexOrDocValuesQuery.kt:131-140); ``cost()`` reports the
    index form's cost. In this engine the two forms surface as different
    SCANS in the plan — a postings-driven doc-set vs a docs-table column
    predicate — while Catalyst/AQE still owns the physical join strategy
    (the part of the reference's trade-off Spark already does)."""

    index_query: "Query"
    dv_query: "Query"
    boost: float = 1.0

    def rewrite(self) -> "Query":
        iq = self.index_query.rewrite()
        dq = self.dv_query.rewrite()
        if isinstance(iq, MatchNoDocsQuery):
            return MatchNoDocsQuery()
        if iq is self.index_query and dq is self.dv_query:
            return self
        return IndexOrDocValuesQuery(iq, dq, self.boost)


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(clauses) + tie_breaker * sum(others)
    (search/DisjunctionMaxQuery.kt:25)."""
    queries: tuple["Query", ...]
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with term alternatives per position (search/MultiPhraseQuery.kt:31).

    ``slots`` is one tuple of alternative terms per phrase position; a doc
    matches when some choice of one term per slot occurs at consecutive
    positions (within ``slop`` for sloppy matching). Scored like a phrase
    whose idf is the sum over ALL alternative terms (MultiPhraseQuery
    createWeight gathers every term's statistics)."""

    slots: tuple[tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0

    def rewrite(self) -> Query:
        if len(self.slots) == 1 and len(self.slots[0]) == 1:
            return TermQuery(self.slots[0][0], boost=self.boost)
        if all(len(s) == 1 for s in self.slots):
            return PhraseQuery(tuple(s[0] for s in self.slots), slop=self.slop, boost=self.boost)
        return self


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Position-constrained conjunction (queries/spans/SpanNearQuery.kt):
    all clauses occur with total gap <= slop, optionally in order
    (NearSpansOrdered.kt). Scored like a sloppy phrase: per-match weight
    1/(1 + matchWidth), idf summed over clause terms.

    ``terms`` entries are bare strings (term clauses — fast path) or nested
    span queries (SpanTermQuery/SpanOrQuery/SpanNotQuery/SpanFirstQuery/
    SpanNearQuery — the composable span algebra)."""

    terms: tuple  # str | span Query per entry
    slop: int = 0
    in_order: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class SpanTermQuery(Query):
    """Leaf span: every occurrence of the term is a (p, p+1) span
    (queries/spans/SpanTermQuery.kt)."""

    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """Union of sub-spans (queries/spans/SpanOrQuery.kt)."""

    clauses: tuple["Query", ...]
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """Include-spans that do not overlap any exclude-span, with optional
    pre/post exclusion context (queries/spans/SpanNotQuery.kt)."""

    include: "Query"
    exclude: "Query"
    pre: int = 0
    post: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """Match-spans ending within the first ``end`` positions
    (queries/spans/SpanFirstQuery.kt)."""

    match: "Query"
    end: int
    boost: float = 1.0


@dataclass(frozen=True)
class SpanContainingQuery(Query):
    """Spans from ``big`` that contain at least one span from ``little``
    (queries/spans/SpanContainingQuery.kt); scoring stats draw from BOTH
    sides' terms (getTermStates(bigWeight, littleWeight))."""

    big: "Query"
    little: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class SpanWithinQuery(Query):
    """Spans from ``little`` that lie within at least one span from ``big``
    (queries/spans/SpanWithinQuery.kt)."""

    big: "Query"
    little: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class SpanPositionRangeQuery(Query):
    """Match-spans with start >= ``start`` and end <= ``end``
    (queries/spans/SpanPositionRangeQuery.kt acceptPosition); SpanFirstQuery
    is the start=0 special case."""

    match: "Query"
    start: int
    end: int
    boost: float = 1.0


@dataclass(frozen=True)
class FieldMaskingSpanQuery(Query):
    """Span clause whose positions come from another field's postings but
    which composes (and reports its field) as if it were on the enclosing
    query's field (queries/spans/FieldMaskingSpanQuery.kt) — the classic
    parallel-tokenstream trick: fields analyzed in lockstep (same positions,
    different terms) can be mixed inside one SpanNear. ``field`` names the
    REAL field the inner clause reads; the enclosing tree supplies the
    masked-as field."""

    match: "Query"
    field: str
    boost: float = 1.0


@dataclass(frozen=True)
class SpanMultiTermWrapper(Query):
    """Wrap a multi-term query (prefix/wildcard/regexp/range) as a span
    clause (queries/spans/SpanMultiTermQueryWrapper.kt): rewrites to a
    SpanOr over the expanded terms' single-term spans."""

    wrapped: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class SortField:
    """Sort key for ``search_sorted`` (search/SortField.kt:59-113 types +
    missing-value policy; SortedNumericSortField/SortedSetSortField
    selectors). ``column`` names a stored/doc-value column; ``expr`` is a SQL
    expression instead (the CUSTOM sort type — Catalyst evaluates it);
    ``selector`` picks min/max from a multi-valued (array) column
    (SortedNumericSelector.Type MIN/MAX) or the lower/upper middle value
    ("middle_min"/"middle_max" — SortedSetSelector.Type MIDDLE_MIN/
    MIDDLE_MAX over the ascending value list); ``missing_last`` forces docs with
    null keys to the end regardless of direction (the missingValue
    first/last policy — arbitrary sentinel missing values reduce to a
    COALESCE in ``expr``)."""

    column: str | None = None
    ascending: bool = True
    missing_last: bool | None = None
    selector: str | None = None  # None | "min" | "max" | "middle_min" | "middle_max"
    expr: str | None = None
    name: str | None = None  # output column alias (required for expr sorts)

    @staticmethod
    def feature(column: str) -> "SortField":
        """FeatureSortField (document/FeatureSortField.kt): sort by a
        FeatureField value DESCENDING; docs without the feature sort as 0
        (the reference's FeatureComparator leaves values[slot] = 0 when the
        feature postings skip the doc). Features live in stored numeric
        columns here, so the comparator is a COALESCE expression sort."""
        return SortField(expr=f"coalesce({column}, 0.0)", ascending=False,
                         name=f"feature_{column}")


@dataclass(frozen=True)
class KnnFloatVectorQuery(Query):
    """Exact k-nearest-neighbors over a float-vector column
    (``search/KnnFloatVectorQuery.kt``; score mappings
    ``index/VectorSimilarityFunction.kt:15-73``). ``filter`` (a Query) or
    ``filter_predicate`` (a pushdown-able SQL condition on the vector table)
    restricts candidates BEFORE top-k selection — the reference's pre-filter
    semantics (``AbstractKnnVectorQuery.kt`` rewrite). Executed as one
    columnar scan + TakeOrdered (see ``search/knn.py``); approximate probes
    are the pipeline LSH/IVF tiers."""

    vector: tuple[float, ...]
    k: int = 10
    fn: str = "cosine"  # euclidean | dot_product | cosine | maximum_inner_product
    filter: "Query | None" = None
    filter_predicate: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class KnnByteVectorQuery(Query):
    """Exact k-nearest-neighbors over a signed-byte vector column
    (``search/KnnByteVectorQuery.kt``; byte score overloads
    ``index/VectorSimilarityFunction.kt:22-71`` — notably dot_product =
    0.5 + v·q/(dim·2¹⁵), ``util/VectorUtil.kt:281-285``). Same pre-filter
    semantics and plan shape as :class:`KnnFloatVectorQuery`."""

    vector: tuple[int, ...]
    k: int = 10
    fn: str = "dot_product"
    filter: "Query | None" = None
    filter_predicate: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class VectorSimilarityQuery(Query):
    """ALL docs above a similarity threshold —
    Float/ByteVectorSimilarityQuery (``search/AbstractVectorSimilarityQuery.kt``,
    ``FloatVectorSimilarityQuery.kt``, ``ByteVectorSimilarityQuery.kt``):
    score = boost · similarity for every doc with similarity ≥
    ``result_similarity``; the filter restricts candidates first.
    ``traversal_similarity`` (≤ result_similarity, enforced) only bounds the
    reference's HNSW exploration — the exact scan's result set is
    threshold-defined, so it is accepted and ignored."""

    vector: tuple[float, ...]
    result_similarity: float = 0.5
    traversal_similarity: float | None = None
    fn: str = "cosine"
    filter: "Query | None" = None
    filter_predicate: str | None = None
    boost: float = 1.0
    byte_vectors: bool = False


@dataclass(frozen=True)
class SeededKnnVectorQuery(Query):
    """Seeded approximate kNN (``search/SeededKnnVectorQuery.kt``, the LADR
    pattern): a cheap ``seed`` Query's matches pick the entry points of the
    approximate search. The reference seeds the HNSW walk; the distributed
    analog probes exactly the IVF lists containing seed docs
    (``search/knn.py seeded_ivf_topk``). ``centroids`` are the coarse
    quantizer; empty seed set falls back to centroid routing with
    ``fallback_n_probe`` lists (the reference's "format is free to ignore
    the seed")."""

    vector: tuple[float, ...]
    seed: "Query"
    centroids: tuple = ()
    k: int = 10
    fn: str = "cosine"
    fallback_n_probe: int = 1
    boost: float = 1.0


@dataclass(frozen=True)
class IndriAndQuery(Query):
    """Indri-style AND (search/IndriAndQuery.kt + IndriAndScorer.kt:21-46):
    matches the UNION of clause docs; per doc,
    score = Σ w_i·s_i / Σ w_i where s_i is the clause's IndriDirichlet
    log-probability when the term occurs in the doc, else its smoothing
    (background) score ln(mu·p/(dl+mu)) — absence is evidence, not a veto.
    Scores are negative log-probs; higher (closer to 0) is better.
    ``weights`` default to 1.0 per clause."""

    terms: tuple  # term clauses
    weights: tuple = ()
    mu: float = 2000.0
    boost: float = 1.0


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """Docs where a stored column has a value (search/FieldExistsQuery.kt:29).
    Constant score = boost."""

    column: str
    boost: float = 1.0


@dataclass(frozen=True)
class FeatureQuery(Query):
    """Static ranking signal from a stored numeric column
    (document/FeatureQuery.kt:24, FeatureField.kt score functions):

    * ``log``:       boost * log(scale + S)
    * ``saturation``: boost * S / (S + pivot)
    * ``sigmoid``:   boost * S^exp / (S^exp + pivot^exp)
    """

    column: str
    function: str = "saturation"  # log | saturation | sigmoid
    pivot: float = 1.0
    scale: float = 1.0
    exp: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class ColumnFilterQuery(Query):
    """Structured predicate on a stored column (role='user', ts ranges...).

    This is where Catalyst takes over: the predicate is pushed to the docs
    scan (Parquet min/max pruning replaces the reference's BKD points,
    search/PointRangeQuery.kt:40). Never scores (constant 0 unless wrapped)."""
    sql_predicate: str
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionScoreQuery(Query):
    """Score-by-expression wrapper (upstream Lucene
    ``queries/function/FunctionScoreQuery``; the reference repo does not port
    the function module — same situation as grouping/mlt/suggest, we
    implement the published surface so a reference user keeps their
    workflow).

    Matches exactly the wrapped query's docs; the returned score is ENTIRELY
    the value of ``source`` — the DoubleValuesSource analog, expressed as a
    Catalyst SQL expression over the index's stored-field columns plus the
    pseudo-column ``_score`` (the wrapped query's score,
    DoubleValuesSource.fromScorer). Whole-stage codegen, no UDF: the
    expression runs JVM-side fused with the scoring plan.

    ``boost_by_value`` mirrors FunctionScoreQuery.boostByValue (score =
    query score * feature value)."""

    query: Query
    source: str
    boost: float = 1.0

    @staticmethod
    def boost_by_value(query: Query, feature_expr: str, boost: float = 1.0) -> "FunctionScoreQuery":
        return FunctionScoreQuery(query, f"_score * ({feature_expr})", boost)

    def rewrite(self) -> "Query":
        inner = rewrite_query(self.query)
        if inner is self.query:
            return self
        return FunctionScoreQuery(inner, self.source, self.boost)


@dataclass(frozen=True)
class BoostByQueryScoreQuery(Query):
    """FunctionScoreQuery.boostByQuery: the wrapped query's score is
    multiplied by ``value`` for docs that ALSO match ``boost_match``
    (which contributes no matches of its own — a pure conditional
    multiplier, the QueryValueSource conditional form)."""

    query: Query
    boost_match: Query
    value: float
    boost: float = 1.0

    def rewrite(self) -> "Query":
        inner = rewrite_query(self.query)
        bm = rewrite_query(self.boost_match)
        if inner is self.query and bm is self.boost_match:
            return self
        return BoostByQueryScoreQuery(inner, bm, self.value, self.boost)


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


@dataclass(frozen=True)
class SortedNumericRangeQuery(Query):
    """Multi-valued numeric doc-values range
    (``document/SortedNumericDocValuesRangeQuery.kt``): matches when ANY of
    the doc's values in the array column falls in [lower, upper] (None = open
    bound). Rewrites to a Catalyst ``exists()`` lambda over the array —
    whole-stage codegen, no Python. The reference iterates the docvalues the
    same way when the points index can't serve (IndexOrDocValuesQuery's
    docvalues arm)."""

    column: str
    lower: float | int | None = None
    upper: float | int | None = None
    boost: float = 1.0

    def rewrite(self) -> Query:
        conds = []
        if self.lower is not None:
            conds.append(f"v >= {_sql_lit(self.lower)}")
        if self.upper is not None:
            conds.append(f"v <= {_sql_lit(self.upper)}")
        body = " AND ".join(conds) or "true"
        return ColumnFilterQuery(f"exists({self.column}, v -> {body})", boost=self.boost)


@dataclass(frozen=True)
class SortedNumericSetQuery(Query):
    """Multi-valued numeric doc-values set membership
    (``document/SortedNumericDocValuesSetQuery.kt``): ANY value in the set.
    Rewrites to ``arrays_overlap`` — one codegen'd intersection test."""

    column: str
    values: tuple
    boost: float = 1.0

    def rewrite(self) -> Query:
        vals = ", ".join(_sql_lit(v) for v in self.values)
        return ColumnFilterQuery(
            f"arrays_overlap({self.column}, array({vals}))", boost=self.boost
        )


@dataclass(frozen=True)
class SortedSetRangeQuery(Query):
    """Multi-valued STRING doc-values range
    (``document/SortedSetDocValuesRangeQuery.kt``): ANY of the doc's terms in
    the array column within the [lower, upper] bytes range (string order)."""

    column: str
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0

    def rewrite(self) -> Query:
        conds = []
        if self.lower is not None:
            conds.append(f"v >{'=' if self.include_lower else ''} {_sql_lit(self.lower)}")
        if self.upper is not None:
            conds.append(f"v <{'=' if self.include_upper else ''} {_sql_lit(self.upper)}")
        body = " AND ".join(conds) or "true"
        return ColumnFilterQuery(f"exists({self.column}, v -> {body})", boost=self.boost)


@dataclass(frozen=True)
class RangeFieldQuery(Query):
    """Range-field relation query (``document/IntRange.kt`` /
    ``FloatRange.kt`` / ``DoubleRange.kt`` / ``LongRange.kt`` +
    ``IntRangeSlowRangeQuery.kt`` / ``BinaryRangeFieldRangeQuery.kt``): each
    document stores an interval per dimension — here a (min_col, max_col)
    column pair — and the query interval relates to it by one of Lucene's
    ``RangeFieldQuery.QueryType`` relations:

    * ``intersects`` — doc.min <= q.upper AND doc.max >= q.lower (per dim)
    * ``within``     — doc interval inside the query interval (per dim)
    * ``contains``   — doc interval contains the query interval (per dim)
    * ``crosses``    — intersects AND NOT (within OR contains), evaluated
      across ALL dims jointly (the reference's BKD crossing test)

    Spark-first execution: the relation compiles to pure Catalyst predicates
    over the two columns, so Parquet min/max statistics prune files and
    row-groups exactly where the reference's BKD inner nodes prune cells.
    Docs with NULL bounds never match (missing range field). Constant score
    ``boost`` (the reference wraps a ConstantScoreWeight).

    ``dims``: 1-D ctor sugar — pass ``min_col/max_col/lower/upper`` scalars;
    for N dims pass tuples of equal length to ``dims``/``lower``/``upper``.
    """

    min_col: str | None = None
    max_col: str | None = None
    lower: float | tuple = 0.0
    upper: float | tuple = 0.0
    relation: str = "intersects"
    dims: tuple[tuple[str, str], ...] | None = None
    boost: float = 1.0

    def __post_init__(self):
        if self.relation not in ("intersects", "within", "contains", "crosses"):
            raise ValueError(f"unknown relation {self.relation!r}")
        if self.dims is None and (self.min_col is None or self.max_col is None):
            raise ValueError("pass min_col/max_col (1-D) or dims")

    def dimensions(self) -> list[tuple[str, str, float, float]]:
        """Normalized per-dim (min_col, max_col, lower, upper)."""
        if self.dims is None:
            return [(self.min_col, self.max_col, float(self.lower), float(self.upper))]
        lows = self.lower if isinstance(self.lower, tuple) else (self.lower,) * len(self.dims)
        ups = self.upper if isinstance(self.upper, tuple) else (self.upper,) * len(self.dims)
        if not (len(self.dims) == len(lows) == len(ups)):
            raise ValueError("dims/lower/upper length mismatch")
        return [(mn, mx, float(lo), float(up)) for (mn, mx), lo, up in zip(self.dims, lows, ups)]


@dataclass(frozen=True)
class IndexSortRangeQuery(Query):
    """Numeric range exploiting the index sort
    (``search/IndexSortSortedNumericDocValuesRangeQuery.kt``): when the
    query column is the PRIMARY index-sort field (ascending), the matching
    docs are one contiguous docID interval — the reference binary-searches
    the sort to find it and iterates a BoundedDocIdSetIterator instead of
    checking doc values per doc. The Spark analog resolves the interval with
    one tiny two-value aggregate (the binary-search step) and matches on a
    constant-folded ``doc_id BETWEEN`` predicate, which Parquet row-group
    stats on the docID-sorted tables prune directly. When the sort doesn't
    apply, delegates to ``fallback`` (the reference requires an equivalent
    fallback query; ours defaults to the plain column predicate —
    ``ColumnFilterQuery``'s Catalyst path). Matches score ``boost`` (the
    reference wraps the fallback's ConstantScoreWeight)."""

    column: str
    lower: float | None = None
    upper: float | None = None
    fallback: "Query | None" = None
    boost: float = 1.0


@dataclass(frozen=True)
class CombinedFieldQuery(Query):
    """BM25F-style cross-field scoring (search/CombinedFieldQuery.kt:57 +
    MultiNormsLeafSimScorer): the fields are treated as ONE synthetic field —
    per doc, freq = Σ_f weight_f·tf_f and length = Σ_f weight_f·dl_f;
    idf uses df = max over fields (merged pseudo term statistics), avgdl uses
    the weighted sum of per-field sumTotalTermFreq. Executed by
    ``search.multifield.MultiFieldSearcher``."""

    terms: tuple[str, ...]
    field_weights: tuple[tuple[str, float], ...]  # ((field, weight), ...)
    boost: float = 1.0


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """One term across fields with blended statistics
    (search/BlendedTermQuery.kt:30): every per-field TermQuery is scored with
    df/ttf lifted to the max across the fields, then combined with a
    DisjunctionMax (tie_breaker=0.01, the reference's default rewrite).
    Executed by ``search.multifield.MultiFieldSearcher``."""

    term: str
    fields: tuple[str, ...]
    tie_breaker: float = 0.01
    boost: float = 1.0


@dataclass(frozen=True)
class LatLonBoxQuery(Query):
    """Points within a lat/lon rectangle (``LatLonPoint.newBoxQuery``,
    document/LatLonPoint.kt:210-276): bounds are quantized with ceil(min)/
    floor(max) onto the 32-bit grid and compared as encoded ints; a box
    crossing the dateline (max_lon < min_lon) becomes the OR of the two
    open-ended halves. Constant score ``boost``. The encoded comparisons are
    pure Catalyst predicates -> Parquet min/max pruning is the BKD analog."""

    lat_col: str
    lon_col: str
    min_lat: float
    max_lat: float
    min_lon: float
    max_lon: float
    boost: float = 1.0


@dataclass(frozen=True)
class LatLonDistanceQuery(Query):
    """Points within ``radius_meters`` of a center
    (``LatLonPoint.newDistanceQuery`` -> LatLonPointDistanceQuery.kt):
    haversine over the DECODED quantized point ``<=`` radius, with a
    bounding-box prefilter standing in for the reference's BKD cell
    relate(). Constant score ``boost``."""

    lat_col: str
    lon_col: str
    lat: float
    lon: float
    radius_meters: float
    boost: float = 1.0


@dataclass(frozen=True)
class LatLonPolygonQuery(Query):
    """Points inside any of the polygons (``LatLonPoint.newPolygonQuery`` ->
    Polygon2D pnpoly crossing test, on-edge contained, holes subtracted).
    Executed as a bbox Catalyst prefilter + Arrow-vectorized crossing test
    over the survivors (search/geo.py polygon_contains). Constant score."""

    lat_col: str
    lon_col: str
    polygons: tuple  # tuple[GeoPolygon, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class LatLonDistanceFeatureQuery(Query):
    """Proximity boosting (``document/LatLonPointDistanceFeatureQuery.kt``):
    matches every doc with a point; score = boost * pivot / (pivot +
    haversine_meters(doc, origin))."""

    lat_col: str
    lon_col: str
    lat: float
    lon: float
    pivot_meters: float
    boost: float = 1.0


@dataclass(frozen=True)
class LongDistanceFeatureQuery(Query):
    """Numeric proximity boosting (``document/LongDistanceFeatureQuery.kt``,
    the LongField.newDistanceFeatureQuery path — recency boosting on
    timestamps is the canonical use): matches every doc with a value;
    score = boost * pivot / (pivot + |value - origin|)."""

    field: str
    origin: int
    pivot: int
    boost: float = 1.0

    def __post_init__(self):
        if self.pivot <= 0:
            raise ValueError(f"pivotDistance must be > 0, got {self.pivot}")


@dataclass(frozen=True)
class XYBoxQuery(Query):
    """Cartesian points within a rectangle (``document/XYPointField.kt``
    box queries over ``geo/XYRectangle.kt``): coordinates quantize to
    float32 (XYEncodingUtils.encode = sortable float bits, so float
    comparison == encoded comparison); bounds compare inclusively."""

    x_col: str
    y_col: str
    min_x: float
    max_x: float
    min_y: float
    max_y: float
    boost: float = 1.0


@dataclass(frozen=True)
class XYDistanceQuery(Query):
    """Cartesian points within ``radius`` of (x, y) (``geo/XYCircle.kt`` +
    Circle2D.CartesianDistance: diffX² + diffY² <= radius² in doubles over
    the float32-quantized point)."""

    x_col: str
    y_col: str
    x: float
    y: float
    radius: float
    boost: float = 1.0


@dataclass(frozen=True)
class XYPolygonQuery(Query):
    """Cartesian points inside any polygon (``geo/XYPolygon.kt`` — same
    pnpoly crossing semantics as the lat/lon variant over float32-quantized
    coordinates)."""

    x_col: str
    y_col: str
    polygons: tuple  # tuple[XYPolygon, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class InetAddressRangeQuery(Query):
    """Inclusive IP range over the 16-byte IPv6-mapped encoding
    (``document/InetAddressPoint.kt:140-252``): addresses compare as
    unsigned bytes, which both Spark and Parquet stats order natively for
    BinaryType. ``lower``/``upper`` are address strings (IPv4 or IPv6).
    Use :meth:`prefix` for CIDR masks and :meth:`exact` for single hosts.
    Constant score ``boost``."""

    ip_col: str
    lower: str
    upper: str
    boost: float = 1.0

    @staticmethod
    def prefix(ip_col: str, address: str, prefix_length: int, boost: float = 1.0) -> "InetAddressRangeQuery":
        """CIDR network -> range (InetAddressPoint.newPrefixQuery)."""
        import ipaddress as _ip

        from .geo import inet_prefix_range

        lo, up = inet_prefix_range(address, prefix_length)
        # store normalized address strings; executor re-encodes to bytes
        return InetAddressRangeQuery(
            ip_col,
            str(_ip.ip_address(lo[12:] if lo[:12] == bytes(10) + b"\xff\xff" else lo)),
            str(_ip.ip_address(up[12:] if up[:12] == bytes(10) + b"\xff\xff" else up)),
            boost,
        )

    @staticmethod
    def exact(ip_col: str, address: str, boost: float = 1.0) -> "InetAddressRangeQuery":
        return InetAddressRangeQuery(ip_col, address, address, boost)


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: Query


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...]
    minimum_should_match: int = 0
    boost: float = 1.0

    @staticmethod
    def build(
        must=(), should=(), must_not=(), filter=(), minimum_should_match: int = 0, boost: float = 1.0
    ) -> "BooleanQuery":
        cl = (
            [BooleanClause(Occur.MUST, q) for q in must]
            + [BooleanClause(Occur.SHOULD, q) for q in should]
            + [BooleanClause(Occur.MUST_NOT, q) for q in must_not]
            + [BooleanClause(Occur.FILTER, q) for q in filter]
        )
        return BooleanQuery(tuple(cl), minimum_should_match, boost)

    def rewrite(self) -> Query:
        # rewrite children first (fixpoint loop lives in rewrite_query)
        clauses = tuple(BooleanClause(c.occur, rewrite_query(c.query)) for c in self.clauses)
        pos = [c for c in clauses if c.occur != Occur.MUST_NOT]
        neg = [c for c in clauses if c.occur == Occur.MUST_NOT]
        # empty / purely-negative BQ matches nothing (BooleanQuery.kt:224-231)
        if not pos:
            return MatchNoDocsQuery()
        # MatchNoDocs in MUST/FILTER -> nothing
        if any(isinstance(c.query, MatchNoDocsQuery) for c in pos if c.occur in (Occur.MUST, Occur.FILTER)):
            return MatchNoDocsQuery()
        # a clause both required and prohibited -> nothing (BooleanQuery.kt:311-320)
        neg_q = {c.query for c in neg}
        if any(c.query in neg_q for c in pos if c.occur in (Occur.MUST, Occur.FILTER)):
            return MatchNoDocsQuery()
        # drop SHOULD MatchNoDocs
        clauses = tuple(
            c for c in clauses if not (c.occur == Occur.SHOULD and isinstance(c.query, MatchNoDocsQuery))
        )
        # dedup FILTER / MUST_NOT clauses (BooleanQuery.kt:290-438)
        seen = set()
        dedup = []
        for c in clauses:
            key = (c.occur, c.query)
            if c.occur in (Occur.FILTER, Occur.MUST_NOT):
                if key in seen:
                    continue
                seen.add(key)
            dedup.append(c)
        clauses = tuple(dedup)
        # single-clause simplification (BooleanQuery.kt:233-249)
        if len(clauses) == 1 and self.minimum_should_match <= 1:
            c = clauses[0]
            if c.occur in (Occur.MUST, Occur.SHOULD):
                q = c.query
                if self.boost != 1.0:
                    return _with_boost(q, q.boost * self.boost)
                return q
            if c.occur == Occur.FILTER:
                return ConstantScoreQuery(c.query, boost=0.0)
        if clauses != self.clauses:
            return BooleanQuery(clauses, self.minimum_should_match, self.boost)
        return self


def _with_boost(q: Query, boost: float) -> Query:
    import dataclasses

    return dataclasses.replace(q, boost=boost)


def rewrite_query(q: Query, max_iters: int = 10) -> Query:
    """Rewrite to fixpoint (IndexSearcher.kt:699-712)."""
    for _ in range(max_iters):
        nq = q.rewrite()
        if nq is q:
            return q
        q = nq
    return q
