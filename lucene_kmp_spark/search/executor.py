"""Query execution: compile the Query AST to DataFrame plans over the index.

The physical shape mirrors the reference's read path (SURVEY.md §3.1):

* stage 1 — global stats + per-term stats resolved once, driver-side, and
  closed over by the scoring UDF (the Spark analog of ``createWeight``'s one
  global computation, ``search/IndexSearcher.kt:773,912-953``)
* stage 2 — partition-parallel block decode + float32 BM25 scoring inside an
  Arrow ``mapInPandas`` (the per-leaf BulkScorer, ``Lucene101PostingsReader.kt``)
* stage 3 — ``ORDER BY score DESC, doc_id ASC LIMIT k`` =
  TakeOrderedAndProject, Spark's native distributed top-k collector
  (tie-break per ``search/HitQueue.kt:56-62``; merge per ``TopDocs.kt:119-181``)

Boolean composition (``search/BooleanWeight.kt`` semantics): MUST/FILTER =
inner/semi joins on doc_id ordered by clause cost (df ascending, the
``ConjunctionDISI.kt:21-61`` leapfrog order), SHOULD = union + hash aggregate,
MUST_NOT = left_anti. Cross-clause score sums accumulate in double and cast to
float32 at the end, matching the reference's double accumulators
(``WANDScorer.kt:83``, ``DisjunctionSumScorer``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_kmp_spark.index.builder import InvertedIndex
from lucene_kmp_spark.search import bm25
from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE
from lucene_kmp_spark.search.sloppy import sloppy_freq
from lucene_kmp_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    ColumnFilterQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FeatureQuery,
    BoostByQueryScoreQuery,
    FieldExistsQuery,
    FunctionScoreQuery,
    FuzzyQuery,
    IndexOrDocValuesQuery,
    IndexSortRangeQuery,
    IndriAndQuery,
    InetAddressRangeQuery,
    LatLonBoxQuery,
    LatLonDistanceFeatureQuery,
    LongDistanceFeatureQuery,
    LatLonDistanceQuery,
    LatLonPolygonQuery,
    XYBoxQuery,
    XYDistanceQuery,
    XYPolygonQuery,
    KnnByteVectorQuery,
    KnnFloatVectorQuery,
    SeededKnnVectorQuery,
    VectorSimilarityQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RangeFieldQuery,
    RegexpQuery,
    SpanContainingQuery,
    SpanFirstQuery,
    SpanMultiTermWrapper,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanTermQuery,
    SpanWithinQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite_query,
)

# IndexSearcher.maxClauseCount default (IndexSearcher.kt) — boolean rewrites
# of multi-term expansions refuse to exceed it; top-terms rewrites cap at it
MAX_CLAUSE_COUNT = 1024

_SCORED_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("doc_id", LongType()),
        StructField("tf", IntegerType()),
        StructField("score", DoubleType()),
    ]
)

_POS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("doc_id", LongType()),
        StructField("tf", IntegerType()),
        StructField("norm", IntegerType()),
        StructField("positions", ArrayType(IntegerType())),
    ]
)


def _decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    from lucene_kmp_spark.util.packing import block_decode, delta_block_decode, varint_decode

    doc_ids = delta_block_decode(bytes(row["doc_ids_enc"]))
    tfs = block_decode(bytes(row["freqs_enc"]))
    norms = np.frombuffer(bytes(row["norms_enc"]), dtype=np.uint8)
    return doc_ids, tfs, norms


@dataclass
class TermStats:
    df: int
    ttf: int
    # occupied 8,192-doc windows (-1 = unknown: index predates the
    # n_buckets term_dict column; gate falls back to the df proxy)
    n_buckets: int = -1


class FilterCache:
    """LRU cache of FILTER/MUST_NOT doc-sets (search/LRUQueryCache.kt:79).

    Keys are (index identity, frozen Query dataclass) tuples — the index
    component mirrors Lucene caching per segment core reader, so one cache
    instance may be shared across searchers over different indexes; values
    are persisted doc_id DataFrames (the cached DocIdSet analog). Evicted
    entries are unpersisted."""

    def __init__(self, max_entries: int = 32, policy: "UsageTrackingCachingPolicy | None" = None):
        from collections import OrderedDict

        self.max_entries = max_entries
        self.policy = policy
        self._entries: "OrderedDict" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key, compute, query=None):
        if self.policy is not None and query is not None:
            self.policy.on_use(query)
        if key in self._entries:
            self.hits += 1
            self._entries.move_to_end(key)
            return self._entries[key]
        self.misses += 1
        if self.policy is not None and query is not None and not self.policy.should_cache(query):
            return compute()  # evaluate uncached (QueryCachingPolicy veto)
        df = compute().persist()
        self._entries[key] = df
        if len(self._entries) > self.max_entries:
            _old_key, old_df = self._entries.popitem(last=False)
            try:
                old_df.unpersist()
            except Exception:
                pass
        return df

    def clear(self):
        for df in self._entries.values():
            try:
                df.unpersist()
            except Exception:
                pass
        self._entries.clear()


class UsageTrackingCachingPolicy:
    """search/UsageTrackingQueryCachingPolicy.kt over a
    util/FrequencyTrackingRingBuffer.kt: a filter is admitted into the
    FilterCache only once it has appeared often enough in the last
    ``history_size`` filter uses. Doc-sets that are costly to BUILD
    (multi-term expansions, point/column predicates — isCostly,
    UsageTrackingQueryCachingPolicy.kt:115) cache after 2 uses, compound
    queries after 4 (the A-OR-B note at :41-48), everything else after 5;
    queries whose doc-set is already cheap to recompute (TermQuery,
    FieldExistsQuery, MatchAll/MatchNoDocs, empty compounds —
    shouldNeverCache :126-160) are never cached."""

    def __init__(self, history_size: int = 256):
        if history_size < 2:
            raise ValueError("history_size must be at least 2")
        self.history_size = history_size
        self._buf: list = [None] * history_size
        self._pos = 0
        self._freq: dict = {}

    @staticmethod
    def _unwrap(query):
        from lucene_kmp_spark.search.query import ConstantScoreQuery

        while isinstance(query, ConstantScoreQuery):
            query = query.query
        return query

    @staticmethod
    def _is_costly(query) -> bool:
        from lucene_kmp_spark.search import query as qm

        return isinstance(
            query,
            (
                qm.PrefixQuery, qm.WildcardQuery, qm.RegexpQuery, qm.FuzzyQuery,
                qm.TermRangeQuery, qm.TermInSetQuery,  # MultiTermQuery family
                qm.ColumnFilterQuery, qm.RangeFieldQuery,  # point-based family
                qm.SortedNumericRangeQuery, qm.SortedNumericSetQuery,
                qm.SortedSetRangeQuery,
            ),
        )

    @classmethod
    def _should_never_cache(cls, query) -> bool:
        from lucene_kmp_spark.search import query as qm

        if isinstance(query, (qm.TermQuery, qm.FieldExistsQuery,
                              qm.MatchAllDocsQuery, qm.MatchNoDocsQuery)):
            return True
        if isinstance(query, qm.BooleanQuery) and not query.clauses:
            return True
        if isinstance(query, qm.DisjunctionMaxQuery) and not query.queries:
            return True
        return False

    @classmethod
    def _min_frequency(cls, query) -> int:
        from lucene_kmp_spark.search import query as qm

        if cls._is_costly(query):
            return 2
        if isinstance(query, (qm.BooleanQuery, qm.DisjunctionMaxQuery)):
            return 4
        return 5

    def on_use(self, query):
        query = self._unwrap(query)
        if self._should_never_cache(query):
            return
        removed = self._buf[self._pos]
        if removed is not None:
            left = self._freq.get(removed, 0) - 1
            if left <= 0:
                self._freq.pop(removed, None)
            else:
                self._freq[removed] = left
        self._buf[self._pos] = query
        self._freq[query] = self._freq.get(query, 0) + 1
        self._pos = (self._pos + 1) % self.history_size

    def frequency(self, query) -> int:
        return self._freq.get(self._unwrap(query), 0)

    def should_cache(self, query) -> bool:
        query = self._unwrap(query)
        if self._should_never_cache(query):
            return False
        return self._freq.get(query, 0) >= self._min_frequency(query)


class IndexSearcher:
    """Point-in-time searcher over an InvertedIndex (``search/IndexSearcher.kt``)."""

    def __init__(
        self,
        index: InvertedIndex,
        k1: float = 1.2,
        b: float = 0.75,
        dtype=np.float32,
        live_filter: DataFrame | None = None,
        similarity=None,
        filter_cache: "FilterCache | None" = None,
        vectors: DataFrame | None = None,
    ):
        from lucene_kmp_spark.search.similarities import BM25Similarity

        self.filter_cache = filter_cache

        self.index = index
        self.k1 = k1
        self.b = b
        self.dtype = dtype
        # pluggable scoring model (Similarity.kt UDF surface); the default
        # BM25Similarity reproduces the float32 bit-parity kernel exactly
        self.similarity = similarity if similarity is not None else BM25Similarity(k1, b)
        self._is_bm25 = isinstance(self.similarity, BM25Similarity)
        # deleted docIDs anti-joined on every result (liveDocs bitset analog,
        # codecs/lucene90/Lucene90LiveDocsFormat.kt); stats intentionally
        # still include deleted docs until merge, like Lucene
        self.live_filter = live_filter
        # optional float-vector column store (doc_id, embedding) for
        # KnnFloatVectorQuery (search/knn.py)
        self.vectors = vectors
        # DirectPostingsFormat analog (warm_terms): decoded hot-term postings
        self._direct_terms: set | None = None
        self._direct_df: DataFrame | None = None
        self._stats_cache: dict[str, TermStats | None] = {}
        # lead-term skip pruning (two-phase conjunction advance): cached
        # doc-id intervals per lead-term set + a diagnostic of the last
        # phrase/span execution ("pruned" | "unpruned")
        self._lead_windows_cache: dict[frozenset, list | None] = {}
        self._last_lead_prune: str | None = None
        s = index.stats
        self.avgdl = bm25.avg_field_length(s.sum_total_term_freq, s.doc_count, dtype)
        # per-norm-byte cache is term-independent (BM25Similarity.kt:161-165)
        one, k1_, b_ = dtype(1), dtype(k1), dtype(b)
        from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE

        self.cache = one / (k1_ * ((one - b_) + b_ * LENGTH_TABLE.astype(dtype) / self.avgdl))

    def _live(self, df: DataFrame) -> DataFrame:
        if self.live_filter is not None:
            return df.join(self.live_filter, "doc_id", "left_anti")
        return df

    # ------------------------------------------------------------------ stats
    def term_stats(self, terms: list[str]) -> dict[str, TermStats]:
        """Per-term (df, ttf). One driver-side lookup per search — terms are
        prefetched for the whole query tree by ``execute`` (the Spark analog
        of createWeight resolving TermStates once, IndexSearcher.kt:912-919)."""
        want = set(terms)
        missing = want - set(self._stats_cache)
        if missing:
            td = self.index.term_dict
            has_buckets = "n_buckets" in td.columns
            cols = ["term", "df", "ttf"] + (["n_buckets"] if has_buckets else [])
            rows = td.filter(F.col("term").isin(list(missing))).select(*cols).collect()
            for r in rows:
                self._stats_cache[r["term"]] = TermStats(
                    int(r["df"]), int(r["ttf"]),
                    int(r["n_buckets"]) if has_buckets else -1,
                )
            for t in missing:
                self._stats_cache.setdefault(t, None)
        return {t: s for t, s in ((t, self._stats_cache.get(t)) for t in want) if s is not None}

    def _weight(self, term_df: int, boost: float):
        dt = self.dtype
        return dt(dt(boost) * bm25.idf(term_df, self.index.stats.doc_count, dt))

    def _make_scorer(self, boost: float, stats_list: list["TermStats"]):
        """createWeight: bind global + term statistics into a vectorized
        scoring kernel (IndexSearcher.kt:773; Similarity.kt scorer())."""
        s = self.index.stats
        return self.similarity.scorer(
            boost,
            [(st.df, st.ttf) for st in stats_list],
            s.doc_count,
            s.sum_total_term_freq,
            dtype=self.dtype,
        )

    # --------------------------------------------------------------- scoring
    def _scored_terms_df(
        self, boosts: dict[str, float], stats=None, postings_rows: DataFrame | None = None
    ) -> DataFrame:
        """(term, doc_id, tf, score) for every posting of the given terms.

        ``postings_rows`` restricts decoding to a block subset (the WAND
        pruned path); default scans all blocks of the terms."""
        if stats is None:
            stats = self.term_stats(list(boosts))
        scorers = {
            t: self._make_scorer(boosts[t], [st]) for t, st in stats.items() if t in boosts
        }
        if not scorers:
            return self._empty_scored()
        if (
            postings_rows is None
            and self._direct_df is not None
            and set(scorers) <= self._direct_terms
        ):
            # DirectPostingsFormat path: serve from the decoded hot-term
            # cache (warm_terms) — identical rows, block decode skipped
            return self._scored_from_direct(scorers)
        base = (
            postings_rows
            if postings_rows is not None
            else self.index.postings.filter(F.col("term").isin(list(scorers)))
        )
        rows = base.select("term", "doc_ids_enc", "freqs_enc", "norms_enc")

        def gen(batches):
            from lucene_kmp_spark.util.packing import block_decode, delta_block_decode, varint_decode

            for pdf in batches:
                outs = {"term": [], "doc_id": [], "tf": [], "score": []}
                for term, de, fe, ne in zip(
                    pdf["term"].values, pdf["doc_ids_enc"].values,
                    pdf["freqs_enc"].values, pdf["norms_enc"].values,
                ):
                    doc_ids = delta_block_decode(bytes(de))
                    tfs = block_decode(bytes(fe))
                    norms = np.frombuffer(bytes(ne), dtype=np.uint8)
                    sc = scorers[term].score(tfs, norms)
                    outs["term"].append(np.repeat(term, len(doc_ids)))
                    outs["doc_id"].append(doc_ids)
                    outs["tf"].append(tfs)
                    outs["score"].append(sc.astype(np.float64))
                if outs["doc_id"]:
                    yield pd.DataFrame(
                        {
                            "term": np.concatenate(outs["term"]),
                            "doc_id": np.concatenate(outs["doc_id"]),
                            "tf": np.concatenate(outs["tf"]).astype(np.int32),
                            "score": np.concatenate(outs["score"]),
                        }
                    )

        return rows.mapInPandas(gen, schema=_SCORED_SCHEMA)

    def _empty_scored(self) -> DataFrame:
        return self.index.spark.createDataFrame([], schema=_SCORED_SCHEMA)

    # per-window (8,192-doc) conjunction prefilter gate: the lead term must
    # occupy at most this fraction of windows (guaranteeing >=75% of the hot
    # side's windows prunable, since occupied windows <= df) and the other
    # clauses must carry at least this many postings (else decode is cheap
    # and the broadcast join is pure overhead). Values A/B'd at 4M turns —
    # see BENCH/BASELINE.md "BlockMaxConjunction revisit".
    WINDOW_PREFILTER_MAX_OCCUPANCY = 0.25
    WINDOW_PREFILTER_MIN_OTHER_DF = 1 << 16

    def _conjunction_window_rows(self, boosts: dict, stats) -> DataFrame | None:
        """BlockMaxConjunction analog (BlockMaxConjunctionBulkScorer.kt:
        329-350 window skipping) built from INDEX-RESIDENT metadata: the
        lead (rarest) term's occupied 8,192-doc windows — a per-term slice
        of postings block metadata, bucket = block_id >> 16 — broadcast-
        semi-joins the other clauses' block rows BEFORE Arrow decode. No
        separate Spark action: the window list is a subplan Catalyst
        broadcasts inside the same job (the revisit condition recorded with
        round 1's measured-and-reverted doc-set prefilter, BENCH/BASELINE.md
        "conjunction leapfrog prefilter"). Docs outside the lead's windows
        cannot satisfy the conjunction, so results are identical; the win is
        skipped block decode on the hot side. Returns None when the gate
        says the prefilter cannot pay."""
        if not self.index.extra.get("bucketed_blocks", True):
            # skew_safe=False blocks number slices per term: block_id >> 16
            # is NOT a doc-order window there, so pruning would be wrong
            return None
        have = {t: st for t, st in stats.items() if st is not None}
        if len(have) < 2 or len(have) < len(boosts):
            return None  # a missing term empties the conjunction anyway
        n_windows = max(1, -(-self.index.stats.doc_count // (1 << 13)))

        def occupied(st) -> int:
            # build-time n_buckets when present; df is an upper bound on
            # occupied windows otherwise (pre-n_buckets index on disk)
            return st.n_buckets if st.n_buckets >= 0 else min(st.df, n_windows)

        lead = min(have, key=lambda t: occupied(have[t]))
        if occupied(have[lead]) > self.WINDOW_PREFILTER_MAX_OCCUPANCY * n_windows:
            return None
        other_df = sum(st.df for t, st in have.items() if t != lead)
        if other_df < self.WINDOW_PREFILTER_MIN_OTHER_DF:
            return None
        lead_w = (
            self.index.postings.filter(F.col("term") == lead)
            .select(F.shiftright("block_id", 16).alias("_w"))
            .distinct()
        )
        return self.index.postings.filter(F.col("term").isin(list(boosts))).join(
            F.broadcast(lead_w),
            F.shiftright(F.col("block_id"), 16) == F.col("_w"),
            "left_semi",
        )

    def term_freqs(self, terms: list[str]) -> DataFrame:
        """(term, doc_id, tf) — the FREQS-level postings view (PostingsEnum
        flags FREQS, index/PostingsEnum.kt:12-76); never decodes positions."""
        rows = self.index.postings.filter(F.col("term").isin(list(set(terms)))).select(
            "term", "doc_ids_enc", "freqs_enc"
        )

        def gen(batches):
            from lucene_kmp_spark.util.packing import block_decode, delta_block_decode, varint_decode

            for pdf in batches:
                outs = []
                for term, de, fe in zip(
                    pdf["term"].values, pdf["doc_ids_enc"].values, pdf["freqs_enc"].values
                ):
                    d = delta_block_decode(bytes(de))
                    t = block_decode(bytes(fe))
                    outs.append(
                        pd.DataFrame(
                            {
                                "term": np.repeat(term, len(d)),
                                "doc_id": d,
                                "tf": t.astype(np.int32),
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return rows.mapInPandas(gen, schema="term string, doc_id long, tf int")

    # -------------------------------------------------- direct (hot) terms
    def warm_terms(self, terms: list[str]) -> int:
        """DirectPostingsFormat analog (codecs/memory/DirectPostingsFormat.kt):
        decode the freqs-level postings of designated hot terms ONCE and pin
        the decoded ``(term, doc_id, tf, norm)`` rows in executor storage;
        every later scoring scan over a covered term set serves from the
        cache instead of re-decoding blocks. The reference trades RAM for
        skipping its wire format on every postings enumeration — here the
        per-query cost bought out is the Arrow block decode. Scores are NOT
        cached (they depend on boost/similarity), so results stay identical
        bit-for-bit. Returns the number of cached postings rows."""
        terms = sorted(set(terms))
        rows = self.index.postings.filter(F.col("term").isin(terms)).select(
            "term", "doc_ids_enc", "freqs_enc", "norms_enc"
        )

        def gen(batches):
            from lucene_kmp_spark.util.packing import block_decode, delta_block_decode

            for pdf in batches:
                outs = {"term": [], "doc_id": [], "tf": [], "norm": []}
                for term, de, fe, ne in zip(
                    pdf["term"].values, pdf["doc_ids_enc"].values,
                    pdf["freqs_enc"].values, pdf["norms_enc"].values,
                ):
                    d = delta_block_decode(bytes(de))
                    outs["term"].append(np.repeat(term, len(d)))
                    outs["doc_id"].append(d)
                    outs["tf"].append(block_decode(bytes(fe)).astype(np.int32))
                    outs["norm"].append(
                        np.frombuffer(bytes(ne), dtype=np.uint8).astype(np.int32)
                    )
                if outs["doc_id"]:
                    yield pd.DataFrame(
                        {k: np.concatenate(v) for k, v in outs.items()}
                    )

        df = rows.mapInPandas(
            gen, schema="term string, doc_id long, tf int, norm int"
        ).persist()
        n = df.count()  # materialize the pin eagerly (the "load into RAM")
        self.cool_terms()
        self._direct_terms = set(terms)
        self._direct_df = df
        return n

    def cool_terms(self) -> None:
        """Drop the direct-postings cache (close() of the direct reader)."""
        if getattr(self, "_direct_df", None) is not None:
            try:
                self._direct_df.unpersist()
            except Exception:
                pass
        self._direct_df = None
        self._direct_terms = None

    def _scored_from_direct(self, scorers: dict) -> DataFrame:
        """Score straight off the decoded cache — no block decode."""
        base = self._direct_df.filter(F.col("term").isin(list(scorers)))

        def gen(batches):
            for pdf in batches:
                tvals = pdf["term"].values
                tfs = pdf["tf"].values
                norms = pdf["norm"].values.astype(np.int64)
                scores = np.empty(len(pdf), dtype=np.float64)
                for t in pd.unique(tvals):
                    m = tvals == t
                    scores[m] = scorers[t].score(tfs[m], norms[m]).astype(np.float64)
                yield pd.DataFrame(
                    {
                        "term": tvals,
                        "doc_id": pdf["doc_id"].values,
                        "tf": tfs.astype(np.int32),
                        "score": scores,
                    }
                )

        return base.mapInPandas(gen, schema=_SCORED_SCHEMA)

    # ------------------------------------------- lead-term skip pruning
    # Two-phase conjunction advance (the distributed analog of Lucene's
    # ConjunctionDISI leading with the lowest-cost iterator and driving skip
    # pointers into the denser terms, ConjunctionDISI.kt / Lucene90SkipReader):
    # the rarest term's doc IDs are decoded once (metadata-scale — df is small
    # by the gate), bucketed into 8,192-doc windows (the level-1 skip window),
    # merged into <=256 doc-id intervals, and pushed as a min/max_doc_id
    # predicate into the positions scan. Hot terms' blocks outside the lead's
    # windows are eliminated IN THE PARQUET SCAN (row-group stats on
    # min_doc_id/max_doc_id) and never reach the Python positions decode —
    # the measured bottleneck of rare-AND-hot phrases.
    _LEAD_PRUNE_MAX_DF = 131072  # lead decode stays metadata-scale
    _LEAD_PRUNE_MIN_RATIO = 8  # df(densest)/df(lead) — else no win
    _LEAD_PRUNE_MAX_INTERVALS = 256  # plan-size cap (coarsening is sound)
    _LEAD_WINDOW_BITS: int | None = None  # None = adapt to corpus size

    def _lead_window_bits(self) -> int:
        """Window granularity adapts to corpus size: aim for ~16k windows
        (enough resolution for a rare lead to leave gaps) but never finer
        than 64 docs nor coarser than the 8,192-doc level-1 skip window."""
        if self._LEAD_WINDOW_BITS is not None:
            return self._LEAD_WINDOW_BITS
        return min(13, max(6, int(self.index.stats.max_doc).bit_length() - 14))

    _LEAD_PRUNE_MAX_COVERAGE = 0.25  # prune only if lead touches <25% of docs

    def _lead_doc_intervals(self, lead_terms: tuple[str, ...]) -> list | None:
        """Merged ``[lo_doc, hi_doc]`` intervals covering every document that
        contains any of ``lead_terms`` (window-rounded, so an over-
        approximation — sound for pruning). None when the lead's windows are
        too dense or too uniformly scattered for interval pruning to pay:
        a uniformly scattered lead coarsens into intervals that cover
        everything (measured 3.5x SLOWER than no pruning), so coverage is
        gated three times — a metadata-only estimate from block spans (no
        decode), the exact window count, and the post-coarsening interval
        cover."""
        key = frozenset(lead_terms)
        if key in self._lead_windows_cache:
            return self._lead_windows_cache[key]
        out = self._compute_lead_intervals(lead_terms)
        self._lead_windows_cache[key] = out
        return out

    def _compute_lead_intervals(self, lead_terms: tuple[str, ...]) -> list | None:
        from lucene_kmp_spark.util.packing import delta_block_decode

        wbits = self._lead_window_bits()
        wsize = 1 << wbits
        max_doc = max(self.index.stats.max_doc, 1)
        cov_docs = self._LEAD_PRUNE_MAX_COVERAGE * max_doc
        lead_rows = self.index.postings.filter(F.col("term").isin(list(lead_terms)))

        # gate 1 — metadata only (block min/max, <=1,024 rows at the df cap):
        # estimated windows if each block's docs spread uniformly over its
        # span; over-estimates clusters (a skipped optimization, never a
        # wrong answer), catches the scattered case without any decode
        meta = lead_rows.select("num_docs", "min_doc_id", "max_doc_id").collect()
        if not meta:
            return []
        est_windows = sum(
            min(r["num_docs"], (r["max_doc_id"] - r["min_doc_id"]) // wsize + 1)
            for r in meta
        )
        if est_windows * wsize >= cov_docs:
            return None

        def gen(batches):
            for pdf in batches:
                ws: set = set()
                for de in pdf["doc_ids_enc"].values:
                    ws.update((delta_block_decode(bytes(de)) >> wbits).tolist())
                if ws:
                    yield pd.DataFrame({"w": np.fromiter(ws, dtype=np.int64)})

        wrows = lead_rows.select("doc_ids_enc").mapInPandas(gen, "w long").distinct().collect()
        ws = np.sort(np.array([r["w"] for r in wrows], dtype=np.int64))
        if len(ws) == 0:
            return []
        # gate 2 — exact distinct-window coverage
        if (len(ws) << wbits) >= cov_docs:
            return None
        # consecutive windows -> intervals; coarsen to the cap by keeping
        # only the largest inter-interval gaps as breaks (over-approx)
        breaks = np.flatnonzero(np.diff(ws) > 1)
        lo_w = np.concatenate(([ws[0]], ws[breaks + 1]))
        hi_w = np.concatenate((ws[breaks], [ws[-1]]))
        if len(lo_w) > self._LEAD_PRUNE_MAX_INTERVALS:
            gaps = lo_w[1:] - hi_w[:-1]  # gap before interval i+1
            keep = np.sort(np.argsort(gaps)[-(self._LEAD_PRUNE_MAX_INTERVALS - 1):])
            lo_w = np.concatenate(([lo_w[0]], lo_w[keep + 1]))
            hi_w = np.concatenate((hi_w[keep], [hi_w[-1]]))
        # gate 3 — post-coarsening cover: a uniformly scattered lead merges
        # into near-total cover here even when gate 2 passed
        if int((hi_w - lo_w + 1).sum()) * wsize >= cov_docs:
            return None
        return [
            (int(lo) << wbits, ((int(hi) + 1) << wbits) - 1)
            for lo, hi in zip(lo_w, hi_w)
        ]

    def _conjunctive_block_filter(self, units: list) -> "F.Column | None":
        """Pruning predicate for a conjunctive positions scan, or None.
        ``units`` = list of ``(terms_tuple, df)`` — a unit is one required
        phrase slot / span clause (a set of interchangeable terms). Leads
        with the lowest-df unit when it is rare enough to matter."""
        if len(units) < 2:
            return None
        lead_terms, lead_df = min(units, key=lambda u: u[1])
        densest_df = max(df for _, df in units)
        if (
            lead_df == 0
            or lead_df > self._LEAD_PRUNE_MAX_DF
            or densest_df < self._LEAD_PRUNE_MIN_RATIO * lead_df
        ):
            return None
        intervals = self._lead_doc_intervals(tuple(lead_terms))
        if intervals is None:
            return None
        if not intervals:
            return F.lit(False)
        overlap = None
        for lo, hi in intervals:
            c = (F.col("max_doc_id") >= F.lit(lo)) & (F.col("min_doc_id") <= F.lit(hi))
            overlap = c if overlap is None else (overlap | c)
        # the lead unit's own blocks always overlap its windows, so one
        # predicate serves every term in the scan
        return overlap

    def _positions_df(self, terms: list[str], block_filter=None) -> DataFrame:
        """(term, doc_id, tf, norm, positions) — the POSITIONS postings view."""
        from lucene_kmp_spark.util.packing import block_decode as _pos_decode

        rows = self.index.postings.filter(F.col("term").isin(list(set(terms))))
        if block_filter is not None:
            rows = rows.filter(block_filter)
        rows = rows.select(
            "term", "doc_ids_enc", "freqs_enc", "norms_enc", "positions_enc"
        )

        def gen(batches):
            import pyarrow as pa

            from lucene_kmp_spark.util.packing import block_decode, delta_block_decode

            for pdf in batches:
                terms_o, docs_o, tfs_o, norms_o, pos_o = [], [], [], [], []
                for term, de, fe, ne, pe in zip(
                    pdf["term"].values, pdf["doc_ids_enc"].values, pdf["freqs_enc"].values,
                    pdf["norms_enc"].values, pdf["positions_enc"].values,
                ):
                    doc_ids = delta_block_decode(bytes(de))
                    tfs = block_decode(bytes(fe))
                    norms = np.frombuffer(bytes(ne), dtype=np.uint8)
                    deltas = _pos_decode(bytes(pe))
                    # per-doc position lists: global cumsum, re-based per doc
                    cs = np.cumsum(deltas)
                    ends = np.cumsum(tfs)
                    starts = ends - tfs
                    before = cs[starts] - deltas[starts]
                    pos_all = cs - np.repeat(before, tfs)
                    terms_o.append(np.repeat(term, len(doc_ids)))
                    docs_o.append(doc_ids)
                    tfs_o.append(tfs)
                    norms_o.append(norms)
                    pos_o.append(pos_all.astype(np.int32))
                if not docs_o:
                    continue
                # Arrow-native list column (offsets + one flat values buffer):
                # no per-doc Python lists — ~70x cheaper than tolist() per
                # batch, which dominated hot-term phrase queries
                all_tfs = np.concatenate(tfs_o)
                offsets = np.zeros(len(all_tfs) + 1, dtype=np.int32)
                np.cumsum(all_tfs, out=offsets[1:])
                la = pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(np.concatenate(pos_o))
                )
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms_o),
                        "doc_id": np.concatenate(docs_o),
                        "tf": all_tfs.astype(np.int32),
                        "norm": np.concatenate(norms_o).astype(np.int32),
                        "positions": pd.Series(la, dtype=pd.ArrowDtype(pa.list_(pa.int32()))),
                    }
                )

        return rows.mapInPandas(gen, schema=_POS_SCHEMA)

    # ------------------------------------------------- offsets/payloads view
    def term_occurrences(self, terms: list[str]) -> DataFrame:
        """One row per term occurrence: ``(term, doc_id, position,
        start_offset, end_offset, payload)`` — the OFFSETS/PAYLOADS-level
        postings view (``index/PostingsEnum.kt:12-76`` flags). Requires an
        index built with ``index_options="offsets"``; ``payload`` is null
        unless a ``payload_fn`` was supplied at build time."""
        if "offsets_enc" not in self.index.postings.columns or (
            self.index.extra.get("index_options", "positions") != "offsets"
            and not self.index.extra.get("has_payloads", False)
        ):
            raise ValueError(
                "index was built without offsets — pass index_options='offsets' to build_index"
            )
        rows = self.index.postings.filter(F.col("term").isin(list(set(terms)))).select(
            "term", "doc_ids_enc", "freqs_enc", "positions_enc", "offsets_enc", "payloads_enc"
        )

        def gen(batches):
            from lucene_kmp_spark.util.packing import block_decode, delta_block_decode

            for pdf in batches:
                outs = []
                for term, de, fe, pe, oe, ye in zip(
                    pdf["term"].values, pdf["doc_ids_enc"].values, pdf["freqs_enc"].values,
                    pdf["positions_enc"].values, pdf["offsets_enc"].values,
                    pdf["payloads_enc"].values,
                ):
                    doc_ids = delta_block_decode(bytes(de))
                    tfs = block_decode(bytes(fe))
                    n_occ = int(tfs.sum())
                    ends_idx = np.cumsum(tfs)
                    starts_idx = ends_idx - tfs

                    def _rebase(deltas):
                        # doc-local cumulative sums over the flat occurrence
                        # stream (same re-base as the positions decode)
                        cs = np.cumsum(deltas)
                        before = cs[starts_idx] - deltas[starts_idx]
                        return cs - np.repeat(before, tfs)

                    pos_all = _rebase(block_decode(bytes(pe)))
                    if oe is not None:
                        offs = block_decode(bytes(oe))
                        start_all = _rebase(offs[0::2])
                        end_all = start_all + offs[1::2]
                    else:
                        start_all = end_all = np.full(n_occ, -1, dtype=np.int64)
                    pays = (
                        block_decode(bytes(ye)).astype(np.float64)
                        if ye is not None
                        else np.full(n_occ, np.nan)
                    )
                    outs.append(
                        pd.DataFrame(
                            {
                                "term": np.repeat(term, n_occ),
                                "doc_id": np.repeat(doc_ids, tfs),
                                "position": pos_all.astype(np.int32),
                                "start_offset": start_all.astype(np.int32),
                                "end_offset": end_all.astype(np.int32),
                                "payload": pays,
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        schema = (
            "term string, doc_id long, position int, "
            "start_offset int, end_offset int, payload double"
        )
        out = rows.mapInPandas(gen, schema=schema)
        return self._live(out)

    def term_offsets(self, term: str) -> DataFrame:
        """(doc_id, position, start_offset, end_offset) for every occurrence
        of ``term`` — the consumer surface for the OFFSETS flag (what a
        highlighter/passage extractor reads)."""
        return self.term_occurrences([term]).select(
            "doc_id", "position", "start_offset", "end_offset"
        )

    def term_vector(self, doc_id: int) -> DataFrame:
        """(term, tf, positions[, starts, ends]) forward index of one doc —
        the ``TermVectors.get(docID)`` analog (``index/TermVectors.kt``,
        ``codecs/lucene90/Lucene90TermVectorsFormat.kt``). Requires
        ``build_index(term_vectors=True)``; the equality predicate prunes the
        doc_id-range-sorted storage (the .tvx doc-pointer lookup)."""
        if self.index.term_vectors is None:
            raise ValueError(
                "index was built without term vectors — pass term_vectors=True to build_index"
            )
        return self.index.term_vectors.filter(F.col("doc_id") == doc_id).drop("doc_id")

    def doc(self, doc_id: int, fields: tuple[str, ...] | None = None) -> dict | None:
        """StoredFields.document(docID) analog (``index/StoredFields.kt``,
        ``IndexSearcher.storedFields()``): the stored-field row for one doc,
        or None for an unknown/deleted docID. The docs table IS the stored
        fields (.fdt analog — a columnar Parquet scan pruned by the doc_id
        equality predicate instead of the .fdx pointer lookup); ``fields``
        selects a subset like StoredFieldVisitor needsField."""
        df = self._live(self.index.docs).filter(F.col("doc_id") == int(doc_id))
        if fields is not None:
            df = df.select("doc_id", *fields)
        rows = df.limit(1).collect()
        return rows[0].asDict() if rows else None

    def docs_for(self, doc_ids, fields: tuple[str, ...] | None = None) -> DataFrame:
        """Batch stored-fields fetch: live rows for the given docIDs (the
        distributed form a hydration join uses — stays a DataFrame, no
        driver collect)."""
        df = self._live(self.index.docs).filter(
            F.col("doc_id").isin([int(d) for d in doc_ids])
        )
        if fields is not None:
            df = df.select("doc_id", *fields)
        return df

    def payload_scores(self, term: str, agg: str = "sum", boost: float = 1.0) -> DataFrame:
        """(doc_id, score): per-doc aggregate of the term's occurrence
        payloads — the PayloadScoreQuery/PayloadFunction analog (Sum/Max/Min/
        Average over payloads seen at matching positions; includeSpanScore =
        false form). Requires ``payload_fn`` at build time."""
        if not self.index.extra.get("has_payloads", False):
            raise ValueError("index was built without payloads — pass payload_fn to build_index")
        fns = {"sum": F.sum, "max": F.max, "min": F.min, "avg": F.avg}
        if agg not in fns:
            raise ValueError(f"agg must be one of {sorted(fns)}")
        occ = self.term_occurrences([term])
        return occ.groupBy("doc_id").agg(
            (fns[agg]("payload") * F.lit(float(boost))).alias("score")
        )

    def matches(self, q: Query, name: str | None = None) -> DataFrame:
        """Weight.matches analog (search/Matches.kt / MatchesIterator.kt):
        every match interval of ``q`` over documents matching the whole
        query — ``(doc_id, query, start_position, end_position,
        start_offset, end_offset)`` ordered by (doc, start, end), offsets -1
        on positions-only indexes. ``name`` = NamedMatches.kt relabeling.
        See ``search/matches.py`` for the distributed-iterator mapping."""
        from lucene_kmp_spark.search.matches import matches_df

        return matches_df(self, q, name=name)

    # ------------------------------------------------------------ match sets
    def _doc_set(self, q: Query, dedup: bool = True) -> DataFrame:
        """doc_ids matching q (ScoreMode.NO_SCORES path). ``dedup=False``
        skips the distinct() shuffle — safe whenever the result feeds a
        semi/anti join, which dedups implicitly."""
        if getattr(q, "rewrite_method", None) == "doc_values":
            return self._docvalues_docset(q, dedup=dedup)
        pred = self._term_pred(q)
        if pred is not None:
            return self._docs_for_term_filter(pred, dedup)
        if isinstance(q, ColumnFilterQuery):
            return self.index.docs.filter(q.sql_predicate).select("doc_id")
        if isinstance(q, RangeFieldQuery):
            return self.index.docs.filter(_range_field_pred(q)).select("doc_id")
        if isinstance(q, (LatLonBoxQuery, LatLonDistanceQuery, LatLonPolygonQuery, InetAddressRangeQuery, XYBoxQuery, XYDistanceQuery, XYPolygonQuery)):
            from lucene_kmp_spark.search.geo import geo_docset

            return geo_docset(self.index.docs, q)
        if isinstance(q, IndexSortRangeQuery):
            return self._index_sort_range_docset(q)
        if isinstance(q, FieldExistsQuery):
            return self.index.docs.filter(F.col(q.column).isNotNull()).select("doc_id")
        if isinstance(q, MatchAllDocsQuery):
            return self.index.docs.select("doc_id")
        if isinstance(q, MatchNoDocsQuery):
            return self.index.spark.createDataFrame([], schema="doc_id long")
        if isinstance(q, ConstantScoreQuery):
            return self._doc_set(q.query)
        if isinstance(q, IndexOrDocValuesQuery):
            return self._doc_set(q.index_query)
        # general fallback: scored execution, keep doc ids
        return self.execute(q).select("doc_id")

    def _term_pred(self, q: Query):
        """Postings/term-dict `term` predicate for the multi-term family, or
        None when q is not a term-level query."""
        if isinstance(q, TermQuery):
            return F.col("term") == q.term
        if isinstance(q, TermInSetQuery):
            return F.col("term").isin(list(q.terms))
        if isinstance(q, PrefixQuery):
            return F.col("term").startswith(q.prefix)
        if isinstance(q, WildcardQuery):
            return F.col("term").rlike(_wildcard_to_regex(q.pattern))
        if isinstance(q, RegexpQuery):
            return F.col("term").isin(self._regexp_terms(q))
        if isinstance(q, TermRangeQuery):
            return _range_pred(q)
        return None

    def _docs_for_term_filter(
        self, pred, dedup: bool = True, doc_bound: int | None = None
    ) -> DataFrame:
        """Decode doc_ids only for postings whose term matches a predicate.

        The term predicate is pushed into the Parquet scan of the postings
        table (PushedFilters on the `term` column — the term-dictionary
        lookup of ``codecs/lucene90/blocktree`` becomes file/row-group
        pruning). ``doc_bound`` additionally prunes whole posting blocks via
        the level-0 skip column (``min_doc_id < bound``) — the early-
        termination path's IO cut."""
        rows = self.index.postings.filter(pred)
        if doc_bound is not None:
            rows = rows.filter(F.col("min_doc_id") < int(doc_bound))
        rows = rows.select("doc_ids_enc")
        bound = doc_bound

        def gen(batches):
            from lucene_kmp_spark.util.packing import delta_block_decode

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                arrs = [delta_block_decode(bytes(b)) for b in pdf["doc_ids_enc"].values]
                ids = np.concatenate(arrs)
                if bound is not None:
                    ids = ids[ids < bound]  # straddling block tail
                yield pd.DataFrame({"doc_id": ids})

        out = rows.mapInPandas(gen, schema="doc_id long")
        return out.distinct() if dedup else out

    def _docvalues_docset(self, q: Query, dedup: bool = True) -> DataFrame:
        """DocValuesRewriteMethod (search/DocValuesRewriteMethod.kt): evaluate
        a multi-term query through the DOCVALUES access path instead of
        postings — the reference runs the automaton over the field's
        SORTED_SET docvalues TermsEnum, collects accepted ords into a bitset,
        and matches docs whose per-doc ord list intersects it. The engine's
        per-doc sorted-set view of an analyzed field is the term-vector
        forward index (``build_index(term_vectors=True)`` — one row per
        (doc_id, term)), so the rewrite is ONE predicate-pushed scan of that
        table: the term predicate prunes Parquet row groups (the ord-bitset
        analog) and the distinct doc_ids come back without touching postings.
        RegexpQuery keeps its term-dict DFA expansion first (the reference
        also enumerates the terms dictionary) and pushes the matched set as
        an ``isin``. Match parity with the postings form is guaranteed by
        construction — both derive from the same tokenize pass."""
        if self.index.term_vectors is None:
            raise ValueError(
                "doc_values rewrite needs the docvalues access path — build "
                "the index with term_vectors=True (the per-doc sorted-set view)"
            )
        pred = self._term_pred(q)
        if pred is None:
            raise NotImplementedError(
                f"doc_values rewrite does not apply to {type(q).__name__}"
            )
        out = self.index.term_vectors.filter(pred).select("doc_id")
        # dedup=False callers (FILTER/MUST_NOT semi-joins) dedup implicitly —
        # skip the distinct shuffle over the (doc, term) forward index
        return out.distinct() if dedup else out

    def _regexp_terms(self, q: RegexpQuery) -> list[str]:
        """Expand a Lucene-syntax regexp (RegExp.kt grammar — union,
        intersection `&`, intervals `<n-m>`, anystring `@`, quoted strings,
        opt-in complement `~`) against the term dictionary, the
        AutomatonTermsEnum analog (index/AutomatonTermsEnum.kt): the
        compiled DFA runs partition-parallel in a pandas UDF over the term
        dict; the DFA's common literal prefix is additionally pushed into
        the Parquet scan (the automaton seek-prefix optimization). Only the
        matching term strings come back to the driver — term dict ≪ corpus,
        the same expansion pattern FuzzyQuery uses."""
        from lucene_kmp_spark.util.regexp import compile_regexp

        dfa = compile_regexp(q.regexp, q.syntax_flags, q.match_flags)

        @F.pandas_udf("boolean")
        def _matches(s: pd.Series) -> pd.Series:
            return s.map(dfa.match)

        cand = self.index.term_dict
        prefix = dfa.common_prefix()
        if prefix:
            cand = cand.filter(F.col("term").startswith(prefix))
        return sorted(
            r["term"]
            for r in cand.filter(_matches(F.col("term"))).select("term").distinct().collect()
        )

    # --------------------------------------------- multi-term rewrite methods
    def _multiterm_terms(self, q: Query) -> list[str]:
        """Expand a multi-term query against the term dictionary, returning
        the matching term strings in lexicographic order (the TermsEnum
        iteration order every RewriteMethod consumes — TopTermsRewrite.kt:88
        asserts terms arrive sorted). The predicate is pushed into the
        Parquet scan of the term dict; only matching strings come back to
        the driver (term dict ≪ corpus — the FuzzyTermsEnum pattern)."""
        if isinstance(q, RegexpQuery):
            return self._regexp_terms(q)  # already sorted
        pred = self._term_pred(q)
        rows = self.index.term_dict.filter(pred).select("term").distinct().collect()
        return sorted(r["term"] for r in rows)

    def _exec_multiterm_rewrite(self, q: Query, rw: str) -> DataFrame:
        """Scoring rewrite methods for the multi-term family
        (ScoringRewrite.kt:152 SCORING_BOOLEAN_REWRITE / :185
        CONSTANT_SCORE_BOOLEAN_REWRITE; TopTermsRewrite.kt + the three
        MultiTermQuery.kt builders). Top-terms selection keeps the
        ``rewrite_size`` highest-boost terms, ties toward the
        lexicographically smaller term (TopTermsRewrite.kt:95-97) — the
        pattern-expansion enums emit constant boost 1.0, so that is the
        ``rewrite_size`` smallest matching terms."""
        terms = self._multiterm_terms(q)
        boost = float(getattr(q, "boost", 1.0))
        if not terms:
            return self.index.spark.createDataFrame([], schema="doc_id long, score double")
        if rw in ("scoring_boolean", "constant_score_boolean"):
            if len(terms) > MAX_CLAUSE_COUNT:
                raise ValueError(
                    f"TooManyClauses: {len(terms)} expanded terms > maxClauseCount "
                    f"{MAX_CLAUSE_COUNT} (IndexSearcher.kt maxClauseCount); use a "
                    "constant_score or top_terms rewrite"
                )
            if rw == "constant_score_boolean":
                # SCORING_BOOLEAN then score stripped (ScoringRewrite.kt:185-192)
                return self._doc_set(q).withColumn(
                    "score", F.lit(boost).cast("double")
                )
        else:
            size = min(int(getattr(q, "rewrite_size", 50)), MAX_CLAUSE_COUNT)
            terms = terms[:size]
        if rw in ("scoring_boolean", "top_terms_scoring_boolean"):
            # SHOULD boolean of per-term TermQuery, each with its own stats
            # (ScoringRewrite addClause: BoostQuery(TermQuery(term), boost))
            bq = BooleanQuery.build(should=[TermQuery(t, boost=boost) for t in terms])
            return self._exec_boolean(bq)
        if rw == "top_terms_blended_freqs":
            return self._exec_blended_terms(terms, boost)
        if rw == "top_terms_boost":
            # per-clause ConstantScoreQuery(TermQuery)·boost summed
            # (MultiTermQuery.kt:149-176): score = #matching expanded terms
            rows = self._docs_for_term_filter(F.col("term").isin(terms), dedup=False)
            return rows.groupBy("doc_id").agg(
                (F.count(F.lit(1)) * F.lit(boost)).cast("double").alias("score")
            )
        raise ValueError(f"unknown multi-term rewrite method: {rw}")

    def _exec_blended_terms(self, terms: list[str], boost: float) -> DataFrame:
        """TOP_TERMS_BLENDED_FREQ_REWRITE scoring (MultiTermQuery.kt:107-139
        via BlendedTermQuery.kt:225-234): every expanded term is scored with
        ARTIFICIAL stats — df lifted to the max across the expanded terms,
        ttf to their sum — so rare expansions can't dominate on idf; the
        per-term scores then sum per doc (BlendedTermQuery.BOOLEAN_REWRITE,
        the disjunction the builder installs at :122)."""
        st = self.term_stats(terms)
        if not st:
            return self.index.spark.createDataFrame([], schema="doc_id long, score double")
        df_max = max(s.df for s in st.values())
        ttf_sum = sum(s.ttf for s in st.values())
        blended = {t: TermStats(df_max, ttf_sum) for t in st}
        sdf = self._scored_terms_df({t: boost for t in st}, stats=blended)
        return sdf.groupBy("doc_id").agg(F.sum("score").alias("score"))

    # ------------------------------------------------------------- execution
    def execute(self, q: Query) -> DataFrame:
        """Full match set with scores: DataFrame(doc_id long, score double)."""
        q = rewrite_query(q)
        # SpanMultiTermQueryWrapper rewrite happens before the stats prefetch
        # so the expanded terms' stats are fetched in the same single lookup
        q = self._expand_span_multiterms(q)
        self.term_stats(list(_collect_terms(q)))  # one stats lookup per search
        return self._live(self._exec(q))

    def _exec(self, q: Query) -> DataFrame:
        if isinstance(q, TermQuery):
            return self._scored_terms_df({q.term: q.boost}).select("doc_id", "score")
        if isinstance(q, SynonymQuery):
            return self._exec_synonym(q)
        if isinstance(q, BooleanQuery):
            return self._exec_boolean(q)
        if isinstance(q, PhraseQuery):
            return self._exec_phrase(q)
        if isinstance(q, (PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery, TermInSetQuery)):
            rw = getattr(q, "rewrite_method", "constant_score")
            if rw == "doc_values":
                # DocValuesRewriteMethod (search/DocValuesRewriteMethod.kt):
                # constant-score over the docvalues access path
                return self._docvalues_docset(q).withColumn(
                    "score", F.lit(float(getattr(q, "boost", 1.0))).cast("double")
                )
            if rw in ("constant_score", "constant_score_blended"):
                # CONSTANT_SCORE[_BLENDED] rewrite (MultiTermQuery.kt:21-70,
                # :247): match set, score = boost — the default
                return self._doc_set(q).withColumn("score", F.lit(float(q.boost)).cast("double"))
            return self._exec_multiterm_rewrite(q, rw)
        if isinstance(q, FuzzyQuery):
            return self._exec_fuzzy(q)
        if isinstance(q, ConstantScoreQuery):
            return self._doc_set(q.query).withColumn("score", F.lit(float(q.boost)).cast("double"))
        if isinstance(q, IndexOrDocValuesQuery):
            # bulk scoring consumes the whole doc set -> index form always
            # (IndexOrDocValuesQuery.kt:145-148 bulkScorer override)
            out = self._exec(q.index_query)
            if q.boost != 1.0:
                out = out.select("doc_id", (F.col("score") * F.lit(float(q.boost))).alias("score"))
            return out
        if isinstance(q, MatchAllDocsQuery):
            return self.index.docs.select("doc_id").withColumn("score", F.lit(float(q.boost)).cast("double"))
        if isinstance(q, MatchNoDocsQuery):
            return self.index.spark.createDataFrame([], schema="doc_id long, score double")
        if isinstance(q, DisjunctionMaxQuery):
            return self._exec_dismax(q)
        if isinstance(q, IndriAndQuery):
            return self._exec_indri_and(q)
        if isinstance(q, KnnFloatVectorQuery):
            return self._exec_knn(q)
        if isinstance(q, (KnnByteVectorQuery, VectorSimilarityQuery, SeededKnnVectorQuery)):
            return self._exec_vector_family(q)
        if isinstance(q, ColumnFilterQuery):
            return self._doc_set(q).withColumn("score", F.lit(0.0))
        if isinstance(q, RangeFieldQuery):
            return self._doc_set(q).withColumn("score", F.lit(float(q.boost)).cast("double"))
        if isinstance(q, (LatLonBoxQuery, LatLonDistanceQuery, LatLonPolygonQuery, InetAddressRangeQuery, XYBoxQuery, XYDistanceQuery, XYPolygonQuery)):
            return self._doc_set(q).withColumn("score", F.lit(float(q.boost)).cast("double"))
        if isinstance(q, LatLonDistanceFeatureQuery):
            from lucene_kmp_spark.search.geo import distance_feature_scores

            return distance_feature_scores(self.index.docs, q)
        if isinstance(q, LongDistanceFeatureQuery):
            # document/LongDistanceFeatureQuery.kt score shape — pure column
            # expression over the stored field, no Python, no shuffle
            score = (
                F.lit(float(q.boost))
                * F.lit(float(q.pivot))
                / (F.lit(float(q.pivot)) + F.abs(F.col(q.field) - F.lit(int(q.origin))))
            )
            return self._live(
                self.index.docs.filter(F.col(q.field).isNotNull()).select(
                    "doc_id", score.cast("double").alias("score")
                )
            )
        if isinstance(q, IndexSortRangeQuery):
            return self._doc_set(q).withColumn("score", F.lit(float(q.boost)).cast("double"))
        if isinstance(q, FieldExistsQuery):
            return self._doc_set(q).withColumn("score", F.lit(float(q.boost)).cast("double"))
        if isinstance(q, FeatureQuery):
            return self._exec_feature(q)
        if isinstance(q, FunctionScoreQuery):
            return self._exec_function_score(q)
        if isinstance(q, BoostByQueryScoreQuery):
            # boostByQuery: left join the boost query's match SET (never its
            # scores) and multiply conditionally — matches are unchanged
            inner = self._exec(q.query)
            bset = self._doc_set(q.boost_match).withColumn("_bm", F.lit(1))
            j = inner.join(bset, "doc_id", "left")
            mult = F.when(F.col("_bm").isNotNull(), F.lit(float(q.value))).otherwise(F.lit(1.0))
            return j.select(
                "doc_id",
                (F.col("score") * mult * F.lit(float(q.boost))).cast("double").alias("score"),
            )
        if isinstance(q, MultiPhraseQuery):
            return self._exec_multi_phrase(q)
        if isinstance(q, SpanNearQuery):
            if all(isinstance(t, str) for t in q.terms):
                return self._exec_span_near(q)  # term-clause fast path
            return self._exec_span_generic(self._expand_span_multiterms(q))
        if isinstance(
            q,
            (
                SpanTermQuery,
                SpanOrQuery,
                SpanNotQuery,
                SpanFirstQuery,
                SpanContainingQuery,
                SpanWithinQuery,
                SpanPositionRangeQuery,
            ),
        ):
            return self._exec_span_generic(self._expand_span_multiterms(q))
        if isinstance(q, SpanMultiTermWrapper):
            return self._exec_span_generic(self._expand_span_multiterms(q))
        raise NotImplementedError(type(q).__name__)

    def _expand_span_multiterms(self, q):
        """Rewrite SpanMultiTermWrapper nodes to SpanOr over the expanded
        terms (SpanMultiTermQueryWrapper.kt rewrite): the wrapped multi-term
        predicate runs against the term dictionary (pushed-down scan, only
        the matching term strings are collected — term dict ≪ corpus)."""
        if isinstance(q, SpanMultiTermWrapper):
            inner = q.wrapped
            if isinstance(inner, PrefixQuery):
                pred = F.col("term").startswith(inner.prefix)
            elif isinstance(inner, WildcardQuery):
                pred = F.col("term").rlike(_wildcard_to_regex(inner.pattern))
            elif isinstance(inner, RegexpQuery):
                pred = F.col("term").isin(self._regexp_terms(inner))
            elif isinstance(inner, TermRangeQuery):
                pred = _range_pred(inner)
            elif isinstance(inner, FuzzyQuery):
                # FuzzyTermsEnum expansion (same candidates / similarity
                # ordering / cap as _exec_fuzzy) — ComplexPhraseQueryParser
                # wraps fuzzy phrase elements this way
                return SpanOrQuery(
                    tuple(SpanTermQuery(t) for t in self._fuzzy_terms(inner)),
                    boost=q.boost,
                )
            else:
                raise NotImplementedError(
                    f"SpanMultiTermWrapper over {type(inner).__name__}"
                )
            terms = sorted(
                r["term"] for r in self.index.term_dict.filter(pred).select("term").collect()
            )
            return SpanOrQuery(
                tuple(SpanTermQuery(t) for t in terms), boost=q.boost
            )
        if isinstance(q, SpanOrQuery):
            return SpanOrQuery(
                tuple(self._expand_span_multiterms(c) for c in q.clauses), boost=q.boost
            )
        if isinstance(q, SpanNotQuery):
            return SpanNotQuery(
                self._expand_span_multiterms(q.include),
                self._expand_span_multiterms(q.exclude),
                q.pre,
                q.post,
                q.boost,
            )
        if isinstance(q, SpanFirstQuery):
            return SpanFirstQuery(self._expand_span_multiterms(q.match), q.end, q.boost)
        if isinstance(q, SpanPositionRangeQuery):
            return SpanPositionRangeQuery(
                self._expand_span_multiterms(q.match), q.start, q.end, q.boost
            )
        if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
            return type(q)(
                self._expand_span_multiterms(q.big),
                self._expand_span_multiterms(q.little),
                q.boost,
            )
        if isinstance(q, SpanNearQuery):
            return SpanNearQuery(
                tuple(
                    t if isinstance(t, str) else self._expand_span_multiterms(t)
                    for t in q.terms
                ),
                q.slop,
                q.in_order,
                q.boost,
            )
        # non-span containers that may hold span clauses
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                tuple(
                    BooleanClause(c.occur, self._expand_span_multiterms(c.query))
                    for c in q.clauses
                ),
                q.minimum_should_match,
                q.boost,
            )
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(self._expand_span_multiterms(q.query), q.boost)
        if isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                tuple(self._expand_span_multiterms(c) for c in q.queries),
                q.tie_breaker,
                q.boost,
            )
        return q

    def _exec_feature(self, q: FeatureQuery) -> DataFrame:
        """FeatureField score functions (document/FeatureField.kt) as pure
        column expressions — stays in whole-stage codegen, no Python."""
        s = F.col(q.column).cast("double")
        if q.function == "log":
            expr = F.log(F.lit(float(q.scale)) + s)
        elif q.function == "saturation":
            expr = s / (s + F.lit(float(q.pivot)))
        elif q.function == "sigmoid":
            p = F.pow(s, F.lit(float(q.exp)))
            expr = p / (p + F.pow(F.lit(float(q.pivot)), F.lit(float(q.exp))))
        else:
            raise ValueError(f"unknown feature function {q.function!r}")
        return (
            self.index.docs.filter(F.col(q.column).isNotNull() & (s > 0))
            .select("doc_id", (F.lit(float(q.boost)) * expr).alias("score"))
        )

    def _exec_function_score(self, q: FunctionScoreQuery) -> DataFrame:
        """FunctionScoreQuery (upstream queries/function module): the wrapped
        query supplies the match set and ``_score``; the final score is the
        Catalyst expression ``q.source`` over the doc's stored-field row.
        The docs join is column-pruned by Catalyst to exactly the fields the
        expression references; the expression itself stays JVM-side in
        whole-stage codegen."""
        inner = self._exec(q.query).withColumnRenamed("score", "_score")
        j = inner.join(self.index.docs, "doc_id")
        val = F.expr(q.source).cast("double")
        return j.select(
            "doc_id", (F.lit(float(q.boost)) * val).cast("double").alias("score")
        )

    def _exec_multi_phrase(self, q: MultiPhraseQuery) -> DataFrame:
        """MultiPhraseQuery.kt:31 — per position, ANY of the slot's terms may
        match; position sets of a slot are the union over its alternatives.
        idf = sum over all alternative terms (createWeight gathers every
        term's TermStates)."""
        all_terms = [t for slot in q.slots for t in slot]
        stats = self.term_stats(all_terms)
        live_slots = [tuple(t for t in slot if t in stats) for slot in q.slots]
        if any(not slot for slot in live_slots):
            return self._exec(MatchNoDocsQuery())
        scorer = self._make_scorer(
            q.boost,
            [stats[t] for t in dict.fromkeys(t for slot in live_slots for t in slot)],
        )

        # ONE positions scan for every alternative term, slot-mapped pivot in
        # a single hash aggregate (the same 1-scan/1-shuffle shape as plain
        # phrases' _pivoted_positions) — replaces the per-slot scan + join
        # cascade (n scans, n aggregates, n-1 shuffles)
        uniq_terms = list(dict.fromkeys(t for slot in live_slots for t in slot))
        # lead-slot skip pruning: a slot's cost is the sum of its
        # alternatives' dfs (the union iterator's cost)
        block_filter = self._conjunctive_block_filter(
            [
                (tuple(slot), sum(stats[t].df for t in slot if t in stats))
                for slot in live_slots
            ]
        )
        self._last_lead_prune = "pruned" if block_filter is not None else "unpruned"
        pos = self._positions_df(uniq_terms, block_filter=block_filter)
        aggs = [
            F.array_sort(
                F.flatten(
                    F.collect_list(
                        F.when(F.col("term").isin(list(slot)), F.col("positions"))
                    )
                )
            ).alias(f"_pos_{i}")
            for i, slot in enumerate(live_slots)
        ]
        aggs.append(F.max("norm").alias("norm"))
        joined = pos.groupBy("doc_id").agg(*aggs)
        for i in range(len(live_slots)):
            joined = joined.filter(F.size(F.col(f"_pos_{i}")) > 0)

        pos_cols = [f"_pos_{i}" for i in range(len(live_slots))]
        gen = _phrase_verify_gen(pos_cols, "norm", q.slop, live_slots, scorer)
        return joined.mapInPandas(gen, schema="doc_id long, score double")

    def _exec_span_near(self, q: SpanNearQuery) -> DataFrame:
        """SpanNearQuery over term clauses (queries/spans/SpanNearQuery.kt,
        NearSpansOrdered.kt / NearSpansUnordered.kt): per-doc matches with
        total gap <= slop, optionally in order; per-match weight
        1/(1 + matchWidth) summed into the sloppy freq (SpanScorer)."""
        terms = list(q.terms)
        stats = self.term_stats(terms)
        if len(stats) < len(set(terms)):
            return self._exec(MatchNoDocsQuery())
        scorer = self._make_scorer(q.boost, [stats[t] for t in dict.fromkeys(terms)])

        uniq = list(dict.fromkeys(terms))
        joined = self._pivoted_positions(uniq, stats=stats)
        pos_cols = [f"_pos_{uniq.index(t)}" for t in terms]
        slop, in_order = q.slop, q.in_order

        def gen(batches):
            for pdf in batches:
                out_doc, out_freq, out_norm = [], [], []
                col_vals = [pdf[c].values for c in pos_cols]
                for doc_id, norm, *plists_raw in zip(
                    pdf["doc_id"].values, pdf["norm"].values, *col_vals
                ):
                    plists = [np.asarray(p, dtype=np.int64) for p in plists_raw]
                    freq = (
                        _span_near_ordered_freq(plists, slop)
                        if in_order
                        else _span_near_unordered_freq(plists, slop)
                    )
                    if freq > 0:
                        out_doc.append(int(doc_id))
                        out_freq.append(freq)
                        out_norm.append(int(norm))
                sc = scorer.score(np.array(out_freq), np.array(out_norm, dtype=np.int64))
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_doc, dtype="int64"),
                        "score": sc.astype(np.float64),
                    }
                )

        return joined.mapInPandas(gen, schema="doc_id long, score double")

    def _exec_synonym(self, q: SynonymQuery) -> DataFrame:
        """SynonymQuery.kt:40 — blended stats: df = max over terms, freq summed."""
        stats = self.term_stats(list(q.terms))
        if not stats:
            return self._exec(MatchNoDocsQuery())
        blended_df = max(st.df for st in stats.values())
        blended_ttf = sum(st.ttf for st in stats.values())
        scorer = self._make_scorer(q.boost, [TermStats(blended_df, blended_ttf)])
        pos = self._positions_df(list(q.terms)).select("doc_id", "tf", "norm")
        agg = pos.groupBy("doc_id").agg(F.sum("tf").alias("tf"), F.max("norm").alias("norm"))

        def gen(batches):
            for pdf in batches:
                sc = scorer.score(pdf["tf"].values, pdf["norm"].values)
                yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "score": sc.astype(np.float64)})

        return agg.mapInPandas(gen, schema="doc_id long, score double")

    def _exec_knn(self, q: "KnnFloatVectorQuery") -> DataFrame:
        """KnnFloatVectorQuery: exact pre-filtered top-k over the attached
        vector store (AbstractKnnVectorQuery.kt exactSearch analog). The
        filter Query's match set is evaluated first and semi-joined before
        scoring — never a post-filter of k results."""
        from lucene_kmp_spark.search.knn import knn_topk

        if self.vectors is None:
            raise ValueError(
                "KnnFloatVectorQuery needs IndexSearcher(vectors=...) — a "
                "DataFrame with (doc_id, embedding) columns"
            )
        docset = self._doc_set(q.filter) if q.filter is not None else None
        # deletes are excluded BEFORE the top-k heap (Lucene's liveDocs
        # acceptDocs in the vector visit), not post-filtered from k results
        return knn_topk(
            self._live(self.vectors),
            list(q.vector),
            k=q.k,
            fn=q.fn,
            predicate=q.filter_predicate,
            docset=docset,
            boost=q.boost,
        ).select("doc_id", F.col("score").cast("double"))

    def _exec_vector_family(self, q) -> DataFrame:
        """KnnByteVectorQuery / Float|ByteVectorSimilarityQuery /
        SeededKnnVectorQuery over the attached vector store — all share the
        KnnFloatVectorQuery pre-filter + single-columnar-scan shape
        (see ``search/knn.py`` for the per-query plan notes)."""
        from lucene_kmp_spark.search.knn import (
            knn_byte_topk,
            seeded_ivf_topk,
            vector_similarity_all,
        )

        if self.vectors is None:
            raise ValueError(
                "vector queries need IndexSearcher(vectors=...) — a "
                "DataFrame with (doc_id, embedding) columns"
            )
        live = self._live(self.vectors)
        if isinstance(q, KnnByteVectorQuery):
            docset = self._doc_set(q.filter) if q.filter is not None else None
            out = knn_byte_topk(
                live, list(q.vector), k=q.k, fn=q.fn,
                predicate=q.filter_predicate, docset=docset, boost=q.boost,
            )
        elif isinstance(q, VectorSimilarityQuery):
            docset = self._doc_set(q.filter) if q.filter is not None else None
            out = vector_similarity_all(
                live, list(q.vector), q.result_similarity,
                traversal_similarity=q.traversal_similarity, fn=q.fn,
                predicate=q.filter_predicate, docset=docset, boost=q.boost,
                byte_vectors=q.byte_vectors,
            )
        else:  # SeededKnnVectorQuery
            seed_docs = self._doc_set(q.seed)
            out = seeded_ivf_topk(
                live, list(q.vector), [list(c) for c in q.centroids],
                seed_docs, k=q.k, fn=q.fn, id_col="doc_id",
                fallback_n_probe=q.fallback_n_probe,
            )
            if q.boost != 1.0:
                out = out.withColumn("score", F.col("score") * F.lit(float(q.boost)))
        return out.select("doc_id", F.col("score").cast("double"))

    def _exec_indri_and(self, q: "IndriAndQuery") -> DataFrame:
        """Indri AND (IndriAndScorer.kt:21-46 scoreDoc): match the UNION of
        clause docs; per doc each clause contributes its IndriDirichlet
        log-prob if the term occurs, else the smoothing (background) score —
        weighted mean over clause weights. Plan: ONE freqs scan pivoted per
        doc + a norms join (docLen is needed even for absent clauses), one
        Arrow pass for the kernel. The per-clause kernel is exactly
        IndriDirichletSimilarity's formula (score and smoothing coincide as
        tf->0, so one expression covers both branches)."""
        stats = self.term_stats(list(q.terms))
        live = [(t, w) for t, w in zip(
            q.terms, q.weights or (1.0,) * len(q.terms)
        ) if t in stats]
        if not live:
            return self._exec(MatchNoDocsQuery())
        s = self.index.stats
        mu = float(q.mu)
        ps = [stats[t].ttf / float(s.sum_total_term_freq) for t, _ in live]
        ws = [float(w) for _, w in live]
        w_sum = sum(ws)
        outer = float(q.boost)

        tf = self.term_freqs([t for t, _ in live])
        aggs = [
            F.first(F.when(F.col("term") == t, F.col("tf")), ignorenulls=True).alias(f"_tf_{i}")
            for i, (t, _) in enumerate(live)
        ]
        pivot = tf.groupBy("doc_id").agg(*aggs)
        joined = pivot.join(self.index.norms, "doc_id")
        tf_cols = [f"_tf_{i}" for i in range(len(live))]

        def gen(batches):
            for pdf in batches:
                dl = LENGTH_TABLE[pdf["norm"].values.astype(np.int64) & 0xFF].astype(np.float64)
                acc = np.zeros(len(pdf), dtype=np.float64)
                for c, p, w in zip(tf_cols, ps, ws):
                    tfv = pdf[c].values.astype(np.float64)
                    tfv = np.nan_to_num(tfv, nan=0.0)  # absent clause -> tf 0
                    acc += w * np.log((tfv + mu * p) / (dl + mu))
                sc = outer * acc / w_sum
                yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "score": sc})

        return joined.mapInPandas(gen, schema="doc_id long, score double")

    def _exec_boolean(self, q: BooleanQuery) -> DataFrame:
        musts = [c.query for c in q.clauses if c.occur == Occur.MUST]
        shoulds = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
        filters = [c.query for c in q.clauses if c.occur == Occur.FILTER]
        must_nots = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]
        msm = q.minimum_should_match

        def _batchable(qs):
            # distinct bare TermQuerys can share ONE postings scan + decode
            # pass instead of one stage per clause (the per-clause scores and
            # match counts are recovered from the combined rows)
            return (
                len(qs) >= 2
                and all(type(x) is TermQuery for x in qs)
                and len({x.term for x in qs}) == len(qs)
            )

        base = None
        if musts:
            if _batchable(musts):
                boosts = {m.term: m.boost for m in musts}
                stats = self.term_stats(list(boosts))
                rows = self._conjunction_window_rows(boosts, stats)
                scored = self._scored_terms_df(boosts, stats=stats, postings_rows=rows)
                base = (
                    scored.groupBy("doc_id")
                    .agg(F.sum("score").alias("score"), F.count("*").alias("_m_cnt"))
                    .filter(F.col("_m_cnt") == len(musts))
                    .select("doc_id", "score")
                )
            else:
                # conjunction ordered by cost ascending (ConjunctionDISI.kt:29-32)
                ordered = sorted(musts, key=self._cost_estimate)
                base = self._exec(ordered[0]).withColumnRenamed("score", "s0")
                for i, m in enumerate(ordered[1:], start=1):
                    nxt = self._exec(m).withColumnRenamed("score", f"s{i}")
                    base = base.join(nxt, "doc_id")
                score_expr = sum(F.col(f"s{i}") for i in range(len(ordered)))
                base = base.select("doc_id", score_expr.alias("score"))

        if shoulds:
            term_qs = [s for s in shoulds if type(s) is TermQuery]
            if _batchable(term_qs):
                sdf = self._scored_terms_df({t.term: t.boost for t in term_qs}).select(
                    "doc_id", "score"
                )
                rest = [s for s in shoulds if type(s) is not TermQuery]
            else:
                sdf, rest = None, list(shoulds)
            for s in rest:
                part = self._exec(s)
                sdf = part if sdf is None else sdf.unionByName(part)
            sagg = sdf.groupBy("doc_id").agg(
                F.sum("score").alias("_s_score"), F.count("*").alias("_s_cnt")
            )
            if base is not None:
                base = base.join(sagg, "doc_id", "left")
                if msm > 0:
                    base = base.filter(F.coalesce(F.col("_s_cnt"), F.lit(0)) >= msm)
                base = base.select(
                    "doc_id",
                    (F.col("score") + F.coalesce(F.col("_s_score"), F.lit(0.0))).alias("score"),
                )
            else:
                base = sagg.filter(F.col("_s_cnt") >= max(msm, 1)).select(
                    "doc_id", F.col("_s_score").alias("score")
                )

        if base is None:
            if filters:
                base = self._doc_set(filters[0]).withColumn("score", F.lit(0.0))
                filters = filters[1:]
            else:
                return self._exec(MatchNoDocsQuery())

        def _join_set(q2):
            if self.filter_cache is not None:
                # key includes the index identity so a cache shared across
                # searchers can never serve doc_ids from another index, and
                # entries die with the index object (LRUQueryCache keys per
                # segment core reader, LRUQueryCache.kt:79)
                return self.filter_cache.get_or_compute(
                    (id(self.index), q2), lambda: self._doc_set(q2, dedup=False), query=q2
                )
            return self._doc_set(q2, dedup=False)

        # leadCost of the conjunction = the cheapest required clause's cost
        # (ConjunctionDISI lead); SHOULD-only bases cost the disjunction sum
        lead_cost = None
        if musts:
            lead_cost = min(self._cost_estimate(m) for m in musts)
        elif shoulds:
            costs = [self._cost_estimate(sq) for sq in shoulds]
            lead_cost = sum(c for c in costs if c < (1 << 60)) or None

        def _resolve(q2):
            if isinstance(q2, IndexOrDocValuesQuery):
                return self._iodv_choose(q2, lead_cost)
            return q2

        for f_q in filters:
            base = base.join(_join_set(_resolve(f_q)), "doc_id", "left_semi")
        for n_q in must_nots:
            base = base.join(_join_set(_resolve(n_q)), "doc_id", "left_anti")
        if q.boost != 1.0:
            base = base.select("doc_id", (F.col("score") * F.lit(float(q.boost))).alias("score"))
        return base

    def _exec_dismax(self, q: DisjunctionMaxQuery) -> DataFrame:
        parts = None
        for sub in q.queries:
            p = self._exec(sub)
            parts = p if parts is None else parts.unionByName(p)
        if parts is None:
            return self._exec(MatchNoDocsQuery())
        tb = float(q.tie_breaker)
        agg = parts.groupBy("doc_id").agg(F.max("score").alias("_mx"), F.sum("score").alias("_sm"))
        return agg.select(
            "doc_id",
            ((F.col("_mx") + F.lit(tb) * (F.col("_sm") - F.col("_mx"))) * F.lit(float(q.boost))).alias("score"),
        )

    def _pivoted_positions(
        self, uniq_terms: list[str], required: bool = True, stats=None
    ) -> DataFrame:
        """(doc_id, _pos_0.._pos_{n-1}, norm) pivoted per doc: one postings
        scan + one hash aggregate, replacing the per-term scan-and-join
        cascade (n scans, n-1 shuffles → 1 scan, 1 shuffle). ``required``
        keeps only docs containing EVERY term (conjunctive); otherwise any.
        With ``stats`` and ``required``, lead-term skip pruning drops hot
        terms' blocks outside the rarest term's doc windows before decode."""
        block_filter = None
        if required and stats:
            block_filter = self._conjunctive_block_filter(
                [((t,), stats[t].df) for t in uniq_terms if t in stats]
            )
        self._last_lead_prune = "pruned" if block_filter is not None else "unpruned"
        pos = self._positions_df(uniq_terms, block_filter=block_filter)
        aggs = [
            F.first(F.when(F.col("term") == t, F.col("positions")), ignorenulls=True).alias(
                f"_pos_{i}"
            )
            for i, t in enumerate(uniq_terms)
        ]
        aggs.append(F.max("norm").alias("norm"))
        out = pos.groupBy("doc_id").agg(*aggs)
        if required:
            for i in range(len(uniq_terms)):
                out = out.filter(F.col(f"_pos_{i}").isNotNull())
        return out

    def _exec_span_generic(self, q) -> DataFrame:
        """Composable span algebra (queries/spans/*): evaluate the span tree
        per candidate doc against its {term: positions} map; freq =
        Σ 1/(1+width) over top-level spans (SpanScorer)."""
        from lucene_kmp_spark.search.spans import span_freq, span_scoring_terms, span_terms

        all_terms = sorted(span_terms(q))
        stats = self.term_stats(all_terms)
        scoring = [stats[t] for t in sorted(span_scoring_terms(q)) if t in stats]
        if not scoring:
            return self._exec(MatchNoDocsQuery())
        scorer = self._make_scorer(q.boost, scoring)
        joined = self._pivoted_positions(all_terms, required=False)
        pos_cols = [f"_pos_{i}" for i in range(len(all_terms))]
        terms_ref = list(all_terms)
        qq = q

        def gen(batches):
            for pdf in batches:
                out_doc, out_freq, out_norm = [], [], []
                col_vals = [pdf[c].values for c in pos_cols]
                for doc_id, norm, *plists in zip(
                    pdf["doc_id"].values, pdf["norm"].values, *col_vals
                ):
                    pos_map = {
                        t: np.asarray(p, dtype=np.int64)
                        for t, p in zip(terms_ref, plists)
                        if p is not None
                    }
                    freq = span_freq(qq, pos_map)
                    if freq > 0:
                        out_doc.append(int(doc_id))
                        out_freq.append(freq)
                        out_norm.append(int(norm))
                sc = scorer.score(np.array(out_freq), np.array(out_norm, dtype=np.int64))
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_doc, dtype="int64"),
                        "score": sc.astype(np.float64),
                    }
                )

        return joined.mapInPandas(gen, schema="doc_id long, score double")

    def _exec_phrase(self, q: PhraseQuery) -> DataFrame:
        """Exact/sloppy phrase: position-join + vectorized verification
        (ExactPhraseMatcher.kt:19-60 / SloppyPhraseMatcher.kt:33)."""
        terms = list(q.terms)
        stats = self.term_stats(terms)
        if len(stats) < len(set(terms)):
            return self._exec(MatchNoDocsQuery())
        # phrase weight from ALL terms' stats — idf-like weights sum across
        # terms (BM25Similarity.kt:134-147 / idfExplain over TermStatistics[])
        scorer = self._make_scorer(q.boost, [stats[t] for t in terms])

        # ONE positions scan for all phrase terms (the term-isin predicate
        # pushes down), pivoted per doc by a single hash aggregate; docs
        # missing any term drop out (the ConjunctionDISI intersection)
        uniq = list(dict.fromkeys(terms))
        joined = self._pivoted_positions(uniq, stats=stats)
        pos_cols = [f"_pos_{uniq.index(t)}" for t in terms]
        gen = _phrase_verify_gen(
            pos_cols, "norm", q.slop, [(t,) for t in terms], scorer
        )
        return joined.mapInPandas(gen, schema="doc_id long, score double")

    def _exec_fuzzy(self, q: FuzzyQuery) -> DataFrame:
        """FuzzyQuery.kt:38,159-162: expand to the top-``max_expansions`` terms
        within ``max_edits``, then score as a boosted disjunction. With
        ``transpositions`` (the reference default) the distance is OSA —
        the reference's own automata conformance oracle is the OSA
        recurrence (TestFuzzyQuery.kt:657-695 getDistance), so this matches
        the tested reference semantics exactly.

        Expansion prefilters JVM-side (length window + ``levenshtein`` pushed
        into the term_dict scan — a transposition costs ≤2 plain edits, so
        ``lev <= 2*max_edits`` is a sound superset for the OSA check); only
        the surviving candidate list is collected."""
        t = q.term
        cand = (
            self.index.term_dict.filter(F.length("term").between(len(t) - q.max_edits, len(t) + q.max_edits))
        )
        if q.prefix_length > 0:
            cand = cand.filter(F.col("term").startswith(t[: q.prefix_length]))
        lev_cap = (2 * q.max_edits) if q.transpositions else q.max_edits
        cand = (
            cand.withColumn("_dist", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("_dist") <= lev_cap)
            .select("term", "_dist", "df")
            .collect()
        )
        if q.transpositions:
            cand = [
                {"term": r["term"], "_dist": d, "df": r["df"]}
                for r in cand
                if (d := _osa_distance(r["term"], t, q.max_edits)) <= q.max_edits
            ]
        if not cand:
            return self._exec(MatchNoDocsQuery())
        scored = []
        for r in cand:
            dist = int(r["_dist"])
            sim = 1.0 - dist / min(len(t), len(r["term"])) if dist > 0 else 1.0
            scored.append((sim, r["term"]))
        scored.sort(key=lambda x: (-x[0], x[1]))
        top = scored[: q.max_expansions]
        sub = tuple(TermQuery(term, boost=q.boost * s) for s, term in top)
        return self._exec(BooleanQuery.build(should=sub))

    def _fuzzy_terms(self, q: FuzzyQuery) -> list[str]:
        """The concrete terms a FuzzyQuery expands to (FuzzyTermsEnum view),
        for consumers that need the term set rather than scores — the
        Matches API and span multi-term wrapping. Same candidate pipeline,
        similarity ordering and expansion cap as ``_exec_fuzzy``."""
        t = q.term
        cand = self.index.term_dict.filter(
            F.length("term").between(len(t) - q.max_edits, len(t) + q.max_edits)
        )
        if q.prefix_length > 0:
            cand = cand.filter(F.col("term").startswith(t[: q.prefix_length]))
        lev_cap = (2 * q.max_edits) if q.transpositions else q.max_edits
        rows = (
            cand.withColumn("_dist", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("_dist") <= lev_cap)
            .select("term", "_dist")
            .collect()
        )
        out = []
        for r in rows:
            dist = int(r["_dist"])
            if q.transpositions:
                dist = _osa_distance(r["term"], t, q.max_edits)
                if dist > q.max_edits:
                    continue
            sim = 1.0 - dist / min(len(t), len(r["term"])) if dist > 0 else 1.0
            out.append((sim, r["term"]))
        out.sort(key=lambda x: (-x[0], x[1]))
        return [term for _sim, term in out[: q.max_expansions]]

    def _iodv_choose(self, q: "IndexOrDocValuesQuery", lead_cost: int | None) -> Query:
        """ScorerSupplier.get(leadCost) dispatch
        (IndexOrDocValuesQuery.kt:131-140): dv form iff
        ``leadCost < indexCost >>> 3`` — the arbitrary 8x penalty because a
        dv check runs once per candidate while the index iterator organizes
        its matches. With no cost anchor the index form wins (bulk path)."""
        if lead_cost is None:
            return q.index_query
        ic = self._cost_estimate(q.index_query)
        if ic >= (1 << 60):
            # refine unknown term-level costs from the term dictionary —
            # a metadata-scale, term-pruned aggregate (the reference reads
            # the same number off its terms index for free)
            pred = self._term_pred(q.index_query)
            if pred is not None:
                row = self.index.term_dict.filter(pred).agg(F.sum("df")).collect()[0][0]
                ic = int(row or 0)
        return q.dv_query if (ic >> 3) > lead_cost else q.index_query

    def _cost_estimate(self, q: Query) -> int:
        if isinstance(q, IndexOrDocValuesQuery):
            # cost() reports the index form (IndexOrDocValuesQuery.kt:150-152)
            return self._cost_estimate(q.index_query)
        if isinstance(q, TermQuery):
            st = self.term_stats([q.term])
            return st[q.term].df if q.term in st else 0
        if isinstance(q, PhraseQuery):
            st = self.term_stats(list(q.terms))
            return min((s.df for s in st.values()), default=0)
        return 1 << 60

    # ----------------------------------------------------------------- top-k
    def _wand_boosts(self, q: Query) -> dict[str, float] | None:
        """Terms+boosts if q is WAND-prunable: a TermQuery, or a SHOULD-only
        BooleanQuery of TermQueries with minimumShouldMatch <= 1
        (BooleanScorerSupplier.kt:472-481 trigger conditions)."""
        q = rewrite_query(q)
        if isinstance(q, TermQuery):
            return {q.term: q.boost}
        if isinstance(q, BooleanQuery) and q.minimum_should_match <= 1 and q.boost == 1.0:
            if all(c.occur == Occur.SHOULD and isinstance(c.query, TermQuery) for c in q.clauses):
                out: dict[str, float] = {}
                for c in q.clauses:
                    # duplicate SHOULD terms merge by summing boosts (BooleanQuery.kt:290-438)
                    out[c.query.term] = out.get(c.query.term, 0.0) + c.query.boost
                return out
        return None

    # fraction of doc_count the clause postings must total before block-max
    # pruning pays for its θ-seed job — A/B-measured at 4.07M turns
    # (BENCH/BASELINE.md "pruning auto-policy"): hot 3-term OR 17.4s→13.9s,
    # hot+rare 8.3s→4.6s with MAXSCORE, but mid/rare ORs and single terms
    # LOSE 1-3s to the fixed seed-collect overhead. At larger corpora the
    # fixed cost amortizes further, so the ratio test is scale-stable.
    AUTO_PRUNE_DF_FRACTION = 0.5

    def _auto_prune(self, q: Query) -> str | bool:
        """Cost-based strategy pick for ``prune="auto"`` — the
        BooleanScorerSupplier role (BooleanScorerSupplier.kt:472-481 decides
        bulk-scorer strategy from clause shape + cost there; here the cost
        signal is Σdf over prunable clause terms vs doc_count)."""
        return self._auto_prune_choice(q)[0]

    def _auto_prune_choice(self, q: Query) -> tuple[str | bool, dict | None]:
        """(strategy, prunable boosts) — boosts returned so top_k does not
        re-run the rewrite + clause extraction."""
        if not self._is_bm25:
            return False, None
        boosts = self._wand_boosts(q)
        if not boosts or len(boosts) < 2:
            # single-term: nothing to outprune, the θ-seed job is pure loss
            return False, boosts
        stats = self.term_stats(list(boosts))
        sum_df = sum(st.df for st in stats.values())
        if sum_df >= self.AUTO_PRUNE_DF_FRACTION * self.index.stats.doc_count:
            return "maxscore", boosts
        return False, boosts

    def top_k(
        self, q: Query, k: int = 10, hydrate: bool = False, prune: bool | str = "auto"
    ) -> DataFrame:
        """TopScoreDocCollector analog: score desc, docID asc on ties
        (HitQueue.kt:56-62) — Spark's TakeOrderedAndProject does the
        per-partition heaps + merge. ``prune`` picks the block-max strategy
        for prunable disjunctions (both exact): ``True``/``"wand"`` =
        window-aligned WAND (WANDScorer.kt), ``"maxscore"`` =
        essential/non-essential MAXSCORE (MaxScoreBulkScorer.kt) — the
        reference's BooleanScorerSupplier picks between the same two.
        ``"auto"`` (default) applies the measured cost policy in
        ``_auto_prune``: MAXSCORE for high-volume prunable disjunctions,
        plain scan otherwise — mirroring the reference's default-on
        TOP_SCORES pruning (IndexSearcher.kt:1024) with a distributed cost
        gate."""
        if prune == "auto":
            prune, boosts = self._auto_prune_choice(q)
            if not prune:
                boosts = None
        else:
            # block-max bounds derive from the BM25 impact formula; other
            # similarities fall back to the exact unpruned plan
            boosts = self._wand_boosts(q) if (prune and self._is_bm25) else None
        if boosts is not None:
            if prune == "maxscore":
                from lucene_kmp_spark.search.wand import topk_disjunction_maxscore as _topk
            else:
                from lucene_kmp_spark.search.wand import topk_disjunction_pruned as _topk

            scored = self._live(_topk(self, boosts, k))
        else:
            scored = self.execute(q)
        if self.dtype == np.float32:
            scored = scored.select("doc_id", F.col("score").cast("float").alias("score"))
        out = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if hydrate:
            out = out.join(self.index.docs, "doc_id", "left").orderBy(F.desc("score"), F.asc("doc_id"))
        return out

    def search_after(self, q: Query, after_score: float, after_doc: int, k: int = 10) -> DataFrame:
        """Pagination (IndexSearcher.kt:363-398): keep hits strictly worse than
        the (score, doc) cursor."""
        scored = self.execute(q)
        if self.dtype == np.float32:
            scored = scored.select("doc_id", F.col("score").cast("float").alias("score"))
        cond = (F.col("score") < after_score) | (
            (F.col("score") == after_score) & (F.col("doc_id") > after_doc)
        )
        return scored.filter(cond).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def explain(self, q: Query, doc_id: int) -> dict:
        """Per-doc score breakdown (search/Explanation.kt;
        BM25Similarity.explain, BM25Similarity.kt:201-245). The top-level
        ``value`` must equal the executed score — CheckHits' re-derivation
        oracle (tests/search/CheckHits.kt:130)."""
        q = rewrite_query(q)
        if isinstance(q, TermQuery) and self._is_bm25:
            st = self.term_stats([q.term])
            if q.term not in st:
                return {"match": False, "value": 0.0, "description": f"no term {q.term!r}"}
            row = (
                self._scored_terms_df({q.term: q.boost}, stats=st)
                .filter(F.col("doc_id") == doc_id)
                .collect()
            )
            if not row:
                return {"match": False, "value": 0.0, "description": "doc does not match"}
            tf = int(row[0]["tf"])
            # norm byte for the doc (from any block containing it)
            dt = self.dtype
            idf_val = bm25.idf(st[q.term].df, self.index.stats.doc_count, dt)
            weight = dt(dt(q.boost) * idf_val)
            score = float(row[0]["score"])
            return {
                "match": True,
                "value": score,
                "description": f"score(freq={tf}), computed as boost * idf * tf",
                "details": [
                    {"value": float(q.boost), "description": "boost"},
                    {
                        "value": float(idf_val),
                        "description": "idf, computed as log(1 + (N - n + 0.5) / (n + 0.5))",
                        "details": [
                            {"value": st[q.term].df, "description": "n, number of documents containing term"},
                            {"value": self.index.stats.doc_count, "description": "N, total number of documents with field"},
                        ],
                    },
                    {
                        "value": score / float(weight) if weight else 0.0,
                        "description": "tf, computed as freq / (freq + k1 * (1 - b + b * dl / avgdl))",
                        "details": [
                            {"value": tf, "description": "freq"},
                            {"value": self.k1, "description": "k1, term saturation parameter"},
                            {"value": self.b, "description": "b, length normalization parameter"},
                            {"value": float(self.avgdl), "description": "avgdl, average length of field"},
                        ],
                    },
                ],
            }
        if isinstance(q, PhraseQuery) and self._is_bm25:
            terms = list(q.terms)
            stats = self.term_stats(terms)
            if len(stats) < len(set(terms)):
                return {"match": False, "value": 0.0, "description": "phrase term missing from index"}
            row = self._exec_phrase(q).filter(F.col("doc_id") == doc_id).collect()
            if not row:
                return {"match": False, "value": 0.0, "description": "doc does not match phrase"}
            # re-derive the phrase freq from this doc's positions
            uniq = list(dict.fromkeys(terms))
            pos_rows = (
                self._positions_df(uniq).filter(F.col("doc_id") == doc_id).collect()
            )
            by_term = {r["term"]: np.asarray(r["positions"], dtype=np.int64) for r in pos_rows}
            plists = [by_term[t] for t in terms]
            if q.slop == 0:
                base0 = plists[0]
                ok = np.ones(len(base0), dtype=bool)
                for i in range(1, len(terms)):
                    ok &= np.isin(base0 + i, plists[i])
                freq = float(ok.sum())
            else:
                freq = sloppy_freq(plists, q.slop, [(t,) for t in terms])
            dt = self.dtype
            idf_details = [
                {
                    "value": float(bm25.idf(stats[t].df, self.index.stats.doc_count, dt)),
                    "description": f"idf(term={t!r}, n={stats[t].df})",
                }
                for t in dict.fromkeys(terms)
            ]
            return {
                "match": True,
                "value": float(row[0]["score"]),
                "description": f"weight(phrase {terms}), phraseFreq={freq}",
                "details": [
                    {"value": float(q.boost), "description": "boost"},
                    {
                        "value": float(sum(d["value"] for d in idf_details)),
                        "description": "idf, sum of per-term idfs:",
                        "details": idf_details,
                    },
                    {"value": freq, "description": "phraseFreq (slop-weighted)" if q.slop else "phraseFreq"},
                    {"value": float(self.avgdl), "description": "avgdl, average length of field"},
                ],
            }
        if isinstance(q, BooleanQuery):
            subs = []
            total = 0.0
            matched = False
            for c in q.clauses:
                if c.occur == Occur.MUST_NOT:
                    continue
                e = self.explain(c.query, doc_id)
                if e.get("match"):
                    matched = True
                    if c.occur in (Occur.MUST, Occur.SHOULD):
                        total += e["value"]
                subs.append({**e, "occur": c.occur.value})
            row = self.execute(q).filter(F.col("doc_id") == doc_id).collect()
            if not row:
                return {"match": False, "value": 0.0, "description": "doc does not match", "details": subs}
            return {
                "match": matched,
                "value": float(row[0]["score"]),
                "description": "sum of:",
                "details": subs,
            }
        row = self.execute(q).filter(F.col("doc_id") == doc_id).collect()
        if not row:
            return {"match": False, "value": 0.0, "description": "doc does not match"}
        return {"match": True, "value": float(row[0]["score"]), "description": type(q).__name__}

    def search_sorted(self, q: Query, sort: list, k: int = 10) -> DataFrame:
        """Sort-by-field top-k (TopFieldCollector.kt:21, SortField.kt:59-113):
        match set (ScoreMode.COMPLETE_NO_SCORES) joined to the stored-field /
        doc-value columns, ``ORDER BY field... , doc_id LIMIT k`` — Spark's
        TakeOrderedAndProject is the distributed field collector. ``sort``
        entries are ``(column, ascending)`` tuples or ``SortField`` values
        (expression sorts, min/max selectors over multi-valued columns,
        missing-value first/last policy); docID asc is the final tiebreak."""
        from lucene_kmp_spark.search.query import SortField

        fields = [
            sf if isinstance(sf, SortField) else SortField(column=sf[0], ascending=sf[1])
            for sf in sort
        ]
        rq = rewrite_query(q)

        def finish(matches: DataFrame) -> DataFrame:
            joined, order, out_names = self._apply_sort_fields(
                matches.join(self.index.docs, "doc_id"), fields
            )
            return joined.orderBy(*order, F.asc("doc_id")).limit(k).select("doc_id", *out_names)

        bounded = self._index_sorted_matches(rq, fields, k)
        if bounded is not None:
            return finish(bounded)
        return finish(self._live(self._doc_set(rq)))

    def _index_sort_range_docset(self, q: "IndexSortRangeQuery") -> DataFrame:
        """IndexSortSortedNumericDocValuesRangeQuery.kt: when the query
        column is the primary ascending index-sort field, matches form one
        contiguous docID interval. The reference finds it with a per-segment
        binary search (getDocIdSetIteratorOrNullFromBkd / BoundedDocIdSet);
        the analog is two stats-pruned boundary aggregates — the docs table
        is WRITTEN in column-sorted order, so ``col >= lower`` prunes every
        Parquet row group below the boundary and ``min(doc_id)`` touches only
        the boundary groups (log-like IO, not a table scan). The match set
        is then a constant-folded ``doc_id BETWEEN`` predicate. Docs without
        a value sort first (nulls-first docID assignment) and never match,
        like the reference's docvalues iterator. Falls back to ``q.fallback``
        (or the plain Catalyst column predicate) when the sort doesn't apply."""
        index_sort = self.index.extra.get("index_sort")
        applies = bool(index_sort) and tuple(index_sort[0]) == (q.column, True)
        if not applies:
            if q.fallback is not None:
                return self._doc_set(q.fallback)
            col = F.col(q.column)
            pred = col.isNotNull()
            if q.lower is not None:
                pred = pred & (col >= F.lit(q.lower))
            if q.upper is not None:
                pred = pred & (col <= F.lit(q.upper))
            return self.index.docs.filter(pred).select("doc_id")
        col = F.col(q.column)
        lo_cond = col.isNotNull() if q.lower is None else (col >= F.lit(q.lower))
        hi_cond = col.isNotNull() if q.upper is None else (col <= F.lit(q.upper))
        lo = self.index.docs.filter(lo_cond).agg(F.min("doc_id")).collect()[0][0]
        hi = self.index.docs.filter(hi_cond).agg(F.max("doc_id")).collect()[0][0]
        if lo is None or hi is None or lo > hi:
            return self.index.spark.createDataFrame([], schema="doc_id long")
        return self.index.docs.select("doc_id").filter(
            (F.col("doc_id") >= int(lo)) & (F.col("doc_id") <= int(hi))
        )

    def _index_sorted_matches(self, rq: Query, fields: list, k: int) -> DataFrame | None:
        """Early termination on index-sorted segments (TopFieldCollector's
        CollectionTerminatedException when the query sort is a prefix of
        IndexWriterConfig.setIndexSort — Sorter.kt / SortingCodecReader.kt).

        With docIDs assigned by ``assign_doc_ids_sorted``, index-sort order
        IS ascending docID order, so the sorted top-k are the k smallest
        matching docIDs. Matches are gathered under a widening ``doc_id <
        bound`` cutoff: the bound prunes posting BLOCKS through the level-0
        skip column before decode (a genuine IO cut, not a post-filter), and
        widens 8x until k live matches are in bound (rare: only when match
        density is below k/bound). Returns None when the index isn't sorted
        compatibly — caller falls back to the full sort."""
        index_sort = self.index.extra.get("index_sort")
        if not index_sort:
            return None
        if any(sf.expr is not None or sf.selector is not None for sf in fields):
            return None
        want = [(sf.column, bool(sf.ascending)) for sf in fields]
        if want != [tuple(p) for p in index_sort[: len(want)]]:
            return None
        pred = self._term_pred(rq)
        if pred is None and not isinstance(rq, MatchAllDocsQuery):
            return None
        max_doc = self.index.stats.max_doc
        bound = max(8 * k, 4096)
        while True:
            if pred is not None:
                m = self._docs_for_term_filter(pred, dedup=True, doc_bound=bound)
            else:
                m = self.index.docs.select("doc_id").filter(F.col("doc_id") < bound)
            m = self._live(m).persist()
            if bound >= max_doc or m.count() >= k:
                return m
            m.unpersist()
            bound *= 8

    def rescore(
        self, first: Query, second: Query, window: int = 100, weight: float = 1.0, k: int = 10
    ) -> DataFrame:
        """QueryRescorer.kt: re-rank the top-``window`` first-pass hits;
        combined = firstPassScore + weight * secondPassScore when the doc
        matches the second query (the reference's default combine). The
        second pass only scores the (tiny) window — joined broadcast-side."""
        top = self.top_k(first, window).select("doc_id", F.col("score").alias("_s1"))
        second_scores = self.execute(second).select("doc_id", F.col("score").alias("_s2"))
        out = top.join(second_scores, "doc_id", "left").select(
            "doc_id",
            (F.col("_s1") + F.lit(float(weight)) * F.coalesce(F.col("_s2"), F.lit(0.0))).alias(
                "score"
            ),
        )
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _apply_sort_fields(self, joined: DataFrame, fields: list):
        """Materialize SortField keys as columns and build the ORDER BY list
        (shared by search_sorted and rescore_sort)."""
        order, out_names = [], []
        for i, sf in enumerate(fields):
            key = F.expr(sf.expr) if sf.expr is not None else F.col(sf.column)
            if sf.selector == "min":
                key = F.array_min(key)
            elif sf.selector == "max":
                key = F.array_max(key)
            elif sf.selector in ("middle_min", "middle_max"):
                # SortedSetSelector.Type MIDDLE_MIN/MIDDLE_MAX
                # (search/SortedSetSelector.kt:256,321): over the doc's
                # ASCENDING DISTINCT value list (SORTED_SET docvalues are a
                # set of ords — duplicates collapse before the middle is
                # picked), index (n-1)>>>1 / n>>>1 — the lower/upper middle
                # (equal for odd n). element_at is 1-based; greatest(...,1)
                # keeps the empty-array branch (NULL via the when guard)
                # from building index 0.
                srt = F.array_sort(F.array_distinct(key))
                half = F.size(srt) - F.lit(1) if sf.selector == "middle_min" else F.size(srt)
                idx = F.greatest(F.floor(half / F.lit(2)).cast("int") + F.lit(1), F.lit(1))
                key = F.when(F.size(srt) > 0, F.element_at(srt, idx)).otherwise(F.lit(None))
            name = sf.name or sf.column or f"sort_key_{i}"
            joined = joined.withColumn(name, key)
            out_names.append(name)
            col = F.col(name)
            if sf.missing_last is None:
                order.append(col.asc() if sf.ascending else col.desc())
            elif sf.missing_last:
                order.append(col.asc_nulls_last() if sf.ascending else col.desc_nulls_last())
            else:
                order.append(col.asc_nulls_first() if sf.ascending else col.desc_nulls_first())
        return joined, order, out_names

    def rescore_sort(self, first: Query, sort: list, window: int = 100, k: int = 10) -> DataFrame:
        """SortRescorer.kt: re-order the top-``window`` first-pass hits by a
        Sort (TopFieldCollector over exactly those docs, docID-asc tiebreak)
        while KEEPING each hit's original first-pass score
        (SortRescorer.kt:77-82 copies the scores back). The window is tiny,
        so the sort-field join broadcasts it against the docs table."""
        from lucene_kmp_spark.search.query import SortField

        fields = [
            sf if isinstance(sf, SortField) else SortField(column=sf[0], ascending=sf[1])
            for sf in sort
        ]
        top = self.top_k(first, window).select("doc_id", "score")
        joined, order, out_names = self._apply_sort_fields(
            F.broadcast(top).join(self.index.docs, "doc_id"), fields
        )
        return (
            joined.orderBy(*order, F.asc("doc_id"))
            .limit(k)
            .select("doc_id", *out_names, "score")
        )

    def count(self, q: Query) -> int:
        """count(query) fast path (IndexSearcher.kt:282-306): term count ==
        df only when there are no deletes, exactly like the reference."""
        q = rewrite_query(q)
        if self.live_filter is None:
            if isinstance(q, TermQuery):
                st = self.term_stats([q.term])
                return st[q.term].df if q.term in st else 0
            if isinstance(q, MatchAllDocsQuery):
                return self.index.stats.max_doc
        return self._live(self._doc_set(q)).count()


def _collect_terms(q: Query) -> set[str]:
    """All index terms referenced by a query tree (for one-shot stats prefetch)."""
    out: set[str] = set()
    if isinstance(q, TermQuery):
        out.add(q.term)
    elif isinstance(q, (PhraseQuery, SynonymQuery, IndriAndQuery)):
        out.update(q.terms)
    elif isinstance(q, (SpanNearQuery, SpanTermQuery, SpanOrQuery, SpanNotQuery, SpanFirstQuery)):
        from lucene_kmp_spark.search.spans import span_terms

        out.update(span_terms(q))
    elif isinstance(q, MultiPhraseQuery):
        out.update(t for slot in q.slots for t in slot)
    elif isinstance(q, BooleanQuery):
        for c in q.clauses:
            out |= _collect_terms(c.query)
    elif isinstance(q, DisjunctionMaxQuery):
        for sub in q.queries:
            out |= _collect_terms(sub)
    elif isinstance(q, (ConstantScoreQuery, FunctionScoreQuery)):
        out |= _collect_terms(q.query)
    elif isinstance(q, BoostByQueryScoreQuery):
        out |= _collect_terms(q.query) | _collect_terms(q.boost_match)
    return out


def _osa_distance(a: str, b: str, cap: int) -> int:
    """Optimal-string-alignment (Damerau with non-overlapping transpositions)
    edit distance, the semantics of the reference's transposition-enabled
    Levenshtein automata (util/automaton/Lev{1,2}TParametricDescription.kt).
    Returns cap+1 early when a row's minimum exceeds ``cap``."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        if min(cur) > cap:
            return cap + 1
        prev2, prev = prev, cur
    return prev[lb]


def _wildcard_to_regex(pattern: str) -> str:
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^" + "".join(out) + "$"


def _range_field_pred(q: RangeFieldQuery):
    """Catalyst predicate for a RangeFieldQuery relation
    (RangeFieldQuery.QueryType semantics; see query.py docstring). Built
    from plain column comparisons so Parquet min/max stats prune the docs
    scan — the distributed analog of BKD inner-node cell rejection.
    ``crosses`` is intersects minus (within OR contains) across all dims
    jointly, matching the reference's whole-range crossing test."""
    intersects = within = contains = F.lit(True)
    for mn, mx, lo, up in q.dimensions():
        dmin, dmax = F.col(mn), F.col(mx)
        intersects = intersects & (dmin <= F.lit(up)) & (dmax >= F.lit(lo))
        within = within & (dmin >= F.lit(lo)) & (dmax <= F.lit(up))
        contains = contains & (dmin <= F.lit(lo)) & (dmax >= F.lit(up))
    if q.relation == "intersects":
        return intersects
    if q.relation == "within":
        return within
    if q.relation == "contains":
        return contains
    return intersects & ~within & ~contains  # crosses


def _range_pred(q: TermRangeQuery):
    pred = F.lit(True)
    if q.lower is not None:
        pred = pred & (F.col("term") >= q.lower if q.include_lower else F.col("term") > q.lower)
    if q.upper is not None:
        pred = pred & (F.col("term") <= q.upper if q.include_upper else F.col("term") < q.upper)
    return pred


_DOC_KEY_SHIFT = np.int64(1) << np.int64(32)  # doc-local keys for batch verify


def _phrase_verify_gen(pos_cols, norm_col, slop, terms_per_slot, scorer):
    """Arrow-batch phrase verification shared by PhraseQuery and
    MultiPhraseQuery (the two-phase iteration's verify step).

    slop == 0: the adjacency check is vectorized across the WHOLE batch —
    per-doc position arrays flatten with a doc-index high key and each slot
    runs ONE ``np.isin`` over the concatenated batch
    (ExactPhraseMatcher.kt:19-60 semantics, batch-parallel instead of
    per-doc).  slop > 0: the faithful SloppyPhraseMatcher port runs per
    candidate doc (``search/sloppy.py``, SloppyPhraseMatcher.kt:133-679)."""
    n = len(terms_per_slot)

    def _flat(col, m):
        lens = np.fromiter((len(p) for p in col), dtype=np.int64, count=m)
        didx = np.repeat(np.arange(m, dtype=np.int64), lens)
        vals = (
            np.concatenate([np.asarray(p, dtype=np.int64) for p in col])
            if int(lens.sum())
            else np.zeros(0, dtype=np.int64)
        )
        return didx, vals

    def gen(batches):
        for pdf in batches:
            m = len(pdf)
            col_vals = [pdf[c].values for c in pos_cols]
            if slop == 0:
                didx0, base0 = _flat(col_vals[0], m)
                key0 = didx0 * _DOC_KEY_SHIFT + base0
                ok = np.ones(key0.size, dtype=bool)
                keys_cache = {pos_cols[0]: key0}
                for i in range(1, n):
                    keys_i = keys_cache.get(pos_cols[i])
                    if keys_i is None:
                        didx_i, vals_i = _flat(col_vals[i], m)
                        keys_i = didx_i * _DOC_KEY_SHIFT + vals_i
                        keys_cache[pos_cols[i]] = keys_i
                    ok &= np.isin(key0 + i, keys_i)
                freqs = np.bincount(didx0[ok], minlength=m).astype(np.float64)
            else:
                freqs = np.zeros(m, dtype=np.float64)
                for j in range(m):
                    plists = [np.asarray(col[j], dtype=np.int64) for col in col_vals]
                    freqs[j] = sloppy_freq(plists, slop, terms_per_slot)
            sel = freqs > 0
            sc = scorer.score(freqs[sel], pdf[norm_col].values[sel].astype(np.int64))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values[sel].astype(np.int64),
                    "score": sc.astype(np.float64),
                }
            )

    return gen


def _span_near_ordered_freq(plists: list[np.ndarray], slop: int) -> float:
    """Ordered near-spans over single-term clauses — faithful
    NearSpansOrdered.kt: for each successive position of clause 0,
    ``stretchToOrder`` advances each later clause's forward-only iterator
    while ``pos < prev_end`` and sums the gaps; match when the gap sum <=
    slop, weighted 1/(1+width) accumulated in float32 (SpanScorer.kt:82).
    Stops when any later clause exhausts in the doc."""
    n = len(plists)
    if any(len(p) == 0 for p in plists):
        return 0.0
    a0 = plists[0]
    idx = [0] * n  # forward-only iterator per clause
    freq = np.float32(0.0)
    one = np.float32(1.0)
    for i0 in range(len(a0)):
        prev_end = int(a0[i0]) + 1
        width = 0
        for k in range(1, n):
            a = plists[k]
            j = int(np.searchsorted(a, prev_end))
            if j < idx[k]:
                j = idx[k]
            if j >= len(a):
                return float(freq)  # oneExhaustedInCurrentDoc
            idx[k] = j
            p = int(a[j])
            width += p - prev_end
            prev_end = p + 1
        if width <= slop:
            freq += one / (one + np.float32(width))
    return float(freq)


def _span_near_unordered_freq(plists: list[np.ndarray], slop: int) -> float:
    """Unordered near-spans — faithful NearSpansUnordered.kt: queue states
    over one current position per clause; match when
    ``maxEnd - top - Σ spanLength <= slop`` (spanLength = 1 per term span,
    maxEnd a high-water mark); each matching state weighs
    1/(1 + (maxEnd - top)) — the covering-window ``width()`` — in float32."""
    n = len(plists)
    if any(len(p) == 0 for p in plists):
        return 0.0
    idx = [0] * n
    cur = [int(a[0]) for a in plists]
    max_end = max(cur) + 1
    freq = np.float32(0.0)
    one = np.float32(1.0)
    while True:
        start = min(cur)
        if max_end - start - n <= slop:
            freq += one / (one + np.float32(max_end - start))
        k = cur.index(start)
        idx[k] += 1
        if idx[k] >= len(plists[k]):
            return float(freq)
        cur[k] = int(plists[k][idx[k]])
        if cur[k] + 1 > max_end:
            max_end = cur[k] + 1
