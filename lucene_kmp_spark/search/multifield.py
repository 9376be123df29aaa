"""Cross-field scoring: CombinedFieldQuery (BM25F) + BlendedTermQuery.

The index side is "per-field postings tables" (SURVEY.md §2.3): one
InvertedIndex per text field, sharing the same docs table and docID space.
``build_field_indexes`` builds them; ``MultiFieldSearcher`` executes the two
cross-field query types with the reference's exact statistic-merging rules:

* CombinedFieldQuery (``search/CombinedFieldQuery.kt:236-252,259-281`` +
  ``MultiNormsLeafSimScorer.kt:100-124``):
  - ONE pseudo term for the whole query: df = max over every (term, field)
    stat pair, ttf = Σ floor(weight·ttf) (≥1; BM25 never reads ttf)
  - pseudo collection stats: docCount/maxDoc/sumDocFreq = max over fields,
    sumTotalTermFreq = Σ floor(weight·sumTTF_f)
  - per-doc freq = Σ weight·tf over ALL terms and fields, one saturation with
    the pseudo-term weight (``CombinedFieldQuery.kt:368-400``)
  - per-doc norm byte = SmallFloat.intToByte4(round(Σ weight·LENGTH_TABLE[norm_f]))
    — the weighted sum of *decoded* per-field lengths re-quantized through the
    same byte codec, so the scoring kernel still runs off the 256-entry cache
* BlendedTermQuery (``search/BlendedTermQuery.kt:224-234``): every per-field
  TermQuery is scored with df lifted to the max (capped at the field's
  docCount) and ttf to the sum across fields, then combined with
  DisjunctionMax(tie_breaker), default 0.01 — the reference's default rewrite.

Execution shape: per-field FREQS postings decode (Arrow), one union + hash
aggregate on doc_id, a broadcast-sized norms join, float32 kernel in a single
mapInPandas — the same 3-stage plan as a plain disjunction.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_kmp_spark.index.builder import InvertedIndex, build_index
from lucene_kmp_spark.search import bm25
from lucene_kmp_spark.search.executor import IndexSearcher, TermStats
from lucene_kmp_spark.search.query import BlendedTermQuery, CombinedFieldQuery, Query
from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4_np


def build_field_indexes(
    docs_with_ids: DataFrame, text_cols: tuple[str, ...], **kw
) -> dict[str, InvertedIndex]:
    """One InvertedIndex per text column over a shared docID space."""
    return {c: build_index(docs_with_ids, text_col=c, **kw) for c in text_cols}


class MultiFieldSearcher:
    def __init__(
        self,
        indexes: dict[str, InvertedIndex],
        k1: float = 1.2,
        b: float = 0.75,
        dtype=np.float32,
        similarity=None,
    ):
        # similarity may be a PerFieldSimilarityWrapper
        # (PerFieldSimilarityWrapper.kt): each field's searcher is built with
        # get(field) so scorer routing matches the reference's
        # CollectionStatistics.field dispatch. A plain Similarity applies to
        # every field; None keeps the (k1, b) BM25 default.
        from lucene_kmp_spark.search.similarities import PerFieldSimilarityWrapper

        def _sim_for(field):
            if similarity is None:
                return None
            if isinstance(similarity, PerFieldSimilarityWrapper):
                return similarity.get(field)
            return similarity

        self.searchers = {
            f: IndexSearcher(ix, k1, b, dtype, similarity=_sim_for(f))
            for f, ix in indexes.items()
        }
        self.k1, self.b, self.dtype = k1, b, dtype

    def _spark(self):
        return next(iter(self.searchers.values())).index.spark

    def _empty(self) -> DataFrame:
        return self._spark().createDataFrame([], schema="doc_id long, score double")

    # ------------------------------------------------------------- execution
    def execute(self, q: Query) -> DataFrame:
        if isinstance(q, CombinedFieldQuery):
            return self._exec_combined(q)
        if isinstance(q, BlendedTermQuery):
            return self._exec_blended(q)
        raise NotImplementedError(type(q).__name__)

    def top_k(self, q: Query, k: int = 10) -> DataFrame:
        scored = self.execute(q)
        if self.dtype == np.float32:
            scored = scored.select("doc_id", F.col("score").cast("float").alias("score"))
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def combined_norm_bytes(self, field_weights: list[tuple[str, float]]) -> DataFrame:
        """(doc_id, cnorm) — MultiNormsLeafSimScorer.MultiFieldNormValues:
        float32 accumulate of weight·decodedLength per present field, round
        half-up, re-encode with intToByte4."""
        joined = None
        for f, _w in field_weights:
            nf = self.searchers[f].index.norms.select(
                "doc_id", F.col("norm").alias(f"_n_{f}")
            )
            joined = nf if joined is None else joined.join(nf, "doc_id", "outer")
        weights = [np.float32(w) for _f, w in field_weights]
        cols = [f"_n_{f}" for f, _w in field_weights]

        def gen(batches):
            for pdf in batches:
                acc = np.zeros(len(pdf), dtype=np.float32)
                for c, w in zip(cols, weights):
                    n = pdf[c].values
                    present = pd.notna(n)
                    idx = n[present].astype(np.int64) & 0xFF
                    acc[present] += w * LENGTH_TABLE[idx]
                rounded = np.floor(acc.astype(np.float64) + 0.5).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].values,
                        "cnorm": int_to_byte4_np(rounded).astype(np.int32),
                    }
                )

        return joined.mapInPandas(gen, schema="doc_id long, cnorm int")

    def _exec_combined(self, q: CombinedFieldQuery) -> DataFrame:
        fw = [(f, float(w)) for f, w in q.field_weights]
        terms = list(dict.fromkeys(q.terms))
        per_field = {f: self.searchers[f].term_stats(terms) for f, _ in fw}

        # pseudo collection statistics (CombinedFieldQuery.kt:259-281)
        doc_count = max(self.searchers[f].index.stats.doc_count for f, _ in fw)
        sum_ttf = sum(
            int(w * self.searchers[f].index.stats.sum_total_term_freq) for f, w in fw
        )
        dt = self.dtype
        avgdl = bm25.avg_field_length(sum_ttf, doc_count, dt)
        one, k1_, b_ = dt(1), dt(self.k1), dt(self.b)
        cache = one / (k1_ * ((one - b_) + b_ * LENGTH_TABLE.astype(dt) / avgdl))

        # ONE pseudo term over every (term, field) stat pair
        # (CombinedFieldQuery.kt:236-252 CombinedFieldWeight init): docFreq =
        # max over ALL term-field stats; ttf = Σ floor(weight·ttf) is also
        # accumulated there but BM25 never reads it, so it is not materialized
        df_pseudo = 0
        for f, _w in fw:
            for t in terms:
                st = per_field[f].get(t)
                if st is not None and st.df > 0:
                    df_pseudo = max(df_pseudo, st.df)
        if df_pseudo == 0:
            return self._empty()
        w_pseudo = dt(dt(q.boost) * bm25.idf(df_pseudo, doc_count, dt))

        parts = []
        for f, w in fw:
            present = [t for t in terms if t in per_field[f]]
            if present:
                parts.append(
                    self.searchers[f]
                    .term_freqs(present)
                    .select(
                        "doc_id", (F.col("tf").cast("double") * F.lit(w)).alias("wtf")
                    )
                )
        # per-doc freq = Σ weight·tf over ALL terms and fields, then a single
        # saturation with the pseudo-term weight (CombinedFieldScorer.freq,
        # CombinedFieldQuery.kt:384-400)
        tfu = (
            reduce(lambda a, b2: a.unionByName(b2), parts)
            .groupBy("doc_id")
            .agg(F.sum("wtf").alias("wtf"))
        )
        joined = tfu.join(self.combined_norm_bytes(fw), "doc_id")

        def gen(batches):
            for pdf in batches:
                ni = cache[pdf["cnorm"].values.astype(np.int64) & 0xFF]
                tf32 = pdf["wtf"].values.astype(dt)
                sc = w_pseudo - w_pseudo / (dt(1) + tf32 * ni)
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"].values, "score": sc.astype(np.float64)}
                )

        return joined.mapInPandas(gen, schema="doc_id long, score double")

    def search_all_fields(
        self,
        query_string: str,
        k: int = 10,
        boosts: dict[str, float] | None = None,
        tie_breaker: float = 0.0,
    ) -> DataFrame:
        """MultiFieldQueryParser surface (queryparser/MultiFieldQueryParser.kt:
        replicate a parsed query across fields with per-field boosts). The
        parsed AST runs against every field's index; per-doc field scores
        combine with DisjunctionMax(tie_breaker) — the dismax variant of the
        classic per-clause expansion."""
        from lucene_kmp_spark.queryparser import parse

        q = parse(query_string)
        boosts = boosts or {}
        parts = []
        for f, s in self.searchers.items():
            b = float(boosts.get(f, 1.0))
            scored = s.execute(q).select(
                "doc_id", (F.col("score") * F.lit(b)).alias("score")
            )
            parts.append(scored)
        u = reduce(lambda a, b2: a.unionByName(b2), parts)
        agg = u.groupBy("doc_id").agg(F.max("score").alias("_mx"), F.sum("score").alias("_sm"))
        tb = float(tie_breaker)
        scored = agg.select(
            "doc_id", (F.col("_mx") + F.lit(tb) * (F.col("_sm") - F.col("_mx"))).alias("score")
        )
        if self.dtype == np.float32:
            scored = scored.select("doc_id", F.col("score").cast("float").alias("score"))
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def masked_span_docset(self, primary_field: str, q) -> DataFrame:
        """Execute a span tree that may contain FieldMaskingSpanQuery nodes
        (queries/spans/FieldMaskingSpanQuery.kt) and return the matching
        doc_ids. Unmasked leaves read ``primary_field``'s postings; a masked
        subtree reads its own field's postings while composing positionally
        with the rest (parallel-tokenstream fields share one position space).

        Plan shape: ONE pivoted positions scan per referenced field (each a
        1-scan/1-shuffle term-pruned aggregate), outer-joined on doc_id, then
        a single Arrow pass evaluating the span tree per candidate doc —
        fields add joins, never per-doc work on the driver."""
        from lucene_kmp_spark.search.spans import FIELD_SEP, resolve_masks, span_freq

        rewritten, per_field = resolve_masks(
            q,
            primary_field,
            expand=lambda node, f: self.searchers[f]._expand_span_multiterms(node),
        )
        joined = None
        col_keys: list[tuple[str, str]] = []  # (df column, pos-map key)
        for fi, (f, terms) in enumerate(sorted(per_field.items())):
            piv = self.searchers[f]._pivoted_positions(list(terms), required=False)
            sel = [F.col("doc_id")]
            for i, t in enumerate(terms):
                cn = f"_p{fi}_{i}"
                sel.append(F.col(f"_pos_{i}").alias(cn))
                col_keys.append((cn, f + FIELD_SEP + t))
            piv = piv.select(*sel)
            joined = piv if joined is None else joined.join(piv, "doc_id", "outer")
        if joined is None:
            return self._spark().createDataFrame([], schema="doc_id long")
        cols = [c for c, _k in col_keys]
        keys = [k for _c, k in col_keys]
        qq = rewritten

        def gen(batches):
            for pdf in batches:
                out = []
                col_vals = [pdf[c].values for c in cols]
                for doc_id, *plists in zip(pdf["doc_id"].values, *col_vals):
                    pos = {
                        k: np.asarray(p, dtype=np.int64)
                        for k, p in zip(keys, plists)
                        if p is not None
                    }
                    if span_freq(qq, pos) > 0:
                        out.append(int(doc_id))
                yield pd.DataFrame({"doc_id": pd.Series(out, dtype="int64")})

        return joined.mapInPandas(gen, schema="doc_id long")

    def _exec_blended(self, q: BlendedTermQuery) -> DataFrame:
        live: dict[str, TermStats] = {}
        for f in q.fields:
            st = self.searchers[f].term_stats([q.term]).get(q.term)
            if st is not None:
                live[f] = st
        if not live:
            return self._empty()
        # df = max of all doc freqs, ttf = sum (BlendedTermQuery.kt:224-234)
        df_blend = max(st.df for st in live.values())
        ttf_blend = sum(st.ttf for st in live.values())
        parts = []
        for f in live:
            s = self.searchers[f]
            pseudo = {
                q.term: TermStats(min(df_blend, s.index.stats.doc_count), ttf_blend)
            }
            parts.append(
                s._scored_terms_df({q.term: q.boost}, stats=pseudo).select("doc_id", "score")
            )
        u = reduce(lambda a, b2: a.unionByName(b2), parts)
        agg = u.groupBy("doc_id").agg(F.max("score").alias("_mx"), F.sum("score").alias("_sm"))
        tb = float(q.tie_breaker)
        return agg.select(
            "doc_id", (F.col("_mx") + F.lit(tb) * (F.col("_sm") - F.col("_mx"))).alias("score")
        )
