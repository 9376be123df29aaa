"""Pluggable scoring models — the reference's custom-Similarity UDF surface
(``search/similarities/`` has 20+ implementations; SURVEY.md §2.4 last row).

Each Similarity builds a vectorized ``SimScorer`` from global statistics (the
``createWeight`` step) whose ``score(freqs, norm_bytes)`` runs numpy-batched
inside the Arrow scoring UDFs. Swapping the similarity swaps only this numpy
kernel — the distributed plan (postings decode, joins, top-k) is unchanged,
exactly the plug-point the reference exposes.

Implemented models (formula parity with the cited reference files):

* BM25Similarity      — BM25Similarity.kt:16-199 (delegates to bm25.py, the
                        float32 bit-parity kernel)
* ClassicSimilarity   — ClassicSimilarity.kt:20-60 + TFIDFSimilarity.kt:419-455:
                        idf = ln((docCount+1)/(docFreq+1)) + 1 (summed over
                        terms), tf = sqrt(freq), normTable[i] =
                        1/sqrt(LENGTH_TABLE[i]) with normTable[0] =
                        1/normTable[255]; score = tf·queryWeight·normTable[norm]
* LMDirichletSimilarity — LMDirichletSimilarity.kt:50-61 + LMSimilarity.kt
                        DefaultCollectionModel:110-122: score = boost ·
                        (ln(1 + freq/(mu·p)) + ln(mu/(docLen+mu))) clipped at
                        0, p = (totalTermFreq+1)/(numberOfFieldTokens+1),
                        docLen = LENGTH_TABLE[norm] (SimilarityBase.kt:153)
* BooleanSimilarity   — BooleanSimilarity.kt: score = boost

All term statistics arrive as (df, ttf) pairs; multi-term scorers (phrase,
synonym) pass several pairs and the idf-like weights sum, matching
``idfExplain(collectionStats, termStats[])``.
"""

from __future__ import annotations

import math

import numpy as np

from lucene_kmp_spark.search import bm25
from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE


class SimScorer:
    """score(freqs, norm_bytes) -> per-posting scores (vectorized)."""

    weight: float = 0.0  # query-time weight, for explain()

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class Similarity:
    """Builds SimScorers from global stats (Similarity.kt scorer())."""

    name = "similarity"

    def scorer(
        self,
        boost: float,
        term_stats: list[tuple[int, int]],  # [(df, ttf), ...]
        doc_count: int,
        sum_ttf: int,
        dtype=np.float32,
    ) -> SimScorer:
        raise NotImplementedError


# ---------------------------------------------------------------------- BM25
class BM25Similarity(Similarity):
    name = "BM25"

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        dt = dtype
        idf_sum = float(sum(float(bm25.idf(df, doc_count, dt)) for df, _ in term_stats))
        idf_val = dt(idf_sum) if len(term_stats) > 1 else bm25.idf(term_stats[0][0], doc_count, dt)
        return bm25.BM25Scorer(
            boost,
            idf_val,
            bm25.avg_field_length(sum_ttf, doc_count, dt),
            k1=self.k1,
            b=self.b,
            dtype=dt,
        )


# ------------------------------------------------------------- Classic TFIDF
class _ClassicScorer(SimScorer):
    def __init__(self, boost: float, idf_sum: float, dtype):
        dt = dtype
        self.dtype = dt
        self.weight = dt(dt(boost) * dt(idf_sum))  # queryWeight (TFIDFSimilarity.kt:450)
        with np.errstate(divide="ignore"):  # slot 0 (length 0) is patched below
            table = (1.0 / np.sqrt(LENGTH_TABLE.astype(np.float64))).astype(dt)
        table[0] = dt(1) / table[255]  # TFIDFSimilarity.kt:434
        self.norm_table = table

    def score(self, freqs, norm_bytes):
        dt = self.dtype
        tf = np.sqrt(np.asarray(freqs).astype(np.float64)).astype(dt)  # tf = sqrt(freq)
        raw = tf * self.weight
        return raw * self.norm_table[np.asarray(norm_bytes).astype(np.int64) & 0xFF]


class ClassicSimilarity(Similarity):
    name = "Classic"

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        dt = dtype
        idf_sum = float(
            sum(dt(math.log((doc_count + 1) / (df + 1.0)) + 1.0) for df, _ in term_stats)
        )
        return _ClassicScorer(boost, idf_sum, dt)


# ------------------------------------------------------------- LM Dirichlet
class _LMDirichletScorer(SimScorer):
    def __init__(self, boost: float, mu: float, collection_prob: float, dtype):
        self.dtype = dtype
        self.boost, self.mu, self.p = float(boost), float(mu), float(collection_prob)
        self.weight = float(boost)

    def score(self, freqs, norm_bytes):
        # double math, clipped at 0, cast to dtype (SimilarityBase.kt:129-132)
        doc_len = LENGTH_TABLE[np.asarray(norm_bytes).astype(np.int64) & 0xFF].astype(np.float64)
        f = np.asarray(freqs).astype(np.float64)
        sc = self.boost * (
            np.log1p(f / (self.mu * self.p)) + np.log(self.mu / (doc_len + self.mu))
        )
        return np.maximum(sc, 0.0).astype(self.dtype)


class LMDirichletSimilarity(Similarity):
    name = "LMDirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = mu

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        ttf = sum(t for _, t in term_stats)  # combined over terms for multi-stat scorers
        p = (ttf + 1.0) / (sum_ttf + 1.0)  # DefaultCollectionModel (LMSimilarity.kt:117)
        return _LMDirichletScorer(boost, self.mu, p, dtype)


# ------------------------------------------------------------------ Boolean
class _BooleanScorer(SimScorer):
    def __init__(self, boost: float, dtype):
        self.dtype = dtype
        self.weight = float(boost)

    def score(self, freqs, norm_bytes):
        return np.full(len(np.asarray(freqs)), self.dtype(self.weight), dtype=self.dtype)


class BooleanSimilarity(Similarity):
    name = "Boolean"

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        return _BooleanScorer(boost, dtype)
