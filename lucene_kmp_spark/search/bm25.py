"""Okapi BM25 scoring kernel, numerically matching the reference.

Reference: ``search/similarities/BM25Similarity.kt`` (lucene-kmp):

* idf    = ``ln(1 + (docCount - docFreq + 0.5)/(docFreq + 0.5))`` computed in
  double then cast to float32 (BM25Similarity.kt:48-50)
* avgdl  = ``(sumTotalTermFreq / docCount.toDouble()).toFloat()`` (:53-55)
* cache  = per-norm-byte ``1f/(k1*((1-b) + b*LENGTH_TABLE[i]/avgdl))`` in
  float32 for all 256 decoded lengths (:161-165)
* score  = ``weight - weight/(1 + freq*cache[norm & 0xFF])`` with
  ``weight = boost * idf`` — the REWRITTEN monotonic form, all float32
  (:187-199). The rewrite changes float rounding vs the textbook formula, so we
  reproduce it verbatim in numpy float32.

``dtype=np.float64`` selects a float64 twin of the same expressions (same norm
quantization) used for DuckDB-oracle cross-checks, where the oracle computes in
SQL doubles.
"""

from __future__ import annotations

import math

import numpy as np

from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(doc_freq: int, doc_count: int, dtype=np.float32):
    """BM25Similarity.kt:48-50 — double math, cast to float."""
    val = math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    return dtype(val)


def avg_field_length(sum_total_term_freq: int, doc_count: int, dtype=np.float32):
    """BM25Similarity.kt:53-55."""
    return dtype(sum_total_term_freq / float(doc_count))


class BM25Scorer:
    """Per-(query-term, field) scorer: precomputed weight + 256-entry norm cache.

    Mirrors BM25Similarity.BM25Scorer (BM25Similarity.kt:169-199).
    """

    def __init__(
        self,
        boost: float,
        idf_value,
        avgdl,
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        dtype=np.float32,
    ):
        self.dtype = dtype
        k1_ = dtype(k1)
        b_ = dtype(b)
        one = dtype(1)
        lengths = LENGTH_TABLE.astype(dtype)
        # cache[i] = 1 / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))  (:161-165)
        self.cache = one / (k1_ * ((one - b_) + b_ * lengths / dtype(avgdl)))
        self.weight = dtype(dtype(boost) * dtype(idf_value))

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """score = weight - weight / (1 + freq * cache[norm & 0xFF])  (:187-199)."""
        dt = self.dtype
        norm_inverse = self.cache[np.asarray(norm_bytes).astype(np.int64) & 0xFF]
        f = np.asarray(freqs).astype(dt)
        return self.weight - self.weight / (dt(1) + f * norm_inverse)

    def max_score(self, impact_freqs: np.ndarray, impact_norms: np.ndarray):
        """Block-max upper bound from impact pairs (MaxScoreCache.kt:55-63)."""
        if len(impact_freqs) == 0:
            return self.dtype(0)
        return self.score(np.asarray(impact_freqs), np.asarray(impact_norms)).max()


def make_scorer(
    boost: float,
    doc_freq: int,
    doc_count: int,
    sum_total_term_freq: int,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    dtype=np.float32,
) -> BM25Scorer:
    """Build a scorer from global collection/term statistics
    (IndexSearcher.createWeight semantics, IndexSearcher.kt:773,912-953)."""
    return BM25Scorer(
        boost=1.0 if boost is None else boost,
        idf_value=idf(doc_freq, doc_count, dtype),
        avgdl=avg_field_length(sum_total_term_freq, doc_count, dtype),
        k1=k1,
        b=b,
        dtype=dtype,
    )
