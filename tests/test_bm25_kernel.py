"""BM25 kernel goldens (reference BM25Similarity.kt:48-55,161-199)."""

import math

import numpy as np

from lucene_kmp_spark.search.bm25 import BM25Scorer, avg_field_length, idf, make_scorer
from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4


def test_idf_formula():
    # double math then float32 cast
    v = idf(5, 100)
    assert v.dtype == np.float32
    assert v == np.float32(math.log(1 + (100 - 5 + 0.5) / (5 + 0.5)))


def test_avgdl():
    assert avg_field_length(1000, 40) == np.float32(25.0)


def _naive_score_f32(freq, dl_byte, df, N, sum_ttf, k1=1.2, b=0.75, boost=1.0):
    """Direct float32 transcription of the reference expression shape."""
    w = np.float32(np.float32(boost) * np.float32(math.log(1 + (N - df + 0.5) / (df + 0.5))))
    avgdl = np.float32(sum_ttf / float(N))
    cache = np.float32(1) / (
        np.float32(k1) * ((np.float32(1) - np.float32(b)) + np.float32(b) * LENGTH_TABLE[dl_byte] / avgdl)
    )
    return w - w / (np.float32(1) + np.float32(freq) * cache)


def test_score_matches_reference_shape():
    N, sum_ttf = 1000, 25000
    sc = make_scorer(1.0, doc_freq=7, doc_count=N, sum_total_term_freq=sum_ttf)
    for freq, dl in [(1, 3), (2, 10), (5, 50), (10, 255), (3, 100)]:
        nb = int_to_byte4(dl)
        got = sc.score(np.array([freq]), np.array([nb]))[0]
        exp = _naive_score_f32(freq, nb, 7, N, sum_ttf)
        assert got == exp, (freq, dl)
        assert got.dtype == np.float32


def test_monotonicity():
    sc = make_scorer(1.0, doc_freq=3, doc_count=500, sum_total_term_freq=9000)
    freqs = np.arange(1, 200)
    norms = np.full(freqs.shape, int_to_byte4(20))
    s = sc.score(freqs, norms)
    assert (np.diff(s) >= 0).all()  # increasing in freq
    # decreasing in doc length
    s2 = sc.score(np.full(200, 5), np.arange(1, 201))
    # LENGTH_TABLE is nondecreasing in byte, so score nonincreasing
    assert (np.diff(s2) <= 1e-9).all()


def test_score_bounded_by_weight():
    sc = make_scorer(2.0, doc_freq=1, doc_count=10**6, sum_total_term_freq=10**7)
    s = sc.score(np.array([10**6]), np.array([1]))
    assert (s <= sc.weight).all()
    assert (s >= 0).all()


def test_max_score_dominates():
    sc = make_scorer(1.0, doc_freq=10, doc_count=1000, sum_total_term_freq=30000)
    freqs = np.array([1, 4, 2])
    norms = np.array([int_to_byte4(5), int_to_byte4(30), int_to_byte4(8)])
    ub = sc.max_score(freqs, norms)
    assert (sc.score(freqs, norms) <= ub).all()


def test_float64_mode():
    sc = BM25Scorer(1.0, idf(5, 100, np.float64), avg_field_length(2500, 100, np.float64), dtype=np.float64)
    s = sc.score(np.array([2]), np.array([int_to_byte4(25)]))
    assert s.dtype == np.float64
    # closed form in float64
    w = math.log(1 + (100 - 5 + 0.5) / (5 + 0.5))
    avgdl = 25.0
    dl = 25.0
    ni = 1 / (1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert abs(s[0] - (w - w / (1 + 2 * ni))) < 1e-12
