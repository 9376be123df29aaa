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


# ------------------------------------------------------- DFR (SimilarityBase)
_LN2 = math.log(2.0)


def _dfr_tfn(kind, tf, dl, avgdl, c, mu, z, ttf, sum_ttf):
    """Second (length) normalization (Normalization{H1,H2,H3,Z}.kt tfn)."""
    if kind == "H1":  # tf * c * avgdl / dl
        return tf * c * (avgdl / dl)
    if kind == "H2":  # tf * log2(1 + c * avgdl / dl)
        return tf * np.log1p(c * avgdl / dl) / _LN2
    if kind == "H3":  # (tf + mu*((ttf+1f)/(T+1f))) / (dl+mu) * mu — the
        # collection-prob ratio is computed in FLOAT32 (the `1f` literals in
        # NormalizationH3.kt promote to Float) before the double pipeline
        p = float(np.float32(ttf + 1.0) / np.float32(sum_ttf + 1.0))
        return (tf + mu * p) / (dl + mu) * mu
    # Z: tf * (avgdl/dl)^z
    return tf * np.power(avgdl / dl, z)


class _DFRScorer(SimScorer):
    def __init__(self, boost, N, F_ttf, n_df, avgdl, sum_ttf, basic_model,
                 after_effect, normalization, c, mu, z, dtype):
        self.dtype = dtype
        self.boost, self.N, self.F, self.n = float(boost), int(N), int(F_ttf), int(n_df)
        self.avgdl, self.sum_ttf = float(avgdl), int(sum_ttf)
        self.model, self.ae, self.norm_kind = basic_model, after_effect, normalization
        self.c, self.mu, self.z = float(c), float(mu), float(z)
        self.weight = float(boost)

    def score(self, freqs, norm_bytes):
        dl = LENGTH_TABLE[np.asarray(norm_bytes).astype(np.int64) & 0xFF].astype(np.float64)
        tf = np.asarray(freqs).astype(np.float64)
        tfn = _dfr_tfn(self.norm_kind, tf, dl, self.avgdl, self.c, self.mu,
                       self.z, self.F, self.sum_ttf)
        if self.ae == "B":  # AfterEffectB.kt:31-35: (F+1)/n over F=ttf+1, n=df+1
            ae1p = (self.F + 2.0) / (self.n + 1.0)
        else:  # AfterEffectL: 1.0
            ae1p = 1.0
        N, F = float(self.N), float(self.F)
        if self.model == "IF":
            # BasicModelIF.kt:31-42: A = log2(1 + (N+1)/(F+0.5))
            A = math.log1p((N + 1.0) / (F + 0.5)) / _LN2
            base = A * ae1p * (1.0 - 1.0 / (1.0 + tfn))
        elif self.model == "In":
            # BasicModelIn.kt: A = log2((N+1)/(n+0.5))
            A = math.log((N + 1.0) / (self.n + 0.5)) / _LN2
            base = A * ae1p * (1.0 - 1.0 / (1.0 + tfn))
        elif self.model == "Ine":
            # BasicModelIne.kt: ne = N·(1 − ((N−1)/N)^F); A = log2((N+1)/(ne+0.5))
            ne = N * (1.0 - ((N - 1.0) / N) ** F)
            A = math.log((N + 1.0) / (ne + 0.5)) / _LN2
            base = A * ae1p * (1.0 - 1.0 / (1.0 + tfn))
        else:  # "G"
            # BasicModelG.kt: λ = (F+1)/(N+F+1); A = log2(λ+1),
            # B = log2((1+λ)/λ); score = (B − (B−A)/(1+tfn)) · ae1p
            lam = (F + 1.0) / (N + F + 1.0)
            A = math.log1p(lam) / _LN2
            B = math.log((1.0 + lam) / lam) / _LN2
            base = (B - (B - A) / (1.0 + tfn)) * ae1p
        return (self.boost * base).astype(self.dtype)


class DFRSimilarity(Similarity):
    """Divergence-from-randomness (DFRSimilarity.kt; SimilarityBase double
    pipeline): basic models I(F) (BasicModelIF.kt), I(n) (BasicModelIn.kt),
    I(ne) (BasicModelIne.kt), G (BasicModelG.kt) with after effect L or B
    and normalization H1/H2 (c), H3 (mu), or Z (z)."""

    name = "DFR"

    def __init__(self, basic_model: str = "IF", after_effect: str = "L",
                 normalization: str = "H2", c: float = 1.0, mu: float = 800.0,
                 z: float = 0.30):
        assert basic_model in ("IF", "In", "Ine", "G")
        assert after_effect in ("L", "B")
        assert normalization in ("H1", "H2", "H3", "Z")
        self.basic_model, self.after_effect, self.normalization = (
            basic_model, after_effect, normalization)
        self.c, self.mu, self.z = c, mu, z

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        df = max(df for df, _ in term_stats)
        ttf = sum(t for _, t in term_stats)
        avgdl = sum_ttf / float(doc_count)  # SimilarityBase.kt:72 (double)
        return _DFRScorer(
            boost, doc_count, ttf, df, avgdl, sum_ttf, self.basic_model,
            self.after_effect, self.normalization, self.c, self.mu, self.z, dtype
        )


# ------------------------------------------------------------ Axiomatic family
class _AxiomaticScorer(SimScorer):
    """Axiomatic.kt:70-84 score pipeline: boost · max(0,
    tf·ln·tfln·idf − gamma) with the variant-specific components:

    * F1*: tf = 1+ln(1+ln(freq+1)), ln = (avgdl+s)/(avgdl+dl·s), tfln = 1
    * F2*: tf = 1, ln = 1,          tfln = freq/(freq + s + s·dl/avgdl)
    * F3*: tf = 1+ln(1+ln(freq+1)), ln = 1, tfln = 1,
           gamma = (dl − queryLen)·s·queryLen/avgdl (else gamma = 0)
    * *EXP: idf = ((N+1)/df)^k      *LOG: idf = ln((N+1)/df)
    """

    def __init__(self, boost, variant, N, n_df, avgdl, s, k, query_len, dtype):
        self.dtype = dtype
        self.boost, self.variant = float(boost), variant
        self.N, self.n = int(N), int(n_df)
        self.avgdl, self.s, self.k = float(avgdl), float(s), float(k)
        self.query_len = int(query_len)
        self.weight = float(boost)

    def score(self, freqs, norm_bytes):
        dl = LENGTH_TABLE[np.asarray(norm_bytes).astype(np.int64) & 0xFF].astype(np.float64)
        f = np.asarray(freqs).astype(np.float64)
        fam, kind = self.variant[:2], self.variant[2:]  # "F1"/"F2"/"F3", "EXP"/"LOG"
        s, avgdl = self.s, self.avgdl
        # freq += 1 first: "otherwise gives negative scores for freqs < 1"
        # (AxiomaticF1EXP.kt:34-42 and siblings)
        tf = 1.0 + np.log1p(np.log(f + 1.0)) if fam in ("F1", "F3") else 1.0
        ln_ = (avgdl + s) / (avgdl + dl * s) if fam == "F1" else 1.0
        tfln = f / (f + s + s * dl / avgdl) if fam == "F2" else 1.0
        idf = (
            ((self.N + 1.0) / self.n) ** self.k
            if kind == "EXP"
            else math.log((self.N + 1.0) / self.n)
        )
        gamma = (
            (dl - self.query_len) * s * self.query_len / avgdl if fam == "F3" else 0.0
        )
        sc = self.boost * (tf * ln_ * tfln * idf - gamma)
        return np.maximum(sc, 0.0).astype(self.dtype)


class AxiomaticSimilarity(Similarity):
    """The six axiomatic models (AxiomaticF{1,2,3}{EXP,LOG}.kt; base class
    Axiomatic.kt, defaults s=0.25, queryLen=1, k=0.35)."""

    _VARIANTS = ("F1EXP", "F1LOG", "F2EXP", "F2LOG", "F3EXP", "F3LOG")

    def __init__(self, variant: str = "F2EXP", s: float = 0.25,
                 k: float = 0.35, query_len: int = 1):
        assert variant in self._VARIANTS
        self.variant, self.s, self.k, self.query_len = variant, s, k, query_len
        self.name = "Axiomatic" + variant

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        df = max(df for df, _ in term_stats)
        avgdl = sum_ttf / float(doc_count)
        return _AxiomaticScorer(
            boost, self.variant, doc_count, df, avgdl, self.s, self.k,
            self.query_len, dtype,
        )


class AxiomaticF2EXP(AxiomaticSimilarity):
    """Axiomatic F2EXP (AxiomaticF2EXP.kt): score = boost ·
    freq/(freq + s + s·dl/avgdl) · ((N+1)/df)^k."""

    def __init__(self, s: float = 0.25, k: float = 0.35):
        super().__init__("F2EXP", s=s, k=k)


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


# ------------------------------------------------ SimilarityBase generic kernel
class _FnScorer(SimScorer):
    """SimilarityBase pipeline (SimilarityBase.kt score(stats, freq, docLen)):
    ``fn(tf_float64, docLen_float64) -> float64``, cast to dtype — no clamp,
    mirroring BasicSimScorer.score's direct ``.toFloat()``."""

    def __init__(self, fn, boost: float, dtype):
        self.fn, self.dtype = fn, dtype
        self.weight = float(boost)

    def score(self, freqs, norm_bytes):
        dl = LENGTH_TABLE[np.asarray(norm_bytes).astype(np.int64) & 0xFF].astype(np.float64)
        tf = np.asarray(freqs).astype(np.float64)
        return self.fn(tf, dl).astype(self.dtype)


class LMJelinekMercerSimilarity(Similarity):
    """LMJelinekMercerSimilarity.kt: score = boost ·
    ln(1 + ((1−λ)·tf/dl)/(λ·p)), p = (ttf+1)/(sumTTF+1)
    (LMSimilarity DefaultCollectionModel)."""

    name = "LMJelinekMercer"

    def __init__(self, lambda_: float = 0.1):
        self.lambda_ = float(lambda_)

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        ttf = sum(t for _, t in term_stats)
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        lam, b = self.lambda_, float(boost)
        return _FnScorer(
            lambda tf, dl: b * np.log1p(((1.0 - lam) * tf / dl) / (lam * p)),
            boost, dtype,
        )


class DFISimilarity(Similarity):
    """Divergence from independence (DFISimilarity.kt): expected =
    (F+1)·dl/(T+1); 0 when tf <= expected, else boost·log2(measure+1) with
    measure from IndependenceChiSquared/Saturated/Standardized."""

    name = "DFI"
    _MEASURES = {
        "chisquared": lambda f, e: (f - e) * (f - e) / e,
        "saturated": lambda f, e: (f - e) / e,
        "standardized": lambda f, e: (f - e) / np.sqrt(e),
    }

    def __init__(self, independence: str = "chisquared"):
        assert independence in self._MEASURES
        self.independence = independence

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        ttf = sum(t for _, t in term_stats)
        measure = self._MEASURES[self.independence]
        b = float(boost)
        ln2 = math.log(2.0)

        def fn(tf, dl):
            expected = (ttf + 1.0) * dl / (sum_ttf + 1.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                sc = b * np.log1p(measure(tf, expected)) / ln2
            return np.where(tf <= expected, 0.0, sc)

        return _FnScorer(fn, boost, dtype)


class IndriDirichletSimilarity(Similarity):
    """IndriDirichletSimilarity.kt: score = ln((tf + mu·p)/(dl + mu)),
    p = ttf/sumTTF (IndriCollectionModel — no +1s). ``smoothing_fn`` gives the
    tf=0 background score IndriAndQuery needs for non-matching clauses."""

    name = "IndriDirichlet"

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def _p(self, term_stats, sum_ttf):
        ttf = sum(t for _, t in term_stats)
        return ttf / float(sum_ttf)

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        p, mu = self._p(term_stats, sum_ttf), self.mu
        return _FnScorer(lambda tf, dl: np.log((tf + mu * p) / (dl + mu)), boost, dtype)

    def smoothing_fn(self, term_stats, sum_ttf):
        """docLen_array -> smoothing score (tf = 0), IndriScorer.smoothingScore."""
        p, mu = self._p(term_stats, sum_ttf), self.mu
        return lambda dl: np.log((mu * p) / (dl + mu))


class IBSimilarity(Similarity):
    """Information-based model (IBSimilarity.kt): score = boost ·
    distribution(tfn(tf, dl), λ) with distribution LL
    (−ln(λ/(tfn+λ))) or SPL (−ln((λ^q − λ)/(1 − λ)), q = 1−1/(tfn+1)),
    λ = float32((df+1)/(N+1)) [DF] or float32((ttf+1)/(N+1)) [TTF]
    (LambdaDF.kt/LambdaTTF.kt — float math preserved), and DFR
    normalization H1/H2 (c) / H3 (mu) / Z (z)."""

    name = "IB"

    def __init__(
        self,
        distribution: str = "spl",
        lambda_kind: str = "df",
        normalization: str = "h2",
        c: float = 1.0,
        mu: float = 800.0,
        z: float = 0.3,
    ):
        assert distribution in ("ll", "spl")
        assert lambda_kind in ("df", "ttf")
        assert normalization in ("h1", "h2", "h3", "z")
        self.distribution, self.lambda_kind = distribution, lambda_kind
        self.normalization, self.c, self.mu, self.z = normalization, float(c), float(mu), float(z)

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        df = max(d for d, _ in term_stats)
        ttf = sum(t for _, t in term_stats)
        avgdl = sum_ttf / float(doc_count)
        num = (df + 1.0) if self.lambda_kind == "df" else (ttf + 1.0)
        lam = float(np.float32(num / (doc_count + 1.0)))  # LambdaDF/TTF float32
        if lam == 1.0:
            lam = float(np.nextafter(np.float32(lam), np.float32(0)))
        kind, c, mu, z = self.normalization, self.c, self.mu, self.z
        ln2 = math.log(2.0)
        dist = self.distribution
        b = float(boost)

        def fn(tf, dl):
            if kind == "h1":
                tfn = tf * c * avgdl / dl
            elif kind == "h2":
                tfn = tf * np.log1p(c * avgdl / dl) / ln2
            elif kind == "h3":
                tfn = (tf + mu * ((ttf + 1.0) / (sum_ttf + 1.0))) / (dl + mu) * mu
            else:  # z
                tfn = tf * np.power(avgdl / dl, z)
            if dist == "ll":
                return b * -np.log(lam / (tfn + lam))
            q = 1.0 - 1.0 / (tfn + 1.0)
            q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
            pow_ = np.power(lam, q)
            # guard the floating-point collapse pow == lam (DistributionSPL.kt)
            bump = np.nextafter(lam, 1.0) if lam < 1 else np.nextafter(lam, 0.0)
            pow_ = np.where(pow_ == lam, bump, pow_)
            return b * -np.log((pow_ - lam) / (1.0 - lam))

        return _FnScorer(fn, boost, dtype)


class RawTFSimilarity(Similarity):
    """RawTFSimilarity.kt: score = boost · freq."""

    name = "RawTF"

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        b = float(boost)
        return _FnScorer(lambda tf, dl: b * tf, boost, dtype)


class MultiSimilarity(Similarity):
    """MultiSimilarity.kt: score = Σ sub-similarity scores (same freq/norm)."""

    name = "Multi"

    def __init__(self, sims: tuple[Similarity, ...]):
        self.sims = tuple(sims)

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        subs = [s.scorer(boost, term_stats, doc_count, sum_ttf, dtype) for s in self.sims]

        class _Multi(SimScorer):
            weight = float(boost)

            def score(self, freqs, norm_bytes):
                acc = np.zeros(len(np.asarray(freqs)), dtype=np.float64)
                for sub in subs:
                    acc += sub.score(freqs, norm_bytes).astype(np.float64)
                return acc.astype(dtype)

        return _Multi()


class PerFieldSimilarityWrapper(Similarity):
    """PerFieldSimilarityWrapper.kt: delegate every scorer/norm computation
    to ``get(field_name)``. In the columnar engine a "field" is a text
    column with its own InvertedIndex, so the wrapper is consumed by
    MultiFieldSearcher, which builds each field's IndexSearcher with
    ``wrapper.get(field)`` — the same routing the reference does inside
    computeNorm/scorer via CollectionStatistics.field."""

    name = "PerField"

    def get(self, name: str) -> Similarity:
        raise NotImplementedError

    def scorer(self, boost, term_stats, doc_count, sum_ttf, dtype=np.float32):
        raise TypeError(
            "PerFieldSimilarityWrapper must be resolved per field via get(); "
            "pass it to MultiFieldSearcher(similarity=...)"
        )


class PerFieldSimilarity(PerFieldSimilarityWrapper):
    """Dict-backed concrete wrapper: ``get(f)`` -> mapping[f] or default."""

    def __init__(self, mapping: dict[str, Similarity], default: Similarity | None = None):
        self.mapping = dict(mapping)
        self.default = default if default is not None else BM25Similarity()

    def get(self, name: str) -> Similarity:
        return self.mapping.get(name, self.default)
