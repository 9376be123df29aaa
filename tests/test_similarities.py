"""Pluggable Similarity parity: engine scores under Classic / LM-Dirichlet /
Boolean similarities vs independently-computed formula values; BM25 default
must stay bit-identical to the naive oracle after the scorer refactor."""

import math

import numpy as np
import pytest

from lucene_kmp_spark.analysis import analyze
from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import BooleanQuery, PhraseQuery, TermQuery
from lucene_kmp_spark.search.similarities import (
    BooleanSimilarity,
    ClassicSimilarity,
    LMDirichletSimilarity,
)
from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=23)).persist()
    docs.count()
    idx = build_index(docs)
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    return idx, rows


class CorpusStats:
    """Independent tf/df/norm accounting from the raw rows."""

    def __init__(self, rows):
        self.tf = {}   # term -> doc -> count
        self.norm = {}
        total = 0
        for doc, text in rows:
            terms, _, _ = analyze(text)
            if not terms:
                continue
            self.norm[doc] = int_to_byte4(len(terms))
            total += len(terms)
            for t in terms:
                self.tf.setdefault(t, {}).setdefault(doc, 0)
                self.tf[t][doc] += 1
        self.doc_count = len(self.norm)
        self.sum_ttf = total

    def df(self, t):
        return len(self.tf.get(t, {}))

    def ttf(self, t):
        return sum(self.tf.get(t, {}).values())


def _scores(idx, q, sim):
    s = IndexSearcher(idx, similarity=sim)
    return {r["doc_id"]: r["score"] for r in s.execute(q).collect()}


def test_bm25_default_still_bit_identical(env):
    idx, rows = env
    s = IndexSearcher(idx)
    naive = NaiveIndex(rows)
    for q in (
        TermQuery("hope"),
        PhraseQuery(("kingdom", "of")),
        BooleanQuery.build(should=(TermQuery("hope"), TermQuery("light"))),
    ):
        got = [(r["doc_id"], r["score"]) for r in s.top_k(q, 10).collect()]
        exp = [(d, float(np.float32(v))) for d, v in naive.top_k(q, 10)]
        assert got == exp, q


def test_classic_similarity(env):
    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    got = _scores(idx, TermQuery(t), ClassicSimilarity())
    idf = np.float32(math.log((st.doc_count + 1) / (st.df(t) + 1.0)) + 1.0)
    qw = np.float32(1.0) * idf
    table = (1.0 / np.sqrt(LENGTH_TABLE.astype(np.float64))).astype(np.float32)
    table[0] = np.float32(1) / table[255]
    assert set(got) == set(st.tf[t])
    for d, tf in st.tf[t].items():
        exp = np.float32(np.float32(math.sqrt(tf)) * qw) * table[st.norm[d]]
        assert np.float32(got[d]) == exp, d


def test_lm_dirichlet_similarity(env):
    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    mu = 2000.0
    got = _scores(idx, TermQuery(t), LMDirichletSimilarity(mu=mu))
    p = (st.ttf(t) + 1.0) / (st.sum_ttf + 1.0)
    # engine emits only matching postings; docs whose clipped score is 0 still match
    assert set(got) == set(st.tf[t])
    for d, tf in st.tf[t].items():
        dl = float(LENGTH_TABLE[st.norm[d]])
        exp = max(0.0, math.log(1 + tf / (mu * p)) + math.log(mu / (dl + mu)))
        assert abs(got[d] - np.float32(exp)) < 1e-6, d


def test_boolean_similarity(env):
    idx, rows = env
    st = CorpusStats(rows)
    got = _scores(idx, TermQuery("hope", boost=2.5), BooleanSimilarity())
    assert set(got) == set(st.tf["hope"])
    assert all(v == 2.5 for v in got.values())


def test_classic_phrase_idf_sums(env):
    idx, rows = env
    st = CorpusStats(rows)
    q = PhraseQuery(("kingdom", "of"))
    got = _scores(idx, q, ClassicSimilarity())
    idf_sum = sum(
        float(np.float32(math.log((st.doc_count + 1) / (st.df(t) + 1.0)) + 1.0))
        for t in ("kingdom", "of")
    )
    table = (1.0 / np.sqrt(LENGTH_TABLE.astype(np.float64))).astype(np.float32)
    table[0] = np.float32(1) / table[255]
    for d, sc in list(got.items())[:20]:
        # phrase freq from the raw positions
        terms, pos, _ = analyze(dict(rows)[d])
        pk = [p for t2, p in zip(terms, pos) if t2 == "kingdom"]
        po = {p for t2, p in zip(terms, pos) if t2 == "of"}
        freq = sum(1 for p in pk if p + 1 in po)
        exp = np.float32(np.float32(math.sqrt(freq)) * np.float32(idf_sum)) * table[st.norm[d]]
        assert np.float32(sc) == exp, d


def test_wand_prune_falls_back_for_non_bm25(env):
    idx, _ = env
    s = IndexSearcher(idx, similarity=ClassicSimilarity())
    q = BooleanQuery.build(should=(TermQuery("hope"), TermQuery("light")))
    pruned = [(r["doc_id"], r["score"]) for r in s.top_k(q, 10, prune=True).collect()]
    full = [(r["doc_id"], r["score"]) for r in s.top_k(q, 10).collect()]
    assert pruned == full


def test_dfr_similarity(env):
    import math as _m

    from lucene_kmp_spark.search.similarities import DFRSimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    avgdl = st.sum_ttf / float(st.doc_count)
    for ae in ("L", "B"):
        for norm_kind in ("H1", "H2"):
            got = _scores(idx, TermQuery(t), DFRSimilarity(after_effect=ae, normalization=norm_kind))
            assert set(got) == set(st.tf[t]), (ae, norm_kind)
            F = st.ttf(t)
            n = st.df(t)
            A = _m.log2(1 + (st.doc_count + 1.0) / (F + 0.5))
            ae1p = (F + 2.0) / (n + 1.0) if ae == "B" else 1.0
            for d, tf in list(st.tf[t].items())[:30]:
                dl = float(LENGTH_TABLE[st.norm[d]])
                tfn = tf * (avgdl / dl) if norm_kind == "H1" else tf * _m.log2(1 + avgdl / dl)
                exp = A * ae1p * (1 - 1 / (1 + tfn))
                assert abs(got[d] - np.float32(exp)) < 1e-6, (ae, norm_kind, d)


def test_axiomatic_f2exp(env):
    from lucene_kmp_spark.search.similarities import AxiomaticF2EXP

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    avgdl = st.sum_ttf / float(st.doc_count)
    got = _scores(idx, TermQuery(t), AxiomaticF2EXP())
    idf = ((st.doc_count + 1.0) / st.df(t)) ** 0.35
    for d, tf in list(st.tf[t].items())[:30]:
        dl = float(LENGTH_TABLE[st.norm[d]])
        exp = (tf / (tf + 0.25 + 0.25 * dl / avgdl)) * idf
        assert abs(got[d] - np.float32(exp)) < 1e-6, d


def test_lm_jelinek_mercer(env):
    from lucene_kmp_spark.search.similarities import LMJelinekMercerSimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t, lam = "hope", 0.1
    got = _scores(idx, TermQuery(t), LMJelinekMercerSimilarity(lambda_=lam))
    p = (st.ttf(t) + 1.0) / (st.sum_ttf + 1.0)
    assert set(got) == set(st.tf[t])
    for d, tf in st.tf[t].items():
        dl = float(LENGTH_TABLE[st.norm[d]])
        exp = math.log(1 + ((1 - lam) * tf / dl) / (lam * p))
        assert abs(got[d] - np.float32(exp)) < 1e-6, d


def test_dfi_similarity(env):
    from lucene_kmp_spark.search.similarities import DFISimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    got = _scores(idx, TermQuery(t), DFISimilarity("standardized"))
    assert set(got) == set(st.tf[t])
    for d, tf in st.tf[t].items():
        dl = float(LENGTH_TABLE[st.norm[d]])
        expected = (st.ttf(t) + 1.0) * dl / (st.sum_ttf + 1.0)
        if tf <= expected:
            exp = 0.0
        else:
            exp = math.log2((tf - expected) / math.sqrt(expected) + 1)
        assert abs(got[d] - np.float32(exp)) < 1e-6, d


def test_indri_dirichlet_similarity(env):
    from lucene_kmp_spark.search.similarities import IndriDirichletSimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t, mu = "hope", 2000.0
    got = _scores(idx, TermQuery(t), IndriDirichletSimilarity(mu=mu))
    p = st.ttf(t) / float(st.sum_ttf)  # IndriCollectionModel: no +1s
    assert set(got) == set(st.tf[t])
    for d, tf in st.tf[t].items():
        dl = float(LENGTH_TABLE[st.norm[d]])
        exp = math.log((tf + mu * p) / (dl + mu))  # negative log-prob
        assert abs(got[d] - np.float32(exp)) < 1e-6, d


def test_ib_similarity_ll_and_spl(env):
    from lucene_kmp_spark.search.similarities import IBSimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    avgdl = st.sum_ttf / float(st.doc_count)
    lam = float(np.float32((st.df(t) + 1.0) / (st.doc_count + 1.0)))

    got_ll = _scores(idx, TermQuery(t), IBSimilarity("ll", "df", "h2"))
    got_spl = _scores(idx, TermQuery(t), IBSimilarity("spl", "df", "h2"))
    for d, tf in st.tf[t].items():
        dl = float(LENGTH_TABLE[st.norm[d]])
        tfn = tf * math.log2(1 + avgdl / dl)
        exp_ll = -math.log(lam / (tfn + lam))
        assert abs(got_ll[d] - np.float32(exp_ll)) < 1e-6, d
        q = 1 - 1 / (tfn + 1)
        exp_spl = -math.log((lam ** q - lam) / (1 - lam))
        assert abs(got_spl[d] - np.float32(exp_spl)) < 1e-5, d


def test_raw_tf_and_multi(env):
    from lucene_kmp_spark.search.similarities import (
        MultiSimilarity,
        RawTFSimilarity,
    )

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    got = _scores(idx, TermQuery(t), RawTFSimilarity())
    for d, tf in st.tf[t].items():
        assert got[d] == float(tf), d
    # MultiSimilarity sums sub-scores: RawTF + RawTF == 2*tf
    got2 = _scores(idx, TermQuery(t), MultiSimilarity((RawTFSimilarity(), RawTFSimilarity())))
    for d, tf in st.tf[t].items():
        assert got2[d] == 2.0 * tf, d


def test_indri_and_query(env):
    from lucene_kmp_spark.search.query import IndriAndQuery

    idx, rows = env
    st = CorpusStats(rows)
    s = IndexSearcher(idx, dtype=np.float64)
    terms, mu = ("hope", "light"), 2000.0
    got = {r["doc_id"]: r["score"] for r in s.execute(IndriAndQuery(terms, mu=mu)).collect()}
    # union of matching docs
    union = set(st.tf[terms[0]]) | set(st.tf[terms[1]])
    assert set(got) == union
    ps = {t: st.ttf(t) / float(st.sum_ttf) for t in terms}
    for d in union:
        dl = float(LENGTH_TABLE[st.norm[d]])
        exp = 0.0
        for t in terms:
            tf = st.tf[t].get(d, 0)  # absent -> smoothing score (tf = 0)
            exp += math.log((tf + mu * ps[t]) / (dl + mu))
        exp /= len(terms)
        assert abs(got[d] - exp) < 1e-9, d
    # ranking sanity: a doc with both terms outranks same-length docs with one
    assert all(v < 0 for v in got.values())  # negative log-probs


def test_dfr_basic_models(env):
    """BasicModelIn/Ine/G (BasicModelIn.kt:31-42, BasicModelIne.kt:32-44,
    BasicModelG.kt:33-48) with H2 normalization, both after effects."""
    from lucene_kmp_spark.search.similarities import DFRSimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    avgdl = st.sum_ttf / float(st.doc_count)
    N, F, n = float(st.doc_count), float(st.ttf(t)), float(st.df(t))
    for model in ("In", "Ine", "G"):
        for ae in ("L", "B"):
            got = _scores(idx, TermQuery(t), DFRSimilarity(basic_model=model, after_effect=ae))
            assert set(got) == set(st.tf[t]), (model, ae)
            ae1p = (F + 2.0) / (n + 1.0) if ae == "B" else 1.0
            for d, tf in list(st.tf[t].items())[:30]:
                dl = float(LENGTH_TABLE[st.norm[d]])
                tfn = tf * math.log2(1 + avgdl / dl)
                if model == "In":
                    exp = math.log2((N + 1.0) / (n + 0.5)) * ae1p * (1 - 1 / (1 + tfn))
                elif model == "Ine":
                    ne = N * (1.0 - ((N - 1.0) / N) ** F)
                    exp = math.log2((N + 1.0) / (ne + 0.5)) * ae1p * (1 - 1 / (1 + tfn))
                else:  # G: lambda over F+1 (BasicModelG.kt:35)
                    lam = (F + 1.0) / (N + F + 1.0)
                    A = math.log2(lam + 1.0)
                    B = math.log2((1.0 + lam) / lam)
                    exp = (B - (B - A) / (1.0 + tfn)) * ae1p
                assert abs(got[d] - np.float32(exp)) < 1e-6, (model, ae, d)


def test_dfr_normalizations_h3_z(env):
    """NormalizationH3 (mu; float32 collection-prob ratio per the 1f literals
    in NormalizationH3.kt:45-48) and NormalizationZ (z) with model IF."""
    from lucene_kmp_spark.search.similarities import DFRSimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    avgdl = st.sum_ttf / float(st.doc_count)
    N, F = float(st.doc_count), float(st.ttf(t))
    A = math.log2(1 + (N + 1.0) / (F + 0.5))
    mu, z = 800.0, 0.30
    got_h3 = _scores(idx, TermQuery(t), DFRSimilarity(normalization="H3", mu=mu))
    got_z = _scores(idx, TermQuery(t), DFRSimilarity(normalization="Z", z=z))
    p = float(np.float32(F + 1.0) / np.float32(st.sum_ttf + 1.0))
    for d, tf in list(st.tf[t].items())[:30]:
        dl = float(LENGTH_TABLE[st.norm[d]])
        tfn_h3 = (tf + mu * p) / (dl + mu) * mu
        tfn_z = tf * (avgdl / dl) ** z
        for got, tfn in ((got_h3, tfn_h3), (got_z, tfn_z)):
            exp = A * (1 - 1 / (1 + tfn))
            assert abs(got[d] - np.float32(exp)) < 1e-6, d


def test_axiomatic_family(env):
    """All six variants (AxiomaticF{1,2,3}{EXP,LOG}.kt): components tf
    (freq+1 inside the double log), ln, tfln, idf, gamma per the reference;
    score = max(0, boost*(tf*ln*tfln*idf - gamma)) (Axiomatic.kt:70-84)."""
    from lucene_kmp_spark.search.similarities import AxiomaticSimilarity

    idx, rows = env
    st = CorpusStats(rows)
    t = "hope"
    avgdl = st.sum_ttf / float(st.doc_count)
    N, n = float(st.doc_count), float(st.df(t))
    s, k, qlen = 0.25, 0.35, 1
    idf_exp = ((N + 1.0) / n) ** k
    idf_log = math.log((N + 1.0) / n)
    for variant in ("F1EXP", "F1LOG", "F2EXP", "F2LOG", "F3EXP", "F3LOG"):
        got = _scores(idx, TermQuery(t), AxiomaticSimilarity(variant))
        idf = idf_exp if variant.endswith("EXP") else idf_log
        for d, tf in list(st.tf[t].items())[:30]:
            dl = float(LENGTH_TABLE[st.norm[d]])
            fam = variant[:2]
            tfc = 1.0 + math.log1p(math.log(tf + 1.0)) if fam in ("F1", "F3") else 1.0
            ln_ = (avgdl + s) / (avgdl + dl * s) if fam == "F1" else 1.0
            tfln = tf / (tf + s + s * dl / avgdl) if fam == "F2" else 1.0
            gamma = (dl - qlen) * s * qlen / avgdl if fam == "F3" else 0.0
            exp = max(0.0, tfc * ln_ * tfln * idf - gamma)
            assert abs(got[d] - np.float32(exp)) < 1e-6, (variant, d)
