"""CombinedFieldQuery (BM25F) + BlendedTermQuery vs a pure-python oracle
that independently applies the reference's statistic-merging rules
(CombinedFieldQuery.kt:236-281, MultiNormsLeafSimScorer.kt:100-124,
BlendedTermQuery.kt:224-234)."""

import numpy as np
import pytest

from lucene_kmp_spark.analysis import analyze
from lucene_kmp_spark.index import assign_doc_ids
from lucene_kmp_spark.search import bm25
from lucene_kmp_spark.search.multifield import MultiFieldSearcher, build_field_indexes
from lucene_kmp_spark.search.query import BlendedTermQuery, CombinedFieldQuery
from lucene_kmp_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4

ROWS = [
    ("c", 0, "spark index", "the spark engine builds a big index of terms"),
    ("c", 1, "query scoring", "spark query scoring uses bm25 and index stats"),
    ("c", 2, "merge policy", "segments merge by tier the index stays small"),
    ("c", 3, "spark spark", "no relevant words here at all just filler text"),
    ("c", 4, "empty body", None),
    ("c", 5, None, "body only document about spark index internals"),
    ("c", 6, "a very long title with many words to change its length norm", "short body"),
]


@pytest.fixture(scope="module")
def env(spark):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, title string, body string"
    )
    docs = assign_doc_ids(df).persist()
    docs.count()
    idxs = build_field_indexes(docs, ("title", "body"))
    key = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in docs.collect()}
    rows = {key[(c, t)]: (title, body) for c, t, title, body in ROWS}
    return MultiFieldSearcher(idxs), rows


class Oracle:
    """Independent python reimplementation of the merged-stats scoring."""

    def __init__(self, rows: dict[int, tuple[str | None, str | None]]):
        self.fields = {"title": {}, "body": {}}  # field -> doc -> Counter(term)
        self.norm = {"title": {}, "body": {}}    # field -> doc -> norm byte
        for doc, (title, body) in rows.items():
            for f, text in (("title", title), ("body", body)):
                if text is None:
                    continue
                terms, _pos, _ = analyze(text)
                if not terms:
                    continue
                cnt = {}
                for t in terms:
                    cnt[t] = cnt.get(t, 0) + 1
                self.fields[f][doc] = cnt
                self.norm[f][doc] = int_to_byte4(len(terms))

    def stats(self, f):
        docs = self.fields[f]
        doc_count = len(docs)
        sum_ttf = sum(sum(c.values()) for c in docs.values())
        return doc_count, sum_ttf

    def combined(self, terms, fw, boost=1.0, dtype=np.float32):
        dt = dtype
        doc_count = max(self.stats(f)[0] for f, _ in fw)
        sum_ttf = sum(int(w * self.stats(f)[1]) for f, w in fw)
        avgdl = bm25.avg_field_length(sum_ttf, doc_count, dt)
        cache = dt(1) / (dt(1.2) * ((dt(1) - dt(0.75)) + dt(0.75) * LENGTH_TABLE.astype(dt) / avgdl))
        # combined norm byte per doc
        cnorm = {}
        all_docs = set().union(*(self.fields[f].keys() for f, _ in fw))
        for d in all_docs:
            acc = np.float32(0)
            for f, w in fw:
                if d in self.norm[f]:
                    acc += np.float32(w) * LENGTH_TABLE[self.norm[f][d] & 0xFF]
            cnorm[d] = int_to_byte4(int(np.floor(np.float64(acc) + 0.5)))
        # ONE pseudo term: df = max over every (term, field) stat pair
        # (CombinedFieldQuery.kt:236-252); per-doc freq sums weighted tf over
        # ALL terms and fields, one saturation (CombinedFieldScorer.freq)
        df_pseudo = max(
            (
                sum(1 for c in self.fields[f].values() if t in c)
                for t in dict.fromkeys(terms)
                for f, _ in fw
            ),
            default=0,
        )
        if df_pseudo == 0:
            return {}
        w_p = dt(dt(boost) * bm25.idf(df_pseudo, doc_count, dt))
        out = {}
        for d in all_docs:
            wtf = sum(
                w * self.fields[f].get(d, {}).get(t, 0)
                for t in dict.fromkeys(terms)
                for f, w in fw
            )
            if wtf <= 0:
                continue
            ni = cache[cnorm[d]]
            sc = w_p - w_p / (dt(1) + dt(wtf) * ni)
            out[d] = float(sc)
        return out

    def blended(self, term, fields, tie_breaker=0.01, boost=1.0, dtype=np.float32):
        per_field = {}
        dfs, ttfs = {}, {}
        for f in fields:
            df = sum(1 for c in self.fields[f].values() if term in c)
            if df:
                dfs[f] = df
                ttfs[f] = sum(c.get(term, 0) for c in self.fields[f].values())
        if not dfs:
            return {}
        df_blend, ttf_blend = max(dfs.values()), sum(ttfs.values())
        for f in dfs:
            doc_count, sum_ttf = self.stats(f)
            sc = bm25.make_scorer(
                boost, min(df_blend, doc_count), doc_count, sum_ttf, dtype=dtype
            )
            per_field[f] = {
                d: float(sc.score(np.array([c[term]]), np.array([self.norm[f][d]]))[0])
                for d, c in self.fields[f].items()
                if term in c
            }
        out = {}
        for d in set().union(*(m.keys() for m in per_field.values())):
            vals = [m[d] for m in per_field.values() if d in m]
            out[d] = max(vals) + tie_breaker * (sum(vals) - max(vals))
        return out


@pytest.fixture(scope="module")
def oracle(env):
    return Oracle(env[1])


def _score_map(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


@pytest.mark.parametrize("fw", [(("title", 1.0), ("body", 1.0)), (("title", 2.5), ("body", 1.0))])
def test_combined_field_vs_oracle(env, oracle, fw):
    s, _ = env
    q = CombinedFieldQuery(("spark", "index"), field_weights=fw)
    got, exp = _score_map(s.execute(q)), oracle.combined(("spark", "index"), list(fw))
    assert set(got) == set(exp) and got, fw
    for d in got:
        assert abs(got[d] - exp[d]) < 1e-6, (fw, d)


def test_combined_field_norm_is_cross_field(env, oracle):
    """A doc matching in one field is still normalized by BOTH field lengths."""
    s, rows = env
    long_title_doc = next(d for d, (t, _b) in rows.items() if t and "very long title" in t)
    q = CombinedFieldQuery(("short",), field_weights=(("title", 1.0), ("body", 1.0)))
    got = _score_map(s.execute(q))
    assert long_title_doc in got  # "short" only in body, but doc matches
    # oracle agrees including the combined-norm effect of the long title
    exp = oracle.combined(("short",), [("title", 1.0), ("body", 1.0)])
    assert abs(got[long_title_doc] - exp[long_title_doc]) < 1e-6


def test_blended_term_vs_oracle(env, oracle):
    s, _ = env
    q = BlendedTermQuery("spark", fields=("title", "body"))
    got, exp = _score_map(s.execute(q)), oracle.blended("spark", ("title", "body"))
    assert set(got) == set(exp) and got
    for d in got:
        assert abs(got[d] - exp[d]) < 1e-6


def test_blended_missing_everywhere(env):
    s, _ = env
    assert s.execute(BlendedTermQuery("zzz", fields=("title", "body"))).count() == 0


def test_combined_topk_orders(env):
    s, _ = env
    q = CombinedFieldQuery(("spark",), field_weights=(("title", 1.0), ("body", 1.0)))
    rows = s.top_k(q, 5).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_search_all_fields(env):
    """MultiFieldQueryParser pattern: parsed query across title+body with
    boosts, dismax-combined per doc."""
    s, rows = env
    got = s.search_all_fields("spark index", k=10, boosts={"title": 2.0}, tie_breaker=0.1)
    hits = [(r["doc_id"], r["score"]) for r in got.collect()]
    assert hits
    # oracle: per-field execute + manual dismax
    from lucene_kmp_spark.queryparser import parse

    q = parse("spark index")
    per_field = {}
    for f, sub in s.searchers.items():
        b = 2.0 if f == "title" else 1.0
        per_field[f] = {r["doc_id"]: r["score"] * b for r in sub.execute(q).collect()}
    exp = {}
    for d in set().union(*(m.keys() for m in per_field.values())):
        vals = [m[d] for m in per_field.values() if d in m]
        exp[d] = max(vals) + 0.1 * (sum(vals) - max(vals))
    ranked = sorted(exp.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [d for d, _ in hits] == [d for d, _ in ranked]


def test_per_field_similarity_wrapper(env, spark):
    """PerFieldSimilarityWrapper routes each field to its own similarity:
    scores match single-field searchers built directly with that
    similarity."""
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import TermQuery
    from lucene_kmp_spark.search.similarities import (
        BM25Similarity,
        ClassicSimilarity,
        PerFieldSimilarity,
        PerFieldSimilarityWrapper,
    )

    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, title string, body string"
    )
    docs = assign_doc_ids(df).persist()
    docs.count()
    idxs = build_field_indexes(docs, ("title", "body"))
    wrapper = PerFieldSimilarity({"title": ClassicSimilarity()}, default=BM25Similarity())
    mf = MultiFieldSearcher(idxs, similarity=wrapper)

    q = TermQuery("spark")
    got_title = {r["doc_id"]: r["score"] for r in mf.searchers["title"].execute(q).collect()}
    exp_title = {
        r["doc_id"]: r["score"]
        for r in IndexSearcher(idxs["title"], similarity=ClassicSimilarity()).execute(q).collect()
    }
    assert got_title == exp_title and got_title

    got_body = {r["doc_id"]: r["score"] for r in mf.searchers["body"].execute(q).collect()}
    exp_body = {
        r["doc_id"]: r["score"] for r in IndexSearcher(idxs["body"]).execute(q).collect()
    }
    assert got_body == exp_body and got_body

    # the wrapper itself refuses direct scorer() use (must be field-resolved)
    with pytest.raises(TypeError):
        wrapper.scorer(1.0, [(1, 1)], 10, 100)
    # abstract base contract
    with pytest.raises(NotImplementedError):
        PerFieldSimilarityWrapper().get("x")
