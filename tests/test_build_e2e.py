"""End-to-end build + query parity vs the naive oracle (CheckHits pattern)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

N_CONVS = 60
SEED = 7


@pytest.fixture(scope="module")
def corpus(spark):
    df = synth_transcripts(spark, n_convs=N_CONVS, seed=SEED)
    docs = assign_doc_ids(df).persist()
    docs.count()
    return docs


@pytest.fixture(scope="module")
def index(spark, corpus):
    return build_index(corpus, text_col="text")


@pytest.fixture(scope="module")
def searcher(index):
    return IndexSearcher(index)


@pytest.fixture(scope="module")
def naive(corpus):
    rows = [(r["doc_id"], r["text"]) for r in corpus.select("doc_id", "text").collect()]
    return NaiveIndex(rows)


def _topk(searcher, q, k=10):
    return [(r["doc_id"], r["score"]) for r in searcher.top_k(q, k).collect()]


def assert_topk_equal(engine, oracle, tol_ulp=0):
    assert [d for d, _ in engine] == [d for d, _ in oracle], (engine, oracle)
    for (d1, s1), (d2, s2) in zip(engine, oracle):
        assert np.float32(s1) == np.float32(s2), (d1, s1, s2)


# ---------------------------------------------------------------- docids


def test_doc_ids_dense_and_ordered(corpus):
    n = corpus.count()
    ids = corpus.select("doc_id").orderBy("doc_id").collect()
    assert [r["doc_id"] for r in ids] == list(range(n))
    # doc_id order == (conv_id, turn_idx) order
    rows = corpus.select("conv_id", "turn_idx", "doc_id").orderBy("conv_id", "turn_idx").collect()
    assert [r["doc_id"] for r in rows] == list(range(n))


def test_doc_ids_stable_across_partitioning(spark):
    df = synth_transcripts(spark, n_convs=20, seed=3)
    a = assign_doc_ids(df, num_partitions=2).select("conv_id", "turn_idx", "doc_id")
    b = assign_doc_ids(df.repartition(13), num_partitions=7).select("conv_id", "turn_idx", "doc_id")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0


def test_per_turn_text_equality_invariant(spark, corpus):
    """north-rule invariant: per-turn text equality under stable ordering."""
    src = synth_transcripts(spark, n_convs=N_CONVS, seed=SEED).select("conv_id", "turn_idx", "text")
    roundtrip = corpus.select("conv_id", "turn_idx", "text")
    assert src.exceptAll(roundtrip).count() == 0
    assert roundtrip.exceptAll(src).count() == 0


# ---------------------------------------------------------------- stats


def test_stats_match_naive(index, naive):
    assert index.stats.doc_count == naive.doc_count
    assert index.stats.sum_total_term_freq == naive.sum_ttf
    assert index.stats.sum_doc_freq == sum(len(p) for p in naive.postings.values())


def test_term_dict_matches_naive(index, naive):
    rows = index.term_dict.collect()
    got = {r["term"]: (r["df"], r["ttf"]) for r in rows}
    exp = {t: (naive.df(t), naive.ttf(t)) for t in naive.postings}
    assert got == exp


def test_block_layout(index):
    """Blocks hold <=128 docs, are doc-ordered and disjoint per term, and the
    per-term totals reconcile with the term_dict."""
    from lucene_kmp_spark.index.builder import BLOCK_SIZE

    rows = index.postings.select("term", "block_id", "num_docs", "min_doc_id", "max_doc_id").collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    dfs = {r["term"]: r["df"] for r in index.term_dict.collect()}
    for term, blocks in by_term.items():
        blocks.sort(key=lambda r: r["block_id"])
        for b in blocks:
            assert 1 <= b["num_docs"] <= BLOCK_SIZE
            assert b["min_doc_id"] <= b["max_doc_id"]
        # block_id order == doc order, ranges disjoint
        for prev, nxt in zip(blocks, blocks[1:]):
            assert prev["max_doc_id"] < nxt["min_doc_id"]
        assert sum(b["num_docs"] for b in blocks) == dfs[term]


def _decoded_postings(df):
    from lucene_kmp_spark.util.packing import block_decode, delta_block_decode
    import numpy as np

    out = set()
    for r in df.select("term", "doc_ids_enc", "freqs_enc", "norms_enc").collect():
        docs = delta_block_decode(bytes(r["doc_ids_enc"]))
        tfs = block_decode(bytes(r["freqs_enc"]))
        norms = np.frombuffer(bytes(r["norms_enc"]), dtype=np.uint8)
        for d, t, n in zip(docs.tolist(), tfs.tolist(), norms.tolist()):
            out.add((r["term"], d, t, n))
    return out


def test_skew_safe_equals_plain_window(spark, corpus, index):
    """Two physically different layouts (bucketed vs per-term window) must
    decode to identical logical postings."""
    from lucene_kmp_spark.index.builder import build_postings, tokenize_to_tokens

    tokens = tokenize_to_tokens(corpus).persist()
    a = _decoded_postings(build_postings(tokens, skew_safe=True))
    b = _decoded_postings(build_postings(tokens, skew_safe=False))
    assert a == b
    tokens.unpersist()


# ---------------------------------------------------------------- queries


def test_term_query_topk(searcher, naive):
    for term in ["the", "spark", "resurrection", "w0042", "hope"]:
        oracle = naive.top_k(TermQuery(term))
        assert oracle, f"vacuous test: {term} not in corpus"
        assert_topk_equal(_topk(searcher, TermQuery(term)), oracle)


def test_zipf_skew_present(naive):
    # "the" (rank 1) must be a hot term so skew handling is actually exercised
    assert naive.df("the") > 0.3 * naive.doc_count


def test_term_query_missing_term(searcher, naive):
    assert _topk(searcher, TermQuery("zzznotaterm")) == []


def test_term_query_full_match_set(searcher, naive):
    q = TermQuery("spark")
    got = {r["doc_id"]: r["score"] for r in searcher.execute(q).collect()}
    exp = naive.scores(q)
    assert set(got) == set(exp)
    for d in got:
        assert np.float32(got[d]) == np.float32(exp[d])


def test_bool_and(searcher, naive):
    q = BooleanQuery.build(must=(TermQuery("the"), TermQuery("spark")))
    assert_topk_equal(_topk(searcher, q), naive.top_k(q))


def test_bool_or(searcher, naive):
    q = BooleanQuery.build(should=(TermQuery("hope"), TermQuery("faith"), TermQuery("light")))
    assert_topk_equal(_topk(searcher, q), naive.top_k(q))


def test_bool_or_msm(searcher, naive):
    q = BooleanQuery.build(
        should=(TermQuery("hope"), TermQuery("faith"), TermQuery("light")),
        minimum_should_match=2,
    )
    assert_topk_equal(_topk(searcher, q), naive.top_k(q))


def test_bool_not(searcher, naive):
    q = BooleanQuery.build(must=(TermQuery("the"),), must_not=(TermQuery("spark"),))
    assert_topk_equal(_topk(searcher, q), naive.top_k(q))


def test_bool_must_plus_should(searcher, naive):
    q = BooleanQuery.build(must=(TermQuery("the"),), should=(TermQuery("hope"), TermQuery("spark")))
    assert_topk_equal(_topk(searcher, q), naive.top_k(q))


def test_bool_filter_no_score(searcher, naive):
    q = BooleanQuery.build(must=(TermQuery("hope"),), filter=(TermQuery("the"),))
    assert_topk_equal(_topk(searcher, q), naive.top_k(q))


def test_phrase_query(searcher, naive):
    q = PhraseQuery(("kingdom", "of"))
    got, exp = _topk(searcher, q), naive.top_k(q)
    assert_topk_equal(got, exp)


def test_prefix_query(searcher, naive):
    q = PrefixQuery("w00")
    got = {r["doc_id"] for r in searcher.execute(q).collect()}
    assert got == set(naive.scores(q))


def test_wildcard_query(searcher, naive):
    q = WildcardQuery("w0?4*")
    got = {r["doc_id"] for r in searcher.execute(q).collect()}
    assert got == set(naive.scores(q))


def test_term_range_query(searcher, naive):
    q = TermRangeQuery("spark", "token")
    got = {r["doc_id"] for r in searcher.execute(q).collect()}
    assert got == set(naive.scores(q))


def test_term_in_set(searcher, naive):
    q = TermInSetQuery(("spark", "hope", "zzz"))
    got = {r["doc_id"] for r in searcher.execute(q).collect()}
    assert got == set(naive.scores(q))


def test_count_fast_path(searcher, naive):
    assert searcher.count(TermQuery("the")) == naive.df("the")
    q = BooleanQuery.build(must=(TermQuery("the"), TermQuery("spark")))
    assert searcher.count(q) == len(naive.scores(q))


def test_search_after(searcher, naive):
    q = TermQuery("the")
    full = naive.top_k(q, k=20)
    page1 = _topk(searcher, q, k=10)
    after_score, after_doc = page1[-1][1], page1[-1][0]
    page2 = [
        (r["doc_id"], r["score"])
        for r in searcher.search_after(q, float(after_score), int(after_doc), k=10).collect()
    ]
    assert_topk_equal(page1 + page2, full)


def test_index_roundtrip_write_read(tmp_path, spark, index, naive, searcher):
    from lucene_kmp_spark.index.builder import InvertedIndex

    path = str(tmp_path / "idx")
    index.write(path)
    idx2 = InvertedIndex.read(spark, path)
    s2 = IndexSearcher(idx2)
    q = BooleanQuery.build(must=(TermQuery("the"),), should=(TermQuery("hope"),))
    assert_topk_equal(_topk(s2, q), naive.top_k(q))


def test_index_roundtrip_orc_format(tmp_path, spark, index, naive):
    """storage_format plumb-through: any stats-bearing columnar format
    persists the same index (ORC here; Iceberg takes the same path on a
    cluster with the runtime jars). The manifest records the format, so
    read() is format-blind."""
    from lucene_kmp_spark.index.builder import InvertedIndex

    path = str(tmp_path / "idx_orc")
    index.write(path, storage_format="orc")
    idx2 = InvertedIndex.read(spark, path)
    s2 = IndexSearcher(idx2)
    q = BooleanQuery.build(must=(TermQuery("the"),), should=(TermQuery("hope"),))
    assert_topk_equal(_topk(s2, q), naive.top_k(q))


# ----------------------------------------------------------- stored fields

def test_stored_fields_doc(spark, corpus, searcher):
    """StoredFields.document(docID) analog: live lookup, field subset,
    unknown id, deleted-doc invisibility (live_filter)."""
    row = corpus.select("doc_id", "text").orderBy("doc_id").first()
    got = searcher.doc(row["doc_id"])
    assert got is not None and got["text"] == row["text"]

    subset = searcher.doc(row["doc_id"], fields=("text",))
    assert set(subset) == {"doc_id", "text"}

    assert searcher.doc(10**9) is None

    batch = searcher.docs_for([row["doc_id"], 10**9], fields=("text",))
    assert batch.count() == 1

    # a deleted doc is invisible through the live filter
    from lucene_kmp_spark.search.executor import IndexSearcher

    deleted = spark.createDataFrame([(int(row["doc_id"]),)], "doc_id long")
    s2 = IndexSearcher(searcher.index, live_filter=deleted)
    assert s2.doc(row["doc_id"]) is None


def test_auto_serve_width_rule(spark):
    """serve_partitions=None auto-narrows ONLY small indexes: floor
    min(8, build_width), one partition per ~50k docs, never narrowing at
    or above the build width (a 4M-doc corpus computes 81 >= width and is
    untouched)."""
    from lucene_kmp_spark.data.transcripts import synth_transcripts
    from lucene_kmp_spark.index import assign_doc_ids, build_index

    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=3))
    build_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # tiny corpus: auto = min(8, build_width); tests run at width 8 => no
    # narrowing is only when build_width <= floor
    idx = build_index(docs)
    got = idx.postings.rdd.getNumPartitions()
    floor = min(8, build_width)
    if floor < build_width:
        assert got == floor
        assert idx.term_dict.rdd.getNumPartitions() == floor
        assert idx.norms.rdd.getNumPartitions() == floor
    else:
        # floor == build_width: rule must leave the tables alone
        assert got >= 1
    # explicit override still honored
    idx2 = build_index(docs, serve_partitions=2)
    assert idx2.postings.rdd.getNumPartitions() == 2
    # explicit 0 disables narrowing entirely
    idx3 = build_index(docs, serve_partitions=0)
    assert idx3.postings.rdd.getNumPartitions() >= floor
    # cache=False (ephemeral build, no reuse to amortize the repartition
    # jobs) auto-gates the narrowing off; explicit serve_partitions still
    # honored regardless of cache
    idx4 = build_index(docs, cache=False)
    assert idx4.postings.rdd.getNumPartitions() >= floor
    if floor < build_width:
        assert idx4.postings.rdd.getNumPartitions() == build_width
    idx5 = build_index(docs, cache=False, serve_partitions=2)
    assert idx5.postings.rdd.getNumPartitions() == 2
