"""Conjunction window prefilter (the BlockMaxConjunction revisit):
result identity with the plain conjunction, gate behavior, and the
no-extra-action property (the lead-window list is a broadcast subplan,
not a collected set)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, TermQuery


@pytest.fixture(scope="module")
def idx(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=60, seed=23)).persist()
    docs.count()
    ix = build_index(docs)
    yield ix
    ix.unpersist()
    docs.unpersist()


def _topk(searcher, q, k=20):
    return [
        (r["doc_id"], round(float(r["score"]), 5))
        for r in searcher.top_k(q, k).collect()
    ]


def _rare_and_hot_terms(searcher):
    rows = (
        searcher.index.term_dict.orderBy(F.desc("df")).limit(1).collect()
        + searcher.index.term_dict.filter(F.col("df").between(2, 8))
        .orderBy("term").limit(1).collect()
    )
    hot, rare = rows[0]["term"], rows[1]["term"]
    return rare, hot


def test_prefilter_identical_results(spark, idx):
    """With the gate forced open, the window-restricted conjunction must be
    rank- and score-identical to the plain path."""
    s_plain = IndexSearcher(idx)
    s_pref = IndexSearcher(idx)
    s_pref.WINDOW_PREFILTER_MAX_OCCUPANCY = 1e9
    s_pref.WINDOW_PREFILTER_MIN_OTHER_DF = 0
    s_plain.WINDOW_PREFILTER_MAX_OCCUPANCY = -1.0  # gate always closed

    rare, hot = _rare_and_hot_terms(s_plain)
    q = BooleanQuery.build(must=(TermQuery(rare), TermQuery(hot)))
    assert s_pref._conjunction_window_rows(
        {rare: 1.0, hot: 1.0}, s_pref.term_stats([rare, hot])) is not None
    assert _topk(s_pref, q) == _topk(s_plain, q)

    # three-clause conjunction through the same path
    rows = s_plain.index.term_dict.orderBy(F.desc("df")).limit(2).collect()
    hot2 = rows[1]["term"]
    q3 = BooleanQuery.build(
        must=(TermQuery(rare), TermQuery(hot), TermQuery(hot2)))
    assert _topk(s_pref, q3) == _topk(s_plain, q3)


def test_gate_closes_on_hot_lead(idx):
    """hot AND hot: the lead occupies (nearly) every window — the gate must
    refuse (no pruning possible, the broadcast join would be pure cost)."""
    s = IndexSearcher(idx)
    rows = s.index.term_dict.orderBy(F.desc("df")).limit(2).collect()
    terms = [r["term"] for r in rows]
    stats = s.term_stats(terms)
    assert s._conjunction_window_rows({t: 1.0 for t in terms}, stats) is None


def test_gate_closes_on_small_other(idx):
    """rare AND rare: decode volume is tiny — gate refuses by MIN_OTHER_DF."""
    s = IndexSearcher(idx)
    rows = (
        s.index.term_dict.filter(F.col("df").between(2, 8))
        .orderBy("term").limit(2).collect()
    )
    terms = [r["term"] for r in rows]
    stats = s.term_stats(terms)
    assert s._conjunction_window_rows({t: 1.0 for t in terms}, stats) is None


def test_prefilter_restricts_blocks(idx):
    """The restricted rows are a subset of the full block rows: only blocks
    whose window the lead term occupies survive."""
    s = IndexSearcher(idx)
    s.WINDOW_PREFILTER_MAX_OCCUPANCY = 1e9
    s.WINDOW_PREFILTER_MIN_OTHER_DF = 0
    rare, hot = _rare_and_hot_terms(s)
    stats = s.term_stats([rare, hot])
    rows = s._conjunction_window_rows({rare: 1.0, hot: 1.0}, stats)
    full = s.index.postings.filter(F.col("term").isin([rare, hot]))
    kept = rows.count()
    assert 0 < kept <= full.count()
    lead_windows = {
        r["_w"] for r in s.index.postings.filter(F.col("term") == rare)
        .select(F.shiftright("block_id", 16).alias("_w")).distinct().collect()
    }
    surviving = {
        r["w"] for r in rows.select(
            F.shiftright("block_id", 16).alias("w")).distinct().collect()
    }
    assert surviving <= lead_windows


def test_prefilter_with_deletes_and_msm(spark, idx):
    """The prefiltered conjunction composes with SHOULD/msm and MUST_NOT —
    whole-query results stay identical."""
    s_pref = IndexSearcher(idx)
    s_pref.WINDOW_PREFILTER_MAX_OCCUPANCY = 1e9
    s_pref.WINDOW_PREFILTER_MIN_OTHER_DF = 0
    s_plain = IndexSearcher(idx)
    s_plain.WINDOW_PREFILTER_MAX_OCCUPANCY = -1.0
    rare, hot = _rare_and_hot_terms(s_plain)
    q = BooleanQuery.build(
        must=(TermQuery(rare), TermQuery(hot)),
        should=(TermQuery("the"),),
        must_not=(TermQuery("zzzznope"),),
    )
    assert _topk(s_pref, q) == _topk(s_plain, q)


def test_n_buckets_metadata(idx):
    """term_dict carries the build-time occupied-window count (the
    index-resident (term, window) presence metadata): it must equal the
    distinct block_id>>16 count per term, and term_stats must surface it."""
    s = IndexSearcher(idx)
    assert "n_buckets" in idx.term_dict.columns
    sample = [r["term"] for r in idx.term_dict.limit(5).collect()]
    truth = {
        r["term"]: r["nb"]
        for r in idx.postings.filter(F.col("term").isin(sample))
        .groupBy("term")
        .agg(F.countDistinct(F.shiftright("block_id", 16)).alias("nb"))
        .collect()
    }
    stats = s.term_stats(sample)
    for t in sample:
        assert stats[t].n_buckets == truth[t]
    # old-format stats (n_buckets=-1) fall back to occupied = min(df,
    # n_windows): a clustered-but-frequent lead the metadata would admit
    # (n_buckets=1) is REFUSED under the df proxy — the conservative
    # direction — while a tiny-df lead still passes the occupancy gate
    from lucene_kmp_spark.search.executor import TermStats

    s2 = IndexSearcher(idx)
    s2.WINDOW_PREFILTER_MIN_OTHER_DF = 0
    n_windows = max(1, -(-idx.stats.doc_count // 8192))
    big_df = int(s2.WINDOW_PREFILTER_MAX_OCCUPANCY * n_windows) + 1
    old = {"a": TermStats(big_df, big_df), "b": TermStats(10**6, 10**6)}
    assert s2._conjunction_window_rows({"a": 1.0, "b": 1.0}, old) is None
    fresh = {"a": TermStats(big_df, big_df, n_buckets=0),
             "b": TermStats(10**6, 10**6, n_buckets=n_windows)}
    assert s2._conjunction_window_rows({"a": 1.0, "b": 1.0}, fresh) is not None


def test_gate_disabled_on_unbucketed_index(spark):
    """skew_safe=False numbers block slices per term — block_id >> 16 is
    not a doc-order window there, so the prefilter must refuse."""
    from lucene_kmp_spark.search.executor import TermStats

    docs = assign_doc_ids(synth_transcripts(spark, n_convs=6, seed=3))
    ix = build_index(docs, skew_safe=False)
    assert ix.extra["bucketed_blocks"] is False
    s = IndexSearcher(ix)
    s.WINDOW_PREFILTER_MAX_OCCUPANCY = 1e9
    s.WINDOW_PREFILTER_MIN_OTHER_DF = 0
    stats = {"a": TermStats(1, 1, n_buckets=1), "b": TermStats(10**6, 10**6, n_buckets=1)}
    assert s._conjunction_window_rows({"a": 1.0, "b": 1.0}, stats) is None
    # and the flag round-trips through write/read
    import tempfile, os, shutil
    root = tempfile.mkdtemp(prefix="wpf_unbucketed_")
    try:
        ix.write(os.path.join(root, "ix"))
        from lucene_kmp_spark.index.builder import InvertedIndex

        back = InvertedIndex.read(spark, os.path.join(root, "ix"))
        assert back.extra["bucketed_blocks"] is False
    finally:
        shutil.rmtree(root, ignore_errors=True)
