"""MultiReader composite (index/MultiReader.kt) and LiveFieldValues
(search/LiveFieldValues.kt) semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.index.livevalues import LiveFieldValues
from lucene_kmp_spark.index.multireader import multi_reader
from lucene_kmp_spark.index.segments import SegmentedIndexWriter
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, PhraseQuery, TermQuery


@pytest.fixture(scope="module")
def split_env(spark):
    # one global docID space, split into two disjoint leaves (the Lucene
    # leaf-base contract), plus the single whole-corpus index as the oracle
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=31)).persist()
    docs.count()
    half = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    a = docs.filter(F.col("doc_id") <= half).persist()
    b = docs.filter(F.col("doc_id") > half).persist()
    whole = build_index(docs)
    comp = multi_reader(build_index(a), build_index(b))
    return whole, comp


def _topk(idx, q, k=10):
    return [
        (r["doc_id"], np.float32(r["score"]))
        for r in IndexSearcher(idx).top_k(q, k).collect()
    ]


@pytest.mark.parametrize(
    "q",
    [
        TermQuery("hope"),
        BooleanQuery.build(must=(TermQuery("hope"), TermQuery("light"))),
        PhraseQuery(("the", "light")),
    ],
    ids=["term", "bool_and", "phrase"],
)
def test_multireader_matches_whole_index(split_env, q):
    whole, comp = split_env
    assert _topk(whole, q) == _topk(comp, q)


def test_multireader_stats_merge(split_env):
    whole, comp = split_env
    assert comp.stats.max_doc == whole.stats.max_doc
    assert comp.stats.doc_count == whole.stats.doc_count
    assert comp.stats.sum_total_term_freq == whole.stats.sum_total_term_freq
    assert comp.stats.num_terms == whole.stats.num_terms


def test_multireader_guards(spark, split_env):
    whole, _ = split_env
    # single leaf passes through
    assert multi_reader(whole) is whole
    with pytest.raises(ValueError):
        multi_reader()
    # overlapping docID spaces rejected when checked
    with pytest.raises(ValueError, match="overlap"):
        multi_reader(whole, whole, check_disjoint=True)


def test_live_field_values(spark, tmp_path):
    w = SegmentedIndexWriter(spark, str(tmp_path / "idx"))
    lv = LiveFieldValues(w, value_col="text")

    def batch(rows):
        return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")

    lv.add_batch(batch([("c1", 0, "alpha"), ("c1", 1, "beta")]), batch_key="b0")
    reader_gen0 = lv.refresh()  # searcher now current; pending purged
    assert lv.size == 0

    # writes AFTER the pinned refresh: visible through get() immediately
    lv.update_batch(batch([("c1", 0, "alpha-v2")]), batch_key="b1")
    lv.add_batch(batch([("c2", 0, "gamma")]), batch_key="b2")
    lv.delete_by_keys(spark.createDataFrame([("c1", 1)], "conv_id string, turn_idx int"))
    assert lv.size == 3

    keys = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c2", 0)], "conv_id string, turn_idx int"
    )
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in lv.get(keys).collect()}
    assert got == {("c1", 0): "alpha-v2", ("c2", 0): "gamma"}  # deleted key absent

    # refresh purges pending and the committed view now agrees
    lv.refresh()
    assert lv.size == 0
    got2 = {(r["conv_id"], r["turn_idx"]): r["text"] for r in lv.get(keys).collect()}
    assert got2 == got
    # the stale pre-refresh reader still sees generation-0 values (point-in-time)
    stale = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in reader_gen0.index.docs.select("conv_id", "turn_idx", "text").collect()
    }
    assert stale[("c1", 0)] == "alpha"
