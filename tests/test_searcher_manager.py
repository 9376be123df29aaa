"""SearcherManager / ReferenceManager (search/SearcherManager.kt,
ReferenceManager.kt RefreshListener) and ControlledRealTimeReopenThread
(search/ControlledRealTimeReopenThread.kt) visibility semantics."""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index.segments import SegmentedIndexWriter
from lucene_kmp_spark.search.manager import ControlledRealTimeReopen, SearcherManager


@pytest.fixture()
def corpus(spark):
    df = synth_transcripts(spark, n_convs=8, seed=91).persist()
    df.count()
    return df


def _count(reader):
    return reader.index.docs.count()


def test_acquire_stable_until_refresh(spark, corpus, tmp_path):
    w = SegmentedIndexWriter(spark, str(tmp_path / "mgr"))
    w.add_batch(corpus.filter(F.col("conv_id") < "conv-00000004"), batch_key="b0")
    mgr = SearcherManager(w)
    before = mgr.acquire()
    n0 = _count(before)

    # concurrent commit: acquire() must NOT shift (the paging guarantee)
    w.add_batch(corpus.filter(F.col("conv_id") >= "conv-00000004"), batch_key="b1")
    assert mgr.acquire() is before
    assert _count(mgr.acquire()) == n0

    assert mgr.maybe_refresh() is True
    after = mgr.acquire()
    assert after is not before
    assert _count(after) > n0
    # clean refresh is a cheap no-op
    assert mgr.maybe_refresh() is False
    assert mgr.acquire() is after


def test_refresh_listener_and_factory(spark, corpus, tmp_path):
    w = SegmentedIndexWriter(spark, str(tmp_path / "mgrf"))
    w.add_batch(corpus.limit(40), batch_key="b0")

    calls = []

    class Listener:
        def before_refresh(self):
            calls.append("before")

        def after_refresh(self, did):
            calls.append(("after", did))

    factory_runs = []

    def factory(reader):
        factory_runs.append(reader.generation)
        return ("searcher", reader)

    mgr = SearcherManager(w, searcher_factory=factory)
    mgr.add_listener(Listener())
    assert mgr.acquire()[0] == "searcher"
    assert len(factory_runs) == 1  # factory per refresh, not per acquire
    mgr.acquire()
    assert len(factory_runs) == 1

    assert mgr.maybe_refresh() is False  # nothing new
    assert calls == ["before", ("after", False)]
    w.add_batch(corpus.limit(80), batch_key="b1")
    assert mgr.maybe_refresh() is True
    assert calls == ["before", ("after", False), "before", ("after", True)]
    assert len(factory_runs) == 2


def test_wait_for_generation(spark, corpus, tmp_path):
    w = SegmentedIndexWriter(spark, str(tmp_path / "crt"))
    w.add_batch(corpus.filter(F.col("conv_id") < "conv-00000004"), batch_key="b0")
    mgr = SearcherManager(w)
    crt = ControlledRealTimeReopen(w, mgr)

    rec_gen_before = mgr.generation
    w.add_batch(corpus.filter(F.col("conv_id") >= "conv-00000004"), batch_key="b1")
    committed = int(w.manifest()["generation"])
    assert committed > rec_gen_before

    # waiting on an already-visible generation must not refresh
    assert crt.wait_for_generation(rec_gen_before) == rec_gen_before

    got = crt.wait_for_generation(committed)
    assert got >= committed
    assert _count(mgr.acquire()) == corpus.count()

    with pytest.raises(ValueError):
        crt.wait_for_generation(committed + 10)

    w2 = SegmentedIndexWriter(spark, str(tmp_path / "other"))
    with pytest.raises(ValueError):
        ControlledRealTimeReopen(w2, mgr)
