"""SearcherLifetimeManager (search/SearcherLifetimeManager.kt): follow-up
requests acquire the SAME point-in-time searcher by token across commits;
release/prune unpin; pinned segments survive purge_unreferenced."""

import time

from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index.segments import SegmentedIndexWriter
from lucene_kmp_spark.search.lifetime import SearcherLifetimeManager
from lucene_kmp_spark.search.query import TermQuery


def _top(reader, k=10):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in reader.searcher().top_k(TermQuery("kingdom"), k).collect()
    ]


def test_record_acquire_across_commits(spark, tmp_path):
    w = SegmentedIndexWriter(spark, str(tmp_path / "idx"))
    w.add_batch(synth_transcripts(spark, n_convs=10, seed=1), batch_key="b1")
    mgr = SearcherLifetimeManager(w)
    r1 = w.reader()
    tok1 = mgr.record(r1)
    page1 = _top(r1)
    assert mgr.record(w.reader()) == tok1  # same version -> same token

    # commit more docs + a merge: the live view changes
    b2 = synth_transcripts(spark, n_convs=10, seed=2).withColumn(
        "conv_id", F.concat(F.lit("b2-"), F.col("conv_id"))
    )
    w.add_batch(b2, batch_key="b2")
    w.force_merge(1)
    assert _top(w.reader()) != page1 or w.reader().generation != r1.generation

    # the follow-up request sees the ORIGINAL point-in-time view
    old = mgr.acquire(tok1)
    assert old is not None and old.generation == r1.generation
    assert _top(old) == page1

    # pinned segments survive purge; released ones get reclaimed
    removed_while_pinned = w.purge_unreferenced()
    assert _top(mgr.acquire(tok1)) == page1
    assert mgr.release(tok1)
    assert mgr.acquire(tok1) is None
    removed_after = w.purge_unreferenced()
    assert set(removed_while_pinned) < set(removed_while_pinned) | set(removed_after)
    assert removed_after  # the old pre-merge segments are now reclaimable


def test_prune_by_age_keeps_newest(spark, tmp_path):
    w = SegmentedIndexWriter(spark, str(tmp_path / "idx"))
    w.add_batch(synth_transcripts(spark, n_convs=5, seed=1), batch_key="b1")
    mgr = SearcherLifetimeManager(w)
    tok1 = mgr.record(w.reader())
    w.add_batch(
        synth_transcripts(spark, n_convs=5, seed=2).withColumn(
            "conv_id", F.concat(F.lit("x-"), F.col("conv_id"))
        ),
        batch_key="b2",
    )
    tok2 = mgr.record(w.reader())
    time.sleep(0.05)
    # everything is "old", but the newest recorded searcher is always kept
    pruned = mgr.prune(max_age_sec=0.0)
    assert pruned == [tok1]
    assert mgr.tokens() == [tok2]
    assert mgr.acquire(tok2) is not None
