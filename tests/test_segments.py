"""Incremental indexing: segment append, deletes, updates, merge — after each
mutation the visible corpus must match a brute-force oracle rebuilt from
scratch (FIXTURES.md §5 replay pattern; IndexWriter semantics
index/IndexWriter.kt:1239,1591,1641)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index.segments import SegmentedIndexWriter
from lucene_kmp_spark.search.naive import NaiveIndex
from lucene_kmp_spark.search.query import BooleanQuery, TermQuery


def _oracle_for(writer_docs):
    rows = [(r["doc_id"], r["text"]) for r in writer_docs]
    return NaiveIndex(rows)


def _visible_rows(writer):
    r = writer.reader()
    docs = r.index.docs.select("doc_id", "text")
    if r.deleted is not None:
        docs = docs.join(r.deleted, "doc_id", "left_anti")
    return docs.collect()


def _check_parity(writer, terms=("the", "hope", "spark")):
    """Engine top-10 must equal a from-scratch naive rebuild of LIVE docs,
    except scores use full-index stats (deleted docs still counted — Lucene
    behavior) so we compare doc sets on a stats-neutral basis: same index
    stats fed to the oracle."""
    reader = writer.reader()
    s = reader.searcher()
    live = _visible_rows(writer)
    oracle = NaiveIndex([(r["doc_id"], r["text"]) for r in live])
    # align oracle stats with engine (deleted docs still count in stats)
    oracle.doc_count = reader.index.stats.doc_count
    oracle.sum_ttf = reader.index.stats.sum_total_term_freq
    for t in terms:
        got = [(r["doc_id"], r["score"]) for r in s.top_k(TermQuery(t), 10).collect()]
        # oracle df must also come from the full index (deletes don't shrink df)
        full_df = s.term_stats([t])
        if t not in full_df:
            assert got == []
            continue
        sc = oracle._scorer(full_df[t].df, 1.0)
        exp = []
        for doc, plist in oracle.postings.get(t, {}).items():
            exp.append((doc, float(np.float32(sc.score(np.array([len(plist)]), np.array([oracle.norms[doc]]))[0]))))
        exp.sort(key=lambda x: (-x[1], x[0]))
        assert got == exp[:10], f"term {t}"


@pytest.fixture()
def writer(spark, tmp_path):
    return SegmentedIndexWriter(spark, str(tmp_path / "segidx"))


def test_append_two_batches(spark, writer):
    b1 = synth_transcripts(spark, n_convs=20, seed=1)
    b2 = synth_transcripts(spark, n_convs=20, seed=2).withColumn(
        "conv_id", F.concat(F.lit("b2-"), F.col("conv_id"))
    )
    writer.add_batch(b1, batch_key="b1")
    writer.add_batch(b2, batch_key="b2")
    m = writer.manifest()
    assert len(m["segments"]) == 2
    # docIDs globally unique and dense-per-segment
    reader = writer.reader()
    n = reader.index.docs.count()
    ids = [r["doc_id"] for r in reader.index.docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(n))
    _check_parity(writer)


def test_batch_idempotent_replay(spark, writer):
    b1 = synth_transcripts(spark, n_convs=10, seed=1)
    r1 = writer.add_batch(b1, batch_key="b1")
    r2 = writer.add_batch(b1, batch_key="b1")  # checkpoint replay
    assert r1 is not None and r2 is None
    assert len(writer.manifest()["segments"]) == 1


def test_delete_by_keys(spark, writer):
    b1 = synth_transcripts(spark, n_convs=15, seed=3)
    writer.add_batch(b1, batch_key="b1")
    victims = b1.select("conv_id", "turn_idx").limit(20)
    n_before = len(_visible_rows(writer))
    writer.delete_by_keys(victims)
    vis = _visible_rows(writer)
    assert len(vis) == n_before - 20
    _check_parity(writer)


def test_delete_by_query(spark, writer):
    b1 = synth_transcripts(spark, n_convs=15, seed=4)
    writer.add_batch(b1, batch_key="b1")
    writer.delete_by_query(TermQuery("resurrection"))
    reader = writer.reader()
    s = reader.searcher()
    assert s.top_k(TermQuery("resurrection"), 10).count() == 0
    _check_parity(writer, terms=("the", "hope"))


def test_update_batch(spark, writer):
    b1 = synth_transcripts(spark, n_convs=10, seed=5)
    writer.add_batch(b1, batch_key="b1")
    upd = b1.limit(5).withColumn("text", F.lit("updated sentinel document text"))
    writer.update_batch(upd, batch_key="u1")
    reader = writer.reader()
    s = reader.searcher()
    hits = s.top_k(TermQuery("sentinel"), 10).count()
    assert hits == 5
    # old text of updated keys must be gone
    vis_texts = {(r["doc_id"]) for r in _visible_rows(writer)}
    assert len(vis_texts) == reader.index.stats.max_doc - 5


def test_merge_preserves_results(spark, writer):
    for i in range(4):
        b = synth_transcripts(spark, n_convs=6, seed=10 + i).withColumn(
            "conv_id", F.concat(F.lit(f"b{i}-"), F.col("conv_id"))
        )
        writer.add_batch(b, batch_key=f"b{i}")
    writer.delete_by_query(TermQuery("w0055"))
    before = {
        t: [(r["doc_id"], r["score"]) for r in writer.reader().searcher().top_k(TermQuery(t), 10).collect()]
        for t in ("the", "hope")
    }
    merged = writer.merge(writer.manifest()["segments"])
    assert merged["n_docs"] > 0
    assert len(writer.manifest()["segments"]) == 1
    # NOTE: after a merge, deleted docs are purged so collection stats shrink;
    # scores legitimately change (Lucene same). Compare doc SETS only.
    after = {
        t: [r["doc_id"] for r in writer.reader().searcher().top_k(TermQuery(t), 10).collect()]
        for t in ("the", "hope")
    }
    for t in before:
        assert set(d for d, _ in before[t]) == set(after[t])


def test_tiered_merge_selection(spark, writer):
    for i in range(SEGS := 12):
        b = synth_transcripts(spark, n_convs=2, seed=20 + i).withColumn(
            "conv_id", F.concat(F.lit(f"s{i}-"), F.col("conv_id"))
        )
        writer.add_batch(b, batch_key=f"s{i}")
    merges = writer.find_merges()
    assert merges, "12 same-tier segments must trigger a merge"
    assert len(merges[0]) == 10  # SEGMENTS_PER_TIER
    writer.maybe_merge()
    assert len(writer.manifest()["segments"]) == SEGS - 10 + 1


def test_merged_index_passes_check_index(spark, tmp_path):
    """Full lifecycle: append batches -> delete -> merge -> CheckIndex clean
    + query parity vs a fresh single-shot rebuild of the live docs."""
    from lucene_kmp_spark.data.transcripts import synth_transcripts
    from lucene_kmp_spark.index.check import check_index
    from lucene_kmp_spark.index.segments import SegmentedIndexWriter
    from lucene_kmp_spark.search.query import TermQuery
    from pyspark.sql import functions as F

    root = str(tmp_path / "lifecycle_idx")
    w = SegmentedIndexWriter(spark, root)
    corpus = synth_transcripts(spark, n_convs=30, seed=41).persist()
    for b in range(3):
        w.add_batch(
            corpus.filter(F.pmod(F.xxhash64("conv_id"), F.lit(3)) == b),
            batch_key=f"b{b}",
        )
    # delete one conversation entirely, then compact
    w.delete_by_keys(corpus.filter(F.col("conv_id") == "conv-00000003").select("conv_id", "turn_idx"))
    # 3 segments stay under the 10-per-tier trigger — force an explicit merge
    merged = w.merge(w.manifest()["segments"])
    assert merged["n_docs"] > 0 and len(w.manifest()["segments"]) == 1

    reader = w.reader()
    res = check_index(reader.index, raise_on_fail=True)
    assert res["clean"]

    s = reader.searcher()
    got = [(r["doc_id"], r["score"]) for r in s.top_k(TermQuery("hope"), 10).collect()]
    assert got
    # no deleted docs in results
    deleted_keys = {
        r["doc_id"]
        for r in reader.index.docs.filter(F.col("conv_id") == "conv-00000003").collect()
    }
    assert not ({d for d, _ in got} & deleted_keys)
    corpus.unpersist()


def test_log_and_none_merge_policies(spark, tmp_path):
    """LogDocMergePolicy / NoMergePolicy selection (LogMergePolicy.kt levels
    over consecutive segments; NoMergePolicy.kt never merges)."""
    from lucene_kmp_spark.data.transcripts import synth_transcripts
    from lucene_kmp_spark.index.segments import SegmentedIndexWriter

    corpus = synth_transcripts(spark, n_convs=9, seed=31).persist()
    w = SegmentedIndexWriter(
        spark, str(tmp_path / "logidx"), merge_policy="log_doc", merge_factor=3
    )
    for i in range(3):
        lo, hi = f"conv-{3*i:08d}", f"conv-{3*(i+1):08d}"
        w.add_batch(
            corpus.filter((F.col("conv_id") >= lo) & (F.col("conv_id") < hi)),
            batch_key=f"b{i}",
        )
    # 3 equal-size segments at one level with merge_factor=3 -> one merge of all 3
    merges = w.find_merges()
    assert len(merges) == 1 and len(merges[0]) == 3
    before = w.reader()
    total = before.index.stats.doc_count
    w.maybe_merge()
    m = w.manifest()
    assert len(m["segments"]) == 1
    assert w.reader().index.stats.doc_count == total

    w2 = SegmentedIndexWriter(spark, str(tmp_path / "noidx"), merge_policy="none")
    for i in range(3):
        lo, hi = f"conv-{3*i:08d}", f"conv-{3*(i+1):08d}"
        w2.add_batch(
            corpus.filter((F.col("conv_id") >= lo) & (F.col("conv_id") < hi)),
            batch_key=f"b{i}",
        )
    assert w2.find_merges() == []
    corpus.unpersist()


def test_snapshot_deletion_policy(spark, tmp_path):
    """SnapshotDeletionPolicy: a pinned commit survives merge + purge and
    serves the point-in-time view; released snapshots are purgeable
    (KeepOnlyLastCommit default otherwise)."""
    import os

    from lucene_kmp_spark.data.transcripts import synth_transcripts
    from lucene_kmp_spark.index.segments import SegmentedIndexWriter
    from lucene_kmp_spark.search.query import TermQuery

    corpus = synth_transcripts(spark, n_convs=8, seed=37).persist()
    root = str(tmp_path / "snapidx")
    w = SegmentedIndexWriter(spark, root, merge_policy="log_doc", merge_factor=2)
    w.add_batch(corpus.filter(F.col("conv_id") < "conv-00000004"), batch_key="b0")
    w.add_batch(corpus.filter(F.col("conv_id") >= "conv-00000004"), batch_key="b1")
    snap = w.snapshot()
    pre_ids = {s["id"] for s in w.manifest()["segments"]}
    pre_count = w.reader().searcher().count(TermQuery("the"))

    w.maybe_merge()  # 2 segments at one level, factor 2 -> merged
    assert len(w.manifest()["segments"]) == 1
    removed = w.purge_unreferenced()
    assert removed == []  # snapshot pins the pre-merge segments
    for sid in pre_ids:
        assert os.path.isdir(os.path.join(root, "segments", sid))

    # the snapshot reader is a true point-in-time view
    snap_reader = w.reader(snapshot=snap)
    assert snap_reader.searcher().count(TermQuery("the")) == pre_count

    w.release(snap)
    removed = w.purge_unreferenced()
    assert set(removed) == pre_ids
    # current reader unaffected
    assert w.reader().searcher().count(TermQuery("the")) == pre_count
    corpus.unpersist()


def test_force_merge_to_one(spark, writer):
    """forceMerge(1) (IndexWriter.kt:2055): any segment count collapses to
    one; answers identical before/after."""
    for i, seed in enumerate((1, 2, 3)):
        b = synth_transcripts(spark, n_convs=8, seed=seed).withColumn(
            "conv_id", F.concat(F.lit(f"b{i}-"), F.col("conv_id"))
        )
        writer.add_batch(b, batch_key=f"b{i}")
    before = {
        (r["doc_id"], round(r["score"], 6))
        for r in writer.reader().searcher().top_k(TermQuery("kingdom"), 10).collect()
    }
    done = writer.force_merge(1)
    m = writer.manifest()
    assert len(m["segments"]) == 1 and done
    after = {
        (r["doc_id"], round(r["score"], 6))
        for r in writer.reader().searcher().top_k(TermQuery("kingdom"), 10).collect()
    }
    assert before == after
    _check_parity(writer)


def test_force_merge_respects_max_and_minimizes_rewrite(spark, writer):
    for i, seed in enumerate((1, 2, 3, 4)):
        b = synth_transcripts(spark, n_convs=4 * (i + 1), seed=seed).withColumn(
            "conv_id", F.concat(F.lit(f"b{i}-"), F.col("conv_id"))
        )
        writer.add_batch(b, batch_key=f"b{i}")
    sizes = sorted(s["bytes"] for s in writer.manifest()["segments"])
    done = writer.force_merge(2)
    m = writer.manifest()
    assert len(m["segments"]) == 2
    assert len(done) == 1  # one pass: 3 smallest merged, largest untouched
    assert max(s["bytes"] for s in m["segments"]) >= sizes[-1]  # largest kept


def test_force_merge_deletes_purges_and_compacts(spark, writer):
    b1 = synth_transcripts(spark, n_convs=12, seed=1)
    b2 = synth_transcripts(spark, n_convs=12, seed=2).withColumn(
        "conv_id", F.concat(F.lit("b2-"), F.col("conv_id"))
    )
    writer.add_batch(b1, batch_key="b1")
    writer.add_batch(b2, batch_key="b2")
    reader = writer.reader()
    seg0 = writer.manifest()["segments"][0]
    n_victims = seg0["n_docs"] // 5 + 1  # >10% of the segment, crossing pct_allowed
    seg0_ids = [
        r["doc_id"]
        for r in spark.read.parquet(
            writer.root + f"/segments/{seg0['id']}/docs"
        ).select("doc_id").limit(n_victims).collect()
    ]
    victims = spark.createDataFrame([(i,) for i in seg0_ids], "doc_id long")
    writer._append_deletes(victims)
    expected = {
        r["doc_id"]
        for r in writer.reader().searcher().top_k(TermQuery("kingdom"), 50).collect()
    }
    done = writer.force_merge_deletes(pct_allowed=10.0)
    assert done, "segment over the delete pct must be rewritten"
    m = writer.manifest()
    # all deleted ids were purged physically -> compacted delete set is empty
    import os as _os

    compacted = spark.read.parquet(m["deletes"][0]["path"])
    assert compacted.count() == 0
    got = {
        r["doc_id"]
        for r in writer.reader().searcher().top_k(TermQuery("kingdom"), 50).collect()
    }
    assert got == expected
    _check_parity(writer)


def test_add_indexes_reader_form(spark, writer, tmp_path):
    """addIndexes(CodecReader...) re-write path: live docs of another index
    are re-added under this writer's docBase; deleted docs don't cross."""
    other = SegmentedIndexWriter(spark, str(tmp_path / "other"))
    b = synth_transcripts(spark, n_convs=10, seed=7).withColumn(
        "conv_id", F.concat(F.lit("o-"), F.col("conv_id"))
    )
    other.add_batch(b, batch_key="ob")
    oreader = other.reader()
    victim = oreader.index.docs.select("doc_id").limit(3)
    other._append_deletes(victim)

    base = synth_transcripts(spark, n_convs=5, seed=8)
    n_base = base.count()
    writer.add_batch(base, batch_key="base")
    done = writer.add_indexes(other.reader())
    assert len(done) == 1
    reader = writer.reader()
    n_other_live = other.reader().index.docs.join(
        other.reader().deleted, "doc_id", "left_anti"
    ).count()
    assert reader.index.docs.count() == n_base + n_other_live
    ids = [r["doc_id"] for r in reader.index.docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(len(ids)))  # contiguous global docIDs
    _check_parity(writer)


def test_docvalue_updates_numeric_binary_and_fold(spark, writer):
    """updateNumericDocValue / updateBinaryDocValue (IndexWriter.kt:1702,1745):
    per-doc field overlay without re-indexing; latest generation wins;
    fold_docvalue_updates bakes the overlay into segment storage."""
    base = synth_transcripts(spark, n_convs=30).withColumn(
        "views", (F.col("turn_idx") % 10).cast("long")
    )
    writer.add_batch(base, batch_key="b0")

    writer.update_numeric_docvalue("views", 777, query=TermQuery("the"))
    r = writer.reader()
    hit = {row.doc_id for row in r.searcher()._doc_set(TermQuery("the")).collect()}
    assert hit
    for row in r.index.docs.select("doc_id", "views", "turn_idx").collect():
        expected = 777 if row.doc_id in hit else row.turn_idx % 10
        assert row.views == expected, row

    # later generation shadows earlier for the overlapping docs
    sub = r.index.docs.filter(F.col("doc_id") % 2 == 0).select("conv_id", "turn_idx")
    writer.update_numeric_docvalue("views", 5, keys=sub)
    r2 = writer.reader()
    for row in r2.index.docs.select("doc_id", "views", "turn_idx").collect():
        if row.doc_id % 2 == 0:
            expected = 5
        elif row.doc_id in hit:
            expected = 777
        else:
            expected = row.turn_idx % 10
        assert row.views == expected, row

    # binary (string) update minting a NEW field; non-updated docs get NULL
    writer.update_binary_docvalue("tag", "gold", query=TermQuery("the"))
    r3 = writer.reader()
    for row in r3.index.docs.select("doc_id", "tag").collect():
        assert row.tag == ("gold" if row.doc_id in hit else None), row

    # structural fields are protected
    with pytest.raises(ValueError):
        writer.update_numeric_docvalue("doc_id", 0, query=TermQuery("the"))
    with pytest.raises(ValueError):
        writer.update_numeric_docvalue("views", 0)

    # fold: overlay baked into parquet, manifest list cleared, values survive
    before = {
        (row.doc_id): (row.views, row.tag)
        for row in r3.index.docs.select("doc_id", "views", "tag").collect()
    }
    assert writer.fold_docvalue_updates() == 1
    assert writer.manifest()["dv_updates"] == []
    r4 = writer.reader()
    after = {
        (row.doc_id): (row.views, row.tag)
        for row in r4.index.docs.select("doc_id", "views", "tag").collect()
    }
    assert after == before
    _check_parity(writer)


def test_persistent_snapshot_across_writer_restart(spark, tmp_path):
    """PersistentSnapshotDeletionPolicy.kt: snapshots are durable state — a
    NEW writer over the same directory still sees the pin, serves the
    point-in-time view, and must not purge the pinned segments."""
    import os

    from lucene_kmp_spark.data.transcripts import synth_transcripts
    from lucene_kmp_spark.index.segments import SegmentedIndexWriter
    from lucene_kmp_spark.search.query import TermQuery

    corpus = synth_transcripts(spark, n_convs=8, seed=41).persist()
    root = str(tmp_path / "psnap")
    w1 = SegmentedIndexWriter(spark, root, merge_policy="log_doc", merge_factor=2)
    w1.add_batch(corpus.filter(F.col("conv_id") < "conv-00000004"), batch_key="b0")
    w1.add_batch(corpus.filter(F.col("conv_id") >= "conv-00000004"), batch_key="b1")
    snap = w1.snapshot()
    pre_ids = {s["id"] for s in w1.manifest()["segments"]}
    pre_count = w1.reader().searcher().count(TermQuery("the"))
    del w1  # "process exit"

    w2 = SegmentedIndexWriter(spark, root, merge_policy="log_doc", merge_factor=2)
    assert snap in w2.snapshots()  # pin survived the restart
    w2.maybe_merge()
    assert w2.purge_unreferenced() == []
    for sid in pre_ids:
        assert os.path.isdir(os.path.join(root, "segments", sid))
    assert w2.reader(snapshot=snap).searcher().count(TermQuery("the")) == pre_count

    w2.release(snap)
    assert set(w2.purge_unreferenced()) == pre_ids
    corpus.unpersist()
