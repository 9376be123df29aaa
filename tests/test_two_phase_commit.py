"""Two-phase commit protocol (index/TwoPhaseCommit.kt, IndexWriter
prepareCommit/commit/rollback, index/TwoPhaseCommitTool.kt): committed-reader
visibility, prepare freezing, rollback restoration, and the multi-participant
tool's all-or-nothing behavior."""

import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index.segments import (
    CommitFailError,
    PrepareCommitFailError,
    SegmentedIndexWriter,
    execute_two_phase,
)
from lucene_kmp_spark.search.query import TermQuery


@pytest.fixture()
def batches(spark):
    docs = synth_transcripts(spark, n_convs=12, seed=5).persist()
    docs.count()
    convs = sorted(r["conv_id"] for r in docs.select("conv_id").distinct().collect())
    cut = convs[len(convs) // 2]
    return (
        docs.filter(docs.conv_id <= cut),
        docs.filter(docs.conv_id > cut),
    )


def _writer(spark, tmp_path):
    return SegmentedIndexWriter(spark, str(tmp_path / "idx"), merge_policy="none")


def _count(reader, term="the"):
    return reader.searcher().count(TermQuery(term))


def test_committed_reader_visibility(spark, tmp_path, batches):
    b1, b2 = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    # never committed -> committed reader raises (IndexNotFoundException)
    with pytest.raises(FileNotFoundError, match="commit"):
        w.reader(committed=True)
    gen1 = w.commit()
    n1 = _count(w.reader(committed=True))
    assert n1 == _count(w.reader()) > 0
    # NRT view moves ahead; committed view stays at the commit point
    w.add_batch(b2, batch_key="b2")
    assert _count(w.reader()) > n1
    assert _count(w.reader(committed=True)) == n1
    gen2 = w.commit()
    assert gen2 > gen1
    assert _count(w.reader(committed=True)) == _count(w.reader())


def test_prepare_freezes_state(spark, tmp_path, batches):
    b1, b2 = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    w.prepare_commit(commit_data={"step": "one"})
    with pytest.raises(RuntimeError, match="prepareCommit was already called"):
        w.prepare_commit()
    # mutations after prepare are NOT part of the eventual commit
    w.add_batch(b2, batch_key="b2")
    w.commit()
    committed = w.last_commit()
    assert committed["commit_data"] == {"step": "one"}
    assert {s["batch_key"] for s in committed["segments"]} == {"b1"}
    assert _count(w.reader()) > _count(w.reader(committed=True))


def test_rollback_restores_last_commit(spark, tmp_path, batches):
    b1, b2 = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    w.commit()
    n1 = _count(w.reader())
    rec = w.add_batch(b2, batch_key="b2")
    w.delete_by_query(TermQuery("the"))
    w.rollback()
    # working state == last commit; uncommitted segment dir purged
    assert _count(w.reader()) == n1
    assert w.manifest()["deletes"] == []
    import os

    assert not os.path.isdir(os.path.join(w.root, "segments", rec["id"]))
    # discarded batch key replays for real after rollback
    assert w.add_batch(b2, batch_key="b2") is not None
    assert _count(w.reader()) > n1


def test_rollback_without_commit_resets_empty(spark, tmp_path, batches):
    b1, _ = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    w.rollback()
    assert w.manifest()["segments"] == []
    assert w.max_doc == 0


class _Participant:
    """Scriptable TwoPhaseCommit for the tool tests."""

    def __init__(self, fail_prepare=False, fail_commit=False):
        self.fail_prepare = fail_prepare
        self.fail_commit = fail_commit
        self.log = []

    def prepare_commit(self):
        if self.fail_prepare:
            self.log.append("prepare-fail")
            raise OSError("disk full")
        self.log.append("prepare")
        return 1

    def commit(self):
        if self.fail_commit:
            self.log.append("commit-fail")
            raise OSError("network")
        self.log.append("commit")
        return 1

    def rollback(self):
        self.log.append("rollback")


def test_tool_all_succeed(spark, tmp_path, batches):
    b1, _ = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    side = _Participant()
    execute_two_phase(w, None, side)  # None entries skipped, like the reference
    assert side.log == ["prepare", "commit"]
    assert _count(w.reader(committed=True)) > 0


def test_tool_prepare_failure_rolls_back_all(spark, tmp_path, batches):
    b1, _ = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    w.commit()
    n1 = _count(w.reader(committed=True))
    w.add_batch(batches[1], batch_key="b2")
    bad = _Participant(fail_prepare=True)
    with pytest.raises(PrepareCommitFailError):
        execute_two_phase(w, bad)
    # writer rolled back to the last commit: b2 discarded everywhere
    assert _count(w.reader()) == n1
    assert w.last_commit() is not None and len(w.last_commit()["segments"]) == 1


def test_tool_commit_failure_raises_commit_fail(spark, tmp_path, batches):
    b1, _ = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    good = _Participant()
    bad = _Participant(fail_commit=True)
    with pytest.raises(CommitFailError):
        execute_two_phase(good, bad, w)
    # every participant got a rollback instruction (reference NOTE: even
    # already-committed ones)
    assert good.log == ["prepare", "commit", "rollback"]
    assert bad.log == ["prepare", "commit-fail", "rollback"]


def test_rollback_across_merge_respects_pins(spark, tmp_path, batches):
    """commit -> merge (uncommitted) -> rollback: the working state returns
    to the committed pre-merge segment list; the merged-away segment dir is
    purged UNLESS a snapshot pinned it."""
    import os

    b1, b2 = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    w.add_batch(b2, batch_key="b2")
    w.commit()
    pre = [s["id"] for s in w.manifest()["segments"]]
    n_pre = _count(w.reader())
    merged = w.merge(w.manifest()["segments"])
    snap = w.snapshot()  # pins the post-merge manifest (incl. merged segment)
    w.rollback()
    assert [s["id"] for s in w.manifest()["segments"]] == pre
    assert _count(w.reader()) == n_pre
    # merged segment survives: the snapshot references it
    assert os.path.isdir(os.path.join(w.root, "segments", merged["id"]))
    # released pin -> purge drops it
    w.release(snap)
    removed = w.purge_unreferenced()
    assert merged["id"] in removed
    assert not os.path.isdir(os.path.join(w.root, "segments", merged["id"]))
    # committed reader still answers identically after all of it
    assert _count(w.reader(committed=True)) == n_pre

def test_post_rollback_segment_never_reuses_pinned_id(spark, tmp_path, batches):
    """SegmentInfos.counter semantics: segment names come from a monotonic
    counter that rollback() does NOT revert — a batch added after a rollback
    must get a fresh directory even though (len(segments), generation) have
    reverted, so a snapshot pinning the pre-rollback segment keeps serving
    its original data."""
    import os

    b1, b2 = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    w.commit()
    w.add_batch(b2, batch_key="b2")
    pinned_id = w.manifest()["segments"][-1]["id"]
    snap = w.snapshot()  # pins the b2 segment
    pinned_bytes = os.path.getsize(
        os.path.join(w.root, "segments", pinned_id, "manifest.json")
    ) if os.path.exists(os.path.join(w.root, "segments", pinned_id, "manifest.json")) else None
    n_snap = _count(w.reader(snapshot=snap))
    w.rollback()
    rec = w.add_batch(b2, batch_key="b3")
    # fresh id, distinct directory — no overwrite of the pinned segment
    assert rec["id"] != pinned_id
    assert os.path.isdir(os.path.join(w.root, "segments", pinned_id))
    # the snapshot reader still serves the exact pinned view
    assert _count(w.reader(snapshot=snap)) == n_snap
    del pinned_bytes


def test_committed_and_snapshot_mutually_exclusive(spark, tmp_path, batches):
    b1, _ = batches
    w = _writer(spark, tmp_path)
    w.add_batch(b1, batch_key="b1")
    w.commit()
    snap = w.snapshot()
    with pytest.raises(ValueError, match="mutually exclusive"):
        w.reader(committed=True, snapshot=snap)


def test_legacy_segment_dir_names_skipped(spark, tmp_path, batches):
    """A pre-counter index may hold generation-named directories that a
    fresh counter would collide with: the id allocator skips them instead
    of failing the merge/add."""
    import os

    b1, b2 = batches
    w = _writer(spark, tmp_path)
    # simulate legacy leftovers occupying the first counter values
    os.makedirs(os.path.join(w.root, "segments", "seg-00000"))
    os.makedirs(os.path.join(w.root, "segments", "seg-merged-00001"))
    rec1 = w.add_batch(b1, batch_key="b1")
    assert rec1["id"] not in ("seg-00000",)
    w.add_batch(b2, batch_key="b2")
    merged = w.merge(w.manifest()["segments"])
    assert merged["id"] != "seg-merged-00001"
    assert w.reader().searcher().count(TermQuery("the")) > 0
