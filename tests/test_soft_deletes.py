"""Soft deletes: visibility, undelete, and SoftDeletesRetentionMergePolicy
merge retention (index/PendingSoftDeletes.kt, SoftDeletesDirectoryReaderWrapper.kt,
SoftDeletesRetentionMergePolicy.kt)."""

import pytest

from lucene_kmp_spark.index.segments import SegmentedIndexWriter
from lucene_kmp_spark.search.query import ColumnFilterQuery, TermQuery


def _docs(spark, lo, hi, word):
    return spark.createDataFrame(
        [(f"c{i}", 0, f"{word} filler w{i}") for i in range(lo, hi)],
        schema="conv_id string, turn_idx int, text string",
    )


@pytest.fixture()
def writer(spark, tmp_path):
    w = SegmentedIndexWriter(spark, str(tmp_path / "ix"))
    w.add_batch(_docs(spark, 0, 10, "alpha"))
    return w


def _visible_count(w, term, **reader_kw):
    r = w.reader(**reader_kw)
    return r.searcher().count(TermQuery(term))


def test_soft_delete_hides_and_unwrapped_reader_sees(writer, spark):
    assert _visible_count(writer, "alpha") == 10
    keys = spark.createDataFrame(
        [(f"c{i}", 0) for i in range(4)], schema="conv_id string, turn_idx int"
    )
    writer.soft_delete_by_keys(keys)
    # wrapped (default) reader: hidden
    assert _visible_count(writer, "alpha") == 6
    # unwrapped reader (SoftDeletesDirectoryReaderWrapper off): still there
    assert _visible_count(writer, "alpha", include_soft_deleted=True) == 10
    # the docs remain physically present
    r = writer.reader()
    assert r.index.docs.count() == 10
    assert r.soft_deleted.count() == 4


def test_undelete_restores(writer, spark):
    keys = spark.createDataFrame(
        [(f"c{i}", 0) for i in range(4)], schema="conv_id string, turn_idx int"
    )
    writer.soft_delete_by_keys(keys)
    assert _visible_count(writer, "alpha") == 6
    back = spark.createDataFrame(
        [("c0", 0), ("c1", 0)], schema="conv_id string, turn_idx int"
    )
    writer.undelete_by_keys(back)
    assert _visible_count(writer, "alpha") == 8


def test_merge_retains_all_soft_deleted_without_retention(writer, spark):
    writer.add_batch(_docs(spark, 10, 20, "beta"))
    keys = spark.createDataFrame(
        [(f"c{i}", 0) for i in range(3)], schema="conv_id string, turn_idx int"
    )
    writer.soft_delete_by_keys(keys)
    writer.force_merge(1)
    # still physically present after the rewrite, still invisible
    r = writer.reader()
    assert r.index.docs.count() == 20
    assert _visible_count(writer, "alpha") == 7
    assert _visible_count(writer, "alpha", include_soft_deleted=True) == 10


def test_merge_retention_query_purges_nonmatching(spark, tmp_path):
    # retention: keep soft-deleted docs whose conv_id is c0 or c1 only
    w = SegmentedIndexWriter(
        spark,
        str(tmp_path / "ix2"),
        soft_deletes_retention=ColumnFilterQuery("conv_id IN ('c0', 'c1')"),
    )
    w.add_batch(_docs(spark, 0, 10, "alpha"))
    w.add_batch(_docs(spark, 10, 13, "beta"))  # 2nd segment so force_merge(1) rewrites
    keys = spark.createDataFrame(
        [(f"c{i}", 0) for i in range(4)], schema="conv_id string, turn_idx int"
    )
    w.soft_delete_by_keys(keys)
    w.force_merge(1)
    r = w.reader()
    # c2,c3 purged physically; c0,c1 retained (soft-deleted); 6+3 untouched
    assert r.index.docs.count() == 11
    assert _visible_count(w, "alpha") == 6
    assert _visible_count(w, "alpha", include_soft_deleted=True) == 8
    # hard deletes still purge regardless of retention
    w.delete_by_keys(
        spark.createDataFrame([("c5", 0)], schema="conv_id string, turn_idx int")
    )
    w.add_batch(_docs(spark, 13, 14, "gamma"))
    w.force_merge(1)
    assert w.reader().index.docs.count() == 11  # -1 hard-purged, +1 new
    assert _visible_count(w, "alpha") == 5


def test_force_merge_deletes_compacts_soft_list(spark, tmp_path):
    w = SegmentedIndexWriter(
        spark,
        str(tmp_path / "ix3"),
        soft_deletes_retention=ColumnFilterQuery("conv_id = 'c0'"),
    )
    w.add_batch(_docs(spark, 0, 10, "alpha"))
    keys = spark.createDataFrame(
        [(f"c{i}", 0) for i in range(3)], schema="conv_id string, turn_idx int"
    )
    w.soft_delete_by_keys(keys)
    # hard-delete enough of the segment to trip the rewrite threshold
    w.delete_by_keys(
        spark.createDataFrame(
            [(f"c{i}", 0) for i in range(5, 9)], schema="conv_id string, turn_idx int"
        )
    )
    w.force_merge_deletes(pct_allowed=10.0)
    r = w.reader()
    # 10 - 4 hard - 2 purged soft (c1,c2 miss retention) = 4 docs on disk
    assert r.index.docs.count() == 4
    # soft list compacted to the surviving id only
    assert r.soft_deleted.count() == 1
    assert _visible_count(w, "alpha") == 3
