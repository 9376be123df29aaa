"""CheckIndex analog: clean index verifies; corrupted index is caught."""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.index.check import check_index


@pytest.fixture(scope="module")
def idx(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=30, seed=9)).persist()
    docs.count()
    return build_index(docs)


def test_clean_index_verifies(idx):
    res = check_index(idx, raise_on_fail=True)
    assert res["clean"]
    assert all(v == 0 for v in res["checks"].values())


def test_corruption_detected(idx):
    import dataclasses

    # corrupt block metadata: overstate num_docs on every block
    broken = dataclasses.replace(
        idx, postings=idx.postings.withColumn("num_docs", F.col("num_docs") + 1)
    )
    res = check_index(broken)
    assert not res["clean"]
    assert res["checks"]["block_payloads"] > 0

    # corrupt term_dict: inflate one df
    broken2 = dataclasses.replace(
        idx, term_dict=idx.term_dict.withColumn("df", F.col("df") + 1)
    )
    res2 = check_index(broken2)
    assert res2["checks"]["term_dict"] > 0
    with pytest.raises(AssertionError):
        check_index(broken2, raise_on_fail=True)


def test_composite_segmented_index_is_clean(spark, tmp_path):
    """block_ids repeat across segments over disjoint doc ranges — the
    composite reader's index must still verify clean (regression: ordering
    check previously sorted by block_id and reported false overlaps)."""
    from lucene_kmp_spark.data.transcripts import synth_transcripts
    from lucene_kmp_spark.index.segments import SegmentedIndexWriter

    w = SegmentedIndexWriter(spark, str(tmp_path / "comp_idx"))
    for b in range(2):
        w.add_batch(synth_transcripts(spark, n_convs=8, seed=50 + b), batch_key=f"c{b}")
    res = check_index(w.reader().index, raise_on_fail=True)
    assert res["clean"]
