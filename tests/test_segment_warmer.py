"""IndexWriter.IndexReaderWarmer / SimpleMergedSegmentWarmer.kt: the warmer
runs on each merged segment BEFORE the commit makes it visible."""

from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index.segments import SegmentedIndexWriter


def test_merged_segment_warmer(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=8, seed=41).persist()
    corpus.count()

    warmed = []

    def warmer(idx):
        # visibility check: at warm time the merged segment must NOT be in
        # the committed manifest yet (pre-visibility, like the reference)
        committed = {s["id"] for s in w.manifest()["segments"]}
        warmed.append(
            {
                "n_docs": idx.docs.count(),
                "terms": idx.term_dict.count(),
                "pre_visible": not any("merged" in sid for sid in committed),
            }
        )

    w = SegmentedIndexWriter(
        spark, str(tmp_path / "warm"), merge_policy="log_doc", merge_factor=2,
        merged_segment_warmer=warmer,
    )
    w.add_batch(corpus.filter(F.col("conv_id") < "conv-00000004"), batch_key="b0")
    w.add_batch(corpus.filter(F.col("conv_id") >= "conv-00000004"), batch_key="b1")
    assert warmed == []  # plain flushes never warm
    done = w.maybe_merge()
    assert len(done) == 1
    assert len(warmed) == 1
    assert warmed[0]["pre_visible"] is True
    assert warmed[0]["n_docs"] == corpus.count()
    assert warmed[0]["terms"] > 0
