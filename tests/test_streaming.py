"""Streaming ingest: rate-limited file stream -> segments, NRT reopen."""

import time

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index.segments import SegmentedIndexWriter
from lucene_kmp_spark.search.query import TermQuery
from lucene_kmp_spark.streaming.incremental import index_stream


def test_stream_to_segments(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    corpus = synth_transcripts(spark, n_convs=30, seed=21)
    # two "arrival" files
    corpus.filter(F.col("conv_id") < "conv-00000015").coalesce(1).write.parquet(src_dir + "/f1")
    corpus.filter(F.col("conv_id") >= "conv-00000015").coalesce(1).write.parquet(src_dir + "/f2")

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    writer = SegmentedIndexWriter(spark, str(tmp_path / "segidx"))
    q = index_stream(stream, writer, str(tmp_path / "ckpt"), merge_every_batches=0)
    q.awaitTermination(timeout=120)
    for _ in range(60):
        if not q.isActive:
            break
        time.sleep(1)

    m = writer.manifest()
    assert len(m["segments"]) >= 1
    total = sum(s["n_docs"] for s in m["segments"])
    assert total == corpus.count()

    # NRT reopen: new reader sees everything
    s = writer.reader().searcher()
    assert s.count(TermQuery("the")) > 0
    # lineage/metrics recorded per segment
    for seg in m["segments"]:
        assert seg["metrics"]["docs_indexed"] == seg["n_docs"]
        assert seg["batch_key"] is not None
