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


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming session_window aggregation (watermark + event-time windows)
    over a file stream == batch session_spans session count per user."""
    from lucene_kmp_spark.pipeline.events import sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    # early/late arrival split by event time so the batch-1 watermark closes
    # batch-1 sessions during batch 2
    epoch = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    cut = events.selectExpr(f"percentile({epoch}, 0.5) AS c").collect()[0]["c"]
    events.filter(F.expr(epoch) <= cut).coalesce(1).write.parquet(src + "/f1")
    events.filter(F.expr(epoch) > cut).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    sess = sessionize_stream(stream, gap="30 minutes", watermark="0 seconds")
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)

    got = spark.table("sess_stream").collect()
    # append mode emits only watermark-closed sessions and availableNow never
    # flushes the final open state, so assert: every EMITTED session matches a
    # batch session_spans row exactly on (user, start, count), and the stream
    # did emit a meaningful number of them
    from lucene_kmp_spark.pipeline.events import session_spans

    exp = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_spans(
            events.withColumn("ts", F.col("ts").cast("timestamp"))
        ).collect()
    }
    assert len(got) > 0
    for r in got:
        # session_end is max(event ts), matching the batch op — NOT the
        # session_window end (last + gap)
        assert (r.user_id, r.session_start, r.session_end, r.n_events) in exp, r


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    from lucene_kmp_spark.pipeline.events import dedup_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(200)
    dup = events.unionByName(events)  # every event twice
    src = str(tmp_path / "dup")
    dup.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = dedup_stream(stream, key_cols=("event_id",), watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    n = spark.table("dedup_stream_t").select("event_id").distinct().count()
    total = spark.table("dedup_stream_t").count()
    assert n == events.select("event_id").distinct().count()
    assert total == n  # no duplicate rows emitted


def test_assemble_conversations_stream_stateful(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState, EventTimeTimeout):
    conversations assembled from out-of-order streaming turns emit EXACTLY
    once, after the watermark passes last-turn + gap, with turns re-ordered
    by turn_idx — byte-identical to the batch assemble_conversations."""
    from pyspark.sql.types import StringType

    from lucene_kmp_spark.pipeline.events import assemble_conversations
    from lucene_kmp_spark.streaming.conversations import assemble_conversations_stream

    corpus = synth_transcripts(spark, n_convs=12, seed=7).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    early = corpus.filter(F.col("conv_id") < "conv-00000006")
    late = corpus.filter(F.col("conv_id") >= "conv-00000006").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 DAYS")
    )
    # far-future dummy turn: advances the watermark so the early convs'
    # timeouts FIRE in the final micro-batch
    dummy = spark.range(1).select(
        F.lit("conv-zz").alias("conv_id"),
        F.lit(0).cast(corpus.schema["turn_idx"].dataType).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("dummy").alias("text"),
        F.lit("").alias("tool"),
        F.expr("TIMESTAMP'2030-01-01 00:00:00'").alias("ts"),
    )

    src = str(tmp_path / "turns")
    # scramble row order inside each file: arrival order != turn order
    early.orderBy(F.xxhash64("conv_id", "turn_idx")).coalesce(1).write.parquet(src + "/f1")
    late.orderBy(F.xxhash64("turn_idx", "conv_id")).coalesce(1).write.parquet(src + "/f2")
    dummy.coalesce(1).write.parquet(src + "/f3")

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = assemble_conversations_stream(stream, gap="30 minutes", watermark="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("conv_asm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_conv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)

    rows = spark.sql("SELECT * FROM conv_asm").collect()
    got = {r["conv_id"]: (r["n_turns"], r["text"]) for r in rows}
    # exactly-once: each closed conversation emitted a single row
    assert len(rows) == len(got)
    # the dummy's own conversation never goes quiet relative to the final
    # watermark, so it must still be open in state
    assert "conv-zz" not in got
    # every early conversation MUST have closed: the f2/f3 watermark is days
    # past their last turn + gap (how many LATE convs close depends on how
    # the trailing availableNow batch fires clamped timeouts — not asserted)
    early_ids = {r["conv_id"] for r in early.select("conv_id").distinct().collect()}
    assert early_ids <= set(got), sorted(early_ids - set(got))
    # emitted content == batch assembly over the same turns, for every
    # emitted conversation: stable turn order despite scrambled arrival
    data = early.unionByName(late)
    batch = {
        r["conv_id"]: (r["n_turns"], r["text"])
        for r in assemble_conversations(data).collect()
    }
    for cid, val in got.items():
        assert val == batch[cid], cid
