"""Structured Streaming ingestion: micro-batches -> index segments.

The reference's "streaming" is incremental indexing + NRT reopen
(``index/SearcherManager.kt:37``, ``ControlledRealTimeReopenThread.kt:24``) —
no watermarks or event-time aggregation exist there; docs are append-ordered.
The Spark formulation: ``readStream -> foreachBatch(writer.add_batch)``; each
micro-batch commits one segment generation, and readers simply reopen the
latest manifest (SearcherManager.maybeRefresh == make a new SegmentedReader).

Exactly-once: ``add_batch(batch_key=f"stream-{batch_id}")`` is idempotent per
key, so foreachBatch retries after failure do not duplicate segments — this
plus Spark's checkpointLocation gives end-to-end resumability (the north
rule's checkpoint/lineage requirement on the ingest path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lucene_kmp_spark.index.segments import SegmentedIndexWriter


def index_stream(
    stream_df: DataFrame,
    writer: SegmentedIndexWriter,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    merge_every_batches: int = 10,
):
    """Attach a streaming DataFrame of transcript turns to an index writer.

    Returns the StreamingQuery. Call ``.awaitTermination()`` or manage it.
    """
    state = {"batches": 0}

    def handle_batch(batch_df: DataFrame, batch_id: int):
        writer.add_batch(batch_df, batch_key=f"stream-{batch_id}")
        state["batches"] += 1
        if merge_every_batches and state["batches"] % merge_every_batches == 0:
            writer.maybe_merge()  # ConcurrentMergeScheduler analog, inline

    q = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        q = q.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        q = q.trigger(availableNow=True)
    return q.start()
