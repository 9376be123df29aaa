"""Event-stream operators over the structured events table.

Sessionization is the classic gap-based window op: a new session starts when
the gap to the user's previous event exceeds ``gap`` (default 30 min).  Pure
window + aggregate — one shuffle on user_id, no UDF — so it scales to any
event volume that hashes across user_id (skewed power-users stay bounded by
their own event count, not the table size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_micros: int = 1_800_000_000,
) -> DataFrame:
    """(user, n_sessions, n_events): count gap-delimited sessions per user.

    The deterministic tiebreak column makes equal-timestamp event order (and
    thus session counts) partitioning-independent."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    flagged = events.withColumn("_prev", F.lag(ts_col).over(w)).withColumn(
        "_new_sess",
        F.when(
            F.col("_prev").isNull()
            | (F.expr(f"timestampdiff(MICROSECOND, _prev, {ts_col})") > gap_micros),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy(user_col).agg(
        F.sum("_new_sess").cast("long").alias("n_sessions"),
        F.count("*").cast("long").alias("n_events"),
    )


def session_spans(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_micros: int = 1_800_000_000,
) -> DataFrame:
    """One row per (user, session): start/end timestamps + event count —
    the assignment variant of ``sessionize`` (same single shuffle)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    flagged = events.withColumn("_prev", F.lag(ts_col).over(w)).withColumn(
        "_new_sess",
        F.when(
            F.col("_prev").isNull()
            | (F.expr(f"timestampdiff(MICROSECOND, _prev, {ts_col})") > gap_micros),
            1,
        ).otherwise(0),
    )
    with_id = flagged.withColumn("_sess_id", F.sum("_new_sess").over(w))
    return with_id.groupBy(user_col, "_sess_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
    )


# ------------------------------------------------------- streaming variants
def sessionize_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: event-time ``session_window`` aggregation
    with a watermark bounding state for late data — the
    readStream → watermark → windowed-agg shape. Sessions close (emit) once
    the watermark passes their gap; state per (user, open session) only, so
    state size tracks concurrent users, not history.

    Returns (user, session_start, session_end, n_events); attach any sink via
    ``.writeStream``. Batch-mode DataFrames work too (session_window is
    supported in both), which the test uses to check against ``session_spans``.

    Watermarks require TIMESTAMP event time; a TIMESTAMP_NTZ column (the
    transcripts/events schema) is cast in place — wall-clock-preserving under
    the session timezone, so gap arithmetic is unchanged.

    ``session_end`` is max(event ts) in the session — the same value
    ``session_spans`` reports — NOT the session_window's end (which is
    last-event + gap). One boundary divergence from the batch ops remains: an
    event arriving EXACTLY ``gap`` after the previous one stays in the batch
    session (strict ``>`` test) but starts a new streaming session
    (session_window's end bound is exclusive).
    """
    if dict(events_stream.dtypes).get(ts_col) == "timestamp_ntz":
        events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            "session_end",
            "n_events",
        )
    )


def dedup_stream(
    events_stream: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup on ingest: drop events whose key was already
    seen, with state expired by the watermark (``dropDuplicatesWithinWatermark``
    keeps the state store bounded — the at-scale requirement; unbounded
    dropDuplicates state grows with all history)."""
    if dict(events_stream.dtypes).get(ts_col) == "timestamp_ntz":
        events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    wm = events_stream.withWatermark(ts_col, watermark)
    if not events_stream.isStreaming:
        return wm.dropDuplicates(list(key_cols))
    if not hasattr(wm, "dropDuplicatesWithinWatermark"):
        # refuse the silently-unbounded fallback: plain streaming
        # dropDuplicates keeps state for ALL history
        raise RuntimeError(
            "dedup_stream requires dropDuplicatesWithinWatermark (Spark >= 3.5) "
            "for bounded state on streaming input"
        )
    return wm.dropDuplicatesWithinWatermark(list(key_cols))


# ----------------------------------------------- conversation assembly

def assemble_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """One row per conversation with the turns concatenated in STABLE
    ``turn_idx`` order (the north-rule transcript invariant: per-turn text
    equality under stable turn ordering, independent of arrival/partition
    order). One hash aggregate — ``collect_list`` into an ``array_sort`` by
    the struct's leading field, no window, no UDF; per-group memory is the
    conversation's own turns, so skew tracks the longest conversation,
    not the table."""
    return (
        turns.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(turn_col), F.col(text_col)))),
                    lambda s: s[text_col],
                ),
                " ",
            ).alias("text"),
        )
    )
