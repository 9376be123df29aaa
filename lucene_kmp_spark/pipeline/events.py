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
