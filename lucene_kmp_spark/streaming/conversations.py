"""Stateful streaming conversation assembly (applyInPandasWithState).

The north-rule input is a stream of transcript turns (conv_id, turn_idx,
role, text, ts). A batch job assembles a conversation with one aggregate
(`pipeline.events.assemble_conversations`); on a STREAM the turns of one
conversation arrive across micro-batches and possibly out of order, so the
operator must hold open conversations in keyed state and emit each one
exactly once, after it has gone quiet.

This is the custom-stateful-operator shape the engine uses where Spark's
built-in streaming aggregations don't fit: ``session_window`` can group the
turns, but it cannot re-order them by ``turn_idx`` inside the window nor
emit a single concatenated document — that needs per-key state with an
event-time timeout, i.e. ``groupBy(conv).applyInPandasWithState``.

Semantics
---------
* State per OPEN conversation only: (turn_idxs, texts, max event-time).
  Closed conversations leave state immediately, so state size tracks
  concurrent conversations — bounded at 10^12 turns the same way the
  reference's NRT writer memory tracks in-flight docs, not history.
* A conversation closes when the event-time watermark passes its last
  turn's timestamp + ``gap`` (GroupStateTimeout.EventTimeTimeout). Late
  turns beyond the watermark were already dropped by Spark upstream, so a
  closed conversation can never reopen (exactly-once emission).
* Emission is the assembled document with turns sorted by (turn_idx) —
  the stable-turn-ordering invariant — regardless of arrival order.
* Arrow-batched throughout (pandas per group); no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _out_schema(conv_type) -> StructType:
    return StructType(
        [
            StructField("conv_id", conv_type),
            StructField("n_turns", LongType()),
            StructField("text", StringType()),
            StructField("last_ts", TimestampType()),
        ]
    )


_STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(LongType())),
        StructField("texts", ArrayType(StringType())),
        StructField("max_ts_ms", LongType()),
    ]
)


def assemble_conversations_stream(
    turns_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming conversation assembler. Returns an append-mode stream of
    (conv_id, n_turns, text, last_ts), one row per conversation, emitted
    once the watermark passes last-turn + ``gap``. ``text`` is the turns
    joined in ``turn_idx`` order — identical to the batch
    ``assemble_conversations`` output for the same turns."""
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            turn_idxs, texts, max_ts_ms = state.get
            order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [len(turn_idxs)],
                    "text": [" ".join(texts[i] for i in order)],
                    "last_ts": [pd.to_datetime(max_ts_ms, unit="ms")],
                }
            )
            return
        if state.exists:
            turn_idxs, texts, max_ts_ms = state.get
            turn_idxs, texts = list(turn_idxs), list(texts)
        else:
            turn_idxs, texts, max_ts_ms = [], [], 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            turn_idxs.extend(int(v) for v in pdf[turn_col])
            texts.extend(str(v) for v in pdf[text_col])
            batch_max = int(pd.to_datetime(pdf[ts_col]).astype("int64").max() // 1_000_000)
            max_ts_ms = max(max_ts_ms, batch_max)
        state.update((turn_idxs, texts, max_ts_ms))
        # close at last-activity + gap; a timeout timestamp must lie beyond
        # the current watermark (Spark enforces it), so clamp forward
        state.setTimeoutTimestamp(max(max_ts_ms + gap_ms, state.getCurrentWatermarkMs() + 1))
        return
        yield  # pragma: no cover — makes fn a generator on the no-emit path

    if dict(turns_stream.dtypes).get(ts_col) == "timestamp_ntz":
        turns_stream = turns_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        turns_stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(conv_col))
        .applyInPandasWithState(
            fn,
            outputStructType=_out_schema(turns_stream.schema[conv_col].dataType),
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
