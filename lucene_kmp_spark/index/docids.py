"""Deterministic, partitioning-independent docID assignment.

Lucene docIDs are dense ints assigned in insertion order per segment, with
global docID = docBase + local docID (``index/CompositeReaderContext.kt``,
``index/IndexingChain.kt:606``); top-k ties break on smaller docID
(``search/HitQueue.kt:56-62``), so assignment order is rank-significant.

Spark analog: ``doc_id = rank of (key_cols) in the global sort order``,
computed scalably as

1. range-repartition + sort within partitions on the key,
2. per-partition local index (mapInPandas enumerate — zero data movement),
3. per-partition counts -> driver prefix sum -> broadcast offsets (the exact
   analog of Lucene's per-leaf ``docBase``).

The result depends ONLY on the global key order (keys are unique), never on
the number of partitions — so it is byte-stable between N and 4N executors,
as the north rule's rank-identity across cluster sizes requires.
"""

from __future__ import annotations

from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField


def _key_columns(key_cols):
    """Each entry is a column name (ascending) or a (name, ascending) pair."""
    cols = []
    for kc in key_cols:
        if isinstance(kc, str):
            cols.append(F.col(kc).asc())
        else:
            name, asc = kc
            cols.append(F.col(name).asc() if asc else F.col(name).desc())
    return cols


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` plus a dense 0-based ``doc_id`` ordered by ``key_cols``
    (names, or ``(name, ascending)`` pairs for descending keys)."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    order = _key_columns(key_cols)
    parted = df.repartitionByRange(num_partitions, *order).sortWithinPartitions(*order)

    from pyspark.sql.types import StructType

    out_schema = StructType(
        list(parted.schema.fields)
        + [StructField("_pid", LongType()), StructField("_local", LongType())]
    )

    def add_local(batches):
        pid = TaskContext.get().partitionId()
        base = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pid"] = pid
            pdf["_local"] = range(base, base + len(pdf))
            base += len(pdf)
            yield pdf

    with_local = parted.mapInPandas(add_local, schema=out_schema)
    with_local = with_local.persist()
    counts = {r["_pid"]: r["cnt"] for r in with_local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offs_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], schema="_pid long, _off long"
    )
    out = (
        with_local.join(F.broadcast(offs_df), "_pid")
        .withColumn("doc_id", F.col("_off") + F.col("_local"))
        .drop("_pid", "_local", "_off")
    )
    return out


def assign_doc_ids_sorted(
    df: DataFrame,
    index_sort: tuple,
    key_cols: tuple = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
) -> DataFrame:
    """``IndexWriterConfig.setIndexSort`` analog (``index/Sorter.kt``,
    ``index/SortingCodecReader.kt``): docIDs follow ``index_sort`` — entries
    are ``(column, ascending)`` pairs — with ``key_cols`` as the deterministic
    tiebreak. A query sorted by a prefix of the index sort then equals
    ascending-docID order, which is what ``search_sorted``'s early-termination
    path exploits (TopFieldCollector early exit on sorted segments)."""
    return assign_doc_ids(
        df, key_cols=tuple(index_sort) + tuple(key_cols), num_partitions=num_partitions
    )
