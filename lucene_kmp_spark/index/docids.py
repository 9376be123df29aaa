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


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` plus a dense 0-based ``doc_id`` ordered by ``key_cols``."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = df.repartitionByRange(num_partitions, *key_cols).sortWithinPartitions(*key_cols)

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
