"""Term ordinals over the term dictionary — the BlockTreeOrds codec analog.

The reference's ords-extended blocktree codec
(``codecs/blocktreeords/BlockTreeOrdsPostingsFormat.kt``,
``OrdsSegmentTermsEnum.kt`` seekExact(ord)/ord()) assigns every term its
dense rank in term-sorted order and supports seeking by ordinal in both
directions; ``index/OrdTermState.kt`` carries that ord through term states
and ``index/OrdinalMap.kt`` builds the segment-ord -> global-ord mapping a
MultiReader needs for sorted doc values.

Spark-first re-expression: the ordinal space is a *derived ranking* of the
term dictionary, not a storage format. A global ``row_number() OVER
(ORDER BY term)`` would funnel the vocabulary through ONE reducer, so the
ranking runs two-phase, the same shape the engine uses everywhere else:

1. ``repartitionByRange(num_partitions, term)`` + sortWithinPartitions —
   Spark's range partitioner keeps partitions in total term order,
2. per-partition counts -> driver prefix offsets (``num_partitions`` rows,
   metadata-scale),
3. per-partition ``row_number`` windows (parallel — each window is keyed
   by ``spark_partition_id``) + the broadcast offset.

Vocabulary is sublinear in corpus size (heaps' law), so at 10^12 turns the
term dict is ~10^8-10^9 rows — 32-1024 range partitions keep every window
small, and nothing but the per-partition counts ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def term_ordinals(index, num_partitions: int = 32) -> DataFrame:
    """``(ord, term, df, ttf)`` with ``ord`` the dense 0-based rank of
    ``term`` in term-sorted order (OrdsSegmentTermsEnum.ord()).

    The result is deterministic and partition-invariant: ords depend only
    on the set of terms, never on ``num_partitions`` (tested).
    """
    td = index.term_dict.select("term", "df", "ttf")
    # size the range shuffle from build-time metadata: a small vocabulary
    # does not pay 32-way range sampling (at ~64k terms/partition the
    # per-partition sort stays cheap; num_partitions stays the cap)
    num_terms = getattr(getattr(index, "stats", None), "num_terms", None) or 0
    if num_terms:
        num_partitions = max(1, min(num_partitions, -(-num_terms // 65536)))
    parted = (
        td.repartitionByRange(num_partitions, F.col("term"))
        .sortWithinPartitions("term")
        .withColumn("_pid", F.spark_partition_id())
    )
    parted = parted.persist()
    try:
        # metadata-scale: one row per range partition
        counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_expr = None
        for pid, off in offsets.items():
            off_expr = (
                F.when(F.col("_pid") == pid, F.lit(off))
                if off_expr is None
                else off_expr.when(F.col("_pid") == pid, F.lit(off))
            )
        if off_expr is None:
            return td.select(
                F.lit(0).cast("long").alias("ord"), "term", "df", "ttf"
            ).limit(0)
        w = Window.partitionBy("_pid").orderBy("term")
        out = parted.select(
            (F.row_number().over(w) - 1 + off_expr).cast("long").alias("ord"),
            "term",
            "df",
            "ttf",
        )
        # materialize before unpersisting the range-parted intermediate
        out = out.localCheckpoint(eager=True)
    finally:
        parted.unpersist()
    return out


def ord_for_term(index, term: str) -> int:
    """seekExact(BytesRef) -> OrdTermState.ord: the ordinal of ``term``.

    One aggregate over the term dictionary — rank = count of terms that
    sort strictly before it. Raises ``KeyError`` if the term is absent
    (the reference's seekExact returns false).
    """
    row = index.term_dict.agg(
        F.sum(F.when(F.col("term") < term, 1).otherwise(0)).alias("below"),
        F.sum(F.when(F.col("term") == term, 1).otherwise(0)).alias("hit"),
    ).collect()[0]
    if not row["hit"]:
        raise KeyError(term)
    return int(row["below"] or 0)


def term_for_ord(index, ord: int, num_partitions: int = 32):
    """seekExact(long ord): the ``(ord, term, df, ttf)`` row at ``ord``.

    Raises ``IndexError`` past the vocabulary end (the reference throws on
    out-of-bounds ords).
    """
    rows = term_ordinals(index, num_partitions).filter(F.col("ord") == int(ord)).collect()
    if not rows:
        raise IndexError(f"ord {ord} out of bounds for this term dictionary")
    return rows[0]


def ordinal_map(leaves: list) -> DataFrame:
    """OrdinalMap.build analog: ``(leaf, leaf_ord, global_ord, term)`` for
    every term of every leaf index, where ``global_ord`` ranks the term in
    the UNION vocabulary and ``leaf_ord`` in that leaf's own vocabulary —
    the mapping MultiReader-sorted doc values need (``index/OrdinalMap.kt``).

    Per-leaf ords and global ords both come from the two-phase ranking
    above (``term_ordinals``), so no vocabulary-scale window ever runs on
    one reducer; the leaf->global stitch is one equi-join on term.
    """
    if not leaves:
        raise ValueError("ordinal_map needs at least one leaf index")
    uni = None
    for i, leaf in enumerate(leaves):
        part = term_ordinals(leaf).select(
            F.lit(i).cast("int").alias("leaf"),
            F.col("ord").alias("leaf_ord"),
            "term",
        )
        uni = part if uni is None else uni.unionByName(part)
    # global ords over the distinct union vocabulary, same scalable ranking
    vocab = uni.select("term").distinct()

    class _V:  # minimal index-shaped shim for term_ordinals
        pass

    shim = _V()
    shim.term_dict = vocab.withColumn("df", F.lit(0)).withColumn("ttf", F.lit(0))
    gl = term_ordinals(shim).select(F.col("ord").alias("global_ord"), "term")
    return uni.join(gl, "term").select("leaf", "leaf_ord", "global_ord", "term")
