"""Composite point-in-time readers — the MultiReader side of Lucene's
reader family (``index/MultiReader.kt``, ``index/BaseCompositeReader.kt``).

Lucene's MultiReader wraps N sub-readers WITHOUT rewriting anything: each
leaf keeps its own files and docIDs are rebased by leaf offset at search
time. In the columnar engine every index table already carries absolute
``doc_id`` values (IDs are assigned by ``assign_doc_ids`` before any build),
so the composite is a pure DataFrame union — no rebase, no rewrite, no
shuffle beyond re-aggregating the (vocabulary-sized) term dictionary:

* ``postings``/``docs``/``norms``/``term_vectors`` union by name — Spark
  unions are metadata-only (the scan lists both inputs), so opening a
  MultiReader over two 50 TB indexes costs nothing until a query runs,
  exactly like Lucene's open-cost model;
* ``term_dict`` re-aggregates df/ttf across leaves (MultiTerms docFreq
  summing, ``index/MultiTerms.kt``);
* collection stats sum leaf stats (MultiReader.numDocs/maxDoc delegate
  sums, ``BaseCompositeReader.kt``).

The one composite-only hazard: per-leaf ``block_id`` values are only unique
within a leaf, and the block-max pruners join candidate blocks back on
``(term, block_id)``. The composite therefore tags each leaf's blocks with
a leaf ordinal in the high bits — the DataFrame analog of Lucene's
ReaderSlice/leaf-base bookkeeping (``index/ReaderSlice.kt``).

Requirement (caller contract, checked on demand): leaf docID sets must be
disjoint — the same contract Lucene enforces structurally via leaf bases.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from lucene_kmp_spark.index.builder import IndexStats, InvertedIndex

# leaf ordinal lives above bit 48: block_id = (bucket << 16) | slice with
# bucket = doc_id >> 13, so 48 bits cover docIDs past 2^45 per leaf
_LEAF_SHIFT = 48


def multi_reader(*indexes: InvertedIndex, check_disjoint: bool = False) -> InvertedIndex:
    """Compose N indexes into one searchable InvertedIndex (MultiReader.kt).

    All leaves must index the same field with the same index_options (the
    same constraint Lucene's codecs impose per field). ``check_disjoint``
    runs a one-off docID-overlap assertion (a doc-scale self-join — leave
    off in production and guarantee disjointness at assign_doc_ids time).
    """
    if len(indexes) < 1:
        raise ValueError("multi_reader needs >=1 leaf")
    if len(indexes) == 1:
        return indexes[0]
    f0 = indexes[0].field_name
    opt0 = indexes[0].extra.get("index_options", "positions")
    for ix in indexes[1:]:
        if ix.field_name != f0:
            raise ValueError(f"field mismatch: {ix.field_name!r} != {f0!r}")
        if ix.extra.get("index_options", "positions") != opt0:
            raise ValueError("index_options mismatch across leaves")

    if check_disjoint:
        ids = [ix.docs.select("doc_id") for ix in indexes]
        union = reduce(lambda a, b: a.unionByName(b), ids)
        n_rows = union.count()
        n_distinct = union.distinct().count()
        if n_rows != n_distinct:
            raise ValueError(
                f"leaf docID spaces overlap ({n_rows - n_distinct} collisions)"
            )

    def _tagged_postings(ix: InvertedIndex, leaf: int):
        if leaf == 0:
            return ix.postings
        return ix.postings.withColumn(
            "block_id", (F.col("block_id") + F.lit(leaf << _LEAF_SHIFT)).cast("long")
        )

    postings = reduce(
        lambda a, b: a.unionByName(b),
        [_tagged_postings(ix, i) for i, ix in enumerate(indexes)],
    )
    term_dict = (
        # normalize to the stats the re-agg keeps: leaves written before and
        # after the n_buckets term_dict column coexist in one composite
        reduce(
            lambda a, b: a.unionByName(b),
            [ix.term_dict.select("term", "df", "ttf") for ix in indexes],
        )
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
    )
    docs = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True),
        [ix.docs for ix in indexes],
    )
    norms = None
    if all(ix.norms is not None for ix in indexes):
        norms = reduce(lambda a, b: a.unionByName(b), [ix.norms for ix in indexes])
    tv = None
    if all(ix.term_vectors is not None for ix in indexes):
        tv = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            [ix.term_vectors for ix in indexes],
        )

    num_terms = term_dict.count()
    stats = IndexStats(
        max_doc=sum(ix.stats.max_doc for ix in indexes),
        doc_count=sum(ix.stats.doc_count for ix in indexes),
        sum_total_term_freq=sum(ix.stats.sum_total_term_freq for ix in indexes),
        sum_doc_freq=sum(ix.stats.sum_doc_freq for ix in indexes),
        num_terms=num_terms,
    )
    extra = dict(indexes[0].extra)
    extra["composite_leaves"] = len(indexes)
    # semantic flags must hold for EVERY leaf: a skew_safe=False leaf has
    # per-term-slice block ids (block_id>>16 is not a doc-order window), so
    # the composite may only advertise window-prunable blocks if all leaves do
    extra["bucketed_blocks"] = all(
        ix.extra.get("bucketed_blocks", True) for ix in indexes
    )
    # composite loses any per-leaf index sort (docIDs interleave across
    # leaves), like Lucene dropping the sort on a multi-segment view
    extra["index_sort"] = None
    return InvertedIndex(
        spark=indexes[0].spark,
        field_name=f0,
        docs=docs,
        postings=postings,
        term_dict=term_dict,
        stats=stats,
        key_cols=indexes[0].key_cols,
        extra=extra,
        norms=norms,
        term_vectors=tv,
    )
