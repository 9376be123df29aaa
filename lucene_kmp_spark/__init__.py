"""lucene_kmp_spark — a from-scratch, PySpark-native inverted-index + BM25 engine.

Re-expresses the query/data semantics of the reference (nehemiaharchives/lucene-kmp,
a Kotlin port of Apache Lucene 10.x) as an idiomatic Spark design:

* index build = SPIMI-style DataFrame pipeline (tokenize via Arrow pandas UDFs,
  skew-safe distributed rank, 128-doc posting blocks, delta+varint compression)
* query      = Query AST compiled to DataFrame plans; top-k is Spark's
  TakeOrderedAndProject; scoring is a numpy float32 kernel bit-matching
  BM25Similarity.score (reference: search/similarities/BM25Similarity.kt:187-199)

Nothing here is a translation of the reference's Kotlin execution engine; the
reference defines WHAT to compute (semantics, constants, tie-breaks), cited per
module as ``file:line`` docstrings.
"""

__version__ = "0.1.0"
