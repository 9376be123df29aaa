"""Driver contract for the spark-graft builder (PySpark target) — thin shim.

The actual registry lives in ``lucene_kmp_spark/contrib/oracle_queries.py``
(moved there so the contract file stays a maintainable index, not the
largest Python file in the repo):

``entry(spark)``   — flagship parsed BM25 query over sf0.001 documents.
``queries()``      — one entry per implemented operator (SURVEY.md §2 +
                     training-data pipeline ops), each (spark, sf_dir) -> DF.
                     Registration order is ROTATED each round so the
                     driver's 50-slot CORRECTNESS window samples entries
                     that have never been driver-verified (reads the
                     CORRECTNESS_r*.json files already in the repo root).
``oracle_sql()``   — DuckDB-equivalent SQL per query.

Cross-engine float protocol: BM25/cosine oracle queries compute in float64
with the exact same expression shapes on both sides (idf, the rewritten
``w - w/(1 + tf*ni)`` form of BM25Similarity.kt:187-199, integer-exact
SmallFloat norm quantization), round to 4 decimals, and rank by
(rounded score DESC, id ASC) so ordering can never depend on sub-rounding
noise. Lucene float32 bit-parity is pinned separately in tests/ against the
naive oracle.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from lucene_kmp_spark.contrib.oracle_queries import (  # noqa: E402,F401
    _EN_STEM_CASE,
    _ML_PRELUDE,
    _PRELUDE,
    entry,
    oracle_sql,
    queries,
)

__all__ = ["entry", "queries", "oracle_sql"]
