"""Collector surface — Lucene's one-pass multi-consumer search terminals
(``search/MultiCollector.kt``, ``TotalHitCountCollector.kt``,
``CachingCollector.kt``, ``PositiveScoresOnlyCollector.kt``,
``FilterCollector.kt``, ``CollectorManager.kt``).

Lucene streams every hit once through a chain of collectors. The DataFrame
analog: materialize the scored set ONCE (``persist``) and let each
collector run its (cheap) terminal job over the shared cache — one postings
scan regardless of how many consumers, which is the whole point of
MultiCollector at 100 TB where the scan dominates. CollectorManager's
per-slice collect + reduce IS Spark's job model (per-partition partials,
driver merge), so no separate manager type is needed.

Each collector consumes the scored DataFrame ``(doc_id, score)`` and
produces a driver-sized result (top-k rows, a count, facet rows) — the
same contract as the reference's ``collector.result()`` shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class Collector:
    """One terminal consumer of a scored doc set."""

    def collect(self, scored: DataFrame):
        raise NotImplementedError


class TopScoreDocCollector(Collector):
    """TopScoreDocCollector.kt: top-k by (score desc, docID asc). Result is
    a list of Rows (doc_id, score) — driver-sized by construction."""

    def __init__(self, k: int = 10):
        self.k = int(k)

    def collect(self, scored: DataFrame):
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(self.k).collect()


class TotalHitCountCollector(Collector):
    """TotalHitCountCollector.kt: just the hit count."""

    def collect(self, scored: DataFrame):
        return scored.count()


class FacetsCollector(Collector):
    """FacetsCollector-style side aggregation: value counts of a stored
    field over the match set (top_n rows, count desc / value asc)."""

    def __init__(self, docs: DataFrame, field: str, top_n: int = 10):
        self.docs, self.field, self.top_n = docs, field, int(top_n)

    def collect(self, scored: DataFrame):
        return (
            scored.select("doc_id")
            .join(self.docs.select("doc_id", self.field), "doc_id")
            .groupBy(self.field)
            .agg(F.count("*").alias("count"))
            .orderBy(F.desc("count"), F.asc(self.field))
            .limit(self.top_n)
            .collect()
        )


class PositiveScoresOnlyCollector(Collector):
    """PositiveScoresOnlyCollector.kt: drop score <= 0 hits before the
    wrapped collector sees them."""

    def __init__(self, inner: Collector):
        self.inner = inner

    def collect(self, scored: DataFrame):
        return self.inner.collect(scored.filter(F.col("score") > 0))


class FilterCollector(Collector):
    """FilterCollector.kt: arbitrary restriction of the stream (here any
    DataFrame->DataFrame function) before the wrapped collector."""

    def __init__(self, inner: Collector, fn):
        self.inner, self.fn = inner, fn

    def collect(self, scored: DataFrame):
        return self.inner.collect(self.fn(scored))


class CachingCollector(Collector):
    """CachingCollector.kt: remember the hit stream so it can be replayed
    into other collectors without re-running the query. The persisted
    DataFrame IS the cache (exact, distributed, spillable — no maxRAMMB
    cliff: Spark spills to disk where the reference silently stops
    caching)."""

    def __init__(self, inner: Collector | None = None):
        self.inner = inner
        self.cached: DataFrame | None = None

    def collect(self, scored: DataFrame):
        self.cached = scored.persist()
        return self.inner.collect(self.cached) if self.inner is not None else None

    def replay(self, collector: Collector):
        if self.cached is None:
            raise ValueError("nothing cached yet — collect() first")
        return collector.collect(self.cached)

    def unpersist(self):
        if self.cached is not None:
            self.cached.unpersist()


def multi_collect(searcher, q, collectors: list[Collector]) -> list:
    """MultiCollector.wrap(...): run every collector over ONE scored pass.
    The scored set is persisted for the duration so the N terminal jobs
    share a single postings scan, then released."""
    scored = searcher.execute(q)
    if getattr(searcher, "dtype", None) is not None:
        import numpy as np

        if searcher.dtype == np.float32:
            scored = scored.select(
                "doc_id", F.col("score").cast("float").alias("score")
            )
    scored = scored.persist()
    try:
        return [c.collect(scored) for c in collectors]
    finally:
        scored.unpersist()


def topk_with_total(searcher, q, k: int = 10) -> DataFrame:
    """The common TopDocs shape (TopDocs.kt: scoreDocs + totalHits) as one
    DataFrame: top-k rows each carrying total_hits — computed from the same
    persisted pass (window total over the scored set, then rank cut)."""
    scored = searcher.execute(q).persist()
    try:
        # two jobs over ONE cached scan; the count is a 1-row broadcast —
        # never a global repartition-to-one window over the full match set
        total = scored.agg(F.count("*").cast("long").alias("total_hits"))
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(k))
        w_rank = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        out = (
            topk.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w_rank).cast("int"))
            .select("doc_id", "rank", "score", "total_hits")
        )
        # materialize before unpersist so the cache is actually shared
        rows = out.collect()
        return scored.sparkSession.createDataFrame(
            rows, "doc_id long, rank int, score double, total_hits long"
        )
    finally:
        scored.unpersist()
