"""Time-limited query execution.

Reference analogs: ``search/TimeLimitingBulkScorer.kt`` (scores documents in
growing windows and raises ``TimeExceededException`` once the budget is
gone) and ``index/ExitableDirectoryReader.kt`` (wraps every enum with a
timeout check). A Spark job has no per-row hook the driver can piggyback
on, so the analog operates at the unit Spark DOES expose: the job group.
The search runs in a worker thread under its own job group; if the budget
expires first, the group is cancelled cluster-wide (every executor task
gets interrupted — the ExitableDirectoryReader sweep) and
``TimeExceededError`` carries how long the query actually ran.

Both reference contracts are covered: the exception form (this module's
``run_with_time_limit`` — cancel + raise) and ``partialResultsAfterTimeout``
(:func:`partial_top_k` — the deadline lives inside the scoring pipeline and
the hits collected before it return with a ``timed_out`` flag).
"""

from __future__ import annotations

import threading
import time
import uuid

from pyspark.sql import functions as F


class TimeExceededError(Exception):
    """search/TimeLimitingBulkScorer.TimeExceededException analog."""

    def __init__(self, timeout_sec: float, elapsed_sec: float):
        super().__init__(
            f"query exceeded its {timeout_sec:.3f}s budget (ran {elapsed_sec:.3f}s)"
        )
        self.timeout_sec = timeout_sec
        self.elapsed_sec = elapsed_sec


def run_with_time_limit(spark, action, timeout_sec: float):
    """Run ``action()`` (any driver-side call that triggers Spark jobs —
    typically a ``.collect()`` / ``.count()`` closure) under ``timeout_sec``.

    Returns the action's result, or raises :class:`TimeExceededError` after
    cancelling every Spark job the action started. Job-group scoping is
    thread-local in Spark, so concurrent searches don't cancel each other.
    """
    sc = spark.sparkContext
    group = f"timelimit-{uuid.uuid4().hex[:12]}"
    out: dict = {}

    def _run():
        sc.setJobGroup(group, f"time-limited search ({timeout_sec}s)", True)
        try:
            out["result"] = action()
        except BaseException as e:  # surfaced below on the caller thread
            out["error"] = e
        finally:
            sc.setJobGroup("", "", False)

    t0 = time.perf_counter()
    worker = threading.Thread(target=_run, daemon=True)
    worker.start()
    worker.join(timeout_sec)
    if worker.is_alive():
        sc.cancelJobGroup(group)
        worker.join(30.0)  # tasks get interrupted; bounded drain
        raise TimeExceededError(timeout_sec, time.perf_counter() - t0)
    if "error" in out:
        err = out["error"]
        # a cancel racing a just-finished timer shows up as a Spark error
        if worker.is_alive() or "cancelled" in str(err).lower():
            raise TimeExceededError(timeout_sec, time.perf_counter() - t0) from err
        raise err
    return out["result"]


def top_k_with_timeout(searcher, query, k: int, timeout_sec: float, **top_k_kwargs):
    """Time-limited ``IndexSearcher.top_k``: returns the collected rows, or
    raises :class:`TimeExceededError` (IndexSearcher.search-with-timeout
    surface)."""
    spark = searcher.index.spark
    return run_with_time_limit(
        spark, lambda: searcher.top_k(query, k, **top_k_kwargs).collect(), timeout_sec
    )


def partial_top_k(searcher, query, k: int, timeout_sec: float):
    """Partial results after timeout — TimeLimitingBulkScorer's OTHER
    contract (``partialResultsAfterTimeout``): score in bounded windows
    until the budget is gone and return the hits collected SO FAR instead
    of raising (TimeLimitingBulkScorer.kt scores growing doc windows and
    keeps what the collector saw; DEVIATIONS #11's raise-only gap).

    The Spark analog puts the deadline INSIDE the scoring pipeline: a
    pass-through Arrow stage checks the wall clock before forwarding each
    batch and stops pulling from its partition once the budget is spent —
    upstream decode for the unpulled batches never runs (lazy iterator
    pipelining), exactly the "stop scoring mid-stream, keep the collected
    hits" shape. Results under truncation are a valid top-k of the scored
    subset, nondeterministic like the reference's (thread timing decides
    what got scored there too). Executor clocks are assumed driver-close
    (NTP; exact on local mode).

    Returns ``(rows, timed_out)``: ``timed_out=False`` guarantees the full
    exact answer.  The flag is derived from whether any partition actually
    stopped early (a Spark accumulator incremented by the gate on
    truncation), not from the driver wall clock — a slow driver-side
    sort/collect after a fully-scored stream does not flip it, and executor
    clock skew cannot hide a truncation."""
    import time as _time

    scored = searcher.execute(query)
    deadline = _time.time() + timeout_sec
    truncated = searcher.index.spark.sparkContext.accumulator(0)

    def gate(batches):
        import time as _t

        for pdf in batches:
            if _t.time() >= deadline:
                # dropping a fetched batch (and everything behind it) —
                # record the truncation so the driver reports timed_out
                truncated.add(1)
                return
            yield pdf

    gated = scored.mapInPandas(gate, schema=scored.schema)
    rows = (
        gated.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(k)).collect()
    )
    return rows, truncated.value > 0
