"""SearcherManager / ReferenceManager and ControlledRealTimeReopenThread
analogs — managed acquire/refresh of point-in-time searchers.

Reference: ``search/ReferenceManager.kt`` (acquire/release/maybeRefresh +
RefreshListener), ``search/SearcherManager.kt`` (the IndexSearcher-typed
manager with a SearcherFactory hook), and
``search/ControlledRealTimeReopenThread.kt`` (writer mutations return
generations; a caller blocks in waitForGeneration(gen) until a reopen makes
that generation visible).

Spark-first mapping: a "searcher reference" is a ``SegmentedReader`` pinned
to a manifest generation — readers hold no JVM resources, so ``release`` is
a no-op and reference counting disappears (the reason ReferenceManager
exists in the JVM). What remains meaningful at cluster scale is the
*visibility contract*, which is preserved exactly:

* ``acquire()`` always returns the same point-in-time view until a
  successful ``maybe_refresh()`` — pages never shift under concurrent
  commits (the SearcherManager guarantee);
* ``maybe_refresh()`` is cheap-when-clean: one manifest stat, no segment
  IO unless the generation advanced;
* writer mutations already return records with the committed generation,
  so ``ControlledRealTimeReopen.wait_for_generation(gen)`` gives the
  getAndMaybeReopen semantics — in a batch driver there is no background
  thread to wake, so "wait" degenerates to refresh-if-behind, which is the
  same post-condition the reference's blocked caller observes on wake-up.
"""

from __future__ import annotations

from typing import Callable

from lucene_kmp_spark.index.segments import SegmentedIndexWriter, SegmentedReader


class SearcherManager:
    """Acquire/maybeRefresh over a ``SegmentedIndexWriter``
    (SearcherManager.kt); ``searcher_factory`` is the SearcherFactory hook
    (e.g. wrap the reader's index in an IndexSearcher with a custom
    similarity) — it runs once per refresh, never per acquire."""

    def __init__(
        self,
        writer: SegmentedIndexWriter,
        searcher_factory: Callable[[SegmentedReader], object] | None = None,
    ):
        self.writer = writer
        self._factory = searcher_factory or (lambda reader: reader)
        self._listeners: list = []
        self._reader = writer.reader()
        self._searcher = self._factory(self._reader)

    # ------------------------------------------------------------ acquire
    def acquire(self):
        """The current searcher — stable across writer commits until
        ``maybe_refresh`` succeeds (ReferenceManager.acquire)."""
        return self._searcher

    def release(self, searcher) -> None:
        """ReferenceManager.release: a no-op here — Spark readers hold no
        files open; old generations are reclaimed by the writer's
        ``purge_unreferenced`` like closed readers release their commits."""

    @property
    def generation(self) -> int:
        """The generation the current searcher sees."""
        return int(self._reader.generation)

    # ------------------------------------------------------------ refresh
    def add_listener(self, listener) -> None:
        """RefreshListener: ``before_refresh()`` / ``after_refresh(did)``
        callbacks (either may be absent on the listener object)."""
        self._listeners.append(listener)

    def remove_listener(self, listener) -> None:
        self._listeners.remove(listener)

    def maybe_refresh(self) -> bool:
        """Swap in a new point-in-time searcher iff the writer committed a
        newer generation; returns whether a swap happened
        (ReferenceManager.maybeRefresh)."""
        for li in self._listeners:
            fn = getattr(li, "before_refresh", None)
            if fn:
                fn()
        did = False
        try:
            latest = int(self.writer.manifest()["generation"])
            if latest != int(self._reader.generation):
                self._reader = self.writer.reader()
                self._searcher = self._factory(self._reader)
                did = True
        finally:
            for li in self._listeners:
                fn = getattr(li, "after_refresh", None)
                if fn:
                    fn(did)
        return did


class ControlledRealTimeReopen:
    """ControlledRealTimeReopenThread.kt without the thread: writer
    mutations commit a generation; ``wait_for_generation(gen)`` guarantees
    the manager's searcher sees at least ``gen`` before returning — the
    exact post-condition the reference's waiting caller observes."""

    def __init__(self, writer: SegmentedIndexWriter, manager: SearcherManager):
        if manager.writer is not writer:
            raise ValueError("manager must wrap the same writer")
        self.writer = writer
        self.manager = manager

    def wait_for_generation(self, gen: int) -> int:
        """Refresh (at most once) until the searcher generation >= ``gen``;
        returns the searcher generation. Raises if ``gen`` has not been
        committed by the writer at all — a batch driver cannot block on a
        commit that is never coming."""
        gen = int(gen)
        committed = int(self.writer.manifest()["generation"])
        if gen > committed:
            raise ValueError(
                f"generation {gen} not committed yet (writer is at {committed})"
            )
        if self.manager.generation < gen:
            self.manager.maybe_refresh()
        return self.manager.generation
