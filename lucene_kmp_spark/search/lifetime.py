"""SearcherLifetimeManager — point-in-time searchers for follow-up requests.

Reference: ``search/SearcherLifetimeManager.kt`` (+ ``PruneByAge``): a first
search records the searcher under a version token; follow-up actions (next
page, drill-down) ``acquire`` the SAME point-in-time searcher by token so
paging never shifts under a concurrent reopen, and a pruner closes
searchers past an age cutoff.

Spark-first mapping: a "recorded searcher" is a pinned manifest snapshot of
the segmented index (the commit generation is the reference's
``IndexReader.version`` token). ``acquire`` reopens the exact generation
from the snapshot; nothing holds JVM resources, so ``release`` is dropping
the pin — segment directories are reclaimed later by
``purge_unreferenced`` exactly like the reference's closed readers release
their files. ``prune(max_age_sec)`` is PruneByAge.
"""

from __future__ import annotations

import os
import time

from lucene_kmp_spark.index.segments import SegmentedIndexWriter, SegmentedReader

_PREFIX = "life"


class SearcherLifetimeManager:
    """Record/acquire/release/prune over a ``SegmentedIndexWriter``'s
    snapshot store (SearcherLifetimeManager.kt semantics)."""

    def __init__(self, writer: SegmentedIndexWriter):
        self.writer = writer
        self._recorded: dict[int, tuple[str, float]] = {}  # token -> (snap_id, t)

    def record(self, reader: SegmentedReader) -> int:
        """Pin ``reader``'s commit; returns its version token (the commit
        generation — record() on an already-recorded version is a no-op
        returning the same token, like the reference's putIfAbsent)."""
        token = int(reader.generation)
        if token not in self._recorded:
            snap_id = self.writer.snapshot(manifest=reader.manifest, prefix=_PREFIX)
            self._recorded[token] = (snap_id, time.time())
        return token

    def acquire(self, token: int) -> SegmentedReader | None:
        """The exact point-in-time reader for ``token``, or None if it was
        released/pruned (the caller falls back to the current searcher)."""
        entry = self._recorded.get(int(token))
        if entry is None:
            return None
        return self.writer.reader(snapshot=entry[0])

    def release(self, token: int) -> bool:
        entry = self._recorded.pop(int(token), None)
        if entry is None:
            return False
        try:
            self.writer.release(entry[0])
        except FileNotFoundError:
            pass
        return True

    def prune(self, max_age_sec: float) -> list[int]:
        """PruneByAge: drop every recorded searcher older than
        ``max_age_sec``, EXCEPT the newest one (the reference's pruner always
        keeps the current searcher regardless of age). Returns the pruned
        tokens."""
        if not self._recorded:
            return []
        newest = max(self._recorded)
        cutoff = time.time() - max_age_sec
        victims = [
            t for t, (_sid, ts) in self._recorded.items() if t != newest and ts < cutoff
        ]
        for t in victims:
            self.release(t)
        return sorted(victims)

    def tokens(self) -> list[int]:
        return sorted(self._recorded)
