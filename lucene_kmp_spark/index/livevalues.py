"""LiveFieldValues — real-time get-by-key for values newer than the last
searcher refresh (``search/LiveFieldValues.kt``).

Lucene's class tracks id→value in a ConcurrentHashMap while documents are
in flight between ``IndexWriter.updateDocument`` and the next NRT reopen;
``get(id)`` consults the pending map first and falls back to the (stale)
searcher. Here the writer commits batches synchronously but a caller may
hold a point-in-time ``SegmentedReader`` for query stability (the
SearcherManager pattern), so the same staleness window exists between the
reader's generation and the writer's head.

The pending store is a list of tagged DataFrames (one per write since the
pinned reader), resolved lazily with a latest-write-wins window — all
distributed; nothing is collected to the driver. The window is bounded by
the refresh interval, exactly Lucene's cost model. ``refresh()`` reopens
and purges, the atomic analog of the reference's two-generation
current/old handoff (which exists only to tolerate concurrent adds during
reopen — the batch driver's refresh is atomic, so one purge suffices).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class LiveFieldValues:
    """Wrap a SegmentedIndexWriter; route writes through this object so the
    pending (key → value) view stays consistent with the index.

    ``value_col``: the stored field whose fresh value ``get`` serves (the
    reference instance is generic over V; a column name is the DataFrame
    equivalent).
    """

    def __init__(self, writer, value_col: str):
        self.writer = writer
        self.key_cols = tuple(writer.key_cols)
        self.value_col = value_col
        self._pending: list[DataFrame] = []  # (key_cols..., value_col, _gen, _del)
        self._gen = 0
        self._reader = None

    # ------------------------------------------------------------- writes
    def _record(self, df: DataFrame, deleted: bool):
        self._gen += 1
        cols = [*self.key_cols]
        if deleted:
            slim = df.select(*cols).withColumn(self.value_col, F.lit(None))
        else:
            slim = df.select(*cols, self.value_col)
        self._pending.append(
            slim.withColumn("_gen", F.lit(self._gen)).withColumn("_del", F.lit(deleted))
        )

    def add_batch(self, df: DataFrame, batch_key: str | None = None):
        rec = self.writer.add_batch(df, batch_key=batch_key)
        self._record(df, deleted=False)
        return rec

    def update_batch(self, df: DataFrame, batch_key: str | None = None):
        rec = self.writer.update_batch(df, batch_key=batch_key)
        self._record(df, deleted=False)
        return rec

    def delete_by_keys(self, keys: DataFrame):
        self.writer.delete_by_keys(keys)
        self._record(keys, deleted=True)

    # ------------------------------------------------------------- reads
    def _pinned_reader(self):
        if self._reader is None:
            self._reader = self.writer.reader()
        return self._reader

    def get(self, keys: DataFrame) -> DataFrame:
        """Current value for each requested key: the newest pending write if
        one exists (deletes yield no row — the reference returns null),
        else the pinned reader's stored field. Returns
        ``(*key_cols, value_col)``."""
        kc = list(self.key_cols)
        reader = self._pinned_reader()
        committed = (
            reader.searcher()
            ._live(reader.index.docs)
            .join(keys.select(*kc).distinct(), kc, "left_semi")
            .select(*kc, self.value_col)
        )
        if not self._pending:
            return committed
        pend_all = reduce(lambda a, b: a.unionByName(b), self._pending)
        pend = pend_all.join(keys.select(*kc).distinct(), kc, "left_semi")
        w = Window.partitionBy(*kc).orderBy(F.desc("_gen"))
        latest = (
            pend.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_gen")
        )
        fresh = latest.filter(~F.col("_del")).select(*kc, self.value_col)
        tombstoned = latest.filter(F.col("_del")).select(*kc)
        older = committed.join(latest.select(*kc), kc, "left_anti")
        return fresh.unionByName(older)

    # ------------------------------------------------------------ refresh
    def refresh(self):
        """Reopen the reader at the writer's head and purge every pending
        entry it now covers (LiveFieldValues.beforeRefresh/afterRefresh)."""
        self._reader = self.writer.reader()
        self._pending = []
        self._gen = 0
        return self._reader

    @property
    def size(self) -> int:
        """Number of pending write batches (the reference exposes map size;
        batch count is the driver-visible analog — per-key size would be a
        distributed count)."""
        return len(self._pending)
