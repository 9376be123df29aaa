"""Segmented, incremental index: the IndexWriter/commit/merge machinery.

Reference analogs (SURVEY.md §2.2, §3.2):

* ``SegmentedIndexWriter.add_batch``   — IndexWriter.addDocuments
  (``index/IndexWriter.kt:1239,1276``): each batch becomes an immutable
  segment directory; docIDs continue from the current docBase (global,
  never remapped — simpler than ``index/DocIDMerger.kt``)
* ``delete_by_keys`` / ``update_batch`` — deleteDocuments / updateDocument
  (``index/IndexWriter.kt:1591,1641``): deletes are a side table of docIDs
  anti-joined at query time (the liveDocs bitset of
  ``codecs/lucene90/Lucene90LiveDocsFormat.kt``); updates = delete + add
* ``commit``                            — ``segments_N`` generation files
  (``index/SegmentInfos.kt:35-45,93``): manifest.json written atomically
  (tmp + rename), one generation per mutation; readers pin a generation
  (Iceberg-snapshot semantics; Iceberg jars aren't in this container, so
  parquet dirs + a JSON manifest play the role of the table format)
* ``maybe_merge``                       — TieredMergePolicy
  (``index/TieredMergePolicy.kt:60-91``): same constants (10 segments/tier,
  16 MB floor, 5 GB cap); merged postings are rebuilt through the standard
  build pipeline, so every invariant (128-doc blocks, impacts, encodings)
  holds by construction
* collection stats aggregate across segments and INCLUDE deleted docs until
  they are merged away — exactly Lucene's behavior (deleted docs still count
  in ``CollectionStatistics`` until segments rewrite).

Per-segment lineage + metrics (docs indexed, postings rows, bytes) are
recorded in the manifest — the north rule's checkpoint/resumability story:
``add_batch`` is idempotent per ``batch_key`` (a re-run of an already
committed batch is a no-op).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_kmp_spark.index.builder import IndexStats, InvertedIndex, build_index

SEGMENTS_PER_TIER = 10          # TieredMergePolicy.kt:75-76
FLOOR_SEGMENT_BYTES = 16 << 20  # TieredMergePolicy.kt:68
MAX_MERGED_BYTES = 5 << 30      # TieredMergePolicy.kt:66


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _apply_dv_overlay(spark, docs: DataFrame, entries: list[dict]) -> DataFrame:
    """Overlay doc-values updates onto a docs DataFrame: per field, the
    highest-generation value per doc wins; docs without an update keep the
    stored value (coalesce). A field with no stored column is created
    (Lucene requires the DV field to exist; the columnar analog can mint it).
    One small left join per updated field — broadcast-sized by construction."""
    by_field: dict[str, list[dict]] = {}
    for e in entries:
        by_field.setdefault(e["field"], []).append(e)
    for field, es in by_field.items():
        ov = None
        for e in es:
            df = spark.read.parquet(e["path"]).withColumn(
                "_gen", F.lit(int(e["generation"]))
            )
            ov = df if ov is None else ov.unionByName(df)
        latest = ov.groupBy("doc_id").agg(F.max_by("value", "_gen").alias("_dvu"))
        if field in docs.columns:
            tgt = docs.schema[field].dataType
            docs = (
                docs.join(latest, "doc_id", "left")
                .withColumn(field, F.coalesce(F.col("_dvu").cast(tgt), F.col(field)))
                .drop("_dvu")
            )
        else:
            docs = docs.join(latest, "doc_id", "left").withColumnRenamed("_dvu", field)
    return docs


LOG_MERGE_FACTOR = 10             # LogMergePolicy.kt DEFAULT_MERGE_FACTOR
LOG_MIN_MERGE_DOCS = 1000         # LogDocMergePolicy.kt DEFAULT_MIN_MERGE_DOCS
LOG_MIN_MERGE_BYTES = 1 << 21     # LogByteSizeMergePolicy.kt ~1.6-2 MB floor


class SegmentedIndexWriter:
    """Append/delete/update over a directory of immutable segments.

    ``merge_policy``: ``"tiered"`` (default, TieredMergePolicy.kt),
    ``"log_doc"`` / ``"log_bytes"`` (LogDocMergePolicy.kt /
    LogByteSizeMergePolicy.kt: segments bucket into log_{mergeFactor} size
    levels; ``merge_factor`` CONSECUTIVE segments at a level merge — log
    policies never reorder segments), or ``"none"`` (NoMergePolicy.kt)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols=("conv_id", "turn_idx"),
        text_col="text",
        merge_policy: str = "tiered",
        merge_factor: int = LOG_MERGE_FACTOR,
        soft_deletes_retention=None,
        merged_segment_warmer=None,
        term_bloom: bool = True,
    ):
        assert merge_policy in ("tiered", "log_doc", "log_bytes", "none")
        self.spark = spark
        self.root = root
        self.key_cols = tuple(key_cols)
        self.text_col = text_col
        self.merge_policy = merge_policy
        self.merge_factor = int(merge_factor)
        # SoftDeletesRetentionMergePolicy.kt: merges PHYSICALLY KEEP
        # soft-deleted docs that match this query (None = keep all of them);
        # hard deletes always purge. Soft-deleted docs stay invisible to
        # normal readers either way — retention is about recoverability.
        self.soft_deletes_retention = soft_deletes_retention
        self.merged_segment_warmer = merged_segment_warmer
        # codecs/bloom/BloomFilteringPostingsFormat.kt: per-segment term
        # bloom written at flush/merge, consulted to skip segments whose
        # filter PROVES the query's required terms absent (reader(prune_query=))
        self.term_bloom = bool(term_bloom)
        os.makedirs(os.path.join(root, "segments"), exist_ok=True)
        if not os.path.exists(self._manifest_path()):
            self._write_manifest({"generation": 0, "segments": [], "deletes": [], "batches": {}})

    # ------------------------------------------------------------- manifest
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def manifest(self) -> dict:
        with open(self._manifest_path()) as f:
            return json.load(f)

    def _write_manifest(self, m: dict):
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())  # atomic commit (segments_N analog)

    @property
    def max_doc(self) -> int:
        return sum(s["n_docs"] for s in self.manifest()["segments"])

    def _next_doc_base(self) -> int:
        m = self.manifest()
        return max((s["doc_base"] + s["n_docs"] for s in m["segments"]), default=0)

    def _next_seg_num(self) -> int:
        """Monotonic segment counter persisted OUTSIDE the manifest —
        Lucene's ``SegmentInfos.counter`` semantics (SegmentInfos.kt keeps
        the name counter independent of the commit point). ``rollback()``
        reverts the manifest but never this file, so a segment created after
        a rollback can never reuse the directory name of a pre-rollback
        segment kept alive by a snapshot pin (the id-collision hazard:
        add+commit, add, snapshot, rollback, add — same (len, generation)
        pair, same directory, pinned data silently overwritten)."""
        path = os.path.join(self.root, "segment_counter")
        n = 0
        if os.path.exists(path):
            with open(path) as f:
                n = int(f.read().strip() or 0)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(n + 1))
        os.replace(tmp, path)
        return n

    def _claim_seg_path(self, seg_id: str) -> str:
        """Resolve and reserve a fresh segment directory; refuses to write
        into an existing one (belt-and-suspenders against any id reuse —
        an existing directory may be pinned by a snapshot reader)."""
        seg_path = os.path.join(self.root, "segments", seg_id)
        if os.path.exists(seg_path):
            raise FileExistsError(
                f"segment directory already exists: {seg_path} — refusing to "
                "overwrite (it may be pinned by a snapshot); segment ids must "
                "be fresh"
            )
        return seg_path

    def _fresh_seg(self, prefix: str) -> tuple[str, str]:
        """Next counter-derived id whose directory does not exist yet —
        counter values colliding with legacy generation-named directories
        (pre-counter indexes) are skipped, not errors."""
        while True:
            seg_id = f"{prefix}{self._next_seg_num():05d}"
            seg_path = os.path.join(self.root, "segments", seg_id)
            if not os.path.exists(seg_path):
                return seg_id, seg_path

    # ------------------------------------------------------------ mutations
    def add_batch(self, df: DataFrame, batch_key: str | None = None) -> dict | None:
        """Index a batch of turns as one new segment. Idempotent per
        batch_key (checkpoint/resume: replaying a committed batch is a no-op).
        Returns the segment lineage record."""
        m = self.manifest()
        if batch_key is not None and batch_key in m["batches"]:
            return None
        doc_base = self._next_doc_base()
        ordered = df.orderBy(*self.key_cols)
        from lucene_kmp_spark.index.docids import assign_doc_ids

        with_ids = assign_doc_ids(ordered, key_cols=self.key_cols).withColumn(
            "doc_id", F.col("doc_id") + F.lit(doc_base)
        )
        n_docs = with_ids.count()
        idx = build_index(with_ids, text_col=self.text_col, cache=True)
        seg_id, seg_path = self._fresh_seg("seg-")
        idx.write(seg_path)
        has_bloom = self._write_bloom(idx, seg_path)
        record = {
            "id": seg_id,
            "doc_base": doc_base,
            "n_docs": n_docs,
            "stats": idx.stats.to_dict(),
            "bytes": _dir_bytes(seg_path),
            "created_at": time.time(),
            "batch_key": batch_key,
            "bloom": has_bloom,
            "metrics": {
                "docs_indexed": n_docs,
                "postings_rows": idx.postings.count(),
                "terms": idx.stats.num_terms,
            },
        }
        m = self.manifest()
        m["segments"].append(record)
        m["generation"] += 1
        if batch_key is not None:
            m["batches"][batch_key] = seg_id
        self._write_manifest(m)
        idx.unpersist()
        return record

    def _write_bloom(self, idx, seg_path: str) -> bool:
        """Distributed per-segment term bloom (BloomFilteringPostingsFormat
        flush): partition-local bitsets folded in mapInPandas, ORed on the
        driver, downsized to <=0.5 saturation; skipped entirely when even
        the filter would be >90% saturated (DefaultBloomFilterFactory)."""
        if not self.term_bloom:
            return False
        from lucene_kmp_spark.util.bloom import bloom_from_term_dict

        fz = bloom_from_term_dict(idx.term_dict, idx.stats.num_terms)
        if fz is None:
            return False
        with open(os.path.join(seg_path, "bloom.bin"), "wb") as f:
            f.write(fz.serialize())
        return True

    def delete_by_keys(self, keys: DataFrame):
        """Buffered deletes by (key_cols): resolved to docIDs now, applied at
        query time via anti-join; physically purged at merge."""
        reader = self.reader()
        doc_ids = reader.index.docs.join(keys, list(self.key_cols), "left_semi").select("doc_id")
        self._append_deletes(doc_ids)

    def delete_by_query(self, query):
        from lucene_kmp_spark.search.executor import IndexSearcher

        reader = self.reader()
        s = IndexSearcher(reader.index)
        doc_ids = s._doc_set(query)
        self._append_deletes(doc_ids)

    # ---------------------------------------------------------- soft deletes
    def soft_delete_by_keys(self, keys: DataFrame):
        """Soft delete (index/PendingSoftDeletes.kt analog): the docs become
        invisible to normal readers but stay physically recoverable — merges
        retain them per ``soft_deletes_retention`` and ``undelete_by_keys``
        reverses the mark. The doc-values-field mechanism maps to a separate
        manifest list instead of a per-doc column: same visibility algebra,
        no segment rewrite to mark."""
        reader = self.reader(include_soft_deleted=True)
        doc_ids = reader.index.docs.join(keys, list(self.key_cols), "left_semi").select("doc_id")
        self._append_deletes(doc_ids, soft=True)

    def soft_delete_by_query(self, query):
        from lucene_kmp_spark.search.executor import IndexSearcher

        reader = self.reader(include_soft_deleted=True)
        doc_ids = IndexSearcher(reader.index)._doc_set(query)
        self._append_deletes(doc_ids, soft=True)

    def undelete_by_keys(self, keys: DataFrame):
        """Reverse a soft delete (the point of soft deletes — rollback /
        NRT-replication recovery): compact the soft list minus the keys."""
        soft = self._soft_deletes_df()
        if soft is None:
            return
        reader = self.reader(include_soft_deleted=True)
        ids = reader.index.docs.join(keys, list(self.key_cols), "left_semi").select("doc_id")
        remaining = soft.join(ids, "doc_id", "left_anti")
        m = self.manifest()
        path = os.path.join(self.root, "deletes", f"sdel-compact-{m['generation']:05d}")
        remaining.select("doc_id").distinct().write.mode("overwrite").parquet(path)
        m["soft_deletes"] = [{"path": path, "generation": m["generation"]}]
        m["generation"] += 1
        self._write_manifest(m)

    def _append_deletes(self, doc_ids: DataFrame, soft: bool = False):
        m = self.manifest()
        gen = m["generation"]
        prefix = "sdel" if soft else "del"
        path = os.path.join(self.root, "deletes", f"{prefix}-{gen:05d}")
        doc_ids.select("doc_id").write.mode("overwrite").parquet(path)
        m.setdefault("soft_deletes" if soft else "deletes", []).append(
            {"path": path, "generation": gen}
        )
        m["generation"] += 1
        self._write_manifest(m)

    def update_batch(self, df: DataFrame, batch_key: str | None = None):
        """updateDocument semantics (IndexWriter.kt:1641): delete-by-key the
        incoming keys, then add — atomic at the manifest level."""
        self.delete_by_keys(df.select(*self.key_cols).distinct())
        return self.add_batch(df, batch_key=batch_key)

    # ------------------------------------------------------ docvalue updates
    def update_numeric_docvalue(self, field: str, value, keys=None, query=None):
        """IndexWriter.updateNumericDocValue (IndexWriter.kt:1702): set a
        per-doc numeric field for every CURRENT doc matching ``keys`` (a
        key-cols DataFrame) or ``query``, WITHOUT re-indexing the text.

        Lucene writes a new doc-values generation file (.dvd/.dvm, gen
        suffix) that readers overlay on the base values; here the overlay is
        a tiny ``(doc_id, value)`` parquet per update referenced from the
        manifest, applied at read time via a left join + coalesce (latest
        generation wins per doc). DocIDs never remap in this design, so the
        overlay stays valid across merges; ``fold_docvalue_updates`` bakes it
        into segment storage (the reference's merge-time DV rewrite).

        Scale: the overlay is bounded by the number of updated docs — tiny
        vs the corpus — so AQE turns the read-time join into a broadcast."""
        self._update_docvalue(field, value, "numeric", keys, query)

    def update_binary_docvalue(self, field: str, value, keys=None, query=None):
        """IndexWriter.updateBinaryDocValue (IndexWriter.kt:1745) analog:
        string payload instead of raw bytes (the consumable form here)."""
        self._update_docvalue(field, value, "binary", keys, query)

    def _update_docvalue(self, field: str, value, kind: str, keys, query):
        if (keys is None) == (query is None):
            raise ValueError("pass exactly one of keys= / query=")
        if field == "doc_id" or field in self.key_cols or field == self.text_col:
            raise ValueError(f"cannot docvalue-update structural field {field!r}")
        reader = self.reader()
        if keys is not None:
            doc_ids = reader.index.docs.join(
                keys, list(self.key_cols), "left_semi"
            ).select("doc_id")
        else:
            from lucene_kmp_spark.search.executor import IndexSearcher

            doc_ids = IndexSearcher(reader.index)._doc_set(query).select("doc_id")
        m = self.manifest()
        gen = m["generation"]
        path = os.path.join(self.root, "dv_updates", f"dvu-{gen:05d}")
        val_col = (
            F.lit(value).cast("long") if kind == "numeric" else F.lit(value).cast("string")
        )
        doc_ids.distinct().withColumn("value", val_col).write.mode("overwrite").parquet(path)
        m.setdefault("dv_updates", []).append(
            {"path": path, "generation": gen, "field": field, "kind": kind}
        )
        m["generation"] += 1
        self._write_manifest(m)

    def fold_docvalue_updates(self) -> int:
        """Bake pending doc-values updates into the segments' stored docs and
        clear the overlay list — what Lucene's merge does with DV generations
        (the overlay join disappears from every subsequent read plan).
        Returns the number of segments rewritten."""
        import shutil

        m = self.manifest()
        if not m.get("dv_updates"):
            return 0
        overlay_entries = list(m["dv_updates"])
        rewritten = 0
        for s in m["segments"]:
            base = os.path.join(self.root, "segments", s["id"])
            docs = self.spark.read.parquet(os.path.join(base, "docs"))
            docs = _apply_dv_overlay(self.spark, docs, overlay_entries)
            tmp = os.path.join(base, "docs_dvfold_tmp")
            docs.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(os.path.join(base, "docs"))
            os.rename(tmp, os.path.join(base, "docs"))
            rewritten += 1
        m = self.manifest()
        m["dv_updates"] = []
        m["generation"] += 1
        self._write_manifest(m)
        return rewritten

    # --------------------------------------------------------------- reader
    def reader(
        self, snapshot: str | None = None, include_soft_deleted: bool = False,
        prune_query=None, committed: bool = False,
    ) -> "SegmentedReader":
        """Point-in-time reader over the current commit, or over a pinned
        snapshot's manifest (SnapshotDeletionPolicy.getSnapshot view).
        The default hides soft-deleted docs (SoftDeletesDirectoryReaderWrapper
        view); ``include_soft_deleted=True`` is the unwrapped reader.

        ``prune_query``: bloom-prune the composite for THIS query — segments
        whose term bloom proves a required term absent are left out of the
        postings/docs union entirely (their parquet never enters the scan).
        Collection and term statistics still aggregate over ALL segments, so
        scores are identical to the unpruned reader; the contract is that
        the searcher is used for (subqueries of) ``prune_query`` only.

        ``committed=True`` opens the LAST COMMIT (DirectoryReader.open(
        Directory) — two-phase commit visibility) instead of the NRT working
        state; raises if the index was never committed
        (IndexNotFoundException semantics)."""
        if committed:
            if snapshot is not None:
                raise ValueError(
                    "committed=True and snapshot= are mutually exclusive — a "
                    "snapshot IS a commit point; open it with reader(snapshot=...)"
                )
            m = self.last_commit()
            if m is None:
                raise FileNotFoundError(
                    "no commit in index (IndexNotFoundException): call commit() first"
                )
        else:
            m = self._snapshot_manifest(snapshot) if snapshot else self.manifest()
        return SegmentedReader(
            self.spark, self.root, m, self.text_col, self.key_cols,
            include_soft_deleted=include_soft_deleted, prune_query=prune_query,
        )

    # ---------------------------------------------------------------- merge
    def find_merges(self) -> list[list[dict]]:
        """Merge selection per the configured policy."""
        if self.merge_policy == "none":
            return []  # NoMergePolicy.kt: never merges, never deletes
        if self.merge_policy in ("log_doc", "log_bytes"):
            return self._find_merges_log()
        return self._find_merges_tiered()

    def _find_merges_log(self) -> list[list[dict]]:
        """LogMergePolicy.kt selection: each segment's level =
        floor(log_{mergeFactor}(max(size, minSize))); scanning in COMMIT
        ORDER (log policies keep segments contiguous), every run of
        ``merge_factor`` consecutive segments whose level does not exceed the
        run's starting level merges into one."""
        import math

        m = self.manifest()
        size_of = (
            (lambda s: max(s["n_docs"], LOG_MIN_MERGE_DOCS))
            if self.merge_policy == "log_doc"
            else (lambda s: max(s["bytes"], LOG_MIN_MERGE_BYTES))
        )
        segs = m["segments"]
        levels = [int(math.log(size_of(s), self.merge_factor)) for s in segs]
        merges, i = [], 0
        while i < len(segs):
            # the run's level is the max level in the next merge_factor window
            end = min(i + self.merge_factor, len(segs))
            run_level = max(levels[i:end], default=0)
            j = i
            while j < len(segs) and levels[j] <= run_level and j - i < self.merge_factor:
                j += 1
            if j - i >= self.merge_factor:
                merges.append(segs[i:j])
            i = j if j > i else i + 1
        return merges

    def _find_merges_tiered(self) -> list[list[dict]]:
        """TieredMergePolicy-flavored selection: bucket segments into size
        tiers (floored at 16 MB); any tier with > SEGMENTS_PER_TIER members
        yields a merge of its smallest SEGMENTS_PER_TIER, capped at 5 GB."""
        m = self.manifest()
        import math

        tiers: dict[int, list[dict]] = {}
        for s in m["segments"]:
            size = max(s["bytes"], FLOOR_SEGMENT_BYTES)
            tier = int(math.log2(size / FLOOR_SEGMENT_BYTES)) if size > FLOOR_SEGMENT_BYTES else 0
            tiers.setdefault(tier, []).append(s)
        merges = []
        for _tier, segs in sorted(tiers.items()):
            if len(segs) > SEGMENTS_PER_TIER:
                segs = sorted(segs, key=lambda s: s["bytes"])
                chosen, total = [], 0
                for s in segs:
                    if len(chosen) >= SEGMENTS_PER_TIER or total + s["bytes"] > MAX_MERGED_BYTES:
                        break
                    chosen.append(s)
                    total += s["bytes"]
                if len(chosen) >= 2:
                    merges.append(chosen)
        return merges

    def merge(self, segments: list[dict]) -> dict:
        """k-way segment merge: docIDs are already global and disjoint, so the
        merge is re-indexing the union of live docs through the standard
        build pipeline (union + regroup; no docID remap)."""
        ids = {s["id"] for s in segments}
        m = self.manifest()
        live_docs = None
        for s in m["segments"]:
            if s["id"] not in ids:
                continue
            seg_docs = self.spark.read.parquet(os.path.join(self.root, "segments", s["id"], "docs"))
            live_docs = seg_docs if live_docs is None else live_docs.unionByName(seg_docs)
        deleted = self._deletes_df()
        if deleted is not None:
            live_docs = live_docs.join(deleted, "doc_id", "left_anti")  # physical purge
        soft = self._soft_deletes_df()
        if soft is not None and self.soft_deletes_retention is not None:
            # SoftDeletesRetentionMergePolicy.kt: soft-deleted docs matching
            # the retention query survive the rewrite; the rest purge like
            # hard deletes. (retention=None keeps every soft-deleted doc.)
            from lucene_kmp_spark.search.executor import IndexSearcher

            full = self.reader(include_soft_deleted=True)
            keep = IndexSearcher(full.index)._doc_set(self.soft_deletes_retention)
            purge_soft = soft.join(keep.select("doc_id"), "doc_id", "left_anti")
            live_docs = live_docs.join(purge_soft, "doc_id", "left_anti")
        idx = build_index(live_docs, text_col=self.text_col, cache=True)
        seg_id, seg_path = self._fresh_seg("seg-merged-")
        idx.write(seg_path)
        merged_bloom = self._write_bloom(idx, seg_path)
        if self.merged_segment_warmer is not None:
            # IndexWriter.IndexReaderWarmer / SimpleMergedSegmentWarmer.kt:
            # the warmer sees the merged segment BEFORE the commit makes it
            # visible, so the first searcher over the new generation never
            # pays its cold cost (here: e.g. persist hot postings, prime
            # Arrow decode, collect stats)
            from lucene_kmp_spark.index.builder import InvertedIndex

            self.merged_segment_warmer(InvertedIndex.read(self.spark, seg_path))
        idx.unpersist()
        n_docs = live_docs.count()
        doc_base = min(s["doc_base"] for s in segments)
        record = {
            "id": seg_id,
            "doc_base": doc_base,
            "n_docs": n_docs,
            "stats": idx.stats.to_dict(),
            "bytes": _dir_bytes(seg_path),
            "created_at": time.time(),
            "batch_key": None,
            "bloom": merged_bloom,
            "metrics": {"merged_from": sorted(ids), "docs_indexed": n_docs},
        }
        m = self.manifest()
        m["segments"] = [s for s in m["segments"] if s["id"] not in ids] + [record]
        m["generation"] += 1
        self._write_manifest(m)
        return record

    def maybe_merge(self) -> list[dict]:
        done = []
        for group in self.find_merges():
            done.append(self.merge(group))
        return done

    def force_merge(self, max_segments: int = 1) -> list[dict]:
        """IndexWriter.forceMerge(maxNumSegments) (IndexWriter.kt:2055):
        merge until at most ``max_segments`` remain, regardless of the merge
        policy's tiering. Like Lucene, the largest segments are left alone
        when possible: each pass merges the smallest ``k+1`` segments needed
        to reduce the count, so bytes rewritten are minimized."""
        if max_segments < 1:
            raise ValueError("max_segments must be >= 1")
        done = []
        while True:
            segs = self.manifest()["segments"]
            if len(segs) <= max_segments:
                return done
            by_size = sorted(segs, key=lambda s: s.get("bytes", 0))
            group = by_size[: len(segs) - max_segments + 1]
            done.append(self.merge(group))

    def force_merge_deletes(self, pct_allowed: float = 10.0) -> list[dict]:
        """IndexWriter.forceMergeDeletes / TieredMergePolicy.
        forceMergeDeletesPctAllowed (TieredMergePolicy.kt:91): rewrite every
        segment whose deleted-doc percentage exceeds ``pct_allowed``
        (single-segment merges physically purge the deletes), then compact
        the global delete set down to the ids still referencing untouched
        segments — the anti-join shrinks accordingly."""
        deleted = self._deletes_df()
        if deleted is None:
            return []
        deleted = deleted.persist()
        done = []
        for s in list(self.manifest()["segments"]):
            seg_docs = self.spark.read.parquet(
                os.path.join(self.root, "segments", s["id"], "docs")
            )
            n_del = seg_docs.join(deleted, "doc_id", "semi").count()
            if n_del and 100.0 * n_del / max(1, s["n_docs"]) > pct_allowed:
                done.append(self.merge([s]))
        # consolidate: keep only delete ids that still hit a live segment
        m = self.manifest()
        live = None
        for s in m["segments"]:
            d = self.spark.read.parquet(
                os.path.join(self.root, "segments", s["id"], "docs")
            ).select("doc_id")
            live = d if live is None else live.unionByName(d)
        remaining = deleted.join(live, "doc_id", "semi")
        path = os.path.join(self.root, "deletes", f"del-compact-{m['generation']:05d}")
        remaining.select("doc_id").distinct().write.mode("overwrite").parquet(path)
        m["deletes"] = [{"path": path, "created_at": time.time()}]
        soft = self._soft_deletes_df()
        if soft is not None:
            # soft ids whose docs were physically purged (retention miss)
            # drop from the manifest too
            spath = os.path.join(self.root, "deletes", f"sdel-compact-{m['generation']:05d}")
            soft.join(live, "doc_id", "semi").select("doc_id").distinct().write.mode(
                "overwrite"
            ).parquet(spath)
            m["soft_deletes"] = [{"path": spath, "created_at": time.time()}]
        m["generation"] += 1
        self._write_manifest(m)
        deleted.unpersist()
        return done

    def add_indexes(self, *readers: "SegmentedReader") -> list[dict]:
        """IndexWriter.addIndexes(CodecReader...) (IndexWriter.kt:3040):
        re-index another index's LIVE documents through the standard add
        path — docIDs are reassigned against this writer's docBase, exactly
        like the reference's re-write form (the Directory fast path is a
        file copy + docBase remap; with delta-encoded doc cells ours would
        have to rewrite block payloads anyway, so the one honest path is
        the reader form)."""
        done = []
        for i, r in enumerate(readers):
            docs = r.index.docs
            if r.deleted is not None:
                docs = docs.join(r.deleted, "doc_id", "left_anti")
            rec = self.add_batch(
                docs.drop("doc_id"),
                batch_key=f"addindexes-{self.manifest()['generation']:05d}-{i}",
            )
            if rec:
                done.append(rec)
        return done

    # --------------------------------------------- snapshots / deletion policy
    def snapshot(self, manifest: dict | None = None, prefix: str = "snap") -> str:
        """SnapshotDeletionPolicy.kt: pin the CURRENT commit (or an explicit
        older ``manifest`` — the SearcherLifetimeManager record path) so its
        segment files survive later merges/purges. Returns the snapshot id;
        the pinned manifest copy lives in ``snapshots/`` and can be opened
        with ``reader(snapshot=...)`` for a true point-in-time view."""
        m = manifest if manifest is not None else self.manifest()
        snap_id = f"{prefix}-{m['generation']:05d}"
        os.makedirs(os.path.join(self.root, "snapshots"), exist_ok=True)
        path = os.path.join(self.root, "snapshots", snap_id + ".json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, path)
        return snap_id

    def release(self, snap_id: str):
        """SnapshotDeletionPolicy.release: un-pin; files become purgeable."""
        os.remove(os.path.join(self.root, "snapshots", snap_id + ".json"))

    def snapshots(self) -> list[str]:
        d = os.path.join(self.root, "snapshots")
        if not os.path.isdir(d):
            return []
        return sorted(f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json"))

    def _snapshot_manifest(self, snap_id: str) -> dict:
        with open(os.path.join(self.root, "snapshots", snap_id + ".json")) as f:
            return json.load(f)

    # --------------------------------------------------- two-phase commit
    # index/TwoPhaseCommit.kt + IndexWriter.prepareCommit/commit/rollback:
    # the working manifest (manifest.json) is the NRT view every mutation
    # updates; commit.json is the durable segments_N the two-phase protocol
    # promotes atomically. reader(committed=True) = DirectoryReader.open(
    # Directory) — only the last commit; the default reader stays the
    # open(IndexWriter) NRT view.
    def _commit_path(self) -> str:
        return os.path.join(self.root, "commit.json")

    def _pending_path(self) -> str:
        return os.path.join(self.root, "commit.pending.json")

    def prepare_commit(self, commit_data: dict | None = None) -> int:
        """First phase (TwoPhaseCommit.prepareCommit): freeze the CURRENT
        working state as the pending commit — all the expensive work (the
        segments themselves) already sits durably under ``segments/``, so
        this writes only the pending manifest (the fsync-without-rename of
        Lucene's prepareCommit). Mutations after prepare are NOT part of the
        eventual commit, exactly like the reference. ``commit_data`` is the
        setLiveCommitData userData map, stored in the commit."""
        if os.path.exists(self._pending_path()):
            raise RuntimeError(
                "prepareCommit was already called with no corresponding call to commit"
            )
        m = self.manifest()
        if commit_data is not None:
            m["commit_data"] = commit_data
        tmp = self._pending_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._pending_path())
        return int(m["generation"])

    def commit(self, commit_data: dict | None = None) -> int:
        """Second phase (TwoPhaseCommit.commit): promote the pending
        manifest to commit.json with one atomic rename — "very little work"
        per the contract. Without a prior :meth:`prepare_commit` this
        prepares and finishes in one call (IndexWriter.commit())."""
        if os.path.exists(self._pending_path()):
            if commit_data is not None:
                raise ValueError(
                    "commit_data cannot be changed on an already-prepared commit — "
                    "pass it to prepare_commit (setLiveCommitData must precede "
                    "prepareCommit in the reference, too)"
                )
        else:
            self.prepare_commit(commit_data)
        with open(self._pending_path()) as f:
            gen = int(json.load(f)["generation"])
        os.replace(self._pending_path(), self._commit_path())
        return gen

    def rollback(self) -> None:
        """TwoPhaseCommit.rollback / IndexWriter.rollback: discard every
        change since the last successful commit — the working manifest is
        restored from commit.json (or to empty if never committed), any
        pending commit is dropped, and segment directories the restored
        state no longer references are purged (snapshot pins still hold).

        Note: the restored manifest carries the last commit's ``commit_data``
        forward, so a later plain ``commit()`` re-commits it — the same
        behavior as Lucene, where a writer (re)opened from a commit point
        initializes liveCommitData from that commit's userData and keeps
        committing it until ``setLiveCommitData`` changes it. Pass fresh
        ``commit_data`` to ``prepare_commit``/``commit`` to replace it."""
        if os.path.exists(self._pending_path()):
            os.remove(self._pending_path())
        if os.path.exists(self._commit_path()):
            with open(self._commit_path()) as f:
                self._write_manifest(json.load(f))
        else:
            self._write_manifest(
                {"generation": 0, "segments": [], "deletes": [], "batches": {}}
            )
        self.purge_unreferenced()

    def last_commit(self) -> dict | None:
        """The last committed manifest (segments_N content), or None."""
        if not os.path.exists(self._commit_path()):
            return None
        with open(self._commit_path()) as f:
            return json.load(f)

    def purge_unreferenced(self) -> list[str]:
        """IndexDeletionPolicy enforcement (KeepOnlyLastCommitDeletionPolicy.kt
        + snapshot pins): delete segment directories referenced by neither
        the current manifest, the last commit / pending commit, nor any live
        snapshot. Merged-away segments stay on disk until this runs —
        snapshots keep them recoverable."""
        referenced = {s["id"] for s in self.manifest()["segments"]}
        for extra in (self.last_commit(),):
            if extra is not None:
                referenced |= {s["id"] for s in extra["segments"]}
        if os.path.exists(self._pending_path()):
            with open(self._pending_path()) as f:
                referenced |= {s["id"] for s in json.load(f)["segments"]}
        for snap_id in self.snapshots():
            referenced |= {s["id"] for s in self._snapshot_manifest(snap_id)["segments"]}
        removed = []
        seg_root = os.path.join(self.root, "segments")
        import shutil

        for d in sorted(os.listdir(seg_root)):
            if d not in referenced:
                shutil.rmtree(os.path.join(seg_root, d))
                removed.append(d)
        return removed

    def _deletes_df(self) -> DataFrame | None:
        m = self.manifest()
        if not m["deletes"]:
            return None
        out = None
        for d in m["deletes"]:
            df = self.spark.read.parquet(d["path"])
            out = df if out is None else out.unionByName(df)
        return out.distinct()

    def _soft_deletes_df(self) -> DataFrame | None:
        m = self.manifest()
        if not m.get("soft_deletes"):
            return None
        out = None
        for d in m["soft_deletes"]:
            df = self.spark.read.parquet(d["path"])
            out = df if out is None else out.unionByName(df)
        return out.distinct()


class SegmentedReader:
    """Point-in-time composite reader over a manifest generation
    (``index/DirectoryReader.kt`` / ``BaseCompositeReader.kt``)."""

    def __init__(
        self, spark, root, manifest, text_col, key_cols,
        include_soft_deleted: bool = False, prune_query=None,
    ):
        self.generation = manifest["generation"]
        self.manifest = manifest  # retained for lifetime pinning (record())
        segs = manifest["segments"]
        # Bloom segment pruning (BloomFilteringPostingsFormat consult): a
        # pruned segment contributes stats + term_dict (score parity with
        # the unpruned reader) but NOT postings/docs — its files never
        # enter any scan. If every segment prunes, one is kept so the
        # composite still has a schema; it provably matches nothing.
        self.pruned_segments: list[str] = []
        skip: set[str] = set()
        if prune_query is not None:
            from lucene_kmp_spark.search.query import rewrite_query
            from lucene_kmp_spark.util.bloom import FuzzySet, segment_may_match

            pq = rewrite_query(prune_query)
            for s in segs:
                bpath = os.path.join(root, "segments", s["id"], "bloom.bin")
                if not (s.get("bloom") and os.path.exists(bpath)):
                    continue
                with open(bpath, "rb") as f:
                    fz = FuzzySet.deserialize(f.read())

                def _contains(t, _fz=fz):
                    return bool(_fz.contains_batch([t.encode("utf-8")])[0])

                if not segment_may_match(pq, _contains):
                    skip.add(s["id"])
            if len(skip) == len(segs) and segs:
                skip.discard(segs[0]["id"])
            self.pruned_segments = sorted(skip)
        docs = postings = term_dict = None
        max_doc = doc_count = sum_ttf = sum_df = 0
        for s in segs:
            base = os.path.join(root, "segments", s["id"])
            # select the stats the composite re-agg keeps: segments written
            # before/after the n_buckets column coexist in one index
            t = spark.read.parquet(os.path.join(base, "term_dict")).select(
                "term", "df", "ttf"
            )
            term_dict = t if term_dict is None else term_dict.unionByName(t)
            st = s["stats"]
            max_doc += st["max_doc"]
            doc_count += st["doc_count"]
            sum_ttf += st["sum_total_term_freq"]
            sum_df += st["sum_doc_freq"]
            if s["id"] in skip:
                continue
            d = spark.read.parquet(os.path.join(base, "docs"))
            p = spark.read.parquet(os.path.join(base, "postings")).withColumn(
                "segment_id", F.lit(s["id"])
            )
            docs = d if docs is None else docs.unionByName(d)
            postings = p if postings is None else postings.unionByName(p)
        if docs is None:
            raise ValueError("empty index: no segments committed yet")
        # doc-values update overlay (IndexWriter.updateNumericDocValue):
        # latest-generation value per (doc, field) shadows the stored column
        if manifest.get("dv_updates"):
            docs = _apply_dv_overlay(spark, docs, manifest["dv_updates"])
        term_dict = term_dict.groupBy("term").agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        num_terms = term_dict.count()
        self.index = InvertedIndex(
            spark=spark,
            field_name=text_col,
            docs=docs,
            postings=postings,
            term_dict=term_dict.persist(),
            stats=IndexStats(max_doc, doc_count, sum_ttf, sum_df, num_terms),
            key_cols=tuple(key_cols),
        )
        # liveDocs: deletes anti-joined at query time; soft deletes join the
        # live filter unless this is the unwrapped (include_soft_deleted) view
        def _load(entries):
            out = None
            for dd in entries:
                df = spark.read.parquet(dd["path"])
                out = df if out is None else out.unionByName(df)
            return out.distinct() if out is not None else None

        hard = _load(manifest["deletes"])
        self.soft_deleted: DataFrame | None = _load(manifest.get("soft_deletes", []))
        self.deleted: DataFrame | None = hard
        if not include_soft_deleted and self.soft_deleted is not None:
            self.deleted = (
                self.soft_deleted
                if self.deleted is None
                else self.deleted.unionByName(self.soft_deleted).distinct()
            )
        if self.deleted is not None:
            self.deleted = self.deleted.persist()

    def searcher(self, **kw):
        from lucene_kmp_spark.search.executor import IndexSearcher

        return IndexSearcher(self.index, live_filter=self.deleted, **kw)


# --------------------------------------------------------- TwoPhaseCommitTool
class PrepareCommitFailError(IOError):
    """index/TwoPhaseCommitTool.kt PrepareCommitFailException."""

    def __init__(self, cause: BaseException, obj):
        super().__init__(f"prepareCommit() failed on {obj!r}")
        self.__cause__ = cause
        self.obj = obj


class CommitFailError(IOError):
    """index/TwoPhaseCommitTool.kt CommitFailException."""

    def __init__(self, cause: BaseException, obj):
        super().__init__(f"commit() failed on {obj!r}")
        self.__cause__ = cause
        self.obj = obj


def execute_two_phase(*objects) -> None:
    """TwoPhaseCommitTool.execute: run a 2-phase commit over several
    participants (anything with prepare_commit/commit/rollback — e.g. a
    :class:`SegmentedIndexWriter` plus a side store, the cross-system
    atomicity the protocol exists for). All participants prepare first; only
    if every prepare succeeds do they commit. Any failure in either phase
    rolls back EVERY participant (rollback exceptions swallowed, like the
    reference) and raises :class:`PrepareCommitFailError` /
    :class:`CommitFailError`. ``None`` entries are skipped."""

    def _rollback_all():
        for tpc in objects:
            if tpc is not None:
                try:
                    tpc.rollback()
                except BaseException:
                    pass  # ensure every participant gets rolled back

    for phase, err in (("prepare_commit", PrepareCommitFailError), ("commit", CommitFailError)):
        tpc = None
        try:
            for obj in objects:
                tpc = obj
                if obj is not None:
                    getattr(obj, phase)()
        except BaseException as t:
            _rollback_all()
            raise err(t, tpc) from t
