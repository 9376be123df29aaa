"""SPIMI-style distributed inverted-index build (the Lucene "write path").

Dataflow (reference analog in parens — see SURVEY.md §2.2, §3.2):

1. tokenize: Arrow ``mapInPandas`` over (doc_id, text) emitting one row per
   (doc, term): ``(doc_id, term, tf, positions, norm)``
   (``index/FreqProxTermsWriterPerField.kt:64-110`` in-RAM invert; the norm is
   ``SmallFloat.intToByte4(postFilterTokenCount)`` per
   ``search/similarities/Similarity.kt:134-144``)
2. distributed per-term rank WITHOUT a per-term single reducer (hot-term skew:
   "the" can appear in >50% of 10^12 docs):
   a. bucket = doc_id >> BUCKET_BITS (8,192-doc buckets)
   b. counts per (term,bucket)    — map-side-combined agg (metadata-scale)
   c. prefix-sum per term over buckets (window over metadata rows only)
   d. join counts back, local rank within the bounded (term,bucket) group
   e. global rank = bucket offset + local rank; block_id = rank // 128
   (this replaces Lucene's single-threaded term sort at flush,
   ``index/TermsHashPerField.kt:76-78``, with a salted two-stage layout)
3. block encode: group by (term, block_id) — groups are ≤128 postings by
   construction, perfectly distributed — then delta+varint pack docIDs,
   varint freqs/positions, 1 byte/doc norms (denormalized .nvd so queries
   never join a norms table), and per-block competitive impact pairs
   (``codecs/CompetitiveImpactAccumulator.kt:14-70``) for block-max pruning.
   Block size 128 matches ``codecs/lucene101/ForUtil.kt:121``.
4. term_dict: ``(term, df, ttf)`` (``codecs/lucene90/blocktree`` stats)
5. global stats: maxDoc/docCount/sumTotalTermFreq/sumDocFreq — the one
   global computation, broadcast at query time
   (``search/IndexSearcher.kt:932-953``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_kmp_spark.analysis import analyze, analyze_offsets
from lucene_kmp_spark.util.packing import block_encode, delta_block_encode
from lucene_kmp_spark.util.smallfloat import int_to_byte4

BLOCK_SIZE = 128          # docs per posting block (ForUtil.kt:121)
BUCKET_BITS = 13          # 8,192-doc rank buckets for the skew-safe global rank
LEVEL1_FACTOR = 32        # blocks per level-1 skip entry (Lucene101PostingsFormat.kt:484-487)

TOKENS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("term", StringType()),
        StructField("tf", IntegerType()),
        StructField("positions", ArrayType(IntegerType())),
        StructField("norm", IntegerType()),  # unsigned byte 0..255
        StructField("is_first", IntegerType()),  # 1 on the doc's first term row
        # OFFSETS/PAYLOADS flags (index/PostingsEnum.kt:12-76): aligned with
        # ``positions``; null columns when the index_options don't store them
        StructField("starts", ArrayType(IntegerType())),
        StructField("ends", ArrayType(IntegerType())),
        StructField("payloads", ArrayType(IntegerType())),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("block_id", LongType()),  # (bucket << 16) | slice — doc-order monotone
        StructField("num_docs", IntegerType()),
        StructField("min_doc_id", LongType()),
        StructField("max_doc_id", LongType()),
        StructField("max_tf", IntegerType()),
        StructField("tf_sum", LongType()),
        StructField("doc_ids_enc", BinaryType()),
        StructField("freqs_enc", BinaryType()),
        StructField("norms_enc", BinaryType()),
        StructField("positions_enc", BinaryType()),
        StructField("impact_tfs", ArrayType(IntegerType())),
        StructField("impact_norms", ArrayType(IntegerType())),
        # optional OFFSETS cell: per position, interleaved
        # (start-delta-within-doc, end-start) varint/FOR pairs; null when the
        # index was built without offsets (IndexOptions
        # DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS analog)
        StructField("offsets_enc", BinaryType()),
        # optional PAYLOADS cell: one int per position (PostingsEnum.PAYLOADS)
        StructField("payloads_enc", BinaryType()),
    ]
)


def tokenize_to_tokens(
    docs: DataFrame,
    text_col: str = "text",
    stop_words: tuple[str, ...] = (),
    analyzer=None,
    index_options: str = "positions",
    payload_fn=None,
    analyzer_col: str | None = None,
) -> DataFrame:
    """docs(doc_id, text, ...) -> one row per (doc, distinct term).

    ``analyzer`` is the pluggable-Analyzer surface (SURVEY.md §2.4 last row):
    any picklable ``(text) -> (terms, positions, length)`` callable replaces
    the StandardAnalyzer chain inside the same Arrow UDF; norms/positions
    semantics are preserved whatever the token stream.

    ``index_options`` mirrors Lucene's IndexOptions ladder
    (``index/IndexOptions.kt``): ``"positions"`` (the default) or
    ``"offsets"`` which additionally stores per-occurrence character offsets
    (DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS). ``payload_fn(term, position,
    start, end) -> int`` stores one NON-NEGATIVE integer payload per occurrence
    (PostingsEnum.PAYLOADS analog; Lucene payloads are arbitrary bytes — the
    int surface covers the scoring use, PayloadScoreQuery-style). Offsets
    with a custom analyzer require the analyzer to return 5-tuples
    ``(terms, positions, starts, ends, length)``.

    ``analyzer_col`` names a column routed to the analyzer as a second
    argument — ``analyzer(text, row_value)`` — the per-document analyzer
    dispatch a multilingual corpus needs (see
    ``analysis/registry.py multilingual_analyzer``); the reference's
    per-field Analyzer choice (PerFieldAnalyzerWrapper) is per-COLUMN here
    for free, so this covers the per-ROW axis."""
    stop_set = frozenset(stop_words) if stop_words else None
    custom = analyzer
    want_offsets = index_options == "offsets" or payload_fn is not None
    pfn = payload_fn

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "term", "tf", "positions", "norm",
                                   "is_first", "starts", "ends", "payloads")}
            route = pdf[analyzer_col].values if analyzer_col else None
            for row_i, (doc_id, text) in enumerate(
                zip(pdf["doc_id"].values, pdf[text_col].values)
            ):
                if text is None:
                    continue
                starts = ends = None
                if custom is not None:
                    res = custom(text, route[row_i]) if route is not None else custom(text)
                    if want_offsets:
                        terms, positions, starts, ends, _length = res
                    else:
                        terms, positions, _length = res[0], res[1], res[-1]
                elif want_offsets:
                    terms, positions, starts, ends, _length = analyze_offsets(
                        text, stop_set=stop_set
                    )
                else:
                    terms, positions, _length = analyze(text, stop_set=stop_set)
                if not terms:
                    continue
                # discountOverlaps=true norm semantics (Similarity.kt:134-144):
                # count position-incrementing tokens only, i.e. distinct
                # positions — identical to len(terms) for the standard chain,
                # but overlap analyzers (ngram/shingle keep_unigrams, posIncr=0)
                # must not inflate the field length
                norm = int_to_byte4(len(set(positions)))
                acc: dict[str, list[int]] = {}
                occ: dict[str, list[tuple[int, int]]] = {}
                for i, (t, p) in enumerate(zip(terms, positions)):
                    acc.setdefault(t, []).append(p)
                    if want_offsets:
                        occ.setdefault(t, []).append((starts[i], ends[i]))
                first = 1
                for t, plist in acc.items():
                    out["doc_id"].append(doc_id)
                    out["term"].append(t)
                    out["tf"].append(len(plist))
                    out["positions"].append(plist)
                    out["norm"].append(norm)
                    out["is_first"].append(first)
                    if want_offsets:
                        o = occ[t]
                        out["starts"].append([s for s, _e in o])
                        out["ends"].append([e for _s, e in o])
                        if pfn is not None:
                            pays = [pfn(t, p, s, e) for p, (s, e) in zip(plist, o)]
                            if any(v < 0 for v in pays):
                                # fail at the API boundary, not deep inside
                                # the block codec's non-negative requirement
                                raise ValueError(
                                    f"payload_fn returned a negative payload for term "
                                    f"{t!r} (doc {doc_id}): payloads must be non-negative ints"
                                )
                            out["payloads"].append(pays)
                        else:
                            out["payloads"].append(None)
                    else:
                        out["starts"].append(None)
                        out["ends"].append(None)
                        out["payloads"].append(None)
                    first = 0
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "term": pd.Series(out["term"], dtype="object"),
                    "tf": pd.Series(out["tf"], dtype="int32"),
                    "positions": pd.Series(out["positions"], dtype="object"),
                    "norm": pd.Series(out["norm"], dtype="int32"),
                    "is_first": pd.Series(out["is_first"], dtype="int32"),
                    "starts": pd.Series(out["starts"], dtype="object"),
                    "ends": pd.Series(out["ends"], dtype="object"),
                    "payloads": pd.Series(out["payloads"], dtype="object"),
                }
            )

    cols = ["doc_id", text_col] + ([analyzer_col] if analyzer_col else [])
    return docs.select(*cols).mapInPandas(gen, schema=TOKENS_SCHEMA)


def _competitive_impacts(tfs: np.ndarray, norms: np.ndarray):
    """Pareto frontier of (tf, norm): max tf per norm, dominated pairs pruned
    (CompetitiveImpactAccumulator.kt:14-70)."""
    best: dict[int, int] = {}
    for t, n in zip(tfs.tolist(), norms.tolist()):
        if best.get(n, 0) < t:
            best[n] = t
    out_t, out_n = [], []
    max_tf = 0
    for n in sorted(best):
        t = best[n]
        if t > max_tf:
            out_t.append(t)
            out_n.append(n)
            max_tf = t
    return out_t, out_n


def _encode_group(
    rows, term, bucket, doc_ids, tfs, norms, pos_lists, off_lists=None, pay_lists=None
):
    """Slice one sorted (term, bucket) posting run into <=128-doc blocks and
    encode them. block_id = (bucket << 16) | slice — monotone in doc order.

    ``off_lists``: per doc, a (starts, ends) pair of per-occurrence offset
    lists (or None to skip the OFFSETS cell); ``pay_lists``: per doc, a list
    of one int payload per occurrence (or None)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64)
    n = len(doc_ids)
    has_off = off_lists is not None and any(o is not None for o in off_lists)
    has_pay = pay_lists is not None and any(p is not None for p in pay_lists)
    for j, start in enumerate(range(0, n, BLOCK_SIZE)):
        end = min(start + BLOCK_SIZE, n)
        d, t_, nm = doc_ids[start:end], tfs[start:end], norms[start:end]
        # per-doc position deltas, vectorized: concatenate the block's
        # position lists, first-difference, then restore each list's first
        # element (the delta chain restarts per doc)
        pos_sl = pos_lists[start:end]
        lens = np.fromiter((len(pl) for pl in pos_sl), dtype=np.int64,
                           count=end - start)
        total = int(lens.sum())
        if total:
            cat = np.concatenate(
                [np.asarray(pl, dtype=np.int64) for pl in pos_sl if len(pl)]
            )
            flat = np.empty_like(cat)
            flat[0] = cat[0]
            np.subtract(cat[1:], cat[:-1], out=flat[1:])
            starts_idx = np.cumsum(lens) - lens  # first index of each list
            starts_idx = starts_idx[lens > 0]
            flat[starts_idx] = cat[starts_idx]
        else:
            flat = np.zeros(0, dtype=np.int64)
        it, inorm = _competitive_impacts(t_, nm)
        rows["term"].append(term)
        rows["block_id"].append((int(bucket) << 16) | j)
        rows["num_docs"].append(end - start)
        rows["min_doc_id"].append(int(d[0]))
        rows["max_doc_id"].append(int(d[-1]))
        rows["max_tf"].append(int(t_.max()))
        rows["tf_sum"].append(int(t_.sum()))
        rows["doc_ids_enc"].append(delta_block_encode(d))
        rows["freqs_enc"].append(block_encode(t_))
        rows["norms_enc"].append(nm.astype(np.uint8).tobytes())
        rows["positions_enc"].append(block_encode(flat, "vf"))
        rows["impact_tfs"].append(it)
        rows["impact_norms"].append(inorm)
        if has_off:
            # interleaved (start-delta-within-doc, length) per occurrence —
            # start offsets are monotone per doc so deltas stay small, and
            # token lengths are tiny; both compress well under varint/FOR
            oflat = []
            for starts_l, ends_l in off_lists[start:end]:
                prev = 0
                for s, e in zip(starts_l, ends_l):
                    oflat.append(s - prev)
                    oflat.append(e - s)
                    prev = s
            rows["offsets_enc"].append(block_encode(np.array(oflat, dtype=np.int64), "vf"))
        else:
            rows["offsets_enc"].append(None)
        if has_pay:
            pflat = [v for pl in pay_lists[start:end] for v in pl]
            rows["payloads_enc"].append(block_encode(np.array(pflat, dtype=np.int64), "vf"))
        else:
            rows["payloads_enc"].append(None)


def build_postings(
    tokens: DataFrame, skew_safe: bool = True, with_offsets: bool = False
) -> DataFrame:
    """tokens -> blocked postings in ONE shuffle + one Arrow pass.

    ``with_offsets=False`` (the default, positions-only index) keeps the
    OFFSETS/PAYLOADS columns OUT of the shuffle and out of the per-row
    grouping work entirely — the flags must not tax the common path
    (measured: carrying the three null columns cost ~1.8x encode time).

    Layout: hash-repartition by (term, bucket=doc_id>>13) — the salted-term
    shuffle that bounds any reducer's share of a hot term to 8,192 docs —
    then sort within partitions and stream-slice each (term, bucket) run
    into <=128-doc encoded blocks. A term's postings are MANY rows, never one
    giant row, so 'the' at 10^12 docs is ~10^8 independent block rows spread
    across the cluster. (``skew_safe=False`` keeps a per-term window variant
    — single reducer per term — used only to cross-check equivalence.)"""
    if not skew_safe:
        w = Window.partitionBy("term").orderBy("doc_id")
        ranked = tokens.withColumn("grank", F.row_number().over(w) - 1)
        blocks = (
            ranked.withColumn("bucket", F.lit(0))
            .withColumn("slice", (F.col("grank") / BLOCK_SIZE).cast("long"))
            .groupBy("term", "slice")
            .agg(
                F.collect_list(
                    F.struct("doc_id", "tf", "norm", "positions", "starts", "ends", "payloads")
                ).alias("entries")
            )
        )

        def gen_simple(batches):
            for pdf in batches:
                rows = {k: [] for k in POSTINGS_SCHEMA.fieldNames()}
                for term, sl, entries in zip(
                    pdf["term"].values, pdf["slice"].values, pdf["entries"].values
                ):
                    entries = sorted(entries, key=lambda e: e["doc_id"])
                    _encode_group(
                        rows,
                        term,
                        0,
                        [e["doc_id"] for e in entries],
                        [e["tf"] for e in entries],
                        [e["norm"] for e in entries],
                        [e["positions"] for e in entries],
                        [
                            (e["starts"], e["ends"]) if e["starts"] is not None else None
                            for e in entries
                        ],
                        [e["payloads"] for e in entries],
                    )
                    rows["block_id"][-1] = int(sl)  # dense block numbering
                yield pd.DataFrame(rows)

        return blocks.mapInPandas(gen_simple, schema=POSTINGS_SCHEMA)

    base_cols = ["term", "doc_id", "tf", "norm", "positions"]
    if with_offsets:
        base_cols += ["starts", "ends", "payloads"]
    parted = (
        tokens.select(*base_cols)
        .withColumn("bucket", F.shiftright("doc_id", BUCKET_BITS))
        .repartition("term", "bucket")
        .sortWithinPartitions("term", "bucket", "doc_id")
    )

    def gen(batches):
        cur_key = None
        cur = None  # (doc_ids, tfs, norms, pos_lists[, off_lists, pay_lists])

        def flush(rows):
            nonlocal cur_key, cur
            if cur_key is not None and cur[0]:
                _encode_group(rows, cur_key[0], cur_key[1], *cur)
            cur_key, cur = None, None

        for pdf in batches:
            rows = {k: [] for k in POSTINGS_SCHEMA.fieldNames()}
            terms = pdf["term"].values
            buckets = pdf["bucket"].values
            doc_ids = pdf["doc_id"].values
            tfs = pdf["tf"].values
            norms = pdf["norm"].values
            poss = pdf["positions"].values
            if with_offsets:
                starts_v = pdf["starts"].values
                ends_v = pdf["ends"].values
                pays_v = pdf["payloads"].values
            n = len(pdf)
            if n == 0:
                continue
            # group-change boundaries (sorted input), vectorized: hash the
            # term column to int codes once (C loop) instead of a Python
            # string compare per row
            codes = pd.factorize(terms)[0]
            change = np.empty(n, dtype=bool)
            change[0] = True
            np.logical_or(
                codes[1:] != codes[:-1],
                buckets[1:] != buckets[:-1],
                out=change[1:],
            )
            g_starts = np.flatnonzero(change)
            g_ends = np.append(g_starts[1:], n)
            for i, j in zip(g_starts.tolist(), g_ends.tolist()):
                key = (terms[i], int(buckets[i]))
                if cur_key is not None and key != cur_key:
                    flush(rows)
                if cur_key is None:
                    cur_key, cur = key, (
                        ([], [], [], [], [], []) if with_offsets else ([], [], [], [])
                    )
                cur[0].extend(doc_ids[i:j].tolist())
                cur[1].extend(tfs[i:j].tolist())
                cur[2].extend(norms[i:j].tolist())
                cur[3].extend(list(poss[i:j]))
                if with_offsets:
                    cur[4].extend(
                        (s, e) if s is not None else None
                        for s, e in zip(starts_v[i:j], ends_v[i:j])
                    )
                    cur[5].extend(list(pays_v[i:j]))
            if rows["term"]:
                yield pd.DataFrame(rows)
        rows = {k: [] for k in POSTINGS_SCHEMA.fieldNames()}
        flush(rows)
        if rows["term"]:
            yield pd.DataFrame(rows)

    return parted.mapInPandas(gen, schema=POSTINGS_SCHEMA)


@dataclass
class IndexStats:
    max_doc: int
    doc_count: int
    sum_total_term_freq: int
    sum_doc_freq: int
    num_terms: int

    @property
    def avgdl(self) -> float:
        return self.sum_total_term_freq / max(self.doc_count, 1)

    def to_dict(self):
        return self.__dict__.copy()


@dataclass
class InvertedIndex:
    """A queryable index: postings + term_dict + docs + global stats.

    Plays the role of Lucene's point-in-time IndexReader over a commit
    (``index/DirectoryReader.kt``): ``docs`` is the stored-fields row store,
    ``postings`` the .doc/.pos/.nvd analog, ``term_dict`` the blocktree stats,
    ``stats`` the broadcast CollectionStatistics.
    """

    spark: SparkSession
    field_name: str
    docs: DataFrame        # original columns + doc_id
    postings: DataFrame    # POSTINGS_SCHEMA
    term_dict: DataFrame   # term, df, ttf, num_blocks
    stats: IndexStats
    key_cols: tuple = ("doc_id",)
    extra: dict = field(default_factory=dict)
    norms: DataFrame | None = None  # (doc_id, norm byte) — the .nvd analog (1 row/doc)
    # per-doc forward index (doc_id, term, tf, positions[, starts, ends]) —
    # the Lucene90TermVectorsFormat analog, doc_id-sorted for pruned fetch
    term_vectors: DataFrame | None = None

    def unpersist(self):
        for df in (self.postings, self.term_dict, self.norms,
                   self.term_vectors, self.docs):
            try:
                if df is not None:
                    df.unpersist()
            except Exception:
                pass

    def write(self, path: str, term_sorted: bool = True, storage_format: str = "parquet"):
        """Persist the index tables. ``term_sorted`` range-partitions + sorts
        the postings by (term, block_id) so a TermQuery's ``term = 'x'``
        predicate prunes whole files/row-groups via columnar min/max stats —
        the blocktree term-dictionary lookup (``codecs/lucene90/blocktree``)
        becomes storage-level pruning instead of a scan.

        ``storage_format`` is any Spark DataSource V1/V2 format with min/max
        column statistics: ``"parquet"`` (default), ``"orc"`` (same pruning,
        tested in-container), or ``"iceberg"`` on a cluster with the Iceberg
        runtime jars (path-based hadoop tables; Iceberg additionally gives
        snapshot-isolation commits — the segment manifest in
        ``index/segments.py`` provides the same semantics over plain files).
        The choice is recorded in the manifest so ``read`` is format-blind."""
        fmt = storage_format

        def _save(df, sub):
            df.write.mode("overwrite").format(fmt).save(os.path.join(path, sub))

        _save(self.docs, "docs")
        postings = self.postings
        if term_sorted:
            postings = postings.repartitionByRange("term", "block_id").sortWithinPartitions(
                "term", "block_id"
            )
        _save(postings, "postings")
        _save(self.term_dict, "term_dict")
        if self.norms is not None:
            _save(self.norms, "norms")
        if self.term_vectors is not None:
            _save(self.term_vectors, "term_vectors")
        manifest = {
            "storage_format": fmt,
            "field": self.field_name,
            "key_cols": list(self.key_cols),
            "stats": self.stats.to_dict(),
            "format_version": 2,
            "index_options": self.extra.get("index_options", "positions"),
            "has_payloads": bool(self.extra.get("has_payloads", False)),
            "index_sort": [list(p) for p in self.extra["index_sort"]]
            if self.extra.get("index_sort")
            else None,
            "bucketed_blocks": bool(self.extra.get("bucketed_blocks", True)),
        }
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @staticmethod
    def read(spark: SparkSession, path: str) -> "InvertedIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        fmt = manifest.get("storage_format", "parquet")
        norms_path = os.path.join(path, "norms")
        tv_path = os.path.join(path, "term_vectors")

        def _load(sub):
            return spark.read.format(fmt).load(os.path.join(path, sub))

        return InvertedIndex(
            spark=spark,
            field_name=manifest["field"],
            docs=_load("docs"),
            postings=_load("postings"),
            term_dict=_load("term_dict"),
            stats=IndexStats(**manifest["stats"]),
            key_cols=tuple(manifest["key_cols"]),
            norms=_load("norms") if os.path.isdir(norms_path) else None,
            term_vectors=_load("term_vectors") if os.path.isdir(tv_path) else None,
            extra={
                "index_options": manifest.get("index_options", "positions"),
                "has_payloads": manifest.get("has_payloads", False),
                "index_sort": tuple((c, bool(a)) for c, a in manifest["index_sort"])
                if manifest.get("index_sort")
                else None,
                "bucketed_blocks": bool(manifest.get("bucketed_blocks", True)),
            },
        )


def build_index(
    docs_with_ids: DataFrame,
    text_col: str = "text",
    stop_words: tuple[str, ...] = (),
    skew_safe: bool = True,
    cache: bool = True,
    cache_tokens: bool = True,
    serve_partitions: int | None = None,
    analyzer=None,
    index_options: str = "positions",
    payload_fn=None,
    term_vectors: bool = False,
    index_sort: tuple | None = None,
    analyzer_col: str | None = None,
) -> InvertedIndex:
    """Build an InvertedIndex from a DataFrame that already has a ``doc_id``
    column (use ``assign_doc_ids`` first for keyed corpora).

    Parallelism split: the BUILD runs at ``spark.sql.shuffle.partitions``
    (size to input bytes / 128MB, or ≥2x cores); the finished index tables are
    coalesced to ``serve_partitions`` before caching so each query UDF stage
    launches few tasks over the (much smaller) index — big task counts on
    small index tables just multiply Python worker startup."""
    spark = docs_with_ids.sparkSession
    if cache:
        # the docs table is every stored-fields read (hydrate, grouping,
        # facets, sort) — when it is a DERIVED plan (assign_doc_ids runs
        # two Python stages + a join), leaving it lazy re-executes that
        # chain inside EVERY query that touches docs. The max_doc count
        # below materializes the persist, so the build pays it exactly
        # once. (Parquet/Iceberg-backed docs make this a cheap no-op: the
        # cache just pins the scan.)
        docs_with_ids = docs_with_ids.persist()
    max_doc = docs_with_ids.count()

    # tokens are NOT cached by default: the raw token stream (with position
    # arrays) is the largest intermediate, and caching it costs more in
    # memory pressure than the one extra (perfectly parallel) tokenize pass
    # the doc_count computation needs
    tokens = tokenize_to_tokens(
        docs_with_ids,
        text_col=text_col,
        stop_words=stop_words,
        analyzer=analyzer,
        index_options=index_options,
        payload_fn=payload_fn,
        analyzer_col=analyzer_col,
    )
    if cache_tokens:
        tokens = tokens.persist()

    postings = build_postings(
        tokens,
        skew_safe=skew_safe,
        with_offsets=(index_options == "offsets" or payload_fn is not None),
    )
    if serve_partitions is None:
        # auto: a small index served at shuffle-partition width pays a task
        # launch (plus a Python worker handoff) per partition per query for
        # no scan parallelism it can use — measured 28-34% of q_term/
        # q_phrase latency at 100k docs. One serve partition per ~50k docs
        # (floor 4) keeps large corpora at full width: the rule only ever
        # NARROWS below the shuffle setting when the corpus is small.
        # Gated on ``cache`` — the expected-reuse signal: narrowing is a
        # serve-time optimization amortized over many queries, but it adds
        # repartition jobs to the BUILD, and for an ephemeral build-once-
        # query-once index (cache=False) those jobs cost more than the one
        # query saves (same-epoch interleaved A/B at sf0.1: narrowing off
        # was 17% faster on the offsets-index+passages row and 12% on the
        # CJK-analyzer build).
        build_width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        # floor 8 keeps enough scan parallelism for rows-heavy queries
        # (facets/grouping aggregate whole match sets; at width 4 their
        # decode serialized and cost MORE than the task overhead saved)
        auto = max(min(8, build_width), max_doc // 50_000)
        serve_partitions = auto if (cache and auto < build_width) else 0
    if serve_partitions:
        # repartition, not coalesce: coalesce would propagate the narrow
        # width back INTO the encode stage and serialize the build; the
        # extra shuffle moves only the compact encoded blocks
        postings = postings.repartition(serve_partitions)
    if cache:
        postings = postings.persist()

    # term_dict + collection stats derive from BLOCK METADATA (tiny), not a
    # second shuffle over raw tokens (codecs/lucene90/blocktree per-term stats)
    term_dict = postings.groupBy("term").agg(
        F.sum("num_docs").alias("df"),
        F.sum("tf_sum").alias("ttf"),
        # occupied 8,192-doc windows (bucket = block_id >> 16): the
        # index-resident (term, window) presence metadata driving the
        # conjunction window-prefilter gate — a clustered term (entity
        # local to a few conversations) has n_buckets << df
        F.countDistinct(F.shiftright("block_id", 16)).alias("n_buckets"),
    )
    if serve_partitions:
        # same serve-width argument as postings: per-query stats lookups
        # launch one task per partition of the cached term_dict
        term_dict = term_dict.repartition(serve_partitions)
    if cache:
        term_dict = term_dict.persist()
    agg = term_dict.agg(
        F.sum("df").alias("sum_df"),
        F.sum("ttf").alias("sum_ttf"),
        F.count("*").alias("num_terms"),
    ).collect()[0]
    # standalone norms table (the .nvd analog, Lucene90NormsFormat): 1 byte/doc,
    # needed by cross-field scorers (MultiNormsLeafSimScorer) that must see a
    # doc's field length even for fields where the query term is absent.
    # Materialized while tokens are cached so it never re-tokenizes.
    norms = tokens.filter(F.col("is_first") == 1).select("doc_id", "norm")
    if serve_partitions:
        norms = norms.repartition(serve_partitions)
    norms = norms.persist()
    # docs with >=1 indexed term: narrow count over the per-doc marker rows
    doc_count = norms.count()

    # term vectors (storeTermVectors=true analog, Lucene90TermVectorsFormat):
    # the per-doc forward index is the token table itself, re-keyed by doc_id
    # (range-partition + sort) so a doc_id predicate prunes files/row-groups —
    # the .tvx doc-pointer lookup as storage pruning. Materialized while the
    # token stream is still cached (no extra tokenize pass).
    tv = None
    if term_vectors:
        tv_cols = ["doc_id", "term", "tf", "positions"]
        if index_options == "offsets":
            tv_cols += ["starts", "ends"]
        tv = (
            tokens.select(*tv_cols)
            .repartitionByRange("doc_id")
            .sortWithinPartitions("doc_id")
            .persist()
        )
        tv.count()

    stats = IndexStats(
        max_doc=max_doc,
        doc_count=doc_count,
        sum_total_term_freq=int(agg["sum_ttf"] or 0),
        sum_doc_freq=int(agg["sum_df"] or 0),
        num_terms=int(agg["num_terms"] or 0),
    )
    if cache_tokens:
        tokens.unpersist()
    return InvertedIndex(
        spark=spark,
        field_name=text_col,
        docs=docs_with_ids,
        postings=postings,
        term_dict=term_dict,
        stats=stats,
        norms=norms,
        term_vectors=tv,
        extra={
            "index_options": index_options,
            "has_payloads": payload_fn is not None,
            # setIndexSort metadata (SegmentInfo.indexSort analog): docIDs
            # were assigned by assign_doc_ids_sorted over these
            # (column, ascending) pairs; search_sorted early-terminates when
            # the query sort is a prefix of it
            "index_sort": tuple((c, bool(a)) for c, a in index_sort) if index_sort else None,
            # block_id = (doc-order bucket << 16) | slice only on the
            # default path; the skew_safe=False cross-check variant numbers
            # slices per term, so window-keyed optimizations (the
            # conjunction window prefilter) must not fire over it
            "bucketed_blocks": bool(skew_safe),
        },
    )
