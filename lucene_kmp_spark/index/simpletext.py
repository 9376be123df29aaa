"""SimpleText codec analog — a fully human-readable, plain-text index
format for debugging (``codecs/simpletext/SimpleTextPostingsFormat.kt``
and siblings: "FOR RECREATIONAL USE ONLY", any text editor can inspect
the postings).

The reference writes a stateful sectioned file (``field``/``term``/
``  doc``/``    freq``/``    pos`` lines). A stateful format cannot be
parsed partition-parallel, so this codec keeps the same information but
makes every line SELF-CONTAINED::

    term \t doc_id \t tf \t norm \t pos1,pos2,...[ \t s1:e1,s2:e2,...][ \t pay1,pay2,...]

— one line per (term, doc) posting with absolute positions, sorted within
each written file; indexes built with ``index_options="offsets"`` append a
start:end character-offset pair per occurrence, and payload indexes append
one int payload per occurrence (the same OFFSETS/PAYLOADS ladder the
reference's SimpleTextFieldsWriter round-trips with its ``s``/``e``/``pay``
lines). That preserves the codec's whole point (grep-able, eyeball-able
postings) while loading stays an embarrassingly parallel line-parse + the
standard one-shuffle block re-encode. Stored fields dump as JSON lines
(SimpleTextStoredFieldsFormat analog); stats and the term dictionary are
re-derived on open exactly like the binary path, so a hand-edited text
index still opens consistently.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lucene_kmp_spark.index.builder import (
    IndexStats,
    InvertedIndex,
    build_postings,
)

_LINES_SCHEMA = StructType([StructField("value", StringType())])

_PARSED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("term", StringType()),
        StructField("tf", IntegerType()),
        StructField("positions", ArrayType(IntegerType())),
        StructField("norm", IntegerType()),
        StructField("is_first", IntegerType()),
        StructField("starts", ArrayType(IntegerType())),
        StructField("ends", ArrayType(IntegerType())),
        StructField("payloads", ArrayType(IntegerType())),
    ]
)


def write_simpletext(idx: InvertedIndex, path: str) -> None:
    """Dump an index as plain text: ``postings.pst/`` (one posting per
    line), ``docs.json/`` (stored fields), ``meta.json`` (field name +
    key columns)."""
    has_off = idx.extra.get("index_options", "positions") == "offsets"
    has_pay = bool(idx.extra.get("has_payloads", False))

    def gen(batches):
        from lucene_kmp_spark.util.packing import block_decode, delta_block_decode

        for pdf in batches:
            out = []
            for i in range(len(pdf)):
                term = pdf["term"].values[i]
                doc_ids = delta_block_decode(bytes(pdf["doc_ids_enc"].values[i]))
                tfs = block_decode(bytes(pdf["freqs_enc"].values[i]))
                norms = np.frombuffer(bytes(pdf["norms_enc"].values[i]), dtype=np.uint8)
                flat = block_decode(bytes(pdf["positions_enc"].values[i]))
                oflat = (
                    block_decode(bytes(pdf["offsets_enc"].values[i])) if has_off else None
                )
                pflat = (
                    block_decode(bytes(pdf["payloads_enc"].values[i])) if has_pay else None
                )
                off = 0
                for d, t, nm in zip(doc_ids, tfs, norms):
                    t = int(t)
                    deltas = flat[off : off + t]
                    pos = np.cumsum(deltas)
                    line = (
                        f"{term}\t{int(d)}\t{t}\t{int(nm)}\t"
                        + ",".join(str(int(p)) for p in pos)
                    )
                    if has_off:
                        # cell stores interleaved (start-delta-within-doc,
                        # length) pairs; re-derive absolute start:end
                        pairs = oflat[2 * off : 2 * (off + t)]
                        prev, se = 0, []
                        for j in range(t):
                            s = int(pairs[2 * j]) + prev
                            e = s + int(pairs[2 * j + 1])
                            se.append(f"{s}:{e}")
                            prev = s
                        line += "\t" + ",".join(se)
                    if has_pay:
                        line += "\t" + ",".join(
                            str(int(v)) for v in pflat[off : off + t]
                        )
                    off += t
                    out.append(line)
            yield pd.DataFrame({"value": out})

    os.makedirs(path, exist_ok=True)
    lines = idx.postings.mapInPandas(gen, schema=_LINES_SCHEMA)
    lines.sortWithinPartitions("value").write.mode("overwrite").text(
        os.path.join(path, "postings.pst")
    )
    idx.docs.write.mode("overwrite").json(os.path.join(path, "docs.json"))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "field_name": idx.field_name,
                "key_cols": list(idx.key_cols),
                "format": "simpletext-1",
                "index_options": "offsets" if has_off else "positions",
                "has_payloads": has_pay,
            },
            f,
        )


def read_simpletext(spark: SparkSession, path: str) -> InvertedIndex:
    """Open a simpletext index: parallel line parse → the standard
    one-shuffle block encode → stats re-derived from block metadata (the
    same trust-nothing open as CheckIndex would want for a hand-editable
    format)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    has_off = meta.get("index_options", "positions") == "offsets"
    has_pay = bool(meta.get("has_payloads", False))

    raw = spark.read.text(os.path.join(path, "postings.pst"))

    def parse(batches):
        for pdf in batches:
            rows = {
                "doc_id": [],
                "term": [],
                "tf": [],
                "positions": [],
                "norm": [],
                "is_first": [],
                "starts": [],
                "ends": [],
                "payloads": [],
            }
            for line in pdf["value"].values:
                parts = line.split("\t")
                term, doc, tf, norm, pos_csv = parts[:5]
                rows["term"].append(term)
                rows["doc_id"].append(int(doc))
                rows["tf"].append(int(tf))
                rows["norm"].append(int(norm))
                rows["positions"].append(
                    [int(p) for p in pos_csv.split(",")] if pos_csv else []
                )
                rows["is_first"].append(0)
                idx_next = 5
                if has_off:
                    se = (
                        [p.split(":") for p in parts[idx_next].split(",")]
                        if parts[idx_next]
                        else []
                    )
                    rows["starts"].append([int(s) for s, _ in se])
                    rows["ends"].append([int(e) for _, e in se])
                    idx_next += 1
                else:
                    rows["starts"].append(None)
                    rows["ends"].append(None)
                if has_pay:
                    rows["payloads"].append(
                        [int(v) for v in parts[idx_next].split(",")]
                        if parts[idx_next]
                        else []
                    )
                else:
                    rows["payloads"].append(None)
            yield pd.DataFrame(rows)

    tokens = raw.mapInPandas(parse, schema=_PARSED_SCHEMA)
    postings = build_postings(tokens, with_offsets=has_off or has_pay).persist()
    term_dict = (
        postings.groupBy("term")
        .agg(F.sum("num_docs").alias("df"), F.sum("tf_sum").alias("ttf"))
        .persist()
    )
    agg = term_dict.agg(
        F.sum("df").alias("sum_df"),
        F.sum("ttf").alias("sum_ttf"),
        F.count("*").alias("num_terms"),
    ).collect()[0]
    norms = (
        tokens.groupBy("doc_id").agg(F.first("norm").alias("norm")).persist()
    )
    doc_count = norms.count()
    docs = spark.read.json(os.path.join(path, "docs.json"))
    if "doc_id" in docs.columns:
        docs = docs.withColumn("doc_id", F.col("doc_id").cast("long"))
    max_doc = docs.count()
    stats = IndexStats(
        max_doc=max_doc,
        doc_count=doc_count,
        sum_total_term_freq=int(agg["sum_ttf"] or 0),
        sum_doc_freq=int(agg["sum_df"] or 0),
        num_terms=int(agg["num_terms"] or 0),
    )
    return InvertedIndex(
        spark=spark,
        field_name=meta["field_name"],
        docs=docs,
        postings=postings,
        term_dict=term_dict,
        stats=stats,
        key_cols=tuple(meta.get("key_cols", ("doc_id",))),
        norms=norms,
        extra={
            "index_options": "offsets" if has_off else "positions",
            "has_payloads": has_pay,
            "storage_format": "simpletext",
        },
    )
