"""SimpleText codec analog — a fully human-readable, plain-text index
format for debugging (``codecs/simpletext/SimpleTextPostingsFormat.kt``
and siblings: "FOR RECREATIONAL USE ONLY", any text editor can inspect
the postings).

The reference writes a stateful sectioned file (``field``/``term``/
``  doc``/``    freq``/``    pos`` lines). A stateful format cannot be
parsed partition-parallel, so this codec keeps the same information but
makes every line SELF-CONTAINED::

    term \t doc_id \t tf \t norm \t pos1,pos2,...

— one line per (term, doc) posting with absolute positions, sorted within
each written file. That preserves the codec's whole point (grep-able,
eyeball-able postings) while loading stays an embarrassingly parallel
line-parse + the standard one-shuffle block re-encode. Stored fields dump
as JSON lines (SimpleTextStoredFieldsFormat analog); stats and the term
dictionary are re-derived on open exactly like the binary path, so a
hand-edited text index still opens consistently.

Documented subset: positions + norms only — an index built with
``index_options="offsets"`` or payloads must use the binary formats
(the flags are a hot-path feature; the debug codec doesn't carry them).
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
    if idx.extra.get("index_options", "positions") == "offsets" or idx.extra.get(
        "has_payloads", False
    ):
        raise NotImplementedError(
            "simpletext stores positions only — write offsets/payload "
            "indexes with the parquet/orc formats"
        )

    def gen(batches):
        from lucene_kmp_spark.util.packing import block_decode, delta_block_decode

        for pdf in batches:
            out = []
            for term, de, fe, ne, pe in zip(
                pdf["term"].values,
                pdf["doc_ids_enc"].values,
                pdf["freqs_enc"].values,
                pdf["norms_enc"].values,
                pdf["positions_enc"].values,
            ):
                doc_ids = delta_block_decode(bytes(de))
                tfs = block_decode(bytes(fe))
                norms = np.frombuffer(bytes(ne), dtype=np.uint8)
                flat = block_decode(bytes(pe))
                off = 0
                for d, t, nm in zip(doc_ids, tfs, norms):
                    deltas = flat[off : off + t]
                    off += int(t)
                    pos = np.cumsum(deltas)
                    out.append(
                        f"{term}\t{int(d)}\t{int(t)}\t{int(nm)}\t"
                        + ",".join(str(int(p)) for p in pos)
                    )
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
                term, doc, tf, norm, pos_csv = line.split("\t")
                rows["term"].append(term)
                rows["doc_id"].append(int(doc))
                rows["tf"].append(int(tf))
                rows["norm"].append(int(norm))
                rows["positions"].append(
                    [int(p) for p in pos_csv.split(",")] if pos_csv else []
                )
                rows["is_first"].append(0)
                rows["starts"].append(None)
                rows["ends"].append(None)
                rows["payloads"].append(None)
            yield pd.DataFrame(rows)

    tokens = raw.mapInPandas(parse, schema=_PARSED_SCHEMA)
    postings = build_postings(tokens).persist()
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
        extra={"index_options": "positions", "storage_format": "simpletext"},
    )
