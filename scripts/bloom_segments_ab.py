"""Bloom segment-pruning A/B at its design regime (BENCH/BASELINE.md
round-5): many-segment NRT-shaped index (merge_policy="none"), a selective
term living in exactly one segment, interleaved best-of-3 full-vs-pruned
with top-k parity asserted.

Run: python scripts/bloom_segments_ab.py  [--segments 32]
     [--sf-dir /root/testdata/sf0.1]

Reference shape: codecs/bloom BloomFilteringPostingsFormat — a per-segment
membership filter that lets a reader skip segments that provably lack a
required term.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from lucene_kmp_spark.index.segments import SegmentedIndexWriter
    from lucene_kmp_spark.search.query import TermQuery

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").persist()
    base.count()
    root = tempfile.mkdtemp(prefix="bloomab_")
    try:
        w = SegmentedIndexWriter(
            spark, root, key_cols=("doc_id",), text_col="text", merge_policy="none"
        )
        nseg = args.segments
        for i in range(nseg):
            part = base.filter(F.col("doc_id") % nseg == i)
            if i == 5:  # the selective term lives ONLY in this segment
                part = part.withColumn(
                    "text", F.concat(F.col("text"), F.lit(" xylographic"))
                )
            w.add_batch(part, batch_key=f"b{i}")
        q = TermQuery("xylographic")
        s_full = w.reader().searcher()
        pruned = w.reader(prune_query=q)
        s_pruned = pruned.searcher()
        s_full.top_k(q, 10).collect()
        s_pruned.top_k(q, 10).collect()
        samples = {"full": [], "pruned": []}
        r1 = r2 = None
        for _ in range(3):
            t = time.perf_counter()
            r1 = s_full.top_k(q, 10).collect()
            samples["full"].append(round(time.perf_counter() - t, 3))
            t = time.perf_counter()
            r2 = s_pruned.top_k(q, 10).collect()
            samples["pruned"].append(round(time.perf_counter() - t, 3))
        assert [(r.doc_id, r.score) for r in r1] == [
            (r.doc_id, r.score) for r in r2
        ], "bloom-pruned top-k must be rank-identical"
        print(
            json.dumps(
                {
                    "segments": nseg,
                    "segments_pruned": len(pruned.pruned_segments),
                    "full": samples["full"],
                    "pruned": samples["pruned"],
                    "speedup": round(min(samples["full"]) / min(samples["pruned"]), 2),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
