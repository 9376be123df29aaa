"""Build (or resume) a segmented transcript index — spark-submit entrypoint.

    spark-submit --master <cluster> --py-files lucene_kmp_spark.zip \
        scripts/build_transcript_index.py \
        --input /data/transcripts.parquet --index /data/index \
        --batches 8 [--merge] [--text-col text]

The input is split into deterministic conv_id-hash batches; each batch is one
segment commit with an idempotent batch key, so re-running the same command
after a failure resumes from the last committed segment (checkpoint/resume per
the north rule). Per-segment lineage + metrics (docs indexed, postings rows,
bytes) are printed as JSON lines and recorded in the index manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path OR synthetic:<n_convs>")
    ap.add_argument("--index", required=True, help="index root directory")
    ap.add_argument("--batches", type=int, default=8, help="conv-hash batch count")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--key-cols", default="conv_id,turn_idx")
    ap.add_argument("--merge", action="store_true", help="run tiered compaction after build")
    ap.add_argument("--check", action="store_true", help="run CheckIndex invariants after build")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("build_transcript_index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lucene_kmp_spark.index.segments import SegmentedIndexWriter

    if args.input.startswith("synthetic:"):
        from lucene_kmp_spark.data.transcripts import synth_transcripts

        df = synth_transcripts(spark, n_convs=int(args.input.split(":", 1)[1]))
    else:
        df = spark.read.parquet(args.input)

    key_cols = tuple(args.key_cols.split(","))
    writer = SegmentedIndexWriter(spark, args.index, key_cols=key_cols, text_col=args.text_col)

    t0 = time.time()
    total = 0
    for b in range(args.batches):
        batch = df.filter(F.pmod(F.xxhash64(key_cols[0]), F.lit(args.batches)) == b)
        rec = writer.add_batch(batch, batch_key=f"batch-{b:04d}-of-{args.batches}")
        if rec is None:
            print(json.dumps({"batch": b, "status": "already-committed (resume skip)"}))
            continue
        total += rec["n_docs"]
        print(json.dumps({"batch": b, "status": "committed", "lineage": rec}))

    if args.merge:
        for merged in writer.maybe_merge():
            print(json.dumps({"merge": merged["id"], "n_docs": merged["n_docs"]}))

    if args.check:
        from lucene_kmp_spark.index.check import check_index

        res = check_index(writer.reader().index)
        print(json.dumps({"check_index": res}))

    m = writer.manifest()
    print(
        json.dumps(
            {
                "done": True,
                "segments": len(m["segments"]),
                "docs_this_run": total,
                "max_doc": writer.max_doc,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
