"""Composed near-duplicate pipeline — spark-submit entrypoint.

    spark-submit --master <cluster> --py-files lucene_kmp_spark.zip \
        scripts/dedup_pipeline.py \
        --input /data/documents.parquet --output /data/deduped \
        [--threshold 0.5] [--bands 4] [--text-col text] [--id-col doc_id]

The 100 TB keep-one-canonical pipeline end-to-end, every stage bucketed
(never all-pairs):

  MinHash signatures (narrow)                   pipeline/dedup.py:50
  -> LSH band-bucket candidate pairs (per-band join)          :101
  -> exact Jaccard verification of ONLY those pairs           :137
  -> connected components (min-label + pointer jumping)       :232
  -> canonical keep-set written to --output                   :314

Each stage prints one JSON metrics line (rows in/out, seconds) — the
per-stage lineage the north rule asks of every job. Stages are pure
DataFrame transformations; a failed run re-executes from the last written
output (write is atomic per Spark's committer).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of documents")
    ap.add_argument("--output", required=True, help="parquet path for the deduped keep-set")
    ap.add_argument("--threshold", type=float, default=0.5, help="Jaccard keep threshold")
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--pairs-out", default=None, help="optionally persist verified pairs")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dedup_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lucene_kmp_spark.pipeline.dedup import (
        dedup_canonical,
        jaccard_pairs,
        minhash_candidates,
    )

    def emit(stage: str, t0: float, **kw):
        print(json.dumps({"stage": stage, "sec": round(time.perf_counter() - t0, 3), **kw}))

    df = spark.read.parquet(args.input)
    t0 = time.perf_counter()
    n_in = df.count()
    emit("read", t0, rows=n_in)

    t0 = time.perf_counter()
    cands = minhash_candidates(
        df, text_col=args.text_col, id_col=args.id_col, bands=args.bands
    ).persist()
    emit("lsh_candidates", t0, pairs=cands.count())

    t0 = time.perf_counter()
    pairs = jaccard_pairs(
        df,
        threshold=args.threshold,
        text_col=args.text_col,
        id_col=args.id_col,
        candidates=cands,
    ).persist()
    n_pairs = pairs.count()
    emit("jaccard_verify", t0, pairs=n_pairs)
    if args.pairs_out:
        pairs.write.mode("overwrite").parquet(args.pairs_out)

    t0 = time.perf_counter()
    kept = dedup_canonical(df, pairs, text_col=args.text_col, id_col=args.id_col)
    kept.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()
    emit("canonical_keep", t0, rows_in=n_in, rows_kept=n_out, removed=n_in - n_out)

    spark.stop()


if __name__ == "__main__":
    main()
