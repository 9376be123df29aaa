"""Index-upgrade job — rewrite an on-disk index into another storage
format (``index/UpgradeIndexMergePolicy.kt`` rewrites old-codec segments
into the current codec; Lucene's IndexUpgrader CLI drives it; here "codec" = the Spark DataSource
format: parquet <-> orc, or iceberg where its runtime jars exist).

    spark-submit --py-files lucene_kmp_spark.zip \
        scripts/upgrade_index_storage.py \
        --index ./idx_parquet --out ./idx_orc --format orc

The rewrite is the distributed identity scan+write (no decode — block
cells are binary columns either way); min/max statistics and term
clustering are preserved because the write path re-sorts by term.
Verifies with a post-rewrite CheckIndex pass unless --no-check.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="existing index directory")
    ap.add_argument("--out", required=True, help="target directory")
    ap.add_argument("--format", default="orc", help="target Spark datasource format")
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("upgrade_index_storage").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lucene_kmp_spark.index.builder import InvertedIndex

    t0 = time.perf_counter()
    idx = InvertedIndex.read(spark, args.index)
    idx.write(args.out, storage_format=args.format)
    out = InvertedIndex.read(spark, args.out)
    rec = {
        "stage": "rewrite",
        "sec": round(time.perf_counter() - t0, 3),
        "format": args.format,
        "terms": out.stats.num_terms,
        "docs": out.stats.doc_count,
    }
    print(json.dumps(rec))
    if not args.no_check:
        from lucene_kmp_spark.index.check import check_index

        t0 = time.perf_counter()
        check_index(out, raise_on_fail=True)
        print(json.dumps({"stage": "check_index", "sec": round(time.perf_counter() - t0, 3), "ok": True}))
    spark.stop()


if __name__ == "__main__":
    main()
