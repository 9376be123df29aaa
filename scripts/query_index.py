"""Query a segmented transcript index — spark-submit entrypoint.

    spark-submit --master <cluster> --py-files lucene_kmp_spark.zip \
        scripts/query_index.py --index /data/index \
        --query '+merge "order sort" role:user' --k 10 [--prune wand]

The query string uses the classic parser syntax (see queryparser/parser.py);
structured fields (role/tool/conv_id) become Catalyst-pushdown predicates.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--prune", choices=["none", "wand", "maxscore"], default="none")
    ap.add_argument("--hydrate", action="store_true", help="join stored fields into the hits")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("query_index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lucene_kmp_spark.index.segments import SegmentedIndexWriter
    from lucene_kmp_spark.queryparser import parse

    reader = SegmentedIndexWriter(spark, args.index).reader()
    q = parse(args.query)
    s = reader.searcher()
    prune = False if args.prune == "none" else args.prune
    t0 = time.time()
    hits = s.top_k(q, args.k, hydrate=args.hydrate, prune=prune).collect()
    took = time.time() - t0
    for r in hits:
        print(json.dumps({k: (str(v) if not isinstance(v, (int, float)) else v) for k, v in r.asDict().items()}))
    print(json.dumps({"total_shown": len(hits), "took_sec": round(took, 3), "query": args.query}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
