"""Composed ANN-path soak (BENCH/BASELINE.md round-5): IVF partition
pruning x int8 codes x float rescore at 200k vectors, vs exact cosine on
the SAME parquet table, plus bytes-touched accounting from the parquet
metadata (the IO-bound-regime evidence the warm sandbox cannot time).

Run: python scripts/ann_soak.py  [--n 200000] [--dim 64] [--lists 32]

Deterministic corpus (seeded numpy), no external data. Reference shape:
the knn query surface of lucene-kmp (util/hnsw/HnswGraphSearcher.kt is
the single-node sub-linear analog; here the sub-linear path is write-time
IVF partition pruning, SURVEY.md section 1.3).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--lists", type=int, default=32)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import SparkSession

    from lucene_kmp_spark.pipeline import quantize as qz
    from lucene_kmp_spark.pipeline.similarity import (
        cosine_topk,
        ivf_write_assigned,
        nearest_lists,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(13)
    cents = rng.randn(args.lists, args.dim) * 3.0
    assign = rng.randint(0, args.lists, args.n)
    V = cents[assign] + rng.randn(args.n, args.dim)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(args.n, dtype=np.int64),
                "embedding": [v.astype(np.float64).tolist() for v in V],
            }
        )
    )
    params = qz.quantize_params(df)
    C = [c.tolist() for c in cents]
    root = tempfile.mkdtemp(prefix="annsoak_")
    try:
        t0 = time.perf_counter()
        codes_df = df.withColumn("codes", qz.quantize_code_expr("embedding", params))
        ivf_write_assigned(codes_df, C, root)
        out = {
            "n": args.n,
            "dim": args.dim,
            "n_lists": args.lists,
            "ivf_write_sec": round(time.perf_counter() - t0, 2),
        }
        tbl = spark.read.parquet(root).persist()
        tbl.count()

        # query mix: near-centroid + cross-cluster midpoints (indices taken
        # modulo n_lists so smaller --lists smoke runs work)
        L = args.lists
        queries = [
            (cents[i % L] + rng.randn(args.dim) * 0.5) for i in (3, 7, 11, 19)
        ]
        queries += [
            (cents[i % L] + cents[j % L]) / 2 + rng.randn(args.dim) * 0.5
            for i, j in ((1, 2), (5, 9), (14, 23), (28, 30))
        ]
        queries = [q.tolist() for q in queries]
        exact_ids = {
            qi: [r.vec_id for r in cosine_topk(tbl, q, k=10).collect()]
            for qi, q in enumerate(queries)
        }
        qz.ivf_quantized_topk(tbl, queries[0], C, params, k=10, n_probe=2).collect()
        for n_probe in (1, 2, 4, 8):
            tot = rec = 0.0
            for qi, q in enumerate(queries):
                best, rows = 1e9, None
                for _ in range(2):
                    t = time.perf_counter()
                    rows = qz.ivf_quantized_topk(
                        tbl, q, C, params, k=10, n_probe=n_probe, rescore=4
                    ).collect()
                    best = min(best, time.perf_counter() - t)
                tot += best
                rec += len({r.vec_id for r in rows} & set(exact_ids[qi])) / 10
            out[f"probe{n_probe}"] = {
                "mean_sec": round(tot / len(queries), 3),
                "mean_recall@10": round(rec / len(queries), 3),
            }
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            cosine_topk(tbl, queries[0], k=10).collect()
            best = min(best, time.perf_counter() - t)
        out["exact_same_table_sec"] = round(best, 3)

        # bytes-touched accounting: exact scan = float column in EVERY list
        # dir; composed stage 1 = codes column in the probed dirs only
        import pyarrow.parquet as pq

        probes2 = set(nearest_lists(queries[4], C, 2))
        tot_b = {"codes": 0, "embedding": 0}
        probe_b = {"codes": 0, "embedding": 0}
        for f in glob.glob(f"{root}/_list=*/*.parquet"):
            lst = int(f.split("_list=")[1].split("/")[0])
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    name = c.path_in_schema.split(".")[0]
                    if name in tot_b:
                        tot_b[name] += c.total_compressed_size
                        if lst in probes2:
                            probe_b[name] += c.total_compressed_size
        out["exact_scan_mb"] = round(tot_b["embedding"] / 1e6, 1)
        out["composed_stage1_mb"] = round(probe_b["codes"] / 1e6, 1)
        out["io_reduction_x"] = round(tot_b["embedding"] / max(probe_b["codes"], 1), 1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
