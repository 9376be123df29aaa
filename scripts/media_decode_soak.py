"""Multimodal decode-stage soak: synthesize N real containers (24-bit BMP /
16-bit PCM WAV, deterministic from the id), run the real pixel/sample
decode + feature/resize/framing passes, and report objects/s and bytes/s —
the throughput number the 100 TB curation story needs for its decode stage
(one shuffle-free columnar scan with a Python decode kernel per batch).

Run: python scripts/media_decode_soak.py [--n 200000] [--cores 32]

Deterministic corpus (integer arithmetic from the id), no external data.
The decode work is real: every BMP body is rebuilt pixel-for-pixel and every
PCM body sample-for-sample by the numpy readers in pipeline/multimodal.py;
a sampled subset is cross-checked against the synthesis formulas at the end
so a silently-wrong decode fails the soak, not just slows it.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("media-decode-soak")
        .config("spark.sql.shuffle.partitions", str(2 * args.cores))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )
    from lucene_kmp_spark.pipeline.multimodal import (
        decode_media_stats,
        media_feature_frame,
        synth_decodable,
    )

    src = spark.range(args.n).selectExpr("id AS doc_id").repartition(2 * args.cores)
    media = synth_decodable(spark, src).persist()
    n = media.count()  # materialize synthesis OUTSIDE the timed sections
    total_bytes = media.select(F.sum(F.length("payload"))).first()[0]

    t = time.perf_counter()
    n_stats = decode_media_stats(media).count()
    t_decode = time.perf_counter() - t

    t = time.perf_counter()
    n_feats = media_feature_frame(media).count()
    t_feat = time.perf_counter() - t

    assert n_stats == n_feats == n

    # correctness spot-check: decoded sums vs the synthesis formulas on a
    # deterministic 2,000-object slice
    import numpy as np

    sample = decode_media_stats(media.filter(F.col("media_id") < 2000)).collect()
    assert len(sample) == min(2000, n)
    for r in sample:
        i = r["media_id"]
        if i % 2 == 0:
            w = 8 + (i * 7) % 56
            h = 8 + (i * 11) % 40
            x = np.arange(w, dtype=np.int64)
            assert r["container"] == "bmp" and (r["width"], r["height"]) == (w, h)
            assert r["pix_sum_r"] == int(h * ((3 * i + 7 * x) % 256).sum())
        else:
            ch = 1 + (i % 4) // 2
            nn = 64 + i % 64
            j = np.arange(nn * ch, dtype=np.int64)
            s = ((7 * i + 13 * (j // ch) + 17 * (j % ch)) % 2048) - 1024
            assert r["container"] == "wav" and r["n_samp"] == nn * ch
            assert r["samp_sum"] == int(s.sum())

    print(json.dumps({
        "n_objects": n,
        "total_mb": round(total_bytes / 1e6, 1),
        "decode_sec": round(t_decode, 2),
        "decode_objects_per_sec": round(n / t_decode, 1),
        "decode_mb_per_sec": round(total_bytes / 1e6 / t_decode, 1),
        "feature_sec": round(t_feat, 2),
        "feature_objects_per_sec": round(n / t_feat, 1),
        "spot_checked": len(sample),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
