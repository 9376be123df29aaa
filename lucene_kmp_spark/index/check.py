"""CheckIndex analog (``index/CheckIndex.kt``): validate index invariants.

Distributed checks (no driver-side data beyond violation counts):

1. block shape: 1 <= num_docs <= 128, min_doc_id <= max_doc_id, impact
   arrays aligned and pareto-sorted
2. per-term block ordering: consecutive blocks (by block_id) cover strictly
   increasing docID ranges — the DocIdSetIterator monotonicity contract
3. encoded payloads: docIDs decode to exactly num_docs strictly-increasing
   values inside [min_doc_id, max_doc_id]; freqs decode to num_docs values
   with max == max_tf and sum == tf_sum; norms are 1 byte/doc
4. term_dict consistency: df/ttf equal the block-metadata sums
5. collection stats consistency: sum_df/sum_ttf/num_terms match term_dict,
   doc_count matches the norms table

Returns {"clean": bool, "checks": {name: violation_count}}; ``raise_on_fail``
mirrors CheckIndex's exorcise=false default (report, don't repair).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lucene_kmp_spark.index.builder import BLOCK_SIZE, InvertedIndex


def check_index(idx: InvertedIndex, raise_on_fail: bool = False) -> dict:
    checks: dict[str, int] = {}
    p = idx.postings

    bad_shape = p.filter(
        (F.col("num_docs") < 1)
        | (F.col("num_docs") > BLOCK_SIZE)
        | (F.col("min_doc_id") > F.col("max_doc_id"))
        | (F.size("impact_tfs") != F.size("impact_norms"))
    ).count()
    checks["block_shape"] = bad_shape

    from pyspark.sql import Window

    # per-term blocks must cover pairwise-disjoint docID ranges (the
    # DocIdSetIterator monotonicity contract). Ordered by min_doc_id, NOT
    # block_id: block_ids are only unique within one segment, and a composite
    # (multi-segment) index legally repeats them across disjoint doc ranges.
    w = Window.partitionBy("term").orderBy("min_doc_id", "block_id")
    overlap = (
        p.select("term", "block_id", "min_doc_id", "max_doc_id")
        .withColumn("_prev_max", F.lag("max_doc_id").over(w))
        .filter(F.col("_prev_max").isNotNull() & (F.col("min_doc_id") <= F.col("_prev_max")))
        .count()
    )
    checks["block_ordering"] = overlap

    def verify(batches):
        from lucene_kmp_spark.util.packing import block_decode, delta_block_decode, varint_decode

        for pdf in batches:
            bad = 0
            for nd, mn, mx, mtf, tsum, de, fe, ne in zip(
                pdf["num_docs"].values, pdf["min_doc_id"].values, pdf["max_doc_id"].values,
                pdf["max_tf"].values, pdf["tf_sum"].values,
                pdf["doc_ids_enc"].values, pdf["freqs_enc"].values, pdf["norms_enc"].values,
            ):
                d = delta_block_decode(bytes(de))
                t = block_decode(bytes(fe))
                if len(d) == 0 or len(t) == 0:
                    # the builder never writes a zero-doc block — count the
                    # corruption instead of crashing on d[0]/t.max()
                    bad += 1
                    continue
                ok = (
                    len(d) == nd
                    and len(t) == nd
                    and len(bytes(ne)) == nd
                    and (len(d) < 2 or bool((np.diff(d) > 0).all()))
                    and d[0] == mn
                    and d[-1] == mx
                    and int(t.max()) == mtf
                    and int(t.sum()) == tsum
                )
                if not ok:
                    bad += 1
            yield pd.DataFrame({"bad": [bad]})

    payload_bad = (
        p.select(
            "num_docs", "min_doc_id", "max_doc_id", "max_tf", "tf_sum",
            "doc_ids_enc", "freqs_enc", "norms_enc",
        )
        .mapInPandas(verify, schema="bad long")
        .agg(F.sum("bad"))
        .collect()[0][0]
        or 0
    )
    checks["block_payloads"] = int(payload_bad)

    # OFFSETS/PAYLOADS cells, when present (CheckIndex.checkPostings offset
    # monotonicity: startOffset >= previous startOffset, endOffset >= start)
    if "offsets_enc" in p.columns:

        def verify_off(batches):
            from lucene_kmp_spark.util.packing import block_decode

            for pdf in batches:
                bad = 0
                for tsum, oe, ye in zip(
                    pdf["tf_sum"].values, pdf["offsets_enc"].values, pdf["payloads_enc"].values
                ):
                    # a corrupt cell may fail INSIDE the codec (bad tag,
                    # truncated header) — count it, never crash the checker
                    if oe is not None:
                        try:
                            o = block_decode(bytes(oe))
                            # interleaved (start-delta, len) per occurrence:
                            # count = 2*tf_sum, deltas and lens non-negative
                            if len(o) != 2 * int(tsum) or (o < 0).any():
                                bad += 1
                        except Exception:
                            bad += 1
                    if ye is not None:
                        try:
                            y = block_decode(bytes(ye))
                            if len(y) != int(tsum):
                                bad += 1
                        except Exception:
                            bad += 1
                yield pd.DataFrame({"bad": [bad]})

        off_bad = (
            p.select("tf_sum", "offsets_enc", "payloads_enc")
            .mapInPandas(verify_off, schema="bad long")
            .agg(F.sum("bad"))
            .collect()[0][0]
            or 0
        )
        checks["offsets_payloads"] = int(off_bad)

    meta = p.groupBy("term").agg(F.sum("num_docs").alias("_df"), F.sum("tf_sum").alias("_ttf"))
    td_bad = (
        idx.term_dict.join(meta, "term", "full")
        .filter(
            F.col("df").isNull()
            | F.col("_df").isNull()
            | (F.col("df") != F.col("_df"))
            | (F.col("ttf") != F.col("_ttf"))
        )
        .count()
    )
    checks["term_dict"] = td_bad

    agg = idx.term_dict.agg(
        F.sum("df").alias("sdf"), F.sum("ttf").alias("sttf"), F.count("*").alias("nt")
    ).collect()[0]
    stats_bad = int(
        (int(agg["sdf"] or 0) != idx.stats.sum_doc_freq)
        + (int(agg["sttf"] or 0) != idx.stats.sum_total_term_freq)
        + (int(agg["nt"] or 0) != idx.stats.num_terms)
    )
    if idx.norms is not None:
        stats_bad += int(idx.norms.count() != idx.stats.doc_count)
    checks["stats"] = stats_bad

    clean = all(v == 0 for v in checks.values())
    result = {"clean": clean, "checks": checks}
    if raise_on_fail and not clean:
        raise AssertionError(f"CheckIndex failed: {checks}")
    return result
