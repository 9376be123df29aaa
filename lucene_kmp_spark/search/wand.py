"""Distributed block-max WAND: top-k disjunction scoring with window pruning.

Reference semantics: ``search/WANDScorer.kt:21-698`` + per-block impacts
(``codecs/CompetitiveImpactAccumulator.kt``, ``index/Impact.kt``) and
``MaxScoreCache.kt:55-63`` (block upper bound = max over impact pairs).

Spark reformulation (exact, rank-identical — verified pruned == unpruned):

1. per-block upper bound ``bmax`` from the stored impact pairs, computed
   JVM-side as a column expression (no Python);
2. θ seeding: decode only the single best block per term, score exactly, take
   the k-th partial sum — a TRUE achievable score, hence a sound lower bound
   of the final θ* (Lucene seeds θ from the collector the same way);
3. align on fixed docID windows (8,192 docs — Lucene's level-1 skip stride,
   ``Lucene101PostingsFormat.kt:484-487``): window upper bound
   ``u(W) = Σ_t max(bmax of t-blocks overlapping W)``; windows with
   ``u(W) < θ`` are pruned WHOLE, so surviving docs keep ALL their term
   contributions — that is what makes the result exact, unlike pruning
   unaligned blocks;
4. decode only blocks overlapping surviving windows, keep only docs inside
   surviving windows, aggregate, top-k.

At 100 TB the win compounds: ``bmax``/``min_doc_id``/``max_doc_id`` are plain
columns, so step 4's block filter pushes down to Parquet row-group pruning —
the IO-skip role of Lucene's skip lists.

Float safety: upper bounds are computed in float64 and inflated by 1e-6
relative so they dominate the float32 kernel scores; θ comes from real
scores, so pruning can only be conservative.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WINDOW_BITS = 13  # 8,192-doc alignment windows (level-1 skip stride)
_MARGIN = 1.000001


def _bmax_col(w_map_col, cache_arr):
    """Block upper bound from impact pairs (MaxScoreCache.kt:55-63), JVM-side."""
    return F.aggregate(
        F.arrays_zip("impact_tfs", "impact_norms"),
        F.lit(0.0),
        lambda acc, s: F.greatest(
            acc,
            w_map_col
            - w_map_col
            / (F.lit(1.0) + s["impact_tfs"] * F.element_at(cache_arr, s["impact_norms"] + 1)),
        ),
    ) * F.lit(_MARGIN)


def topk_disjunction_maxscore(searcher, boosts: dict[str, float], k: int = 10) -> DataFrame:
    """Exact top-k via the MAXSCORE strategy (search/MaxScoreBulkScorer.kt:15-120):
    terms are split into non-essential (the longest prefix, by ascending global
    max score, whose bound sum stays below θ) and essential; every competitive
    doc must contain at least one essential term, so candidates come only from
    essential postings — non-essential postings are then only consulted for
    those candidates (the "patch" pass, here a semi-join-restricted decode).

    θ is seeded like the WAND path: decode each term's single best block,
    score exactly, take the k-th partial sum (a sound achievable lower bound).
    Block-level refinement inside essential terms: a block survives only if
    its own bmax plus every other term's global max can still reach θ.
    """
    stats = searcher.term_stats(list(boosts))
    live = {t: b for t, b in boosts.items() if t in stats}
    if not live:
        return searcher._empty_scored().select("doc_id", "score")

    weights = {t: float(searcher._weight(stats[t].df, live[t])) for t in live}
    cache_arr = F.array(*[F.lit(float(v)) for v in searcher.cache.astype(np.float64)])
    w_map = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(w))])

    blocks = (
        searcher.index.postings.filter(F.col("term").isin(list(live)))
        .withColumn("bmax", _bmax_col(w_map[F.col("term")], cache_arr))
        .persist()
    )
    try:
        m_rows = blocks.groupBy("term").agg(F.max("bmax").alias("m")).collect()
        m_t = {r["term"]: float(r["m"]) for r in m_rows}

        w1 = Window.partitionBy("term").orderBy(F.desc("bmax"), F.asc("block_id"))
        seed_blocks = blocks.withColumn("_rn", F.row_number().over(w1)).filter(F.col("_rn") == 1)
        # θ must come from LIVE docs only: a deleted top doc would inflate θ
        # and over-prune live hits (the collector never sees deleted docs,
        # so its min-competitive score never reflects them)
        seed_scores = (
            searcher._live(
                searcher._scored_terms_df(live, stats=stats, postings_rows=seed_blocks)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        if len(seed_scores) < k:
            scored = searcher._scored_terms_df(live, stats=stats)
            return scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
        theta = float(seed_scores[-1]["score"])

        # essential / non-essential split (MaxScoreBulkScorer.kt:partitionScorers)
        by_max = sorted(m_t, key=lambda t: (m_t[t], t))
        acc, non_essential = 0.0, []
        for t in by_max:
            if acc + m_t[t] < theta:
                acc += m_t[t]
                non_essential.append(t)
            else:
                break
        essential = [t for t in m_t if t not in set(non_essential)]
        if not essential:  # θ unreachable by any doc — seeds are already exact
            essential = by_max[-1:]
            non_essential = [t for t in by_max[:-1]]

        # block refinement: per-term residual bound Σ_all - m_term + bmax >= θ
        sum_all = sum(m_t.values())
        m_map = F.create_map(*[x for t, m in m_t.items() for x in (F.lit(t), F.lit(m))])
        ess_blocks = blocks.filter(F.col("term").isin(essential)).filter(
            F.col("bmax") + (F.lit(sum_all) - m_map[F.col("term")]) >= F.lit(theta)
        )

        candidates = (
            searcher._scored_terms_df(live, stats=stats, postings_rows=ess_blocks)
            .select("doc_id")
            .distinct()
        )
        scored = searcher._scored_terms_df(live, stats=stats).join(
            candidates, "doc_id", "left_semi"
        )
        return scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
    finally:
        blocks.unpersist()


def topk_disjunction_pruned(searcher, boosts: dict[str, float], k: int = 10) -> DataFrame:
    """Exact top-k for a pure disjunction of term queries, with block-max
    window pruning. Returns DataFrame(doc_id, score double) of ≥k best docs
    (caller applies the final ordering/limit)."""
    stats = searcher.term_stats(list(boosts))
    live = {t: b for t, b in boosts.items() if t in stats}
    if not live:
        return searcher._empty_scored().select("doc_id", "score")

    weights = {t: float(searcher._weight(stats[t].df, live[t])) for t in live}
    cache_arr = F.array(*[F.lit(float(v)) for v in searcher.cache.astype(np.float64)])
    w_map = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(w))])

    blocks = (
        searcher.index.postings.filter(F.col("term").isin(list(live)))
        .withColumn("bmax", _bmax_col(w_map[F.col("term")], cache_arr))
        .persist()
    )
    try:
        # per-term global max (the Σ m_t' term of the WAND bound)
        m_rows = blocks.groupBy("term").agg(F.max("bmax").alias("m")).collect()
        m_t = {r["term"]: float(r["m"]) for r in m_rows}

        # --- pass 1: θ from the best block of each term (exact partial sums,
        # LIVE docs only — a deleted top doc would inflate θ and over-prune)
        w1 = Window.partitionBy("term").orderBy(F.desc("bmax"), F.asc("block_id"))
        seed_blocks = blocks.withColumn("_rn", F.row_number().over(w1)).filter(F.col("_rn") == 1)
        seed_scores = (
            searcher._live(
                searcher._scored_terms_df(live, stats=stats, postings_rows=seed_blocks)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        if len(seed_scores) < k:
            # not enough docs to establish θ — no pruning possible
            scored = searcher._scored_terms_df(live, stats=stats)
            return scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
        theta = float(seed_scores[-1]["score"])

        # --- window upper bounds
        spans = blocks.select(
            "term",
            "block_id",
            "bmax",
            F.explode(
                F.sequence(
                    F.shiftright("min_doc_id", WINDOW_BITS),
                    F.shiftright("max_doc_id", WINDOW_BITS),
                )
            ).alias("win"),
        )
        per_term_win = spans.groupBy("term", "win").agg(F.max("bmax").alias("wmax"))
        win_ub = per_term_win.groupBy("win").agg(F.sum("wmax").alias("u"))
        surv_wins = win_ub.filter(F.col("u") >= theta).select("win")

        surv_blocks = (
            spans.join(surv_wins, "win", "left_semi").select("term", "block_id").distinct()
        )
        candidate_blocks = blocks.join(surv_blocks, ["term", "block_id"], "left_semi")

        scored = searcher._scored_terms_df(live, stats=stats, postings_rows=candidate_blocks)
        scored = scored.withColumn("win", F.shiftright("doc_id", WINDOW_BITS)).join(
            surv_wins, "win", "left_semi"
        )
        return scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
    finally:
        blocks.unpersist()
