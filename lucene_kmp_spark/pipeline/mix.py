"""Training-mix construction operators: deterministic splits, stratified
sampling, per-domain token budgets.

Everything is a pure DataFrame composition keyed on portable md5 hashes, so
assignment is (a) deterministic — re-running at any parallelism, or on a
different engine (the DuckDB oracles), yields byte-identical membership — and
(b) stable under corpus growth: a document's split/sample fate depends only on
its own id, never on which other rows exist (no rand(), no row_number()).

Scale notes (100 TB):
* split_by_hash / stratified_sample are narrow per-row maps — zero shuffles.
* take_token_budget is a per-group sorted prefix; the exact window form puts
  each group on one reducer, so the default path is two-phase: an
  approx-quantile bucketing pass finds the boundary bucket per group (tiny
  aggregate), whole buckets below it are kept with a plain filter (narrow),
  and only the boundary bucket — ~1/n_buckets of the group — pays the
  single-reducer window. Result is EXACTLY the window semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(p: float) -> str:
    """First-8-hex-chars threshold such that P(md5_prefix < t) = p.

    md5 hex is lowercase fixed-width in both Spark and DuckDB, so
    lexicographic comparison of the 8-char prefix equals numeric comparison
    of the top 32 bits — the whole operator stays a string compare. p >= 1
    returns 'g', which sorts above every hex digit (keep everything)."""
    if p >= 1.0:
        return "g"
    return format(max(int(p * 0x100000000), 0), "08x")


def _u32_prefix(id_col: str, salt: str):
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))), 1, 8)


def split_weights_to_bounds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """Cumulative [0,1) boundaries as hex-prefix upper bounds, in dict order.
    The last split's bound is 'g' (> every hex char) so rounding never
    orphans a row."""
    total = sum(weights.values())
    bounds, cum = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bounds.append((name, _hex_threshold(cum)))
    bounds.append((names[-1], "g"))
    return bounds


def split_by_hash(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights,
    deterministically from md5(salt|id). Default 98/1/1 train/val/test."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    h = _u32_prefix(id_col, salt)
    expr = None
    for name, bound in split_weights_to_bounds(weights):
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its hash
    prefix falls under its stratum's threshold. Unlike df.sampleBy this is
    reproducible across engines/runs and independent of partitioning."""
    h = _u32_prefix(id_col, salt)
    thr = F.lit(_hex_threshold(default_fraction) if default_fraction < 1.0 else "g")
    for name, p in fractions.items():
        thr = F.when(F.col(strata_col) == name, F.lit("g" if p >= 1.0 else _hex_threshold(p))).otherwise(thr)
    return df.filter(h < thr)


def _token_count(text_col: str):
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def take_token_budget(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    exact_window: bool = False,
) -> DataFrame:
    """Per-group token-budget selection: walk each group's rows in
    (order_col, id_col) order and keep rows while the running token total
    stays <= budget. The canonical "N billion tokens per domain" mix step.

    Semantics are exactly the window form::

        SUM(tokens) OVER (PARTITION BY group ORDER BY order, id) <= budget

    ``exact_window=True`` runs that directly (fine at test scale; one
    reducer per group at cluster scale). The default two-phase plan:

    1. approx order-col quantiles per group -> n_buckets bucket ids
       (one small aggregate; approximation only moves BUCKET EDGES, never
       the final answer),
    2. per-(group, bucket) token sums -> driver picks, per group, the last
       bucket whose prefix total still fits (groups x n_buckets rows —
       metadata-scale),
    3. buckets strictly before it pass with a narrow filter; ONLY the
       boundary bucket runs the single-reducer window, seeded with the
       prefix total of the kept buckets.
    """
    toks = df.withColumn("_n_tok", _token_count(text_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(order_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if exact_window:
        return (
            toks.withColumn("_cum", F.sum("_n_tok").over(w))
            .filter(F.col("_cum") <= budget)
            .drop("_n_tok", "_cum")
        )

    # phase 1: quantile bucket edges per group (approximate is fine: edges
    # only decide which rows take the cheap path vs the boundary window)
    edges_rows = (
        toks.groupBy(group_col)
        .agg(
            F.percentile_approx(
                F.col(order_col).cast("double"),
                [i / n_buckets for i in range(1, n_buckets)],
                10_000,
            ).alias("_edges")
        )
        .collect()
    )
    edges = {r[group_col]: r["_edges"] for r in edges_rows}
    if not edges:
        return df.limit(0)

    def bucket_expr():
        e = None
        for g, cuts in edges.items():
            arr = F.array(*[F.lit(float(c)) for c in cuts])
            # bucket = count of edges <= order value (0..n_buckets-1)
            b = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, cut: acc + F.when(F.col(order_col).cast("double") >= cut, 1).otherwise(0),
            )
            e = F.when(F.col(group_col) == g, b) if e is None else e.when(F.col(group_col) == g, b)
        return e

    bucketed = toks.withColumn("_bkt", bucket_expr())

    # phase 2: prefix sums over (group, bucket) — metadata-scale collect
    sums = (
        bucketed.groupBy(group_col, "_bkt")
        .agg(F.sum("_n_tok").alias("_t"))
        .collect()
    )
    per_group: dict = {}
    for r in sums:
        per_group.setdefault(r[group_col], {})[r["_bkt"]] = r["_t"]
    keep_below: dict = {}   # group -> first bucket NOT fully kept
    seed: dict = {}         # group -> token total of fully-kept prefix
    for g, bmap in per_group.items():
        cum = 0
        kb, sd = 0, 0
        for b in range(n_buckets):
            t = bmap.get(b, 0)
            if cum + t <= budget:
                cum += t
                kb, sd = b + 1, cum
            else:
                break
        keep_below[g], seed[g] = kb, sd

    if all(keep_below[g] == n_buckets for g in per_group):
        # every group's total already fits the budget: nothing to trim —
        # skip the bucket filter + boundary window plan entirely (the
        # common case when the budget is sized for many epochs)
        return df

    kb_expr, seed_expr = None, None
    for g in per_group:
        cond = F.col(group_col) == g
        kb_expr = F.when(cond, keep_below[g]) if kb_expr is None else kb_expr.when(cond, keep_below[g])
        seed_expr = F.when(cond, seed[g]) if seed_expr is None else seed_expr.when(cond, seed[g])
    if kb_expr is None:  # empty input
        return df.limit(0)

    full = bucketed.filter(F.col("_bkt") < kb_expr)
    boundary = (
        bucketed.filter(F.col("_bkt") == kb_expr)
        .withColumn("_cum", F.sum("_n_tok").over(w) + seed_expr)
        .filter(F.col("_cum") <= budget)
        .drop("_cum")
    )
    return full.unionByName(boundary).drop("_n_tok", "_bkt")
