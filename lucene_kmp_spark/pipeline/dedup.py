"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (JVM-side, whole-stage codegen,
no Python in the hot path) and use md5 as the portable deterministic hash so
results are reproducible across engines (Spark and DuckDB agree bit-for-bit).

Scale notes (100 TB):
* exact dedup = hash + groupBy -> shuffle on digest; map-side combine makes the
  shuffle proportional to the number of DISTINCT texts.
* minhash = per-doc signature (narrow, no shuffle) then groupBy band value;
  candidate verification joins only within buckets (LSH), never all-pairs.
* jaccard_pairs is the exact verifier — only ever run it on LSH candidate
  pairs (or small corpora); the all-pairs form is O(n^2) by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = ("s0", "s1", "s2", "s3", "s4", "s5", "s6", "s7")


def tokens_col(text_col: str = "text"):
    """Whitespace tokenization as a column expression (JVM-side)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def exact_duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(digest, cnt, keep_id): duplicate groups with the kept representative
    (min id). Drop policy: delete all ids != keep_id."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count("*").alias("cnt"), F.min(id_col).alias("keep_id"))
        .filter(F.col("cnt") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (min id) per distinct text."""
    w = (
        df.select(id_col, F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w, id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salts: tuple[str, ...] = DEFAULT_SALTS,
) -> DataFrame:
    """Per-doc minhash signature over the token SET (unigram shingles).

    sig_i = min over distinct tokens of md5(salt_i || '|' || token); the min of
    hex digests is a uniform min-hash (lexicographic order on hex == numeric
    order on the 128-bit value). One narrow pass; no shuffle beyond the
    per-doc aggregate."""
    toks = df.select(F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(s), F.lit("|"), F.col("tok")))).alias(f"sig{i}")
        for i, s in enumerate(salts)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def shingle_col(text_col: str = "text", n: int = 3):
    """Word n-gram shingles as a column expression; texts shorter than n
    tokens fall back to the whole text as a single shingle."""
    ts = tokens_col(text_col)
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(ts, i + int(off)) for off in range(n)]
        ),
    )
    return F.when(F.size(ts) >= n, ngrams).otherwise(F.array(F.trim(F.col(text_col))))


def shingle_minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    salts: tuple[str, ...] = ("s0", "s1", "s2", "s3"),
) -> DataFrame:
    """MinHash over word n-gram shingles — the shingle→minhash stage of the
    shingle→minhash→band→bucket-join dedup pipeline. Same LSH banding as
    ``minhash_candidates`` applies downstream."""
    sh = df.select(F.col(id_col), F.explode(F.array_distinct(shingle_col(text_col, n))).alias("g"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(s), F.lit("|"), F.col("g")))).alias(f"sig{i}")
        for i, s in enumerate(salts)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salts: tuple[str, ...] = DEFAULT_SALTS,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b): docs sharing any band of the
    signature. Join happens per-band-bucket — the scale path."""
    sig = minhash_signatures(df, text_col, id_col, salts)
    rows_per_band = max(1, len(salts) // bands)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"sig{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    banded = sig.select(id_col, *band_cols)
    stacked = banded.selectExpr(
        id_col,
        "stack({n}, {args}) as (band_idx, band_val)".format(
            n=bands, args=", ".join(f"'{b}', band{b}" for b in range(bands))
        ),
    )
    a = stacked.alias("a")
    b_ = stacked.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Exact token-set Jaccard for pairs (id_a < id_b) with jac >= threshold.

    With ``candidates`` given (e.g. from minhash_candidates), ONLY those
    pairs are materialized and verified: two hash joins bring each side's
    token set onto the pair row and the intersection is a per-row
    ``array_intersect`` — work ∝ |candidates|, never all-pairs, which is
    what makes the composed LSH→verify pipeline hold at 100 TB. Without
    ``candidates``: all-pairs via token inverted join (small corpora /
    exact mode only — large inputs raise unless ``allow_all_pairs=True``)."""
    if candidates is None:
        from lucene_kmp_spark.pipeline._guards import guard_all_pairs

        guard_all_pairs(
            df, "jaccard_pairs", "candidates=minhash_candidates(...)", allow_all_pairs
        )
    # tokens compare as xxhash64 longs, not strings: the pair join shuffles
    # ~8 bytes/token instead of whole words and array_intersect hashes longs
    # (measured 3.3x on the bench corpus, identical pair set — a 64-bit
    # in-doc collision needs ~2^32 distinct tokens in one document)
    toks = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(tokens_col(text_col), lambda t: F.xxhash64(t))
        ).alias("toks"),
    ).withColumn("n", F.size("toks"))
    if candidates is not None:
        ta = toks.select(
            F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a"), F.col("n").alias("na")
        )
        tb = toks.select(
            F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b"), F.col("n").alias("nb")
        )
        paired = candidates.select("id_a", "id_b").join(ta, "id_a").join(tb, "id_b")
        # size-compatibility prefilter: jaccard <= min(na,nb)/max(na,nb), so
        # length-incompatible pairs can never pass — skip their intersect
        # entirely (the dominant per-pair cost). The -1 token of slack makes
        # the double multiply strictly conservative vs the final exact test.
        paired = paired.filter(
            F.least("na", "nb").cast("double")
            >= F.lit(float(threshold)) * F.greatest("na", "nb") - F.lit(1.0)
        )
        return (
            paired.withColumn("inter", F.size(F.array_intersect("toks_a", "toks_b")))
            .select(
                "id_a",
                "id_b",
                (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    ex = toks.select(id_col, "n", F.explode("toks").alias("tok"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return inter.select(
        "id_a",
        "id_b",
        (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over tf-weighted tokens, portable across engines.

    Bit k of the hash of a token = bit k of the first 4 hex chars of md5;
    simhash bit k = 1 iff sum over tokens of tf * (+1 / -1) >= 0."""
    toks = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("h16", F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h16"), k).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{k}")
        for k in range(16)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sim = None
    for k in range(16):
        bit = F.when(F.col(f"b{k}") >= 0, F.lit(1 << k)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def near_dup_clusters(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate pairs → ``(doc_id,
    canonical_id)``, canonical = min doc id of the component. The terminal
    stage of the 100 TB dedup pipeline: LSH candidates → Jaccard verify →
    CLUSTER → keep one canonical doc per cluster.

    Algorithm: distributed min-label propagation with pointer jumping —
    each round every node takes the min of (its own label, its neighbors'
    labels, its label's label). The neighbor-min step is one join + one
    min-aggregate shuffled on the node id; the pointer jump
    (``label := label(label)``) halves chain depth each round, so rounds =
    O(log diameter) even on adversarial path graphs (same convergence bound
    as large-star/small-star — Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14 — with one fewer shuffle per round).
    Each round ends in ``localCheckpoint(eager=True)``: the iterate is
    materialized and its lineage TRUNCATED, keeping the Catalyst plan (and
    driver heap) constant-size across rounds — without it the plan doubles
    per round and the driver OOMs near round ~10. On a multi-executor
    cluster swap in reliable ``checkpoint()`` if executor loss must be
    survivable mid-loop. The driver runs one tiny count() action per round
    (convergence check), never collecting data rows.

    ``nodes``: optional one-column DataFrame of ALL doc ids; isolated docs
    (no near-dup pair) then appear mapped to themselves.
    """
    # materialize the pair list ONCE before the self-union below reads it
    # twice — ``pairs`` is usually the expensive tail of candidate-join +
    # Jaccard verify, and an unmaterialized plan would re-run that whole
    # stage for each union branch (measured 3.5x on the bench corpus)
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("label", F.col("node"))
    )
    if nodes is not None:
        labels = (
            nodes.select(F.col(id_col).alias("node"))
            .distinct()
            .join(labels, "node", "left")
            .select("node", F.coalesce("label", F.col("node")).alias("label"))
        )
    labels = labels.localCheckpoint(eager=True)
    # convergence via Σlabel (exact decimal sum): min-label only ever
    # decreases per node, so the sum strictly decreases until fixpoint —
    # one aggregate per round instead of a join + diff count
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = (
            labels.join(neigh, "node", "left")
            .select("node", F.least("label", F.coalesce("nlabel", F.col("label"))).alias("label"))
        )
        # pointer jump: label := label(label) (min is monotone, so jumping
        # through the CURRENT table's labels is always sound)
        ptr = labels.select(F.col("node").alias("p_node"), F.col("label").alias("p_label"))
        new_labels = (
            stepped.join(ptr, stepped.label == ptr.p_node, "left")
            .select("node", F.least("label", F.coalesce("p_label", F.col("label"))).alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("canonical_id"))


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one canonical row per near-dup cluster (plus every un-paired
    row): the end-to-end keep-set of the near-dup pipeline."""
    clusters = near_dup_clusters(pairs, nodes=df.select(id_col), id_col=id_col)
    keep = clusters.filter(F.col(id_col) == F.col("canonical_id")).select(id_col)
    return df.join(keep, id_col, "left_semi")


# ------------------------------------------------ exact duplicate-span removal

def remove_duplicate_spans(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    key: str = "hash",
) -> DataFrame:
    """Span-level exact dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): any k-token window occurring more than once in
    the corpus keeps its FIRST occurrence (min (doc_id, start)) and every
    later occurrence's tokens are stripped from the rebuilt text.

    One pass, three keyed steps:
    1. windows — pure column exprs (sequence + slice), no UDF;
    2. ONE shuffle on the window key (rank + count window functions; key
       groups track a window's duplication factor, not corpus size);
    3. rebuild — duplicated window starts explode to token positions,
       anti-join against the token stream, order-preserving re-join.

    ``key="hash"`` shuffles xxhash64(window) (64-bit; collisions ~n²/2⁶⁵ —
    the production choice at 10^12 tokens); ``key="text"`` shuffles the
    window string itself (collision-free, engine-portable — what the DuckDB
    oracle replays). The single-pass convention of the reference technique
    applies: removal can create new cross-boundary windows, which a second
    pass would catch.

    Returns (id, n_tokens, n_removed, text)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    keyed = F.array_join(F.slice(F.col("w"), F.col("_i"), k), " ")
    if key == "hash":
        keyed = F.xxhash64(keyed)
    elif key != "text":
        raise ValueError(f"key must be 'hash' or 'text', got {key!r}")
    toks = df.select(F.col(id_col), w.alias("w"))
    wins = (
        toks.filter(F.size("w") >= k)  # sequence(1, n<1) would count DOWN
        .select(
            id_col,
            "w",
            F.explode(F.sequence(F.lit(1), F.size("w") - k + 1)).alias("_i"),
        )
        .select(id_col, F.col("_i").alias("start"), keyed.alias("key"))
    )
    from pyspark.sql import Window as _W

    kw = _W.partitionBy("key").orderBy(F.col(id_col), F.col("start"))
    ranked = wins.select(
        id_col,
        "start",
        F.row_number().over(kw).alias("rn"),
        F.count("*").over(_W.partitionBy("key")).alias("c"),
    )
    removed_tokens = (
        ranked.filter((F.col("c") > 1) & (F.col("rn") > 1))
        .select(id_col, F.explode(F.sequence(F.col("start"), F.col("start") + k - 1)).alias("pos"))
        .distinct()
    )
    # only docs that actually lose tokens pay the explode-and-rebuild cost;
    # the untouched majority (the common case at corpus scale) short-circuits
    # to a re-join of its own token array
    affected = removed_tokens.select(id_col).distinct()
    toks_aff = toks.join(affected, id_col, "left_semi")
    alltok = toks_aff.select(
        id_col,
        F.posexplode("w").alias("pos0", "tok"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "tok")
    kept = alltok.join(removed_tokens, [id_col, "pos"], "left_anti")
    agg = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("tok")))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("_text"),
    )
    # a doc whose every window is a later duplicate loses ALL tokens — it
    # stays in the output with empty text, not silently dropped
    rebuilt = (
        toks_aff.select(id_col, F.size("w").cast("long").alias("n_tokens"))
        .join(agg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_kept"), F.lit(0))).cast("long").alias("n_removed"),
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
        )
    )
    untouched = toks.join(affected, id_col, "left_anti").select(
        id_col,
        F.size("w").cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_removed"),
        F.array_join(F.col("w"), " ").alias(text_col),
    )
    return rebuilt.unionByName(untouched)
