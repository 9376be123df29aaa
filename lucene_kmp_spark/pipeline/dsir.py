"""DSIR-style importance resampling for training-data selection.

Implements the hashed n-gram importance-resampling recipe of Xie et al.,
"Data Selection for Language Models via Importance Resampling"
(arXiv:2302.03169): both the raw pool and a (much smaller) target corpus are
featurized as hashed unigram+bigram counts, a bag-of-hashed-ngrams
multinomial is fit to each, every raw document gets an importance log-weight
``log p_target(doc) - log p_raw(doc)``, and the selected subset is the
Gumbel top-k over those weights (= sampling without replacement
proportionally to the importance weights).

Spark-first shape (100 TB safe):

* featurization is a pure column expression (split + slice/zip_with +
  md5-prefix bucket hash) — no Python in the hot path, and the hash is
  engine-portable (md5 hex prefix, same value in DuckDB/any SQL dialect);
* each LM is ONE map-side-combined aggregate whose result has at most
  ``buckets`` rows (constant, e.g. 4k-100k) — broadcastable by construction;
* per-doc weights are explode -> broadcast-join(bucket LM) -> one groupBy(doc)
  sum: a single data-scale shuffle keyed by doc id, same cost envelope as the
  index build's tokenize pass;
* selection is a deterministic seeded Gumbel perturbation + TakeOrdered —
  no RNG state, identical under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def words_col(text_col: str = "text"):
    return F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))


def hashed_ngrams_col(text_col: str = "text", buckets: int = 4096, salt: str = "dsir"):
    """``array<bigint>`` of hashed-ngram bucket ids (unigrams + word bigrams).

    Bucket = first 8 hex chars of md5(salt|ngram) mod ``buckets`` — the
    dialect-portable hash used across pipeline/mix.py, so oracles can replay
    it as ``('0x' || substr(md5(...), 1, 8))::bigint % buckets``.
    """
    w = words_col(text_col)
    n = F.size(w)
    bigrams = F.zip_with(
        F.slice(w, F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(w, F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    ngrams = F.concat(w, bigrams)
    return F.transform(
        ngrams,
        lambda ng: F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws("|", F.lit(salt), ng)), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(buckets),
        ),
    )


def bucket_counts(
    df: DataFrame, text_col: str = "text", buckets: int = 4096, salt: str = "dsir"
) -> DataFrame:
    """Hashed-ngram multinomial counts: (bucket, cnt) — at most ``buckets``
    rows regardless of corpus size (the map-side combine collapses per
    partition first)."""
    return (
        df.select(F.explode(hashed_ngrams_col(text_col, buckets, salt)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_log_ratio(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 4096,
    alpha: float = 0.1,
    salt: str = "dsir",
) -> DataFrame:
    """(bucket, logratio) for every bucket that occurs in the raw pool:
    ``ln p_target(b) - ln p_raw(b)`` with add-``alpha`` smoothing over the
    full ``buckets``-slot table. Buckets absent from the raw pool never
    occur in a raw document, so the raw-side left join covers every weight
    the pool can produce. Result is <= ``buckets`` rows — broadcast it."""
    rc = bucket_counts(raw, text_col, buckets, salt)
    tc = bucket_counts(target, text_col, buckets, salt).withColumnRenamed("cnt", "tcnt")
    n_raw = rc.agg(F.sum("cnt")).collect()[0][0] or 0
    n_tgt = tc.agg(F.sum("tcnt")).collect()[0][0] or 0
    denom_raw = float(n_raw) + alpha * buckets
    denom_tgt = float(n_tgt) + alpha * buckets
    return rc.join(tc, "bucket", "left").select(
        "bucket",
        (
            F.log((F.coalesce(F.col("tcnt"), F.lit(0)) + F.lit(alpha)) / F.lit(denom_tgt))
            - F.log((F.col("cnt") + F.lit(alpha)) / F.lit(denom_raw))
        ).alias("logratio"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    alpha: float = 0.1,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document importance log-weight: (id, n_ngrams, log_weight) where
    ``log_weight = sum over ngram occurrences of ln p_tgt(b) - ln p_raw(b)``.

    One explode + one broadcast join (the <= ``buckets``-row LM table) + one
    groupBy(id) sum — docs with no tokens weight 0."""
    ratio = bucket_log_ratio(raw, target, text_col, buckets, alpha, salt)
    feats = raw.select(
        F.col(id_col), F.explode(hashed_ngrams_col(text_col, buckets, salt)).alias("bucket")
    )
    return (
        feats.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum("logratio").alias("log_weight"),
        )
    )


def gumbel_col(id_col: str = "doc_id", seed: str = "dsir-gumbel"):
    """Deterministic standard-Gumbel noise from the doc id: u32 md5 prefix
    -> u in (0,1) -> -ln(-ln(u)). Seeded, engine-portable, partition-free."""
    u32 = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (u32 + F.lit(0.5)) / F.lit(4294967296.0)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    alpha: float = 0.1,
    salt: str = "dsir",
    seed: str = "dsir-gumbel",
    gumbel: bool = True,
) -> DataFrame:
    """The DSIR selection: top-``k`` docs by ``log_weight + Gumbel(id)``
    (Gumbel top-k == sampling without replacement proportional to the
    importance weights; ``gumbel=False`` gives the deterministic
    highest-weight variant). Returns (id, n_ngrams, log_weight, sel_key)
    ordered by the selection key desc, id asc — a TakeOrderedAndProject,
    per-partition heaps + one tiny driver merge."""
    weights = dsir_log_weights(raw, target, text_col, id_col, buckets, alpha, salt)
    key = F.col("log_weight") + (gumbel_col(id_col, seed) if gumbel else F.lit(0.0))
    return (
        weights.withColumn("sel_key", key)
        .orderBy(F.desc("sel_key"), F.asc(id_col))
        .limit(k)
    )
