"""Deterministic synthetic multi-turn transcripts (the north-rule input shape).

Schema per BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int, role:string, text:string, tool:string, ts:timestamp)``

Everything is generated with pure Spark column expressions seeded by
``xxhash64`` — no driver-side data, no RNG state, so the same (n_convs, seed)
produces byte-identical rows at ANY parallelism level / cluster size. That
property underpins the N-vs-4N scaling-efficiency evidence: both runs consume
literally identical input.

Text is drawn from a closed vocabulary with Zipfian frequencies (hot terms in a
large fraction of docs — exercises the salted/bucketed skew handling), plus a
small fraction of rows decorated with punctuation, numbers, CJK, emoji, and
>255-char tokens per FIXTURES.md §1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 2000
_BASE_WORDS = [
    "the", "of", "and", "to", "in", "is", "that", "for", "it", "with",
    "spark", "index", "query", "term", "score", "merge", "segment", "posting",
    "shard", "token", "search", "rank", "batch", "stream", "table", "block",
    "hope", "resurrection", "kingdom", "gospel", "faith", "light", "truth",
]


def _vocab() -> list[str]:
    words = list(_BASE_WORDS)
    i = 0
    while len(words) < VOCAB_SIZE:
        words.append(f"w{i:04d}")
        i += 1
    return words[:VOCAB_SIZE]


_DECOR = [
    "",  # most rows undecorated
    " don't stop-now 3.14 1,000",
    " B2B item_42 dev@example.com",
    " 我是中国人 それは カタカナ",
    " 😂 🇺🇸 emoji_test",
    " " + "x" * 300,  # >255-char token: maxTokenLength chopping
]


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 50,
    avg_words: int = 24,
    decorated_fraction: float = 0.05,
    entity_every: int = 0,
) -> DataFrame:
    """Build the transcripts DataFrame. ~``n_convs * (max_turns+1)/2`` turns.

    ``entity_every > 0`` appends a conversation-local entity token
    ``entNNNNNNNN`` (one per conv, shared by a pool of 64 convs so df is
    non-trivial) to every ``entity_every``-th turn — naturally
    window-clustered terms (n_buckets << df after conv-ordered doc-id
    assignment), the shape real transcripts have (user/project names local
    to a handful of conversations). Default 0 keeps output byte-identical
    to earlier rounds for bench comparability."""
    vocab = _vocab()
    vocab_arr = F.array(*[F.lit(w) for w in vocab])
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    tools = F.array(F.lit("bash"), F.lit("search"), F.lit("python"))

    convs = spark.range(n_convs).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit("nt")), F.lit(max_turns)) + 1)
        .cast("int")
        .alias("n_turns"),
        F.col("id").alias("_cid"),
    )
    turns = convs.select(
        "conv_id",
        "_cid",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h = lambda *cols: F.xxhash64(F.col("_cid"), F.col("turn_idx"), F.lit(seed), *cols)  # noqa: E731
    n_words = (F.pmod(h(F.lit("nw")), F.lit(2 * avg_words - 2)) + 2).cast("int")

    # Zipf(s=1) via inverse-CDF on a uniform hash: rank = floor(V^u), pdf ~ 1/rank
    u = (F.pmod(h(F.lit("wseed")), F.lit(1_000_000)) / F.lit(1_000_000.0))
    word_at = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab_arr,
            (
                F.least(
                    F.lit(VOCAB_SIZE),
                    F.floor(
                        F.pow(
                            F.lit(float(VOCAB_SIZE)),
                            F.pmod(F.xxhash64(F.col("_cid"), F.col("turn_idx"), F.lit(seed), i), F.lit(1_000_003))
                            / F.lit(1_000_003.0),
                        )
                    ).cast("int"),
                )
            ),
        ),
    )
    base_text = F.array_join(word_at, " ")

    decor_bucket = F.pmod(h(F.lit("decor")), F.lit(int(round(len(_DECOR) / max(decorated_fraction, 1e-9)))))
    decor = F.when(
        decor_bucket < len(_DECOR),
        F.element_at(F.array(*[F.lit(d) for d in _DECOR]), decor_bucket.cast("int") + 1),
    ).otherwise(F.lit(""))

    df = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(roles, (F.pmod(h(F.lit("role")), F.lit(4)) + 1).cast("int")).alias("role"),
        (
            F.concat(
                base_text,
                decor,
                F.when(
                    F.lit(entity_every > 0)
                    & (F.pmod(F.col("turn_idx"), F.lit(max(entity_every, 1))) == 0),
                    F.format_string(" ent%08d", F.col("_cid") - F.pmod(F.col("_cid"), F.lit(64))),
                ).otherwise(F.lit("")),
            )
            if entity_every
            else F.concat(base_text, decor)
        ).alias("text"),
        F.when(
            F.pmod(h(F.lit("tool?")), F.lit(4)) == 0,
            F.element_at(tools, (F.pmod(h(F.lit("tool")), F.lit(3)) + 1).cast("int")),
        ).alias("tool"),
        (
            F.timestamp_seconds(
                F.lit(1704067200)  # 2024-01-01T00:00:00Z
                + F.col("_cid") * 3600
                + F.col("turn_idx") * 37
            )
        ).alias("ts"),
        F.pmod(u * 0, F.lit(1)).cast("int").alias("_drop"),  # keep plan shape stable
    ).drop("_drop")
    return df


def transcripts_for_sf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus sized to the testdata scale factor directory."""
    sf = 0.01
    for cand in ("0.001", "0.01", "0.1", "1", "10"):
        if f"sf{cand}" in sf_dir:
            sf = float(cand)
    n_convs = max(40, int(40000 * sf))  # sf0.1 -> 4,000 convs -> ~100k turns
    return synth_transcripts(spark, n_convs=n_convs, seed=42)
