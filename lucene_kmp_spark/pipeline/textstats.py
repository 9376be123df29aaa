"""Text analysis operators: token counts, quality scoring, language ID,
document fingerprinting. Pure column expressions — no Python UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_kmp_spark.pipeline.dedup import tokens_col


def q4(col):
    """floor(x*1e4)/1e4 — quantization that is exact on doubles (unlike
    round(), which can disagree across engines at half boundaries)."""
    return F.floor(col * 10000) / 10000

EN_STOPWORDS = ("the", "of", "and", "to", "in", "is", "that", "for", "it", "with", "a", "on")
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "und", "die", "ist", "mit"),
    "es": ("el", "la", "de", "es", "con"),
}


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct, avg_token_len, bpe_ish_tokens).

    bpe_ish = sum over words of ceil(len/4) — a deterministic proxy for BPE
    token counts (real tokenizers plug in as a pandas UDF at this spot)."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).alias("_chars"),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int")).alias(
            "bpe_ish_tokens"
        ),
    ).select(
        id_col,
        "n_tokens",
        "n_distinct",
        q4(F.col("_chars") / F.col("n_tokens")).alias("avg_token_len"),
        "bpe_ish_tokens",
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    distinct ratio (a Gopher-rules-flavored filter, simplified)."""
    toks = tokens_col(text_col)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks)
    stop_ratio = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)) / F.greatest(
        F.size(F.array_distinct(toks)), F.lit(1)
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    len_ok = (n >= 5) & (n <= 5000)
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 2, F.lit(1.0)) * 0.3
        + F.least(distinct_ratio * 1.5, F.lit(1.0)) * 0.3
    )
    return df.select(
        F.col(id_col),
        F.col(text_col),
        q4(score).alias("quality"),
        q4(stop_ratio).alias("stopword_ratio"),
        q4(distinct_ratio).alias("distinct_ratio"),
    ).drop(text_col)


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-free marker-word language guess (deterministic heuristic).

    Picks the language whose stopword markers hit the most distinct tokens;
    ties broken by language code ascending; no hits -> 'und'."""
    toks = F.array_distinct(tokens_col(text_col))
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        hit_cols.append(F.struct(F.size(F.array_intersect(toks, arr)).alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*hit_cols))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        best["hits"].alias("marker_hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token set
    (word-order/duplication insensitive — catches shuffled near-dups)."""
    toks = tokens_col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("fingerprint"),
    )

def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_n: int = 2
) -> DataFrame:
    """Gopher-style repetition filters (word-level — the corpus is
    single-line): (id, dup_word_frac, dup_3gram_frac, top_2gram_frac).

    * dup_word_frac   — fraction of token occurrences that repeat an earlier
      token (1 - distinct/total).
    * dup_3gram_frac  — same over 3-gram occurrences.
    * top_2gram_frac  — occurrences of the most frequent 2-gram / total
      2-grams (ties irrelevant: max count is unique-valued).

    The n-gram mode needs per-(doc, gram) counts: one explode + aggregate,
    shuffled on (id, gram) with map-side combine — the same shape (and
    scale story) as the minhash pass."""
    toks = tokens_col(text_col)
    two = F.expr(
        f"CASE WHEN size(split(trim({text_col}), '\\\\s+')) >= 2 THEN "
        f"transform(sequence(1, size(split(trim({text_col}), '\\\\s+')) - 1), "
        f"i -> array_join(slice(split(trim({text_col}), '\\\\s+'), i, 2), ' ')) "
        "ELSE array() END"
    )
    three = F.expr(
        f"CASE WHEN size(split(trim({text_col}), '\\\\s+')) >= 3 THEN "
        f"transform(sequence(1, size(split(trim({text_col}), '\\\\s+')) - 2), "
        f"i -> array_join(slice(split(trim({text_col}), '\\\\s+'), i, 3), ' ')) "
        "ELSE array() END"
    )
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("_nw"),
        F.size(F.array_distinct(toks)).alias("_dw"),
        F.size(three).alias("_n3"),
        F.size(F.array_distinct(three)).alias("_d3"),
        two.alias("_two"),
    )
    top2 = (
        base.select(id_col, F.explode("_two").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("_top2"), F.sum("c").alias("_tot2"))
    )
    return (
        base.drop("_two")
        .join(top2, id_col, "left")
        .select(
            id_col,
            q4((F.col("_nw") - F.col("_dw")) / F.greatest("_nw", F.lit(1))).alias("dup_word_frac"),
            q4((F.col("_n3") - F.col("_d3")) / F.greatest("_n3", F.lit(1))).alias("dup_3gram_frac"),
            q4(F.coalesce(F.col("_top2") / F.col("_tot2"), F.lit(0.0))).alias("top_2gram_frac"),
        )
    )


# ------------------------------------------------- n-gram LM quality filter

def bigram_lm_counts(
    corpus: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Train a bigram language model by counting: returns
    (unigram_counts(w1, c1), bigram_counts(w1, w2, c2), vocab_size).
    The CCNet-style quality signal's model half — two hash aggregates over
    an exploded token stream; at 10^12 turns both tables are term-keyed and
    orders of magnitude smaller than the corpus (vocabulary scale)."""
    toks = corpus.select(
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w")
    ).filter(F.size("w") > 0)
    uni = (
        toks.select(F.explode("w").alias("w1"))
        .groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
                    " ELSE array() END"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    )
    vocab_size = uni.count()
    return uni, bi, vocab_size


def lm_cross_entropy(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document bigram cross-entropy (bits/token) under the counted LM
    with add-alpha smoothing: P(w2|w1) = (c2 + alpha) / (c1 + alpha*V).
    Low = fluent under the corpus model, high = noise — the perplexity
    quality filter of CCNet/Gopher-style curation.

    Plan: explode doc bigrams -> ONE shuffle joining the (w1,w2) count table
    (left: unseen bigrams get c2=0) + the w1 table -> per-doc avg. Both count
    sides are vocabulary-scale; broadcast when small, hash-join otherwise —
    Catalyst/AQE picks. Returns (doc_id, n_bigrams, bits_per_token)."""
    pairs = (
        docs.select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
        )
        .filter(F.size("w") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select(id_col, "p.w1", "p.w2")
    )
    av = float(alpha)
    joined = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .select(
            id_col,
            (
                F.log2(F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(av))
                - F.log2(
                    F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                    + F.lit(av * float(vocab_size))
                )
            ).alias("lp"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        (-F.sum("lp") / F.count("*")).alias("bits_per_token"),
    )
