"""PII scrubbing and paragraph-level dedup — the text-hygiene passes a
pretraining pipeline runs between raw ingest and tokenization.

All operators are pure column expressions (regexp_replace / explode +
window), so they stay JVM-side and scale linearly: no Python in the row
path, shuffles only where the semantics require one (cross-doc paragraph
dedup groups by paragraph hash; everything else is narrow).

PII patterns are deliberately conservative, dialect-portable regexes
(Java regex here == DuckDB RE2 for this subset) so the driver oracle can
replay them verbatim; production deployments layer domain-specific
patterns on top via ``extra_patterns``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# order matters: longer/more-specific patterns first so e.g. an email is
# redacted as ONE email, not a fragment plus a hostname
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("cc", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b"),
    ("phone", r"\+\d{1,3}[ -]\d{2,4}[ -]\d{3,4}(?:[ -]\d{3,4})?\b"),
)


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    replacement: str = "[PII]",
    kinds: tuple[str, ...] | None = None,
    extra_patterns: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """Redact PII matches in ``text_col`` in place (same column name).
    ``kinds`` restricts to a subset of PII_PATTERNS keys; ``extra_patterns``
    appends (name, regex) pairs applied after the built-ins."""
    col = F.col(text_col)
    for name, pat in PII_PATTERNS + tuple(extra_patterns):
        if kinds is not None and name not in kinds:
            continue
        col = F.regexp_replace(col, pat, replacement)
    return df.withColumn(text_col, col)


def pii_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc match counts per PII kind — the audit/triage view (filter
    docs with counts above a threshold instead of scrubbing)."""
    cols = [F.col(id_col)]
    for name, pat in PII_PATTERNS:
        cols.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
    return df.select(*cols)


def remove_repeated_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """WITHIN-doc paragraph dedup: keep the first occurrence of each
    distinct paragraph inside a document, preserving order (the boilerplate/
    template-repetition cleanup). Narrow except one (id, para) window."""
    paras = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para")
    )
    w = Window.partitionBy(id_col, "para").orderBy("pos")
    kept = paras.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda s: s["para"]
            ),
            sep,
        ).alias("_new_text")
    )
    return (
        df.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce("_new_text", F.col(text_col)))
        .drop("_new_text")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """CROSS-doc paragraph dedup: each distinct paragraph survives only in
    the earliest (min id, then position) document that contains it — the
    corpus-level boilerplate strip (CCNet/RefinedWeb-style, at paragraph
    granularity instead of document granularity).

    One shuffle on the paragraph hash; group sizes are bounded by the
    duplication factor of a single paragraph, so the plan holds at corpus
    scale. Docs whose every paragraph lost end up with empty text (filter
    on ``length(text) > 0`` downstream if those rows should drop)."""
    paras = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para")
    ).withColumn("_h", F.xxhash64("para"))
    w = Window.partitionBy("_h").orderBy(id_col, "pos")
    kept = paras.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda s: s["para"]
            ),
            sep,
        ).alias("_new_text")
    )
    return (
        df.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce("_new_text", F.lit("")))
        .drop("_new_text")
    )
