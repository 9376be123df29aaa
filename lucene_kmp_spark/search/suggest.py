"""Spell suggestion ("did you mean"): corrections from the live term
dictionary, the DirectSpellChecker surface (Lucene suggest module —
beyond the reference repo's own port surface; semantics follow the
published DirectSpellChecker: candidates within maxEdits of the query
term, ranked by similarity then document frequency).

Spark shape: ONE term_dict scan with a length-window + common-prefix
Catalyst prefilter (the FuzzyTermsEnum cut — term_dict is term-sorted
Parquet, so the prefix range prunes row groups), JVM `levenshtein` on the
survivors, TakeOrdered for the top-k. The term dictionary is
vocabulary-scale (≪ corpus), so suggestion cost is independent of corpus
size."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def suggest_terms(
    searcher,
    term: str,
    k: int = 5,
    max_edits: int = 2,
    prefix_len: int = 0,
    min_df: int = 1,
) -> DataFrame:
    """Top-k corrections for ``term``: (term, distance, df), ordered by
    (distance asc, df desc, term asc) — DirectSpellChecker's
    score-then-frequency comparator with a deterministic tie-break.
    The query term itself is excluded (it is not a correction)."""
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    td = searcher.index.term_dict
    cand = td.filter(
        (F.length("term") >= F.lit(len(term) - max_edits))
        & (F.length("term") <= F.lit(len(term) + max_edits))
        & (F.col("term") != F.lit(term))
        & (F.col("df") >= F.lit(int(min_df)))
    )
    if prefix_len > 0:
        lo = term[:prefix_len]
        # prefix range: [lo, lo + MAX_CHAR) — pushes into the term-sorted scan
        cand = cand.filter(F.col("term").startswith(lo))
    scored = cand.select(
        "term",
        F.levenshtein(F.col("term"), F.lit(term)).cast("int").alias("distance"),
        F.col("df").cast("long").alias("df"),
    ).filter(F.col("distance") <= max_edits)
    return scored.orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    ).limit(k)


def infix_suggest(
    suggestions: DataFrame,
    query: str,
    k: int = 5,
    text_col: str = "suggestion",
    weight_col: str = "weight",
    highlight: bool = False,
) -> DataFrame:
    """Infix autocomplete over a suggestion table — the
    AnalyzingInfixSuggester surface (upstream Lucene suggest module; beyond
    the reference repo's own port surface, like DirectSpellChecker above).

    Published semantics: the query's FINAL token matches any suggestion
    token by PREFIX; every earlier query token must match a suggestion
    token exactly (AnalyzingInfixSuggester.lookup's finalToken PrefixQuery
    + TermQuery clauses). Results rank by weight desc (the suggester's
    sort), tie-broken by suggestion asc for determinism.

    ``highlight=True`` adds a ``highlighted`` column wrapping every matched
    token in <b>..</b> (the suggester's highlight=true form) — built from
    array ops, not regex, so it is engine-portable and stays JVM-side.

    Scale shape: one filter + TakeOrdered over the suggestion table (pure
    column predicates — `exists` over the token array is whole-stage
    codegen); no shuffle, no Python. A 10^9-row suggestion table scans in
    parallel and returns k rows."""
    toks = [t for t in query.strip().split() if t]
    if not toks:
        raise ValueError("empty suggest query")
    last, full = toks[-1], toks[:-1]
    arr = F.split(F.col(text_col), " ")
    cond = F.exists(arr, lambda t: t.startswith(last))
    for t in full:
        cond = cond & F.array_contains(arr, t)
    out = suggestions.filter(cond)
    if highlight:
        exact = ", ".join("'" + t.replace("'", "''") + "'" for t in full)
        in_full = f" OR t IN ({exact})" if full else ""
        lastq = last.replace("'", "''")
        out = out.withColumn(
            "highlighted",
            F.expr(
                f"array_join(transform(split({text_col}, ' '), "
                f"t -> CASE WHEN startswith(t, '{lastq}'){in_full} "
                f"THEN concat('<b>', t, '</b>') ELSE t END), ' ')"
            ),
        )
    return out.orderBy(
        F.desc(weight_col), F.asc(text_col)
    ).limit(int(k))
