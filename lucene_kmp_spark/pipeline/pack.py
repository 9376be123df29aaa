"""Sequence packing for LLM training: place every document at a
deterministic global token offset, then map it to fixed-length training
sequences (context windows).

Two packing disciplines, both deterministic and partitioning-independent:

* ``pack_sequences`` — GPT-style concat-then-chunk: documents are laid out
  end-to-end in a canonical hash order and the stream is cut every
  ``ctx_len`` tokens; documents may straddle a cut. Per doc it reports the
  global ``start_offset``, the first/last sequence index it lands in, and
  its offset inside the first sequence. Exactly SQL-expressible (the
  driver oracle replays it as one window cumsum), so it carries a full
  value-hash oracle.
* ``pack_next_fit`` — boundary-respecting next-fit binning: walk documents
  in the same canonical order and open a new bin whenever the current doc
  does not fit; no document straddles a bin. Sequential by nature, so it
  runs as an Arrow pass per hash bucket and is verified against an
  independent scalar model in pytest (the sanctioned non-SQL class).

Scale notes (100 TB):

The naive layout is ``SUM(n) OVER (ORDER BY key)`` — a GLOBAL ordered
window, i.e. one reducer sorting the whole corpus. Instead the canonical
order is (bucket, key, id) where ``bucket`` is a fixed-width hex prefix of
``key = md5(salt|id)``, so the global cumsum decomposes exactly:

1. one tiny aggregate: per-bucket token totals (<= 16^bucket_hex rows,
   collected and prefix-summed on the driver — metadata scale),
2. one window PARTITIONED by bucket (bounded reducer groups — at
   ``bucket_hex=4`` a 100 TB corpus puts ~1.5 GB per bucket sort).

Because ``bucket`` is a prefix of ``key``, (bucket, key, id) order IS
(key, id) order, so the composition equals the single global window to
the token — the DuckDB oracle runs the naive form and hashes equal.

No counterpart in the reference (lucene-kmp indexes documents, it does
not emit training batches); this is task-brief pipeline surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _key_cols(df: DataFrame, id_col: str, salt: str, bucket_hex: int) -> DataFrame:
    key = F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    return df.withColumn("_key", key).withColumn(
        "_bucket", F.substring(F.col("_key"), 1, bucket_hex)
    )


def _bucket_offsets(df: DataFrame, n_col: str) -> dict[str, int]:
    """Driver-side prefix sums of per-bucket token totals (metadata scale:
    <= 16^bucket_hex rows)."""
    totals = (
        df.groupBy("_bucket").agg(F.sum(F.col(n_col)).alias("_total")).collect()
    )
    offsets, acc = {}, 0
    for row in sorted(totals, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = acc
        acc += row["_total"]
    return offsets


def token_count_col(text_col: str = "text"):
    """Whitespace token count — the same definition the mix operators use
    (oracle replay: ``len(string_split_regex(trim(text), '\\s+'))``)."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def pack_offsets(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "pack",
    bucket_hex: int = 2,
) -> DataFrame:
    """Assign each row its global start offset in the canonical
    md5(salt|id) layout order. Adds ``start_offset``; preserves input
    columns. Deterministic across runs/partitionings/engines."""
    keyed = _key_cols(df, id_col, salt, bucket_hex)
    offsets = _bucket_offsets(keyed, n_tokens_col)
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(n_tokens_col)).over(w), F.lit(0))
    return (
        keyed.withColumn(
            "start_offset",
            (off_map[F.col("_bucket")] + cum_before).cast("long"),
        )
        .drop("_key", "_bucket")
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    text_col: str = "text",
    n_tokens_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "pack",
    bucket_hex: int = 2,
) -> DataFrame:
    """Concat-then-chunk packing: the canonical document stream is cut
    every ``ctx_len`` tokens. Returns one row per doc with

    * ``n_tokens`` — the doc's token count,
    * ``start_offset`` — global token offset where the doc begins,
    * ``seq_first`` / ``seq_last`` — first/last ctx-window index touched,
    * ``off_in_seq`` — offset inside ``seq_first`` where the doc starts.

    A downstream batch writer groups by sequence index range; docs with
    ``seq_first != seq_last`` straddle a cut (GPT-style packing accepts
    that; use ``pack_next_fit`` for boundary-respecting bins)."""
    if n_tokens_col is None:
        df = df.withColumn("n_tokens", token_count_col(text_col))
        n_tokens_col = "n_tokens"
    out = pack_offsets(
        df, n_tokens_col=n_tokens_col, id_col=id_col, salt=salt, bucket_hex=bucket_hex
    )
    start = F.col("start_offset")
    n = F.col(n_tokens_col)
    return (
        out.withColumn("seq_first", F.floor(start / ctx_len).cast("long"))
        .withColumn(
            "seq_last",
            F.floor((start + F.greatest(n, F.lit(1)) - 1) / ctx_len).cast("long"),
        )
        .withColumn("off_in_seq", (start % ctx_len).cast("long"))
    )


def pack_next_fit(
    df: DataFrame,
    ctx_len: int,
    text_col: str = "text",
    n_tokens_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "pack",
    bucket_hex: int = 2,
) -> DataFrame:
    """Boundary-respecting next-fit packing: walk documents in canonical
    (key, id) order per hash bucket; if the current bin cannot take the
    next doc, seal it and open a new one. No doc straddles a bin; a doc
    longer than ``ctx_len`` gets a bin of its own (truncation is the
    caller's policy). Bins are namespaced per bucket (``bin_id`` =
    ``"<bucket>-<local index>"``) so buckets pack independently — the
    price is at most one partially-filled bin per bucket, bounded waste
    of ``16^bucket_hex * ctx_len`` tokens corpus-wide.

    Adds ``bin_id`` (string) and ``bin_fill_before`` (tokens already in
    the bin when this doc was placed). Sequential per bucket, so it runs
    as one Arrow pass per bucket group — bucket size bounds the memory."""
    if n_tokens_col is None:
        df = df.withColumn("n_tokens", token_count_col(text_col))
        n_tokens_col = "n_tokens"
    keyed = _key_cols(df, id_col, salt, bucket_hex)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    schema = f"{fields}, bin_id string, bin_fill_before long"
    n_col = n_tokens_col

    def _pack(key: tuple, whole: pd.DataFrame) -> pd.DataFrame:
        bucket = key[0]
        whole = whole.sort_values(["_key", id_col], kind="mergesort").reset_index(
            drop=True
        )
        bins, fills = [], []
        bin_idx, fill = 0, 0
        for n in whole[n_col].tolist():
            n = int(n)
            if fill > 0 and fill + n > ctx_len:
                bin_idx, fill = bin_idx + 1, 0
            bins.append(f"{bucket}-{bin_idx}")
            fills.append(fill)
            fill += n
            if fill >= ctx_len:
                bin_idx, fill = bin_idx + 1, 0
        whole["bin_id"] = bins
        whole["bin_fill_before"] = pd.array(fills, dtype="int64")
        return whole

    return (
        keyed.groupBy("_bucket")
        .applyInPandas(_pack, schema=schema)
        .drop("_key", "_bucket")
    )
