"""Byte-pair-encoding subword tokenizer: distributed training + encoding.

The real thing, not a proxy (replaces `token_stats`' ceil(len/4) BPE-ish
estimate when exact subword counts matter): classic BPE (Sennrich et al.
2016) with an end-of-word marker.

Scale architecture — the honest one production BPE trainers use:
* The CORPUS pass is one distributed aggregate: word → count. At 10^12
  turns the word-count table is vocabulary-scale (millions of rows), ~10^6×
  smaller than the corpus.
* The merge LOOP runs driver-local over that count dict — it is a
  vocabulary-scale computation by definition (each iteration touches words,
  not occurrences), so distributing it would add shuffles to save nothing.
* ENCODING is Arrow-batched (`mapInPandas`) with a per-batch word cache:
  each distinct word is encoded once per batch, applied by merge rank
  exactly like published BPE appliers.

Determinism: ties in pair frequency break lexicographically, so the merge
table is a pure function of the word counts (and therefore of the corpus).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-scale pass."""
    return (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    min_pair_freq: int = 2,
    min_word_freq: int = 1,
    max_words: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from the corpus. Returns the ordered
    merge list (rank = position). Stops early when no pair reaches
    ``min_pair_freq``.

    Driver-memory bound: the word-count table is cut INSIDE Spark before the
    collect — ``min_word_freq`` drops the long tail (standard BPE practice;
    singleton URLs/typos/code identifiers cannot win a merge against
    ``min_pair_freq`` anyway), and ``max_words`` keeps the top-N words by
    (count desc, word asc), a deterministic cut. At 100 TB (10^8–10^9
    distinct whitespace words) the default 1M-word cap bounds the driver at
    ~100 MB; the merge loop itself is vocabulary-scale by definition.
    ``max_words=None`` removes the cap (small-corpus exact mode)."""
    wc_df = word_counts(df, text_col)
    if min_word_freq > 1:
        wc_df = wc_df.filter(F.col("cnt") >= min_word_freq)
    if max_words is not None:
        wc_df = wc_df.orderBy(F.desc("cnt"), F.asc("word")).limit(int(max_words))
    wc = {r["word"]: int(r["cnt"]) for r in wc_df.collect()}
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wc.items():
        vocab[tuple(w) + (END,)] = vocab.get(tuple(w) + (END,), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # highest count; ties prefer the lexicographically smallest pair
        (a, b), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_pair_freq:
            break
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, bpe_tokens): exact subword token count per doc under
    the learned merge table. Arrow-batched; each distinct word in a batch is
    encoded once (cache), applied lowest-rank-first like reference BPE."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def count_word(w: str) -> int:
            n = cache.get(w)
            if n is None:
                n = len(_encode_word(w, ranks))
                cache[w] = n
            return n

        for pdf in batches:
            n_words = []
            n_tok = []
            for t in pdf[text_col]:
                ws = str(t).split()
                n_words.append(len(ws))
                n_tok.append(sum(count_word(w) for w in ws))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_words": n_words,
                    "bpe_tokens": n_tok,
                }
            )

    return df.select(F.col(id_col), text_col).mapInPandas(
        gen, schema=f"{id_col} long, n_words long, bpe_tokens long"
    )
