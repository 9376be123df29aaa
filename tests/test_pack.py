"""Sequence packing (pipeline/pack.py): concat-then-chunk offsets vs an
independent scalar model, partition invariance, and next-fit bin
invariants. Cross-engine value parity for pack_sequences is pinned by the
driver oracle (see __spark_entry__.py `pack_sequences`)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.pipeline import pack


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 7) % 23 + 1)))
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _scalar_layout(rows, salt="pack"):
    """Independent model: global (md5 key, id) order, running offsets."""
    keyed = [
        (hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8], i, len(t.split()))
        for i, t in rows
    ]
    keyed.sort()
    out, acc = {}, 0
    for _k, i, n in keyed:
        out[i] = (acc, n)
        acc += n
    return out


def test_pack_offsets_matches_scalar_model(spark, docs):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    expect = _scalar_layout(rows)
    got = {
        r["doc_id"]: (r["start_offset"], r["n_tokens"])
        for r in pack.pack_sequences(docs, ctx_len=16).collect()
    }
    assert got == expect


def test_pack_sequences_window_math(spark, docs):
    ctx = 16
    for r in pack.pack_sequences(docs, ctx_len=ctx).collect():
        s, n = r["start_offset"], r["n_tokens"]
        assert r["seq_first"] == s // ctx
        assert r["seq_last"] == (s + max(n, 1) - 1) // ctx
        assert r["off_in_seq"] == s % ctx


def test_pack_offsets_partition_invariant(spark, docs):
    a = pack.pack_sequences(docs, ctx_len=16).orderBy("doc_id").collect()
    b = (
        pack.pack_sequences(docs.repartition(7, "text"), ctx_len=16)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_pack_offsets_are_dense(spark, docs):
    """Offsets tile the token stream exactly: sorted (start, start+n) spans
    are contiguous from 0."""
    got = sorted(
        (r["start_offset"], r["n_tokens"])
        for r in pack.pack_sequences(docs, ctx_len=16).collect()
    )
    acc = 0
    for s, n in got:
        assert s == acc
        acc += n


def test_next_fit_bins_respect_ctx(spark, docs):
    ctx = 24
    rows = pack.pack_next_fit(docs, ctx_len=ctx).collect()
    fills = {}
    for r in rows:
        fills.setdefault(r["bin_id"], []).append(
            (r["bin_fill_before"], r["n_tokens"])
        )
    for bin_id, members in fills.items():
        members.sort()
        acc = 0
        for before, n in members:
            assert before == acc
            acc += n
        # a bin only exceeds ctx when it holds a single oversized doc
        assert acc <= ctx or len(members) == 1


def test_next_fit_scalar_model(spark, docs):
    """Within each bucket the greedy next-fit walk matches an independent
    scalar replay."""
    ctx = 24
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    keyed = sorted(
        (hashlib.md5(f"pack|{i}".encode()).hexdigest()[:8], i, len(t.split()))
        for i, t in rows
    )
    expect = {}
    state = {}  # bucket -> [bin_idx, fill]
    for k, i, n in keyed:
        bucket = k[:2]
        bin_idx, fill = state.get(bucket, (0, 0))
        if fill > 0 and fill + n > ctx:
            bin_idx, fill = bin_idx + 1, 0
        expect[i] = (f"{bucket}-{bin_idx}", fill)
        fill += n
        if fill >= ctx:
            bin_idx, fill = bin_idx + 1, 0
        state[bucket] = (bin_idx, fill)
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_fill_before"])
        for r in pack.pack_next_fit(docs, ctx_len=ctx).collect()
    }
    assert got == expect


def test_pack_custom_token_column(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 5)], "doc_id long, toks long"
    )
    out = pack.pack_offsets(df, n_tokens_col="toks").collect()
    # dense tiling regardless of hash order
    spans = sorted((r["start_offset"], r["toks"]) for r in out)
    acc = 0
    for s, n in spans:
        assert s == acc
        acc += n
