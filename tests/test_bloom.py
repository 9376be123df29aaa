"""Bloom-filtered term dictionaries (codecs/bloom analog).

FuzzySet.kt semantics: MurmurHash3 x64/128 (seed 104729), k positions
``(lsb + i*msb) & bloomSize`` over all-ones-sized bitsets, AND-modulo
downsize; BloomFilteringPostingsFormat consult = segment pruning in the
composite reader; DefaultBloomFilterFactory sizing/saturation policy."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_kmp_spark.util.bloom import (
    USABLE_BITSET_SIZES,
    FuzzySet,
    murmur3_x64_128,
    murmur3_x64_128_scalar,
    segment_may_match,
)
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    SynonymQuery,
    TermQuery,
)


# ------------------------------------------------------------------ murmur
@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64), st.integers(0, 2**31 - 1))
def test_murmur_vectorized_matches_independent_scalar(data, seed):
    """Two independent implementations of the published algorithm agree
    (the vectorized path is grouped/padded; the scalar one is a direct
    transcription of the spec)."""
    msb, lsb = murmur3_x64_128([data], seed=seed)
    h1, h2 = murmur3_x64_128_scalar(data, seed=seed)
    assert int(msb[0]) == h1 and int(lsb[0]) == h2


def test_murmur_batch_order_and_length_grouping():
    vals = [b"", b"a", b"ab", b"0123456789abcdef", b"0123456789abcdefX", b"a" * 33, b"b"]
    msb, lsb = murmur3_x64_128(vals)
    for i, v in enumerate(vals):
        h1, h2 = murmur3_x64_128_scalar(v)
        assert (int(msb[i]), int(lsb[i])) == (h1, h2)


# ---------------------------------------------------------------- FuzzySet
def test_usable_sizes_are_all_ones():
    for s in USABLE_BITSET_SIZES:
        assert bin(s).count("0") == 1  # only the leading 0b prefix's 'b'... use format
        assert format(s, "b") == "1" * format(s, "b").count("1")


def test_no_false_negatives_and_bounded_fpp():
    fz = FuzzySet.create_optimal_set(2000)
    present = [f"term-{i}".encode() for i in range(2000)]
    fz.add_values(present)
    assert fz.contains_batch(present).all(), "bloom NO on a present term = false negative"
    absent = [f"absent-{i}".encode() for i in range(20000)]
    assert fz.contains_batch(absent).mean() < 0.25  # target fpp 0.1023, generous margin


def test_downsize_keeps_no_false_negatives():
    fz = FuzzySet.create_set_based_on_max_memory(1 << 16)  # oversized for 100 values
    present = [f"v{i}".encode() for i in range(100)]
    fz.add_values(present)
    small = fz.downsize(0.5)
    assert small is not None and small.bloom_size < fz.bloom_size
    assert small.contains_batch(present).all()


def test_serialize_round_trip():
    fz = FuzzySet.create_optimal_set(50)
    fz.add_values([b"alpha", b"beta"])
    rt = FuzzySet.from_b64(fz.to_b64())
    assert rt.bloom_size == fz.bloom_size and rt.hash_count == fz.hash_count
    assert (rt.bits == fz.bits).all()
    assert rt.contains(b"alpha") == FuzzySet.MAYBE


# ------------------------------------------------------- query prune logic
def _contains_in(vocab):
    return lambda t: t in vocab


def test_segment_may_match_shapes():
    c = _contains_in({"a", "b"})
    assert segment_may_match(TermQuery("a"), c)
    assert not segment_may_match(TermQuery("z"), c)
    # conjunction: one absent MUST kills the segment
    assert not segment_may_match(
        BooleanQuery.build(must=[TermQuery("a"), TermQuery("z")]), c)
    assert segment_may_match(BooleanQuery.build(must=[TermQuery("a"), TermQuery("b")]), c)
    # pure disjunction: any present branch keeps it
    assert segment_may_match(BooleanQuery.build(should=[TermQuery("z"), TermQuery("b")]), c)
    assert not segment_may_match(BooleanQuery.build(should=[TermQuery("z"), TermQuery("y")]), c)
    # phrase requires all terms
    assert not segment_may_match(PhraseQuery(("a", "z")), c)
    # multi-phrase: each slot any-of
    assert segment_may_match(MultiPhraseQuery((("a", "z"), ("b",))), c)
    assert not segment_may_match(MultiPhraseQuery((("z", "y"), ("b",))), c)
    assert segment_may_match(SynonymQuery(("z", "b")), c)
    assert not segment_may_match(SynonymQuery(("z", "y")), c)
    assert segment_may_match(DisjunctionMaxQuery((TermQuery("z"), TermQuery("a"))), c)
    assert not segment_may_match(ConstantScoreQuery(TermQuery("z")), c)
    # MUST_NOT never prunes; unknown shapes never prune
    assert segment_may_match(
        BooleanQuery.build(must=[TermQuery("a")], must_not=[TermQuery("z")]), c)
    assert segment_may_match(PrefixQuery("zz"), c)


# ----------------------------------------------------- end-to-end pruning
@pytest.fixture(scope="module")
def bloom_writer(spark, tmp_path_factory):
    from lucene_kmp_spark.index.segments import SegmentedIndexWriter

    root = str(tmp_path_factory.mktemp("bloomidx"))
    w = SegmentedIndexWriter(spark, root)
    rows = []
    for seg in range(3):
        for d in range(40):
            text = f"common words fill document {d} of segment block"
            if seg == 1:
                text += " zanzibar"  # marker term lives ONLY in segment 1
            rows.append((f"c{seg}-{d}", 0, text))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    for seg in range(3):
        w.add_batch(df.filter(F.col("conv_id").startswith(f"c{seg}")), batch_key=f"b{seg}")
    return w


from pyspark.sql import functions as F  # noqa: E402


def test_segments_written_with_bloom(bloom_writer):
    m = bloom_writer.manifest()
    assert len(m["segments"]) == 3
    assert all(s["bloom"] for s in m["segments"])


def test_pruned_reader_skips_provably_absent_segments(bloom_writer):
    q = TermQuery("zanzibar")
    r = bloom_writer.reader(prune_query=q)
    assert len(r.pruned_segments) == 2  # segments 0 and 2 cannot match
    full = bloom_writer.reader()
    got = r.searcher().top_k(q, k=10).collect()
    want = full.searcher().top_k(q, k=10).collect()
    assert [(x["doc_id"], np.float32(x["score"])) for x in got] == [
        (x["doc_id"], np.float32(x["score"])) for x in want
    ]
    assert len(want) == 10


def test_pruned_conjunction_and_stats_parity(bloom_writer):
    # 'common' is everywhere; 'zanzibar' only in segment 1 -> AND prunes 2 segs
    q = BooleanQuery.build(must=[TermQuery("common"), TermQuery("zanzibar")])
    r = bloom_writer.reader(prune_query=q)
    assert len(r.pruned_segments) == 2
    full = bloom_writer.reader()
    assert r.index.stats.doc_count == full.index.stats.doc_count
    assert r.index.stats.sum_total_term_freq == full.index.stats.sum_total_term_freq
    got = r.searcher().top_k(q, k=5).collect()
    want = full.searcher().top_k(q, k=5).collect()
    assert [(x["doc_id"], np.float32(x["score"])) for x in got] == [
        (x["doc_id"], np.float32(x["score"])) for x in want
    ]


def test_all_pruned_keeps_one_segment_for_schema(bloom_writer):
    # find a term every segment's bloom answers NO for (false positives are
    # deterministic per term, so probe candidates until one misses everywhere)
    import os

    blooms = []
    for s in bloom_writer.manifest()["segments"]:
        p = os.path.join(bloom_writer.root, "segments", s["id"], "bloom.bin")
        with open(p, "rb") as f:
            blooms.append(FuzzySet.deserialize(f.read()))
    term = next(
        t for t in (f"wholly-absent-{i}" for i in range(1000))
        if all(not b.contains_batch([t.encode()])[0] for b in blooms)
    )
    r = bloom_writer.reader(prune_query=TermQuery(term))
    assert len(r.pruned_segments) == 2  # one segment retained by design
    assert r.searcher().top_k(TermQuery(term), k=5).count() == 0


def test_disjunction_keeps_any_maybe_segment(bloom_writer):
    import os

    blooms = []
    for s in bloom_writer.manifest()["segments"]:
        p = os.path.join(bloom_writer.root, "segments", s["id"], "bloom.bin")
        with open(p, "rb") as f:
            blooms.append(FuzzySet.deserialize(f.read()))
    absent = next(
        t for t in (f"nowhere-{i}" for i in range(1000))
        if all(not b.contains_batch([t.encode()])[0] for b in blooms)
    )
    q = BooleanQuery.build(should=[TermQuery("zanzibar"), TermQuery(absent)])
    r = bloom_writer.reader(prune_query=q)
    assert len(r.pruned_segments) == 2


def test_bloom_survives_merge(bloom_writer, spark):
    from lucene_kmp_spark.index.segments import SegmentedIndexWriter

    import shutil, tempfile, os

    root = tempfile.mkdtemp(prefix="bloommerge")
    try:
        w = SegmentedIndexWriter(spark, root)
        rows = [(f"m{d}", 0, "alpha beta gamma" + (" zebra" if d < 3 else "")) for d in range(20)]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        w.add_batch(df.filter(F.col("conv_id").isin([f"m{d}" for d in range(10)])), batch_key="a")
        w.add_batch(df.filter(~F.col("conv_id").isin([f"m{d}" for d in range(10)])), batch_key="b")
        w.force_merge(1)
        m = w.manifest()
        assert len(m["segments"]) == 1 and m["segments"][0]["bloom"]
        r = w.reader(prune_query=TermQuery("zebra"))
        assert r.searcher().top_k(TermQuery("zebra"), k=5).count() == 3
    finally:
        shutil.rmtree(root, ignore_errors=True)
