"""DelimitedPayloadTokenFilter goldens (TestDelimitedPayloadTokenFilter.kt)
+ end-to-end payload storage through build_index/postings_view."""
import pytest

from lucene_kmp_spark.analysis.payloads import (
    decode_float_payload, decode_identity_payload,
    delimited_payload_components, encode_float_payload,
    encode_identity_payload, encode_int_payload)


def test_payload_goldens_identity():
    analyzer, pfn = delimited_payload_components()
    text = "The quick|JJ red|JJ fox|NN jumped|VB over the lazy|JJ brown|JJ dogs|NN"
    terms, positions, starts, ends, n = analyzer(text)
    assert terms == ["The", "quick", "red", "fox", "jumped", "over", "the",
                     "lazy", "brown", "dogs"]
    pays = [pfn(t, p, s, e)
            for t, p, s, e in zip(terms, positions, starts, ends)]
    decoded = [decode_identity_payload(v) for v in pays]
    assert decoded == ["", "JJ", "JJ", "NN", "VB", "", "", "JJ", "JJ", "NN"]


def test_payload_encoders():
    assert encode_int_payload("42") == 42
    f = encode_float_payload("1.5")
    assert decode_float_payload(f) == 1.5
    assert decode_identity_payload(encode_identity_payload("JJ")) == "JJ"
    assert decode_identity_payload(encode_identity_payload("")) == ""


def test_end_to_end_payload_index(spark):
    from lucene_kmp_spark.index import build_index
    from lucene_kmp_spark.search.executor import IndexSearcher

    analyzer, pfn = delimited_payload_components(encoder="int",
                                                 lowercase=True)
    docs = spark.createDataFrame(
        [(0, "alpha|3 beta|7 alpha|5"), (1, "beta|2 gamma")],
        ["doc_id", "text"])
    idx = build_index(docs, text_col="text", analyzer=analyzer,
                      index_options="offsets", payload_fn=pfn)
    s = IndexSearcher(idx)
    view = s.term_occurrences(["alpha"]).collect()
    got = sorted((r.doc_id, r.position, r.payload) for r in view)
    assert got == [(0, 0, 3), (0, 2, 5)]
    scores = {r.doc_id: r.score
              for r in s.payload_scores("beta", agg="sum").collect()}
    assert scores == {0: 7.0, 1: 2.0}
