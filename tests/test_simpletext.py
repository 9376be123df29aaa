"""SimpleText codec analog: plain-text dump + parallel reload round-trip
(codecs/simpletext/SimpleTextPostingsFormat.kt)."""

import os

import numpy as np
import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.index.simpletext import read_simpletext, write_simpletext
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import BooleanQuery, PhraseQuery, TermQuery


@pytest.fixture(scope="module")
def rt(spark, tmp_path_factory):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=30, seed=11)).persist()
    docs.count()
    idx = build_index(docs)
    path = str(tmp_path_factory.mktemp("st") / "idx")
    write_simpletext(idx, path)
    back = read_simpletext(spark, path)
    return idx, back, path


def _topk(idx, q, k=10):
    return [
        (r["doc_id"], np.float32(r["score"]))
        for r in IndexSearcher(idx).top_k(q, k).collect()
    ]


@pytest.mark.parametrize(
    "q",
    [
        TermQuery("hope"),
        BooleanQuery.build(must=(TermQuery("hope"), TermQuery("light"))),
        PhraseQuery(("the", "light")),  # exercises position round-trip
    ],
    ids=["term", "bool", "phrase"],
)
def test_roundtrip_scores(rt, q):
    idx, back, _ = rt
    assert _topk(idx, q) == _topk(back, q)


def test_roundtrip_stats(rt):
    idx, back, _ = rt
    assert back.stats.doc_count == idx.stats.doc_count
    assert back.stats.sum_total_term_freq == idx.stats.sum_total_term_freq
    assert back.stats.num_terms == idx.stats.num_terms
    assert back.stats.max_doc == idx.stats.max_doc


def test_dump_is_grepable_text(rt, spark):
    _, _, path = rt
    part = sorted(
        f
        for f in os.listdir(os.path.join(path, "postings.pst"))
        if f.startswith("part-")
    )[0]
    with open(os.path.join(path, "postings.pst", part)) as f:
        line = f.readline().strip()
    term, doc, tf, norm, pos = line.split("\t")
    assert term and doc.isdigit() and tf.isdigit() and norm.isdigit()
    assert len(pos.split(",")) == int(tf)


def test_offsets_payloads_roundtrip(spark, tmp_path):
    """OFFSETS + PAYLOADS cells round-trip through the text format
    (SimpleTextFieldsWriter's s/e/pay lines): per-occurrence char offsets
    and int payloads come back identical, and payload scoring agrees."""
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=8, seed=1)).persist()
    docs.count()
    idx = build_index(
        docs,
        index_options="offsets",
        payload_fn=lambda term, pos, start, end: len(term) + pos,
    )
    path = str(tmp_path / "st_off")
    write_simpletext(idx, path)
    back = read_simpletext(spark, path)
    assert back.extra["index_options"] == "offsets" and back.extra["has_payloads"]

    def occs(i, term):
        return sorted(
            (r["doc_id"], r["position"], r["start_offset"], r["end_offset"])
            for r in IndexSearcher(i).term_offsets(term).collect()
        )

    for t in ("hope", "the"):
        assert occs(idx, t) == occs(back, t) and len(occs(idx, t)) > 0

    def pay(i):
        return sorted(
            (r["doc_id"], r["score"])
            for r in IndexSearcher(i).payload_scores("hope", agg="sum").collect()
        )

    assert pay(idx) == pay(back) and len(pay(idx)) > 0

    # the sixth field is grep-able start:end pairs, one per occurrence
    import glob

    part = sorted(glob.glob(os.path.join(path, "postings.pst", "part-*")))[0]
    with open(part) as f:
        parts = f.readline().strip().split("\t")
    assert len(parts) == 7
    assert all(":" in p for p in parts[5].split(","))
    assert len(parts[5].split(",")) == int(parts[2]) == len(parts[6].split(","))
