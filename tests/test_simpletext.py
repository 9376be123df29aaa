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


def test_offsets_index_rejected(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=3, seed=1))
    idx = build_index(docs, index_options="offsets")
    with pytest.raises(NotImplementedError):
        write_simpletext(idx, "/tmp/should-not-write")
