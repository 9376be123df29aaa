"""Term ordinals (codecs/blocktreeords/BlockTreeOrdsPostingsFormat.kt:
OrdsSegmentTermsEnum.seekExact(ord)/ord(), index/OrdTermState.kt) and
OrdinalMap (index/OrdinalMap.kt) semantics over the derived term ranking."""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.index.ords import (
    ord_for_term,
    ordinal_map,
    term_for_ord,
    term_ordinals,
)


@pytest.fixture(scope="module")
def idx(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=30, seed=77)).persist()
    docs.count()
    return build_index(docs)


def test_ords_dense_and_sorted(idx):
    rows = term_ordinals(idx).orderBy("ord").collect()
    terms = [r["term"] for r in rows]
    assert [r["ord"] for r in rows] == list(range(len(rows)))  # dense 0..V-1
    assert terms == sorted(terms)  # ord order IS term-sorted order
    # df/ttf carried through unchanged
    td = {r["term"]: (r["df"], r["ttf"]) for r in idx.term_dict.collect()}
    for r in rows:
        assert (r["df"], r["ttf"]) == td[r["term"]]


def test_ords_partition_invariant(idx):
    a = [(r["ord"], r["term"]) for r in term_ordinals(idx, num_partitions=2).orderBy("ord").collect()]
    b = [(r["ord"], r["term"]) for r in term_ordinals(idx, num_partitions=17).orderBy("ord").collect()]
    assert a == b


def test_seek_roundtrip(idx):
    rows = term_ordinals(idx).orderBy("ord").collect()
    v = len(rows)
    for probe in {0, 1, v // 2, v - 1}:
        row = term_for_ord(idx, probe)
        assert row["ord"] == probe and row["term"] == rows[probe]["term"]
        assert ord_for_term(idx, row["term"]) == probe
    with pytest.raises(KeyError):
        ord_for_term(idx, "zzz-never-a-term")
    with pytest.raises(IndexError):
        term_for_ord(idx, v + 5)


def test_ordinal_map(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=24, seed=78)).persist()
    docs.count()
    half = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    a = build_index(docs.filter(F.col("doc_id") <= half))
    b = build_index(docs.filter(F.col("doc_id") > half))
    m = ordinal_map([a, b]).collect()

    va = sorted(r["term"] for r in a.term_dict.collect())
    vb = sorted(r["term"] for r in b.term_dict.collect())
    union = sorted(set(va) | set(vb))
    gl = {t: i for i, t in enumerate(union)}
    la = {t: i for i, t in enumerate(va)}
    lb = {t: i for i, t in enumerate(vb)}

    assert len(m) == len(va) + len(vb)
    for r in m:
        leaf_vocab = la if r["leaf"] == 0 else lb
        assert r["leaf_ord"] == leaf_vocab[r["term"]]
        assert r["global_ord"] == gl[r["term"]]
