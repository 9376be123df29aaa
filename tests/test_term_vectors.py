"""Term vectors: build option, reader API, write/read round-trip.

The forward index analog of Lucene90TermVectorsFormat / TermVectors.get(docID).
"""

import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.index.builder import InvertedIndex
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.analysis import analyze


@pytest.fixture(scope="module")
def env(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=31)).persist()
    docs.count()
    idx = build_index(docs, term_vectors=True)
    rows = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    return IndexSearcher(idx), rows, idx


def _expected_vector(text):
    terms, positions, _ = analyze(text)
    vec = {}
    for t, p in zip(terms, positions):
        vec.setdefault(t, []).append(p)
    return {t: (len(ps), sorted(ps)) for t, ps in vec.items()}


def test_term_vector_matches_analyzer(env):
    s, rows, _ = env
    for doc_id in sorted(rows)[:5]:
        got = {
            r["term"]: (r["tf"], sorted(r["positions"]))
            for r in s.term_vector(doc_id).collect()
        }
        assert got == _expected_vector(rows[doc_id]), doc_id


def test_term_vector_requires_build_flag(spark):
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=2, seed=5))
    idx = build_index(docs)
    with pytest.raises(ValueError, match="term_vectors=True"):
        IndexSearcher(idx).term_vector(0)


def test_term_vector_write_read_roundtrip(env, spark, tmp_path):
    s, rows, idx = env
    path = str(tmp_path / "tvidx")
    idx.write(path)
    idx2 = InvertedIndex.read(spark, path)
    assert idx2.term_vectors is not None
    s2 = IndexSearcher(idx2)
    doc_id = sorted(rows)[3]
    a = sorted((r["term"], r["tf"]) for r in s.term_vector(doc_id).collect())
    b = sorted((r["term"], r["tf"]) for r in s2.term_vector(doc_id).collect())
    assert a == b and a
