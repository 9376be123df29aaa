"""Index sorting (IndexWriterConfig.setIndexSort analog) + early termination.

docIDs assigned by assign_doc_ids_sorted follow the index sort, so
search_sorted over a matching sort prefix early-terminates: posting blocks
beyond the doc_id bound are pruned via the level-0 skip column
(min_doc_id) before decode — the CollectionTerminatedException analog
(Sorter.kt / SortingCodecReader.kt / TopFieldCollector early exit).
"""

import pytest
from pyspark.sql import functions as F

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids_sorted, build_index
from lucene_kmp_spark.index.builder import InvertedIndex
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import MatchAllDocsQuery, TermQuery


@pytest.fixture(scope="module")
def env(spark):
    base = synth_transcripts(spark, n_convs=40, seed=41).withColumn(
        "n_chars", F.length("text")
    )
    docs = assign_doc_ids_sorted(
        base, (("n_chars", True),), key_cols=("conv_id", "turn_idx")
    ).persist()
    docs.count()
    idx = build_index(docs, index_sort=(("n_chars", True),))
    return IndexSearcher(idx), docs, idx


def _expected(docs, term, k, ascending=True):
    rows = [
        (r["doc_id"], r["n_chars"])
        for r in docs.select("doc_id", "n_chars", "text").collect()
        if term is None or term in r["text"].lower().split()
    ]
    rows.sort(key=lambda t: (t[1] if ascending else -t[1], t[0]))
    return rows[:k]


def test_docids_follow_index_sort(env):
    _, docs, _ = env
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.select("doc_id", "n_chars").collect()]
    rows.sort()
    lens = [n for _, n in rows]
    assert lens == sorted(lens)


def test_early_terminated_equals_full_sort(env):
    s, docs, _ = env
    got = [
        (r["doc_id"], r["n_chars"])
        for r in s.search_sorted(TermQuery("the"), [("n_chars", True)], k=10).collect()
    ]
    assert got == _expected(docs, "the", 10)


def test_widening_on_rare_term(env):
    # a term sparse enough that the first bound may not hold k matches
    s, docs, _ = env
    term = "w0005"
    got = [
        (r["doc_id"], r["n_chars"])
        for r in s.search_sorted(TermQuery(term), [("n_chars", True)], k=10).collect()
    ]
    assert got == _expected(docs, term, 10)
    assert got, "rare term absent from corpus — pick another"


def test_match_all_early_termination(env):
    s, docs, _ = env
    got = [
        (r["doc_id"], r["n_chars"])
        for r in s.search_sorted(MatchAllDocsQuery(), [("n_chars", True)], k=7).collect()
    ]
    assert got == _expected(docs, None, 7)


def test_non_matching_sort_falls_back(env):
    # descending sort does not match the ascending index sort -> full path,
    # still correct
    s, docs, _ = env
    got = [
        (r["doc_id"], r["n_chars"])
        for r in s.search_sorted(TermQuery("the"), [("n_chars", False)], k=5).collect()
    ]
    assert got == _expected(docs, "the", 5, ascending=False)


def test_early_termination_respects_deletes(env, spark):
    s, docs, idx = env
    # delete the first 3 docs in index order that contain 'the'
    first = _expected(docs, "the", 3)
    dead = {d for d, _ in first}
    # live_filter holds DELETED doc ids (anti-joined, liveDocs analog)
    live = spark.createDataFrame([(d,) for d in sorted(dead)], "doc_id long")
    s2 = IndexSearcher(idx, live_filter=live)
    got = [
        r["doc_id"]
        for r in s2.search_sorted(TermQuery("the"), [("n_chars", True)], k=5).collect()
    ]
    assert not (set(got) & dead)
    assert got == [d for d, _ in _expected(docs, "the", 8) if d not in dead][:5]


def test_index_sort_manifest_roundtrip(env, spark, tmp_path):
    _, _, idx = env
    path = str(tmp_path / "sorted_idx")
    idx.write(path)
    idx2 = InvertedIndex.read(spark, path)
    assert idx2.extra["index_sort"] == (("n_chars", True),)
