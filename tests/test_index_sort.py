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


# ---- IndexSortSortedNumericDocValuesRangeQuery analog ----

from lucene_kmp_spark.search.query import ColumnFilterQuery, IndexSortRangeQuery  # noqa: E402


def _range_expected(docs, lo, hi):
    return {
        r["doc_id"]
        for r in docs.select("doc_id", "n_chars").collect()
        if r["n_chars"] is not None
        and (lo is None or r["n_chars"] >= lo)
        and (hi is None or r["n_chars"] <= hi)
    }


@pytest.mark.parametrize("lo,hi", [(40, 90), (None, 60), (75, None), (10_000, 20_000)])
def test_index_sort_range_matches_predicate(env, lo, hi):
    """Sorted path == plain predicate filter, including empty ranges."""
    s, docs, _ = env
    got = {r["doc_id"] for r in s.execute(IndexSortRangeQuery("n_chars", lo, hi)).collect()}
    assert got == _range_expected(docs, lo, hi)


def test_index_sort_range_is_contiguous_and_scores_boost(env):
    s, docs, _ = env
    res = s.execute(IndexSortRangeQuery("n_chars", 40, 90, boost=2.5)).collect()
    ids = sorted(r["doc_id"] for r in res)
    assert ids == list(range(ids[0], ids[-1] + 1))  # one docID interval
    assert all(r["score"] == 2.5 for r in res)


def test_index_sort_range_fallback_on_unsorted_index(spark):
    """Index without a matching sort delegates to the fallback (or the plain
    Catalyst predicate) — same answer, no interval assumption."""
    from lucene_kmp_spark.index import assign_doc_ids

    base = synth_transcripts(spark, n_convs=15, seed=42).withColumn(
        "n_chars", F.length("text")
    )
    docs = assign_doc_ids(base).persist()
    docs.count()
    s = IndexSearcher(build_index(docs))
    exp = _range_expected(docs, 50, 80)
    got = {r["doc_id"] for r in s.execute(IndexSortRangeQuery("n_chars", 50, 80)).collect()}
    assert got == exp
    fb = ColumnFilterQuery("n_chars BETWEEN 50 AND 80")
    got_fb = {
        r["doc_id"]
        for r in s.execute(IndexSortRangeQuery("n_chars", 50, 80, fallback=fb)).collect()
    }
    assert got_fb == exp


def test_index_sort_range_nulls_never_match(spark):
    """Docs without a value sort first under nulls-first assignment and are
    excluded from every range (the docvalues-iterator semantics)."""
    base = synth_transcripts(spark, n_convs=15, seed=43).withColumn(
        "n_chars", F.when(F.col("turn_idx") % 4 == 0, None).otherwise(F.length("text"))
    )
    docs = assign_doc_ids_sorted(
        base, (("n_chars", True),), key_cols=("conv_id", "turn_idx")
    ).persist()
    docs.count()
    s = IndexSearcher(build_index(docs, index_sort=(("n_chars", True),)))
    got = {r["doc_id"] for r in s.execute(IndexSortRangeQuery("n_chars", None, None)).collect()}
    assert got == _range_expected(docs, None, None)
    assert got  # non-empty
    nulls = {r["doc_id"] for r in docs.filter("n_chars IS NULL").select("doc_id").collect()}
    assert nulls and not (got & nulls)
