"""Monitor (percolation / reverse search) — upstream Lucene monitor module
surface; verified against a pure-python re-evaluation of every registered
query over every doc (the exhaustive oracle the presearcher must never
under-select against)."""

import pytest

from lucene_kmp_spark.analysis.standard import analyze
from lucene_kmp_spark.search.monitor import Monitor, _presearch_terms, _verify
from lucene_kmp_spark.search.query import (
    BooleanQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
)

DOCS = [
    (0, "alpha beta gamma delta order sort merge"),
    (1, "beta gamma sort order alpha alpha"),
    (2, "omicron rho sigma"),
    (3, "merge scan sort beta"),
    (4, "merge scan beta gamma"),
    (5, ""),
]

QUERIES = {
    "t_merge": TermQuery("merge"),
    "b_and_not": BooleanQuery.build(
        must=[TermQuery("merge"), TermQuery("scan")], must_not=[TermQuery("sort")]
    ),
    "p_order_sort": PhraseQuery(("order", "sort")),
    "pre_ga": PrefixQuery("ga"),
    "msm2": BooleanQuery.build(
        should=[TermQuery("alpha"), TermQuery("beta"), TermQuery("sigma")],
        minimum_should_match=2,
    ),
    "all": MatchAllDocsQuery(),
    "in_set": TermInSetQuery(("omicron", "delta")),
}


def _positions(text):
    terms, positions, _ = analyze(text)
    pos = {}
    for t, p in zip(terms, positions):
        pos.setdefault(t, []).append(p)
    return pos


def _expected():
    out = set()
    for doc_id, text in DOCS:
        pos = _positions(text)
        if not pos:  # empty docs never reach the tokenizer output
            continue
        for qid, q in QUERIES.items():
            if _verify(q, pos):
                out.add((doc_id, qid))
    return out


def test_match_equals_exhaustive_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    m = Monitor(spark)
    for qid, q in QUERIES.items():
        m.register(qid, q)
    got = {(r["doc_id"], r["query_id"]) for r in m.match(docs).collect()}
    assert got == _expected()
    # spot checks of the semantics themselves
    assert (3, "b_and_not") not in got  # has sort
    assert (4, "b_and_not") in got
    assert (1, "p_order_sort") not in got  # "sort order", wrong order
    assert (0, "p_order_sort") in got
    assert (0, "pre_ga") in got and (3, "pre_ga") not in got
    assert (2, "all") in got and (5, "all") not in got


def test_presearcher_never_underselects():
    # candidate completeness: every verified match's doc must contain a
    # presearcher term (or the query is ANYTOKEN)
    for qid, q in QUERIES.items():
        terms = _presearch_terms(q)
        if terms is None:
            continue
        for doc_id, text in DOCS:
            pos = _positions(text)
            if pos and _verify(q, pos):
                assert any(t in pos for t in terms), (qid, doc_id)


def test_presearcher_conjunction_picks_cheapest():
    q = BooleanQuery.build(
        must=[TermInSetQuery(("a", "b", "c")), TermQuery("zz")],
    )
    assert _presearch_terms(q) == {"zz"}


def test_register_rejects_sloppy_phrase(spark):
    m = Monitor(spark)
    with pytest.raises(ValueError):
        m.register("x", PhraseQuery(("a", "b"), slop=2))


def test_deregister(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    m = Monitor(spark)
    m.register("t", TermQuery("merge"))
    m.register("u", TermQuery("beta"))
    m.deregister("t")
    got = {r["query_id"] for r in m.match(docs).collect()}
    assert got == {"u"}


def test_monitor_stream_foreachbatch(spark, tmp_path):
    """Streaming percolation: the stateless batch op applied per micro-batch
    equals the batch run over the union — the alerting-flow twin."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string").filter("text <> ''")
    src = str(tmp_path / "incoming")
    docs.filter("doc_id < 3").coalesce(1).write.parquet(src + "/f1")
    docs.filter("doc_id >= 3").coalesce(1).write.parquet(src + "/f2")

    m = Monitor(spark)
    for qid, q in QUERIES.items():
        m.register(qid, q)

    got = []

    def per_batch(batch_df, _bid):
        got.extend(
            (r["doc_id"], r["query_id"]) for r in m.match(batch_df).collect()
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream.writeStream.foreachBatch(per_batch).trigger(availableNow=True).start()
    q.awaitTermination(timeout=180)
    assert set(got) == _expected()
