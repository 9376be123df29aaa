"""Trainable quality classifier (pipeline/classifier.py): separable corpus
learned correctly, scoring deterministic, filter thresholding, bigram flag."""

import pytest
from pyspark.sql import functions as F


def _labeled(spark):
    # positives: coherent "document-like" text; negatives: boilerplate spam
    pos = [
        (i, "the quick brown fox discussed the treaty with measured analysis "
            "and the committee reviewed evidence before reaching a conclusion " + f"v{i}", 1.0)
        for i in range(60)
    ]
    neg = [
        (1000 + i, "click here buy now free free free winner winner casino "
                   "subscribe subscribe limited offer offer offer " + f"v{i}", 0.0)
        for i in range(60)
    ]
    return spark.createDataFrame(pos + neg, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def clf(spark):
    from lucene_kmp_spark.pipeline.classifier import train_quality_classifier

    return train_quality_classifier(_labeled(spark), num_features=1 << 14)


def test_learns_separable_corpus(spark, clf):
    from lucene_kmp_spark.pipeline.classifier import score_quality

    scored = score_quality(_labeled(spark), clf)
    rows = scored.select("label", "quality_prob").collect()
    acc = sum(1 for r in rows if (r["quality_prob"] >= 0.5) == (r["label"] == 1.0)) / len(rows)
    assert acc >= 0.95
    # held-out shaped probes: unseen sentences from each style
    probe = spark.createDataFrame(
        [
            (1, "the council examined the quick brown evidence with analysis"),
            (2, "free casino winner click subscribe now offer"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["quality_prob"] for r in score_quality(probe, clf).collect()}
    assert got[1] > 0.5 > got[2]


def test_scoring_deterministic_and_no_shuffle(spark, clf):
    from lucene_kmp_spark.pipeline.classifier import score_quality

    df = _labeled(spark)
    a = sorted((r["doc_id"], round(r["quality_prob"], 9)) for r in score_quality(df, clf).collect())
    b = sorted(
        (r["doc_id"], round(r["quality_prob"], 9))
        for r in score_quality(df.repartition(7), clf).collect()
    )
    assert a == b
    plan = score_quality(df, clf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]


def test_quality_filter_threshold(spark, clf):
    from lucene_kmp_spark.pipeline.classifier import quality_filter, score_quality

    df = _labeled(spark)
    kept = quality_filter(df, clf, threshold=0.5)
    assert kept.count() == score_quality(df, clf).filter(F.col("quality_prob") >= 0.5).count()
    assert {r["label"] for r in kept.select("label").distinct().collect()} == {1.0}


def test_unigram_only_mode(spark):
    from lucene_kmp_spark.pipeline.classifier import (
        score_quality,
        train_quality_classifier,
    )

    c = train_quality_classifier(_labeled(spark), bigrams=False, num_features=1 << 12)
    scored = score_quality(_labeled(spark), c)
    rows = scored.select("label", "quality_prob").collect()
    acc = sum(1 for r in rows if (r["quality_prob"] >= 0.5) == (r["label"] == 1.0)) / len(rows)
    assert acc >= 0.9
