"""Linear quality classifier — the fastText-shaped filter real curation
pipelines train (CCNet uses a fastText LM/classifier gate; FineWeb and
RefinedWeb gate on linear classifiers over cheap features; GPT-3's quality
filter was a logistic regression over hashed features). This is the
trainable complement to the heuristic ``textstats.quality_score``.

Spark-first shape:

* featurize — hashed bag-of-{words, bigrams} (the fastText trick) as a
  SPARSE MLlib vector via ``HashingTF``; tokenization is the same
  whitespace+lower pure-column pass the other pipeline ops use. One narrow
  Arrow-free pass, no shuffle.
* train — ``pyspark.ml.classification.LogisticRegression`` on a labeled
  sample (labels come from a trusted-vs-crawl contrast set, exactly like
  CCNet: target-domain docs = positives, random crawl = negatives).
  Training is iterative tree-aggregation over the sample — the sample is
  the small side (10^5-10^6 rows), never the corpus.
* score — the fitted model is a broadcast coefficient vector; scoring the
  10^12-row corpus is one map-side pass (featurize + dot product),
  no shuffle, so it composes into the same single plan as the other
  curation stages.

Determinism: HashingTF is a pure hash of tokens; LBFGS on a fixed sample
with fixed parallelism converges to the same coefficients, and scoring is
a fixed dot product — but cross-engine float parity of the TRAINED
coefficients is not a meaningful contract (no SQL oracle; iterative
training is the brief's sanctioned rows-only class, like BPE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENS = "_qc_tokens"
_FEATURES = "_qc_features"


def _with_tokens(df: DataFrame, text_col: str, bigrams: bool) -> DataFrame:
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    if bigrams:
        # word + joined-bigram hash buckets, the fastText n-gram trick.
        # zip_with pads the shorter side with NULL; emit NULL there (not a
        # bare token — concat_ws would silently drop the null half and
        # duplicate the doc's last token as a fake bigram) and filter after.
        big = F.zip_with(
            toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.when(b.isNotNull(), F.concat_ws("_", a, b)),
        )
        toks = F.concat(toks, F.filter(big, lambda x: x.isNotNull()))
    return df.withColumn(_TOKENS, toks)


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    num_features: int = 1 << 18,
    bigrams: bool = True,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the classifier on (text, label∈{0,1}) rows; returns the fitted
    MLlib model wrapped with its featurization config. The labeled set is
    the SMALL side — pass a sample, not the corpus."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    feats = HashingTF(
        inputCol=_TOKENS, outputCol=_FEATURES, numFeatures=int(num_features)
    )
    with_f = feats.transform(_with_tokens(labeled, text_col, bigrams))
    lr = LogisticRegression(
        featuresCol=_FEATURES,
        labelCol=label_col,
        regParam=float(reg_param),
        maxIter=int(max_iter),
        standardization=False,
    )
    model = lr.fit(with_f.select(_FEATURES, label_col))
    return {
        "model": model,
        "num_features": int(num_features),
        "bigrams": bool(bigrams),
        "text_col": text_col,
    }


def score_quality(df: DataFrame, clf: dict, out_col: str = "quality_prob") -> DataFrame:
    """Score a corpus: P(label=1) per doc as ``out_col``. Broadcast
    coefficients + one map-side pass — no shuffle; keep it inside the same
    plan as the rest of the curation pipeline."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    feats = HashingTF(
        inputCol=_TOKENS, outputCol=_FEATURES, numFeatures=clf["num_features"]
    )
    with_f = feats.transform(_with_tokens(df, clf["text_col"], clf["bigrams"]))
    scored = clf["model"].transform(with_f)
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability"))[1]
    ).drop(_TOKENS, _FEATURES, "rawPrediction", "probability", "prediction")


def quality_filter(
    df: DataFrame, clf: dict, threshold: float = 0.5, out_col: str = "quality_prob"
) -> DataFrame:
    """Keep docs the classifier accepts (the CCNet head/middle cut is a
    threshold on this probability)."""
    return score_quality(df, clf, out_col).filter(F.col(out_col) >= float(threshold))
