"""Trained document-quality classifier (CCNet / LLaMA-style fastText
filter re-expressed on pyspark.ml).

The canonical LLM-corpus pipeline trains a cheap linear classifier to
separate "reference-quality" text from crawl noise and keeps documents
the model scores highly (CCNet, Wenzek et al. 2020; LLaMA trained a
fastText Wikipedia-reference classifier). fastText is a bag-of-hashed-
n-gram linear model — exactly HashingTF + LogisticRegression, which
pyspark.ml runs distributed: feature hashing is a narrow map, the
LBFGS fit is treeAggregate (partial gradients combine map-side), and
scoring is a broadcast of the coefficient vector.

No counterpart in /root/reference (the reference has no trained
filters); part of the beyond-reference training-data-pipeline family.

Weak supervision: labels come from a deterministic rule (unique-word
ratio > 0.5 — the registry's type-token diversity score), so the whole
train/score path is reproducible and the invariant projection is
oracle-able: label counts are plain SQL, model quality is asserted as
threshold booleans (same pattern as kmeans_cluster_invariants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIQUE_RATIO_THRESHOLD = 0.5
NUM_FEATURES = 256
SEED = 42


def weak_labels(docs: DataFrame) -> DataFrame:
    """Deterministic weak-label rule shared verbatim with the SQL
    oracle: positive iff distinct-word ratio exceeds the threshold."""
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        words.alias("words"),
        (
            (F.size(F.array_distinct(words)) / F.size(words))
            > UNIQUE_RATIO_THRESHOLD
        )
        .cast("double")
        .alias("label"),
    )


def train_quality_model(labeled: DataFrame):
    """Fit HashingTF + LogisticRegression; returns (model, featurized).

    Deterministic: murmur3 feature hashing, fixed seed, and an LBFGS
    fit whose treeAggregate order is fixed by the input partitioning.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=NUM_FEATURES
    )
    feats = tf.transform(labeled)
    lr = LogisticRegression(
        maxIter=25, regParam=0.01, featuresCol="features", labelCol="label"
    )
    return lr.fit(feats), feats


def quality_scores(model, featurized: DataFrame) -> DataFrame:
    """Score documents; probability of the positive (high-quality)
    class, plus the hard prediction."""
    from pyspark.ml.functions import vector_to_array

    pred = model.transform(featurized)
    pos_prob = F.element_at(vector_to_array("probability"), 2)
    return pred.select(
        "doc_id",
        "label",
        F.col("prediction").alias("prediction"),
        pos_prob.alias("quality_prob"),
    )
