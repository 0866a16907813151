"""Trained document-quality classifier (CCNet / LLaMA-style fastText
filter re-expressed on pyspark.ml + native SQL scoring).

The canonical LLM-corpus pipeline trains a cheap linear classifier to
separate "reference-quality" text from crawl noise and keeps documents
the model scores highly (CCNet, Wenzek et al. 2020; LLaMA trained a
fastText Wikipedia-reference classifier). fastText is a bag-of-hashed-
n-gram linear model — hashed term counts + logistic regression.

Design split (and why):

- FEATURIZATION is native SQL: bucket = ``pmod(hash(term), 256)``
  (Spark's ``hash`` = murmur3 seed 42 — the same hash family ml's
  HashingTF uses, evaluated in whole-stage codegen with no Python or
  UDF crossing). Per-doc dense vectors for the fit are assembled with
  ``map_from_entries`` + ``transform(sequence(...))`` — still codegen —
  and only bridged to VectorUDT at the very end via ``array_to_vector``
  (a stateless column function).
- The FIT is pyspark.ml LogisticRegression (distributed LBFGS via
  treeAggregate — map-side partial gradients).
- SCORING does NOT use ``model.transform``: the fitted model is one
  256-float coefficient row, extracted and joined back as a broadcast
  (bucket, coef) table; margin/sigmoid/prediction are plain SQL
  aggregates. Two reasons: (a) scoring stays whole-stage-codegen with a
  broadcast join — the 100 TB-corpus shape (model.transform would put
  a row-at-a-time ScalaUDF in the hot path); (b) the transform UDF's
  closure drags the model's training-summary DataFrame — and through
  it the live SparkSession — into task serialization, which breaks
  (``NotSerializableException: ObservationManager``) as soon as any
  Observation has been registered on the session. Broadcast-join
  scoring has no such foot-gun (regression-tested in
  tests/test_ml_operators.py::test_quality_scores_after_observation).

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


def hashed_buckets(labeled: DataFrame) -> DataFrame:
    """(doc_id, label, bucket, cnt) hashed-term counts — the sparse
    feature representation, all codegen (explode + hash + hash-agg)."""
    return (
        labeled.select(
            "doc_id", "label", F.explode("words").alias("term")
        )
        .select(
            "doc_id",
            "label",
            F.pmod(F.hash("term"), F.lit(NUM_FEATURES)).alias("bucket"),
        )
        .groupBy("doc_id", "label", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def _dense_vectors(buckets: DataFrame) -> DataFrame:
    """Assemble per-doc dense feature vectors natively: bucket→count
    map, read out over a 0..N-1 index sequence, bridged to VectorUDT
    only at the boundary the ml fit requires."""
    from pyspark.ml.functions import array_to_vector

    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket"), F.col("cnt")))
    )
    dense = (
        buckets.groupBy("doc_id", "label")
        .agg(m.alias("m"))
        .select(
            "doc_id",
            "label",
            F.transform(
                F.sequence(F.lit(0), F.lit(NUM_FEATURES - 1)),
                lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0)),
            ).alias("arr"),
        )
    )
    return dense.select(
        "doc_id", "label", array_to_vector("arr").alias("features")
    )


def train_quality_model(labeled: DataFrame):
    """Fit LogisticRegression on natively-hashed features; returns
    (model, buckets) where buckets is the sparse feature table the
    native scorer consumes.

    Deterministic: murmur3 feature hashing, fixed seed, and an LBFGS
    fit whose treeAggregate order is fixed by the input partitioning.
    """
    from pyspark.ml.classification import LogisticRegression

    buckets = hashed_buckets(labeled)
    feats = _dense_vectors(buckets)
    lr = LogisticRegression(
        maxIter=25, regParam=0.01, featuresCol="features", labelCol="label"
    )
    return lr.fit(feats), buckets


def quality_scores(model, buckets: DataFrame) -> DataFrame:
    """Score documents natively from the fitted coefficients: margin =
    intercept + Σ cnt·coef over the doc's nonzero buckets (broadcast
    (bucket, coef) join + hash-agg), probability via the logistic link,
    prediction = sign of the margin. No UDF, no model.transform — the
    scoring plan is scan → broadcast join → aggregate, all codegen."""
    spark = buckets.sparkSession
    coefs = [float(c) for c in model.coefficients.toArray()]
    coef_df = spark.createDataFrame(
        list(enumerate(coefs)), "bucket int, coef double"
    )
    b0 = float(model.intercept)
    margin = (F.sum(F.col("cnt") * F.col("coef")) + F.lit(b0)).alias("margin")
    scored = (
        buckets.join(F.broadcast(coef_df), "bucket")
        .groupBy("doc_id", "label")
        .agg(margin)
    )
    return scored.select(
        "doc_id",
        "label",
        (F.col("margin") > 0).cast("double").alias("prediction"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias(
            "quality_prob"
        ),
    )
