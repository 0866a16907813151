"""Trained document-quality classifier (CCNet / LLaMA-style fastText
filter re-expressed on pyspark.ml + native SQL scoring).

The canonical LLM-corpus pipeline trains a cheap linear classifier to
separate "reference-quality" text from crawl noise and keeps documents
the model scores highly (CCNet, Wenzek et al. 2020; LLaMA trained a
fastText Wikipedia-reference classifier). fastText is a bag-of-hashed-
n-gram linear model — hashed term counts + logistic regression.

Design split (and why):

- FEATURIZATION is native SQL: bucket = ``pmod(hash(term), 256)``
  (Spark's ``hash`` = murmur3 seed 42, evaluated in whole-stage
  codegen with no Python or UDF crossing). The sparse (doc, bucket,
  cnt) table is the only feature representation — no VectorUDT.
- The FIT is driver-side exact Newton (IRLS) on a BOUNDED
  deterministic sample: CCNet/LLaMA-class quality filters train on a
  small fixed reference set and score the petabytes, so the fit is
  never the scale problem — the featurize+score pass is, and that
  pass stays fully distributed. Same justified bounded-collect
  pattern as the PQ codebook trainer (operators/ann.py).
- SCORING never touches pyspark.ml: the fitted model is one 256-float
  coefficient row, joined back as a broadcast (bucket, coef) table;
  margin/sigmoid/prediction are plain SQL aggregates. Two reasons:
  (a) scoring stays whole-stage-codegen with a broadcast join — the
  100 TB-corpus shape (an ml ``model.transform`` would put a
  row-at-a-time ScalaUDF in the hot path); (b) ml transform UDF
  closures drag the model's training-summary DataFrame — and through
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

from vector_knowledge_base_spark.sources.localframe import local_df as _local_df

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


class QualityModel:
    """Fitted linear quality filter: 256 hashed-bucket coefficients +
    intercept. Deliberately tiny — the whole model broadcasts as one
    row-set, the way a fastText quality filter ships to a cluster."""

    def __init__(self, coefficients, intercept: float):
        self.coefficients = [float(c) for c in coefficients]
        self.intercept = float(intercept)


def _fit_logreg_irls(X, y, reg: float, iters: int = 25):
    """L2-regularized logistic regression via IRLS (Newton): exact
    deterministic convergence in a handful of 256×256 solves — no
    learning-rate knobs, no iteration-order float drift."""
    import numpy as np

    n, d = X.shape
    Xb = np.hstack([np.ones((n, 1)), X])
    w = np.zeros(d + 1)
    lam = reg * n  # objective = Σ logloss + (reg·n)·||w||²/2, no reg on bias
    reg_diag = np.full(d + 1, lam)
    reg_diag[0] = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        g = Xb.T @ (p - y) + reg_diag * w
        wdiag = np.clip(p * (1 - p), 1e-9, None)
        H = (Xb * wdiag[:, None]).T @ Xb + np.diag(reg_diag)
        step = np.linalg.solve(H, g)
        w = w - step
        if float(np.abs(step).max()) < 1e-10:
            break
    return w[1:], w[0]


def train_quality_model(labeled: DataFrame, sample_mod: int = 5):
    """Fit the quality classifier on a bounded deterministic sample
    (``doc_id % sample_mod == 0``); returns (model, buckets) where
    buckets is the full-corpus sparse feature table the native scorer
    consumes.

    Why a driver-side fit: CCNet/LLaMA-class quality filters train on
    a SMALL fixed reference set and score the petabytes — the fit is
    never the scale problem, the featurize+score pass is, and that
    pass stays fully distributed (codegen hash-agg + broadcast join).
    The bounded-sample collect is the same justified pattern as the
    PQ codebook trainer (operators/ann.py); `sample_mod` picks the
    deterministic, replayable sample density for the corpus at hand.
    The IRLS fit is exact Newton — no seed, no float-order
    sensitivity, immune to session/partitioning state.
    """
    import numpy as np

    # materialize the sparse feature table once (r14, guide §5): it
    # feeds the training sample collect AND the scoring pass — without
    # the barrier the scan→explode→hash-agg lineage runs per consumer
    buckets = hashed_buckets(labeled).localCheckpoint(eager=True)
    sample = (
        buckets.where(F.col("doc_id") % sample_mod == 0)
        .toPandas()  # Arrow-backed bounded collect
    )
    ids = sample["doc_id"].to_numpy()
    uniq, inv = np.unique(ids, return_inverse=True)
    X = np.zeros((len(uniq), NUM_FEATURES))
    X[inv, sample["bucket"].to_numpy()] = sample["cnt"].to_numpy()
    first_idx = np.zeros(len(uniq), dtype=int)
    first_idx[inv] = np.arange(len(ids))
    y = sample["label"].to_numpy()[first_idx]
    coef, intercept = _fit_logreg_irls(X, y, reg=0.01)
    return QualityModel(coef, intercept), buckets


def quality_scores(model, buckets: DataFrame) -> DataFrame:
    """Score documents natively from the fitted coefficients: margin =
    intercept + Σ cnt·coef over the doc's nonzero buckets (broadcast
    (bucket, coef) join + hash-agg), probability via the logistic link,
    prediction = sign of the margin. No UDF, no model.transform — the
    scoring plan is scan → broadcast join → aggregate, all codegen."""
    spark = buckets.sparkSession
    coefs = [float(c) for c in model.coefficients]
    coef_df = _local_df(spark, 
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
