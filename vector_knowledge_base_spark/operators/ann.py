"""Approximate nearest-neighbor search (SURVEY §4.3 #2, §7 phase 2).

The reference gets ANN from Qdrant's HNSW index (server-internal).
Spark has no HNSW; the scale paths here are:

- **LSH** (``BucketedRandomProjectionLSH``): random-hyperplane bucketing;
  ``approxNearestNeighbors`` probes the query's buckets only. Euclidean
  distance on unit-norm vectors is monotone in cosine
  (‖a−b‖² = 2 − 2·cos), so the same top-k ordering holds.
- **IVF / centroid pruning** (``ivf_topk``): KMeans partitions the
  corpus; a query searches only the ``n_probe`` nearest partitions —
  the classic inverted-file index, expressed relationally: centroid
  table (broadcast) → partition pruning filter → exact rerank within
  probed partitions. At 100 TB the corpus is *written* partitioned by
  centroid id, so the probe prunes parquet partitions at scan time.

Exact ``cosine_topk`` (operators.knn) is the correctness oracle;
``recall_at_k`` measures approximation quality against it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_knowledge_base_spark.functions.vector import dot_product
from vector_knowledge_base_spark.operators.knn import cosine_topk


def lsh_model(
    emb: DataFrame,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    cache: bool = True,
):
    """Fit an LSH model + return (model, transformed corpus).

    ``cache=True`` persists the hashed corpus for repeated probes
    (interactive search); callers own the unpersist. One-shot pipelines
    (a single similarity join) should pass ``cache=False`` — nothing is
    reused, so a cache would only leak."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(F.col(id_col), array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(vecs)
    hashed = model.transform(vecs)
    return model, (hashed.cache() if cache else hashed)


def lsh_topk(model, corpus_hashed: DataFrame, query_vector: Sequence[float], k: int = 10) -> DataFrame:
    """Approximate top-k via LSH bucket probing. Returns (vec_id, score)
    where score = cosine (corpus assumed unit-norm)."""
    from pyspark.ml.linalg import Vectors

    q = Vectors.dense([float(x) for x in query_vector])
    nn = model.approxNearestNeighbors(corpus_hashed, q, k)
    # distCol is euclidean; for unit vectors cos = 1 - d²/2
    return nn.select(
        "vec_id",
        F.round(1.0 - F.col("distCol") * F.col("distCol") / 2.0, 6).alias("score"),
    )


def build_ivf(
    emb: DataFrame,
    n_partitions: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF index: KMeans centroids + corpus tagged with centroid id.
    Returns (centroids ndarray, assigned DataFrame). In production the
    assigned table is written partitioned by ``ivf_cell`` so probes
    prune at the file level."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=n_partitions, seed=seed, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).select(
        F.col(id_col), F.col(vec_col), F.col("prediction").alias("ivf_cell")
    )
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    return centroids, assigned.cache()


def ivf_topk(
    centroids,
    assigned: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe nearest cells, exact rerank within them.
    The cell filter is a pushable predicate — with centroid-partitioned
    storage it becomes partition pruning, reading n_probe/n_cells of
    the corpus."""
    import numpy as np

    q = np.asarray(list(query_vector), dtype=np.float64)
    dists = ((centroids - q) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(dists)[:n_probe]]
    qvec = F.lit([float(x) for x in query_vector])
    return (
        assigned.where(F.col("ivf_cell").isin(probe))
        .select(
            "vec_id",
            F.round(dot_product(F.col(vec_col), qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )


def lsh_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    bucket_length: float = 1.0,
    num_hash_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate PAIRS via LSH-bucketed similarity join —
    the 100 TB path for cosine near-dup (the exact all-pairs blocked
    matmul in operators/dedup.py is its small-scale oracle).

    ``approxSimilarityJoin`` only compares rows sharing a hash bucket,
    so the join is O(bucket collisions), not O(n²). The euclidean radius
    equivalent to ``cos ≥ t`` on unit vectors is √(2−2t) (‖a−b‖² =
    2−2·cos). Output: (vec_id_a < vec_id_b, score=cosine) — the same
    shape as the exact operator, so recall is directly measurable."""
    import math

    model, hashed = lsh_model(
        emb,
        bucket_length=bucket_length,
        num_hash_tables=num_hash_tables,
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
        cache=False,  # single self-join: no reuse, no leak
    )
    radius = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))
    joined = model.approxSimilarityJoin(hashed, hashed, radius, distCol="dist")
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("vec_id_a"),
            F.col(f"datasetB.{id_col}").alias("vec_id_b"),
            F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 6).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def recall_at_k(
    emb: DataFrame, approx_result: DataFrame, query_vector: Sequence[float], k: int = 10
) -> float:
    """|approx ∩ exact| / k against the exact oracle."""
    exact_ids = {
        r[0] for r in cosine_topk(emb, query_vector, k=k).select("vec_id").collect()
    }
    approx_ids = {r[0] for r in approx_result.select("vec_id").collect()}
    return len(exact_ids & approx_ids) / float(k)
