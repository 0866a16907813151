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

from vector_knowledge_base_spark.sources.localframe import local_df as _local_df

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
    # Persist ONLY the features column for the duration of the fit: every
    # Lloyd iteration (plus k-means|| init) re-scans its input, so an
    # uncached fit re-reads the corpus ~22x (measured 4.5s -> 2.8s at
    # sf0.1; at 100 TB those are full-corpus passes). The projection
    # halves the cached bytes vs caching vecs (embedding array + its
    # vector copy) and select() preserves partitioning, so centroids are
    # bit-identical to the uncached fit (verified at sf0.01/0.1, k=8/16
    # — this index feeds oracled probe results and MUST NOT drift).
    feats = vecs.select("features").persist()
    try:
        model = KMeans(k=n_partitions, seed=seed, featuresCol="features").fit(feats)
    finally:
        feats.unpersist()
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


def ivf_batch_topk(
    centroids,
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int | None = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched IVF search as ONE Spark job (r14 — the K2 batch regime
    with IVF pruning instead of ``batch_knn``'s full scan): each query
    probes ITS OWN ``n_probe`` nearest cells (centroids are a
    driver-held array — the probe assignment is N×k_cells numpy, never
    a Spark job), the corpus scans only the UNION of probed cells (a
    pushable ``isin`` — partition pruning at the file level on
    cell-partitioned storage), the (query, cell, vector) probe pairs
    broadcast, and every query's top-k rides one query-id window.
    A corpus row in a probed cell joins ONLY the queries that probed
    that cell, so per-query answers equal ``ivf_topk``'s exactly
    (same probe rule, rounding, (-score, id) tie-break — pinned by
    tests and the ``ivf_batch_topk_plan`` oracle row). ``n_probe=None``
    probes every cell: exact batch kNN with the same plan shape.

    100 TB shape: scanned volume is (union of probed cells)/k_cells of
    the corpus instead of 1.0 per batch — and the more the batch's
    queries cluster, the more their probe sets overlap, so the scan
    amortizes ACROSS queries; the shuffled row is (query_id, id,
    score); the N×n_probe broadcast side is KB-scale."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    k_cells = cents.shape[0]
    if n_probe is None or n_probe >= k_cells:
        n_probe = k_cells
    qrows = queries.select(query_id_col, query_vec_col).collect()
    spark = queries.sparkSession
    if not qrows:
        return _local_df(spark, 
            [], f"{query_id_col} int, vec_id long, score double, rank int"
        )
    pairs = []
    for r in qrows:
        q = np.asarray(list(r[query_vec_col]), dtype=np.float64)
        d = ((cents - q) ** 2).sum(axis=1)
        qv = [float(x) for x in r[query_vec_col]]
        pairs.extend(
            (int(r[query_id_col]), int(c), qv)
            for c in np.argsort(d)[:n_probe]
        )
    probe_union = sorted({c for _, c, _ in pairs})
    pdf = _local_df(spark, 
        pairs,
        f"{query_id_col} int, ivf_cell int, {query_vec_col} array<double>",
    )
    scored = (
        assigned.where(F.col("ivf_cell").isin(probe_union))
        .join(F.broadcast(pdf), "ivf_cell")
        .select(
            query_id_col,
            "vec_id",
            F.round(
                dot_product(F.col(vec_col), F.col(query_vec_col)), 6
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "vec_id", "score", "rank")
    )


def ivf_topk_adaptive(
    centroids,
    assigned: DataFrame,
    query_vector: Sequence[float],
    k: int = 10,
    alpha: float = 0.35,
    min_probe: int = 1,
    max_probe: int | None = None,
    vec_col: str = "embedding",
):
    """Adaptive IVF probing: instead of a fixed ``n_probe``, the probe
    set is chosen per query from the centroid-distance margins — probe
    every cell whose centroid distance lies in the bottom ``alpha``
    fraction of this query's [d_min, d_max] distance SPREAD (plus
    always the ``min_probe`` nearest). A query landing mid-cell probes
    few cells; a query near a Voronoi boundary probes the cells it
    straddles — scanned volume tracks ambiguity instead of a worst-case
    constant.

    The cutoff is spread-relative, not min-relative (``d ≤ d_min·(1+m)``):
    on high-dimensional embeddings centroid distances CONCENTRATE
    (measured 1.0 ± 0.07 on the 64-d corpus), so any multiplicative
    margin big enough to matter admits every cell; the spread rule
    stays meaningful exactly because it normalizes by the query's own
    distance range.

    Returns ``(topk DataFrame, probe list)`` so callers can report the
    scanned fraction alongside the result. Same pushable cell filter as
    ``ivf_topk`` — with centroid-partitioned storage the probe list is
    partition pruning at the file level."""
    import numpy as np

    q = np.asarray(list(query_vector), dtype=np.float64)
    dists = np.sqrt(((centroids - q) ** 2).sum(axis=1))
    order = np.argsort(dists)
    d_min, d_max = dists[order[0]], dists[order[-1]]
    cutoff = d_min + alpha * (d_max - d_min)
    probe = [int(c) for c in order if dists[c] <= cutoff]
    for c in order[:min_probe]:
        if int(c) not in probe:
            probe.append(int(c))
    if max_probe is not None:
        by_dist = sorted(probe, key=lambda c: dists[c])
        probe = by_dist[:max_probe]
    qvec = F.lit([float(x) for x in query_vector])
    topk = (
        assigned.where(F.col("ivf_cell").isin(probe))
        .select(
            "vec_id",
            F.round(dot_product(F.col(vec_col), qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("vec_id"))
        .limit(k)
    )
    return topk, probe


def save_pq(codebooks, path: str) -> None:
    """Persist PQ codebooks next to the PCA model store pattern
    (operators/projection.py save_projection_model): serving encodes
    against a FIXED codebook — refitting per batch would silently change
    every stored code. JSON keeps it dependency-free and
    human-auditable; codebooks are tiny (m × ksub × dsub doubles)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    m, ksub, dsub = codebooks.shape
    with open(os.path.join(path, "pq_codebooks.json"), "w") as f:
        json.dump(
            {
                "m": int(m),
                "ksub": int(ksub),
                "dsub": int(dsub),
                "codebooks": codebooks.tolist(),
            },
            f,
        )


def load_pq(path: str):
    """Reload persisted PQ codebooks (None if absent — callers re-fit
    via build_pq, mirroring load_projection_model's contract)."""
    import json
    import os

    import numpy as np

    fp = os.path.join(path, "pq_codebooks.json")
    if not os.path.exists(fp):
        return None
    with open(fp) as f:
        d = json.load(f)
    cb = np.asarray(d["codebooks"], dtype=np.float64)
    assert cb.shape == (d["m"], d["ksub"], d["dsub"])
    return cb


def build_opq(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_limit: int = 100_000,
    r_snapshots: list | None = None,
    train_sample=None,
):
    """Optimized Product Quantization (Ge et al., CVPR 2013 — the
    public OPQ-NP algorithm): learn an ORTHOGONAL rotation R so the
    rotated space splits into subspaces PQ quantizes with lower error
    (plain PQ is hostage to the original axis alignment; correlated
    dimensions landing in different subspaces waste codebook budget).

    Alternating minimization on a bounded driver-side sample (same
    cost model as build_pq — codebook fitting is O(sample), FAISS
    trains OPQ the same way): fix R → fit per-subspace k-means on
    X·R; fix codebooks → the best orthogonal R for current
    reconstructions Y is the Procrustes solution R = U·Vᵀ from
    svd(Xᵀ·Y). Each half-step cannot increase ‖X·R − Y‖², so the
    training objective is monotonically non-increasing (asserted in
    tests). Encoding is distributed: one Arrow-batched UDF rotates and
    argmins all subspaces vectorized.

    Serving: rotate the query driver-side (q·R) and reuse the plain
    PQ machinery unchanged — ``pq_topk(codebooks, codes, q @ R)`` —
    because rotation preserves inner products of co-rotated vectors.

    Returns (R [d×d], codebooks [m,ksub,dsub], codes DataFrame,
    history [per-iter training MSE]).

    ``train_sample``: see ``build_pq`` — the same shared-sample seam
    (r15)."""
    import numpy as np

    sample = (
        np.asarray(train_sample, dtype=np.float64)
        if train_sample is not None
        else np.array(
            emb.select(vec_col).limit(train_limit).toPandas()[vec_col].tolist(),
            dtype=np.float64,
        )
    )
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = min(ksub, n)
    rng = np.random.RandomState(seed)
    R = np.eye(dim)
    history: list[float] = []
    codebooks = np.empty((m, ksub, dsub), dtype=np.float64)
    fitted = False
    for _ in range(iters):
        XR = sample @ R
        Y = np.empty_like(XR)
        for j in range(m):
            sub = XR[:, j * dsub : (j + 1) * dsub]
            # WARM-START from the previous iteration's codebooks
            # (OPQ-NP's trick): re-initializing randomly would break
            # the monotone-objective guarantee — Lloyd from the prior
            # cents can only improve on the post-Procrustes error
            cents = (
                codebooks[j].copy()
                if fitted
                else sub[rng.choice(n, size=ksub, replace=False)]
            )
            for _lloyd in range(15):
                d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for c in range(ksub):
                    mask = assign == c
                    if mask.any():
                        cents[c] = sub[mask].mean(axis=0)
            codebooks[j] = cents
            Y[:, j * dsub : (j + 1) * dsub] = cents[
                ((sub[:, None, :] - cents[None, :, :]) ** 2)
                .sum(axis=2)
                .argmin(axis=1)
            ]
        fitted = True
        history.append(float(((XR - Y) ** 2).sum() / n))
        # Procrustes: best orthogonal R for the fixed reconstructions
        u, _s, vt = np.linalg.svd(sample.T @ Y)
        R = u @ vt
        if r_snapshots is not None:
            # training is deterministic and strictly sequential, so the
            # state after i iterations IS the iters=i result: callers
            # that also need a shorter-iters rotation (the recall curve
            # runs iters=4 for the OPQ variant and iters=3 inside
            # build_opq_ivfpq) can take the prefix instead of paying
            # the whole training twice (guide §1.2)
            r_snapshots.append(R.copy())

    spark = emb.sparkSession
    bc_r = spark.sparkContext.broadcast(R)
    bc_cb = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<int>")
    def _encode(batch):
        import pandas as pd

        rot, cb = bc_r.value, bc_cb.value
        mat = np.array(batch.tolist(), dtype=np.float64) @ rot
        codes = np.empty((len(mat), cb.shape[0]), dtype=np.int32)
        for j in range(cb.shape[0]):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    codes = emb.select(F.col(id_col), _encode(F.col(vec_col)).alias("codes"))
    return R, codebooks, codes, history


def opq_shortlist_rerank(
    R,
    codebooks,
    codes: DataFrame,
    emb: DataFrame,
    query_vector,
    k: int = 10,
    shortlist: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage OPQ serving: rotate the query, ADC-shortlist over the
    rotated-space codes, exact-rerank the survivors against RAW
    vectors — identical contract to pq_shortlist_rerank (with a
    covering shortlist the output is bit-identical to exact search)."""
    import numpy as np

    q_rot = np.asarray(list(query_vector), dtype=np.float64) @ R
    short_ids = pq_topk(codebooks, codes, q_rot.tolist(), k=shortlist, id_col=id_col)
    qvec = F.lit([float(x) for x in query_vector])
    return (
        emb.join(short_ids.select(id_col), id_col, "left_semi")
        .select(
            F.col(id_col),
            F.round(dot_product(F.col(vec_col), qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def save_ivfpq(centroids, codebooks, index: DataFrame, path: str) -> None:
    """Persist the composed IVF-PQ index: centroids + codebooks as one
    JSON model file (same dependency-free store as save_pq — both are
    tiny), the code table as parquet PARTITIONED BY ivf_cell, so a
    probe of n cells reads n directories (the write_ivf_corpus layout,
    but holding m-byte codes instead of raw vectors — the 100 TB
    serving store is the code table, ~32× smaller than the corpus)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    m, ksub, dsub = codebooks.shape
    with open(os.path.join(path, "ivfpq_model.json"), "w") as f:
        json.dump(
            {
                "m": int(m),
                "ksub": int(ksub),
                "dsub": int(dsub),
                "codebooks": codebooks.tolist(),
                "centroids": [[float(x) for x in c] for c in centroids],
            },
            f,
        )
    index.write.mode("overwrite").partitionBy("ivf_cell").parquet(
        os.path.join(path, "codes")
    )


def load_ivfpq(spark, path: str):
    """Reload a persisted IVF-PQ index: (centroids, codebooks, index
    DataFrame) or None if absent. The returned index scans the
    cell-partitioned parquet — ``ivfpq_topk``'s cell filter becomes
    directory pruning, and encoding against the loaded codebooks
    reproduces stored codes exactly (same contract as load_pq)."""
    import json
    import os

    import numpy as np

    fp = os.path.join(path, "ivfpq_model.json")
    if not os.path.exists(fp):
        return None
    with open(fp) as f:
        d = json.load(f)
    cb = np.asarray(d["codebooks"], dtype=np.float64)
    assert cb.shape == (d["m"], d["ksub"], d["dsub"])
    centroids = np.asarray(d["centroids"], dtype=np.float64)
    index = spark.read.parquet(os.path.join(path, "codes"))
    return centroids, cb, index


def pq_encode(
    codebooks,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode a corpus against FIXED (e.g. persisted) codebooks — the
    serving-side half of build_pq, split out so load_pq → pq_encode →
    pq_topk needs no refit. Same Arrow-batched vectorized argmin."""
    import numpy as np

    m, ksub, dsub = codebooks.shape
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<int>")
    def _encode(batch):
        import pandas as pd

        cb = bc.value
        mat = np.array(batch.tolist(), dtype=np.float64)
        codes = np.empty((len(mat), cb.shape[0]), dtype=np.int32)
        for j in range(cb.shape[0]):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return emb.select(F.col(id_col), _encode(F.col(vec_col)).alias("codes"))


def pq_shortlist_rerank(
    codebooks,
    codes: DataFrame,
    emb: DataFrame,
    query_vector,
    k: int = 10,
    shortlist: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ serving (the FAISS IndexIVFPQ + refine pattern):
    ADC over the 8-byte codes ranks the whole corpus cheaply, the top
    ``shortlist`` survivors are re-scored against their RAW vectors
    (a semi-join — only shortlist rows are fetched), and the exact top-k
    of the shortlist is returned. With a shortlist that holds every true
    neighbor (measured: worst true-top-10 ADC rank 130 at sf0.01, 694
    at sf0.1 — shortlist=1000 gives >7× margin at the gate SF), the
    output is bit-identical to exact search, which makes this the one
    ANN query whose ORACLE is the plain exact-kNN SQL."""
    short_ids = pq_topk(codebooks, codes, query_vector, k=shortlist, id_col=id_col)
    qvec = F.lit([float(x) for x in query_vector])
    return (
        emb.join(short_ids.select(id_col), id_col, "left_semi")
        .select(
            F.col(id_col),
            F.round(dot_product(F.col(vec_col), qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
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


def build_pq(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_limit: int = 100_000,
    train_sample=None,
):
    """Product quantization: split the D-dim space into ``m`` subspaces,
    learn ``ksub`` centroids per subspace, encode each vector as ``m``
    small codes — the memory-side scale path HNSW/IVF don't cover:
    64-d float32 = 256 B/vec shrinks to ``m`` bytes (32× here), so a
    10¹¹-vector corpus's codes fit a few hundred GB and the ADC scan
    reads codes only, never raw vectors.

    Training collects a bounded sample (``train_limit`` rows — codebook
    fitting is O(sample), not O(corpus); FAISS trains on samples the
    same way) and runs ``m`` tiny k-means fits driver-side with numpy —
    each problem is (sample × D/m), far too small to amortize a
    distributed fit. ENCODING is distributed: codebooks broadcast to an
    Arrow-batched pandas UDF that argmins all subspaces vectorized.

    Returns (codebooks ndarray [m, ksub, D/m], codes DataFrame
    (id, codes array<int>)).

    ``train_sample``: an already-collected (n, D) float64 sample equal
    to what ``limit(train_limit)`` would fetch (limit on a materialized
    frame returns the same partition-order prefix on every collect —
    the determinism ``build_opq_ivfpq``'s pretransform reuse already
    relies on). The recall curve passes one shared sample so three
    builds per budget stop re-collecting the identical matrix
    (r15, guide §1.2).
    """
    import numpy as np
    import pandas as pd

    sample = (
        np.asarray(train_sample, dtype=np.float64)
        if train_sample is not None
        else np.array(
            emb.select(vec_col).limit(train_limit).toPandas()[vec_col].tolist(),
            dtype=np.float64,
        )
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = min(ksub, len(sample))  # can't have more centroids than points
    rng = np.random.RandomState(seed)
    codebooks = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        # Lloyd on the driver: deterministic seeded init, 25 iterations
        cents = sub[rng.choice(len(sub), size=ksub, replace=False)]
        for _ in range(25):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        codebooks[j] = cents

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<int>")
    def _encode(batch):
        cb = bc.value
        mat = np.array(batch.tolist(), dtype=np.float64)
        codes = np.empty((len(mat), cb.shape[0]), dtype=np.int32)
        for j in range(cb.shape[0]):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        import pandas as pd

        return pd.Series(list(codes))

    codes = emb.select(F.col(id_col), _encode(F.col(vec_col)).alias("codes"))
    return codebooks, codes


def build_ivfpq(
    emb: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF + PQ composed index (the FAISS IndexIVFPQ layout): the coarse
    KMeans quantizer assigns each vector to a cell, and PQ encodes the
    RESIDUAL ``x − centroid[cell]``. Residual encoding is the point of
    the composition: within a cell residuals are centered around 0, so
    the same codebook budget quantizes far finer than raw-vector PQ —
    the reason FAISS composes them rather than running either alone.

    100 TB shape: the index table is (id, cell, m-byte codes) — written
    partitioned by ``ivf_cell`` it gives file-level probe pruning AND a
    codes-only hot scan; raw vectors are only fetched for the shortlist
    rerank. The residual is computed in-plan (broadcast 8-row centroid
    frame + ``zip_with`` subtraction — codegen, no UDF); only the PQ
    encode itself is an Arrow-batched pandas UDF.

    Returns (centroids ndarray, codebooks ndarray, index DataFrame
    (id_col, ivf_cell, codes array<int>))."""
    centroids, assigned = build_ivf(
        emb, n_partitions=n_cells, id_col=id_col, vec_col=vec_col, seed=seed
    )
    spark = emb.sparkSession
    cents = _local_df(spark, 
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "ivf_cell int, cent array<double>",
    )
    resid = assigned.join(F.broadcast(cents), "ivf_cell").select(
        F.col(id_col),
        F.col("ivf_cell"),
        F.zip_with(F.col(vec_col), F.col("cent"), lambda a, b: a - b).alias(
            "residual"
        ),
    )
    codebooks, codes = build_pq(
        resid, m=m, ksub=ksub, id_col=id_col, vec_col="residual", seed=seed
    )
    # materialize the index BEFORE dropping the cached assignment: the
    # join has two resid lineages (encode side + cell side), and an
    # unpersisted lazy index would re-run the KMeans transform for each
    index = codes.join(resid.select(id_col, "ivf_cell"), id_col).localCheckpoint(
        eager=True
    )
    assigned.unpersist()
    return centroids, codebooks, index


def _ivfpq_adc_shortlist(
    centroids,
    codebooks,
    index: DataFrame,
    query_vector,
    n_probe: int,
    shortlist: int,
    id_col: str,
) -> DataFrame:
    """Probe + ADC-score + shortlist against an IVF-PQ index, in the
    SPACE THE INDEX WAS BUILT IN (caller rotates the query first for an
    OPQ-pretransformed index). Returns the shortlist ids with their ADC
    scores; the exact rerank is the caller's (it may score in a
    different-but-inner-product-equivalent space, e.g. raw vectors for
    a rotated index)."""
    import numpy as np

    q = np.asarray(list(query_vector), dtype=np.float64)
    mm, ksub, dsub = codebooks.shape
    dists = ((centroids - q) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(dists)[:n_probe]]
    flat = [
        float(np.dot(q[j * dsub : (j + 1) * dsub], codebooks[j][c]))
        for j in range(mm)
        for c in range(ksub)
    ]
    bias = [float(np.dot(q, centroids[c])) for c in range(len(centroids))]
    table, biases = F.lit(flat), F.lit(bias)
    adc = F.element_at(
        biases, (F.col("ivf_cell") + 1).cast("int")
    ) + F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(mm - 1)),
            lambda c, j: F.element_at(table, (j * ksub + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        index.where(F.col("ivf_cell").isin(probe))
        .select(F.col(id_col), adc.alias("adc"))
        .orderBy(F.desc("adc"), F.col(id_col))
        .limit(shortlist)
    )


def ivfpq_topk(
    centroids,
    codebooks,
    index: DataFrame,
    emb: DataFrame,
    query_vector,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve a query against the IVF-PQ index: probe the ``n_probe``
    nearest cells, ADC-score their codes, exact-rerank the ``shortlist``
    survivors against raw vectors (semi-join point reads).

    The inner-product ADC decomposes exactly: with ``x = c_cell + r``,
    ``dot(q, x) = dot(q, c_cell) + dot(q, r)``. The per-subspace table
    ``dot(q_j, codebook_j[·])`` is CELL-INDEPENDENT (codebooks are
    shared across cells), so ONE flat literal array serves every probed
    cell; the per-cell constant ``dot(q, c)`` rides in as a second tiny
    literal indexed by ``ivf_cell``. Scoring a row is therefore m array
    lookups + adds + one bias lookup — no vector math, no raw-vector
    read — and compiles to whole-stage codegen + TakeOrderedAndProject."""
    short = _ivfpq_adc_shortlist(
        centroids, codebooks, index, query_vector, n_probe, shortlist, id_col
    )
    qvec = F.lit([float(x) for x in query_vector])
    return (
        emb.join(short.select(id_col), id_col, "left_semi")
        .select(
            F.col(id_col),
            F.round(dot_product(F.col(vec_col), qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def pq_topk(
    codebooks,
    codes: DataFrame,
    query_vector,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: the query stays full-precision;
    per subspace a ksub-entry inner-product table is computed ONCE on
    the driver and broadcast as a flat literal array, so scoring a
    vector is ``m`` array lookups + adds over its codes — no vector
    math, no raw-vector reads, and the top-k still compiles to
    TakeOrderedAndProject."""
    import numpy as np

    q = np.asarray(list(query_vector), dtype=np.float64)
    m, ksub, dsub = codebooks.shape
    # flat[j*ksub + c] = dot(q_j, codebook[j][c])
    flat = [
        float(np.dot(q[j * dsub : (j + 1) * dsub], codebooks[j][c]))
        for j in range(m)
        for c in range(ksub)
    ]
    table = F.lit(flat)
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, j: F.element_at(table, (j * ksub + c + 1).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def rotate_embeddings(
    emb: DataFrame,
    R,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec·R) — apply a learned orthogonal rotation to the corpus,
    one Arrow-batched matmul per batch (the OPQ pretransform; FAISS's
    OPQMatrix apply). Partitioning carries through — no shuffle."""
    import numpy as np

    spark = emb.sparkSession
    bc_r = spark.sparkContext.broadcast(np.asarray(R, dtype=np.float64))

    @F.pandas_udf("array<double>")
    def _rotate(batch):
        import pandas as pd

        mat = np.array(batch.tolist(), dtype=np.float64) @ bc_r.value
        return pd.Series(list(mat))

    return emb.select(F.col(id_col), _rotate(F.col(vec_col)).alias(vec_col))


def build_opq_ivfpq(
    emb: DataFrame,
    n_cells: int = 8,
    m: int = 8,
    ksub: int = 16,
    opq_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    pretransform=None,
):
    """OPQ-pretransformed IVF-PQ (FAISS's ``OPQ{m},IVF{n},PQ{m}``
    factory string): learn the orthogonal rotation R on global PQ error
    (how FAISS trains OPQMatrix — independent of the coarse quantizer),
    rotate the corpus once, then build the IVF-PQ composed index in the
    ROTATED space — coarse cells and residual codebooks both live
    there. Rotation preserves inner products between co-rotated
    vectors, so serving stays exact-rerank-compatible with the RAW
    corpus (``opq_ivfpq_topk``).

    100 TB shape: training touches a bounded driver-side sample; the
    corpus-scale work is one Arrow-batched rotate + the build_ivfpq
    encode — both single-pass, no shuffle added.

    Returns (R, centroids, codebooks, index) — centroids/codebooks/
    index exactly as build_ivfpq, all in rotated space.

    ``pretransform``: a rotation trained elsewhere with the SAME
    (sample, m, ksub, seed) at ``opq_iters`` iterations — OPQ training
    is deterministic and sequential, so a caller that already ran a
    longer training can hand over the iteration-``opq_iters`` prefix R
    instead of paying the sample collect + training again (guide §1.2;
    the recall curve trains iters=4 for its OPQ variant and previously
    re-trained iters=3 here on the same sample). Prefix equality is
    pinned by tests/test_ml_operators.py."""
    if pretransform is not None:
        import numpy as np

        R = np.asarray(pretransform, dtype=np.float64)
    else:
        R, _cb, _codes, _hist = build_opq(
            emb, m=m, ksub=ksub, iters=opq_iters,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    rotated = rotate_embeddings(emb, R, id_col=id_col, vec_col=vec_col)
    centroids, codebooks, index = build_ivfpq(
        rotated, n_cells=n_cells, m=m, ksub=ksub,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    return R, centroids, codebooks, index


def opq_ivfpq_topk(
    R,
    centroids,
    codebooks,
    index: DataFrame,
    emb: DataFrame,
    query_vector,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve against an OPQ+IVF-PQ index: rotate the query driver-side
    (one d×d matvec), probe/ADC/shortlist in the rotated space, then
    exact-rerank the shortlist against the RAW corpus with the RAW
    query — valid because dot(q·R, x·R) = dot(q, x) for orthogonal R,
    so the rotated-space ADC approximates exactly the raw-space score
    the rerank computes. No rotated copy of the corpus is needed at
    serve time; only the code table is hot."""
    import numpy as np

    q_rot = np.asarray(list(query_vector), dtype=np.float64) @ np.asarray(
        R, dtype=np.float64
    )
    short = _ivfpq_adc_shortlist(
        centroids, codebooks, index, q_rot, n_probe, shortlist, id_col
    )
    qvec = F.lit([float(x) for x in query_vector])
    return (
        emb.join(short.select(id_col), id_col, "left_semi")
        .select(
            F.col(id_col),
            F.round(dot_product(F.col(vec_col), qvec), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def anisotropic_embeddings(
    ids: DataFrame,
    dim: int = 64,
    decay: float = 0.92,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic ANISOTROPIC test corpus (r7, VERDICT r6 #5): the
    hashed embeddings in testdata are near-uniform — the adversarial
    case for IVF but the EASY case for a learned rotation (every axis
    split is as good as any other, so OPQ cannot beat PQ there). Real
    embedding spaces are correlated; the public model is a Gaussian
    with a skewed covariance. Each id's vector is
    ``(z ∘ decay^j) · Q``: z a per-id seeded standard normal (hash-
    seeded per row — independent of partitioning, unlike F.randn), the
    exponential decay concentrates variance in a few directions, and a
    FIXED dense rotation Q (seeded QR) tilts those directions across
    every PQ subspace boundary — the regime OPQ exists for (Ge et al.
    2013 §1: PQ is hostage to the original axis alignment).

    One Arrow-batched UDF over the id column; no shuffle, corpus-scale
    work is a batched matmul."""
    import numpy as np

    rng = np.random.RandomState(seed)
    q_mat, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    scale = decay ** np.arange(dim)
    spark = ids.sparkSession
    bc = spark.sparkContext.broadcast((q_mat, scale))

    @F.pandas_udf("array<double>")
    def _gen(batch):
        import pandas as pd

        q_b, s_b = bc.value
        out = []
        for vid in batch:
            z = np.random.RandomState(
                (int(vid) * 2654435761 + 97) % (2**32)
            ).standard_normal(dim)
            out.append((z * s_b) @ q_b)
        return pd.Series(out)

    return ids.select(F.col(id_col), _gen(F.col(id_col)).alias(vec_col))


def pq_opq_recall_curve(
    emb: DataFrame,
    budgets=(4, 8, 16),
    ksub: int = 16,
    k: int = 10,
    n_queries: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Recall-vs-code-bytes operating curve: for each sub-quantizer
    budget m (code = m·log2(ksub) bits/vector), measure recall@k of
    (a) plain PQ ADC, (b) OPQ ADC (same bytes + one rotation), and
    (c) OPQ→IVF-PQ serving with pruning (same bytes, n_probe of
    n_cells cells scanned) against the exact top-k — averaged over the
    first ``n_queries`` corpus vectors. Exact oracle computed ONCE per
    query and shared across variants/budgets.

    Returns rows ``(code_bits, variant, recall, mean_train_mse)`` —
    train MSE from the final OPQ iteration (PQ row carries its own
    reconstruction error) so the curve shows WHY recall moves.

    100 TB shape: training is bounded-sample driver-side (as FAISS);
    every per-budget scan is ADC over codes (no raw vectors); this
    function is an OFFLINE index-design tool — you run it on a sample
    to pick m before committing a cluster to encoding 10^11 vectors."""
    import math
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from functools import reduce

    qrows = (
        emb.orderBy(id_col).limit(n_queries).select(id_col, vec_col).collect()
    )

    # Tagged-union batching (guide §1.2): every per-query top-k plan is
    # the same limited subtree it always was — tagging each with its
    # query id and unioning them turns n_queries driver round-trips
    # into ONE job per variant (the scans were dispatch-bound: ~0.1 s
    # of scheduling around sub-ms compute on the checkpointed codes).
    # Union preserves each subplan's own LIMIT, so the per-query id
    # sets — and therefore every recall value — are identical to the
    # one-collect-per-query loop.
    def _union_ids(frames):
        tagged = [
            df.select(F.col(id_col)).withColumn("_q", F.lit(qid))
            for qid, df in frames
        ]
        out: dict = {qid: set() for qid, _ in frames}
        for row in reduce(lambda a, b: a.unionAll(b), tagged).collect():
            out[row["_q"]].add(row[id_col])
        return out

    exact = _union_ids(
        [
            (
                r[id_col],
                cosine_topk(emb, [float(v) for v in r[vec_col]], k=k),
            )
            for r in qrows
        ]
    )

    # ONE sample collect for the whole curve (r15, guide §1.2): every
    # budget's build_pq, build_opq AND the curve's own MSE measurement
    # used to re-collect the SAME limit() prefix of the same
    # materialized corpus — 6 identical driver round-trips for 2
    # budgets. limit() on a materialized frame returns the same
    # partition-order prefix on every collect (the determinism the
    # iters-prefix reuse below already relies on), so one collect,
    # sliced per consumer, is value-identical.
    train_full = np.array(
        emb.select(vec_col).limit(100_000).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )

    def _budget_rows(m: int) -> list:
        bits = int(m * math.log2(ksub))
        pq_cb, pq_codes = build_pq(
            emb, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col,
            train_sample=train_full,
        )
        pq_codes = pq_codes.localCheckpoint(eager=True)
        # PQ reconstruction error on the training sample (for the curve)
        sample = train_full[:4096]
        dsub = sample.shape[1] // m
        err = 0.0
        for j in range(m):
            sub = sample[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - pq_cb[j][None, :, :]) ** 2).sum(axis=2)
            err += float(d2.min(axis=1).sum())
        pq_mse = err / len(sample)
        snaps: list = []
        R, opq_cb, opq_codes, hist = build_opq(
            emb, m=m, ksub=ksub, iters=4, id_col=id_col, vec_col=vec_col,
            r_snapshots=snaps, train_sample=train_full,
        )
        opq_codes = opq_codes.localCheckpoint(eager=True)
        # snaps[2] is R after 3 iterations — bit-identical to the
        # build_opq(iters=3) rotation this call used to re-train from
        # scratch on the same sample (prefix property; pinned by
        # tests/test_ml_operators.py::test_opq_r_snapshots_prefix)
        Rc, cents, ivf_cb, ivf_idx = build_opq_ivfpq(
            emb, n_cells=n_cells, m=m, ksub=ksub, opq_iters=3,
            id_col=id_col, vec_col=vec_col, pretransform=snaps[2],
        )
        ivf_idx = ivf_idx.localCheckpoint(eager=True)

        def _variant_recalls(variant):
            frames = []
            for r in qrows:
                qv = [float(v) for v in r[vec_col]]
                if variant == "pq":
                    df = pq_topk(pq_cb, pq_codes, qv, k=k, id_col=id_col)
                elif variant == "opq":
                    q_rot = list(np.asarray(qv) @ R)
                    df = pq_topk(opq_cb, opq_codes, q_rot, k=k, id_col=id_col)
                else:
                    df = opq_ivfpq_topk(
                        Rc, cents, ivf_cb, ivf_idx, emb, qv,
                        k=k, n_probe=n_probe, shortlist=k,
                        id_col=id_col, vec_col=vec_col,
                    )
                frames.append((r[id_col], df))
            got = _union_ids(frames)  # ONE job for all n_queries scans
            return [
                len(got[r[id_col]] & exact[r[id_col]]) / float(k)
                for r in qrows
            ]

        # the three variants scan independent checkpointed code tables
        # — overlap their (single-job) collects (guide §2.6)
        with ThreadPoolExecutor(max_workers=3) as pool:
            pq_r, opq_r, ivf_r = list(
                pool.map(_variant_recalls, ("pq", "opq", "ivf"))
            )
        return [
            (bits, "pq", round(sum(pq_r) / len(pq_r), 4), round(pq_mse, 6)),
            (bits, "opq", round(sum(opq_r) / len(opq_r), 4), round(hist[-1], 6)),
            (
                bits,
                "opq_ivfpq_pruned",
                round(sum(ivf_r) / len(ivf_r), 4),
                round(hist[-1], 6),
            ),
        ]

    rows = []
    with ThreadPoolExecutor(max_workers=max(1, len(budgets))) as pool:
        for budget_rows in pool.map(_budget_rows, list(budgets)):
            rows.extend(budget_rows)
    return rows
