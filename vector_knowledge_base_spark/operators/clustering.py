"""Clustering + cluster naming (SURVEY §2.9 M5-M6).

The reference runs HDBSCAN over the full collected embedding matrix
(/root/reference/backend/clustering.py:32-70) and names clusters with a
per-cluster sklearn TF-IDF top-3 (/root/reference/backend/clustering.py:72-147).
Two modes here, clearly labeled (SURVEY §7 'hard parts'):

- **Scalable mode (default)**: MLlib KMeans on the distributed vector
  column. Different semantics than HDBSCAN (no noise label) but runs at
  any scale; the adaptive min_cluster_size heuristic
  (/root/reference/backend/main.py:795-801) maps to an adaptive k.
- **Parity mode**: exact HDBSCAN (noise −1, eom selection) — requires the
  `hdbscan` package (not in this container; import-gated). The reference
  itself collects every vector to one process
  (/root/reference/backend/main.py:781-792), so parity mode is inherently
  driver-side and gated to small n.

Naming is Spark-native TF-IDF: tokenize → per-cluster term counts → idf
over clusters → top-3 terms → "Term & Term & Term" (initcap), with the
reference's sentinels: cluster −1 → "Uncategorized", <2 docs →
"Cluster {id}" (/root/reference/backend/clustering.py:102-108,137-141).
"""

from __future__ import annotations

from vector_knowledge_base_spark.sources.localframe import local_df as _local_df

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ENGLISH_STOPWORDS = {
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "he", "in", "is", "it", "its", "of", "on", "that", "the", "to", "was",
    "were", "will", "with",
}


def adaptive_k(n_points: int) -> int:
    """Adaptive cluster count, mirroring the reference's adaptive
    min_cluster_size tiers (3/5/10 at <50/<200/else —
    /root/reference/backend/main.py:795-801): smaller corpora get
    coarser clusterings."""
    if n_points < 50:
        return max(2, n_points // 10)
    if n_points < 200:
        return 8
    return 10


def kmeans_cluster(
    emb: DataFrame,
    k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 12,
) -> DataFrame:
    """Scalable clustering: MLlib KMeans over the array<float> column.
    Returns (id_col, cluster). Distributed Lloyd iterations — no
    driver-side matrix, unlike the reference's full collect.

    ``max_iter`` defaults to the cheaper exploration-grade fit (12
    rounds, see inline note); callers needing the fully-converged
    labels pass ``max_iter=20`` (MLlib's default). The 12-vs-20 label
    agreement is measured by a guard test
    (tests/test_ml_operators.py::test_kmeans_maxiter_label_agreement)
    so the trade-off is explicit, not silent."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    # Lloyd iterations re-scan the input once per step; without a persist
    # an upstream Python embed stage would re-execute every iteration
    # (measured 4.8s -> 1.3s on the sf0.1 naming query). Unpersist after
    # fit: the returned label plan re-derives the features in ONE pass.
    vecs.persist()
    try:
        n_points = vecs.count()
        if k is None:
            k = adaptive_k(n_points)
        # size the ITERATION input to the data, not the cluster default:
        # every Lloyd step is a job over these partitions, so 5k rows
        # spread across 32 partitions pay 32-task scheduling per
        # iteration for microsecond compute. The coalesce sits ON TOP of
        # the already-materialized cache (narrow merge of in-memory
        # partitions — the wide upstream embed ran at full parallelism
        # during the count above), and ~200k rows/partition ≈ 100 MB of
        # 64-d doubles keeps the same rule giving thousands of
        # partitions at 100 TB.
        target = max(1, -(-n_points // 200_000))
        fit_input = vecs.coalesce(target) if target < 32 else vecs
        # random init, not k-means||: the parallel init itself costs
        # initSteps extra distributed passes over the corpus, and on
        # embedding-type data (near-uniform pairwise distances) it can
        # land degenerate seeds (measured: a 2-point cluster at sf0.1
        # that random init avoids). tol=1e-3 ends Lloyd as soon as
        # centroids stop moving meaningfully — this is exploration-grade
        # clustering for naming/browsing, same use as the reference's
        # HDBSCAN, not a loss-critical fit. 2.8s -> 1.0s at sf0.1.
        # maxIter=12: on embedding-type data tol never triggers (measured:
        # all 20 default iterations run to the cap). At 12 rounds ~91% of
        # sf0.1 labels match the 20-round fit and the movers sit on
        # cluster boundaries — immaterial for exploration/naming, and the
        # fit costs ~60% less (3.6s -> 1.9s).
        model = KMeans(
            k=k,
            seed=seed,
            featuresCol="features",
            initMode="random",
            tol=1e-3,
            maxIter=max_iter,
        ).fit(fit_input)
        labels = model.transform(fit_input).select(
            F.col(id_col), F.col("prediction").cast("int").alias("cluster")
        )
        # materialize the (id, cluster) pairs while the cache is hot so
        # callers composing further plans never re-run the fit input
        labels = labels.localCheckpoint(eager=True)
    finally:
        vecs.unpersist()
    return labels


def hdbscan_parity_cluster(
    emb: DataFrame,
    min_cluster_size: int | None = None,
    min_samples: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Parity mode: exact HDBSCAN (euclidean, eom), noise = −1.

    Import-gated (hdbscan not installed in this container) and bounded by
    ``max_rows`` — this mode collects to the driver exactly as the
    reference does (/root/reference/backend/main.py:781-804)."""
    try:
        import hdbscan  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "hdbscan package not installed; use kmeans_cluster (scalable "
            "mode) or install hdbscan for reference-parity clustering"
        ) from e
    import numpy as np  # pragma: no cover - exercised only with hdbscan

    n = emb.count()
    if n > max_rows:
        raise ValueError(f"parity mode gated to {max_rows} rows, got {n}")
    rows = emb.select(id_col, vec_col).collect()
    if min_cluster_size is None:
        min_cluster_size = 3 if n < 50 else (5 if n < 200 else 10)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    labels = hdbscan.HDBSCAN(
        min_cluster_size=min_cluster_size,
        min_samples=min_samples,
        metric="euclidean",
        cluster_selection_method="eom",
    ).fit_predict(mat)
    spark = emb.sparkSession
    return _local_df(spark, 
        [(r[0], int(lbl)) for r, lbl in zip(rows, labels)],
        schema=f"{id_col} long, cluster int",
    )


def name_clusters_tfidf(
    docs_with_cluster: DataFrame,
    text_col: str = "text",
    cluster_col: str = "cluster",
    top_terms: int = 3,
) -> DataFrame:
    """Cluster naming: per-cluster TF-IDF top terms, joined ' & '.

    Spark-native analog of the reference's per-cluster sklearn
    TfidfVectorizer (top-3 of max_features=5, English stopwords,
    title-cased, ' & '-joined — clustering.py:117-141). Set-oriented:
    one explode + two aggregates + a rank window; no per-cluster loop.

    Sentinels preserved: −1 → 'Uncategorized'; clusters with <2 docs →
    'Cluster {id}'."""
    toks = (
        docs_with_cluster.select(
            F.col(cluster_col).alias("cluster"),
            F.explode(
                F.split(F.lower(F.regexp_replace(text_col, r"[^\w\s]", " ")), r"\s+")
            ).alias("term"),
        )
        .where(
            (F.length("term") > 2) & ~F.col("term").isin(sorted(ENGLISH_STOPWORDS))
        )
    )
    # tf within cluster
    tf = toks.groupBy("cluster", "term").agg(F.count(F.lit(1)).alias("tf"))
    # IDF's N: distinct clusters, counted from the LABEL column — not
    # from tf, whose count action would execute the whole text explode
    # pipeline eagerly per call (a cluster whose docs have no valid
    # tokens is the only divergence, and it takes the 'Cluster {id}'
    # fallback regardless). r15 (guide §1.2): N rides IN the plan as a
    # broadcast 1-row aggregate instead of an EAGER driver count() —
    # the count used to dispatch its own join+distinct job chain per
    # call (4 jobs at sf0.1) before the real plan ever ran; same N,
    # same rows, one plan.
    # countDistinct excludes NULL; the old distinct().count() counted a
    # NULL label as one distinct value — the max(isnull) term restores
    # that exactly (callers here never produce null labels, but the
    # operator's semantics must not drift)
    n_df = docs_with_cluster.agg(
        (
            F.countDistinct(F.col(cluster_col))
            + F.coalesce(
                F.max(F.col(cluster_col).isNull().cast("int")), F.lit(0)
            )
        ).alias("_n_clusters")
    )
    # idf over clusters: log((1+N)/(1+df)) + 1 (sklearn smooth_idf)
    df_ = tf.groupBy("term").agg(F.countDistinct("cluster").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_df))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log(
                    (F.lit(1.0) + F.col("_n_clusters"))
                    / (F.lit(1.0) + F.col("df"))
                )
                + 1.0
            ),
        )
        .drop("_n_clusters")
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("tfidf"), F.col("term"))
    top = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_terms)
        .groupBy("cluster")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rank", F.initcap("term").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                " & ",
            ).alias("top_terms_name")
        )
    )
    sizes = docs_with_cluster.groupBy(F.col(cluster_col).alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        sizes.join(top, "cluster", "left")
        .select(
            "cluster",
            F.when(F.col("cluster") == -1, F.lit("Uncategorized"))
            .when(
                F.col("n_docs") < 2, F.concat(F.lit("Cluster "), F.col("cluster"))
            )
            .otherwise(F.coalesce("top_terms_name", F.concat(F.lit("Cluster "), F.col("cluster"))))
            .alias("cluster_name"),
            "n_docs",
        )
    )


def apply_cluster_labels(
    chunks: DataFrame, labels: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Set-oriented label write-back — replaces the reference's per-point
    set_payload loop (/root/reference/backend/main.py:813-830, N
    sequential round-trips) with one join."""
    return chunks.drop("cluster").join(labels, id_col, "left")
