"""Top-k cosine similarity search — the reference's flagship operator
(SURVEY.md §2.3 K1/K2).

Reference path: embed query → Qdrant HNSW filtered search → top-k by
cosine (/root/reference/backend/main.py:185-230 endpoint,
/root/reference/backend/vector_db.py:165-170 engine call).

Spark-first design:

- **Exact kNN** (the correctness oracle and the default): the query vector
  is a literal broadcast into the plan; the score is a JVM-side dot
  product (functions.vector); ``ORDER BY score DESC LIMIT k`` compiles to
  ``TakeOrderedAndProject`` — per-partition top-k heaps merged on the
  driver, i.e. O(n/p) per executor with only k rows shuffled. No custom
  operator needed; this scales linearly with executors.

- **Filters compose before the score** as plain Catalyst predicates, so
  they push into the Parquet scan — the distributed mirror of Qdrant's
  filtered-HNSW traversal (payload filter inside the index walk).

- **Batch kNN** (K2 — N queries at once, the shape a training-data
  pipeline actually needs): broadcast-join the (small) query side against
  the corpus, score once, then per-query top-k via window ``row_number``.
  One shuffle, partitioned by query id. For very large query sides,
  pre-bucket both sides with LSH (operators.ann) before the join.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_knowledge_base_spark.functions.filters import filter_dsl_to_column
from vector_knowledge_base_spark.functions.vector import dot_product

ROUND_DIGITS = 6  # stable cross-engine score comparison


def cosine_topk(
    corpus: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    filters: Mapping[str, Any] | None = None,
    assume_normalized: bool = True,
) -> DataFrame:
    """Exact filtered top-k cosine search (K1).

    Returns (id_col, score) with ``score`` rounded for cross-engine
    determinism; ties broken by id. ``assume_normalized`` skips the norm
    division (write-time unit-norm invariant, FIXTURES.md §3).
    """
    qvec = F.lit([float(x) for x in query_vector])
    score = dot_product(F.col(vector_col), qvec)
    if not assume_normalized:
        from vector_knowledge_base_spark.functions.vector import l2_norm

        score = score / (l2_norm(F.col(vector_col)) * l2_norm(qvec))
    return (
        corpus.where(filter_dsl_to_column(filters))
        .select(F.col(id_col), F.round(score, ROUND_DIGITS).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def cosine_topk_df(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 5,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    query_vec_col: str = "qv",
    filters: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Exact filtered top-k cosine with the query vector as a 1-row
    DataFrame instead of a driver-side literal.

    ``cosine_topk`` needs the caller to ``collect()`` the query vector
    first — a full extra Spark job (scan + dispatch) before the search
    job, which doubles single-query latency. Here the 1-row query side
    is broadcast into the scoring plan (BroadcastNestedLoopJoin of one
    row ≈ free), so fetch + score + top-k run as ONE job. Same result,
    same TakeOrderedAndProject tail."""
    scored = corpus.where(filter_dsl_to_column(filters)).join(F.broadcast(query))
    return (
        scored.select(
            F.col(id_col),
            F.round(
                dot_product(F.col(vector_col), F.col(query_vec_col)), ROUND_DIGITS
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def batch_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    corpus_id_col: str = "vec_id",
    corpus_vec_col: str = "embedding",
    include_self: bool = True,
) -> DataFrame:
    """Batch kNN (K2): every query row gets its k nearest corpus rows.

    Plan: broadcast(queries) × corpus → score → window top-k per query.
    The corpus is scanned exactly once regardless of query count; the only
    shuffle is the per-query rank (partitionBy query_id). At 100 TB the
    corpus side stays partitioned in place and the small side moves — the
    right asymmetry.
    """
    scored = corpus.join(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(corpus_id_col),
        F.round(
            dot_product(F.col(corpus_vec_col), F.col(query_vec_col)), ROUND_DIGITS
        ).alias("score"),
    )
    if not include_self:
        scored = scored.where(F.col(query_id_col) != F.col(corpus_id_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(corpus_id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, corpus_id_col, "score", "rank")
    )


def batch_hybrid_rrf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n: int = 1000,
    rrf_k: int = 60,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    query_vec_col: str = "query_vec",
    corpus_id_col: str = "doc_id",
    text_col: str = "text",
    corpus_vec_col: str = "embedding",
) -> DataFrame:
    """Batch HYBRID retrieval as ONE Spark job (r14, VERDICT r13
    Missing #2): every query row — a (terms array, query vector) pair
    — gets its top-k corpus rows by reciprocal-rank fusion of a
    keyword ranking (summed term frequency of the query's terms over
    ``split(text, ' ')`` — duplicate terms count twice, zero-tf rows
    stay ranked) and a cosine ranking (UNROUNDED dot product, the
    write-time unit-norm contract), each pruned to its top-``n`` per
    query, a missing rank coalesced to ``n+1``, rrf rounded to 6
    digits, (-rrf, id) final order — the exact per-query contract of
    ``hybrid_search_rrf`` / ``HybridKnnServer.hybrid_query_batch``
    (reference parity: the vector-only /search at
    /root/reference/backend/main.py:185-230 has no fused form; this
    is the engine-addition batch regime of the hybrid verb).

    Plan shape: broadcast(queries) × corpus → both scores in one
    projection → ONE exchange hash-partitioned by query id carries
    BOTH window ranks and the fused top-k (the three ``row_number``
    windows share the partitioning, so Catalyst plans a single
    shuffle; the shuffled row is 4 small columns, never the text or
    the vector). Because both rankings score the SAME per-query
    universe, the full-outer fusion join collapses to a filter on
    ``rk <= n OR rv <= n`` over the double-ranked frame — no join at
    all. At 100 TB the corpus stays partitioned in place and only the
    N-row query side moves, exactly like ``batch_knn``.

    Returns (query_id, id, rrf_score, rank), rank 1..k per query.
    """
    tf = F.aggregate(
        F.col(terms_col),
        F.lit(0),
        lambda acc, t: acc
        + F.size(F.filter(F.split(F.col(text_col), " "), lambda w: w == t)),
    )
    scored = corpus.join(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(corpus_id_col),
        tf.alias("tf"),
        dot_product(F.col(corpus_vec_col), F.col(query_vec_col)).alias("cos"),
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.desc("tf"), F.asc(corpus_id_col)
    )
    wv = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos"), F.asc(corpus_id_col)
    )
    ranked = scored.select(
        query_id_col,
        corpus_id_col,
        F.row_number().over(wk).alias("rk"),
        F.row_number().over(wv).alias("rv"),
    ).where((F.col("rk") <= n) | (F.col("rv") <= n))
    fused = ranked.withColumn(
        "rrf_score",
        F.round(
            1.0 / (rrf_k + F.least(F.col("rk"), F.lit(n + 1)))
            + 1.0 / (rrf_k + F.least(F.col("rv"), F.lit(n + 1))),
            ROUND_DIGITS,
        ),
    )
    wf = Window.partitionBy(query_id_col).orderBy(
        F.desc("rrf_score"), F.asc(corpus_id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select(query_id_col, corpus_id_col, "rrf_score", "rank")
    )
