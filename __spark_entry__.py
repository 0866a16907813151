"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship filtered top-k cosine search
(SURVEY.md §2.3 K1 — the reference's POST /search,
/root/reference/backend/main.py:185-230) on sf0.001.

``queries()`` / ``oracle_sql()`` expose the full operator registry from
``vector_knowledge_base_spark.queries`` — each Spark DataFrame plan paired
with the ANSI-SQL oracle DuckDB runs on the same parquet.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_knowledge_base_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["knn_neighbor_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only
    for non-SQL-expressible ops → driver does a rows-only check)."""
    return _q.all_oracles()
