"""Parquet table sources for the synthetic star schema + engine tables.

Replaces the reference's trio of stores — Qdrant collection
(/root/reference/backend/vector_db.py:39-42), JSON document registry
(/root/reference/backend/document_registry.py:28-32) and SQLite folder DB
(/root/reference/backend/filesystem_db.py:36-53) — with plain columnar
Parquet reads: one declarative scan per table, letting Catalyst push
filters and prune columns into the scan (the reference always fetches full
payloads, /root/reference/backend/vector_db.py:241-247).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Analyzed-relation cache (r6): profiling the knn_batch serving lane
# showed per-invocation cost is dominated by plan CONSTRUCTION — file
# listing + parquet footer/schema read on every spark.read.parquet —
# not execution (224 ms build vs 64 ms exec at sf0.1). The star-schema
# tables are immutable, so the analyzed base relation is reused per
# (Spark application, sf_dir, table). DataFrames are immutable plan
# handles — sharing one across queries is safe; keying on applicationId
# drops entries from stopped sessions.
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` — the reference's
    full-collection scroll (S14, /root/reference/backend/vector_db.py:230-263)
    is just this scan, executed distributed instead of paged over gRPC.

    The `events` table is written with nanosecond parquet timestamps,
    which Spark 4 refuses by default: read nanos as long and convert to
    a microsecond TimestampType (same truncation DuckDB applies).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: truncate ns→µs exactly as DuckDB/Arrow do
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(df.schema["ts"].dataType, T.TimestampType):
            # µs parquet timestamps load as TIMESTAMP_NTZ in Spark 4, which
            # rejects unix_micros()/cast("long"); with the UTC session tz the
            # cast to TimestampType is value-identical.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _RELATION_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict; also registers each as a temp view so the
    same queries can be written in pure SQL (`spark.sql`)."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
