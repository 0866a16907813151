"""Local mimic of the driver's DuckDB-oracle comparison: run a Spark query
and its oracle SQL on the same parquet, normalize (sort columns by name,
order-insensitive rows, stringify), and diff."""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from vector_knowledge_base_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, out


def compare(spark_df, con, sql):
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    sc, sr = normalize(spark_cols, spark_rows)
    dc, dr = normalize(duck_cols, duck_rows)
    problems = []
    if sc != dc:
        problems.append(f"schema mismatch: spark={sc} duckdb={dc}")
    if len(sr) != len(dr):
        problems.append(f"row count mismatch: spark={len(sr)} duckdb={len(dr)}")
    if not problems and sr != dr:
        diffs = [
            (a, b) for a, b in zip(sr, dr) if a != b
        ][:5]
        problems.append(f"value mismatch, first diffs: {diffs}")
    return problems
