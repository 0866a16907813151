"""Local mimic of the driver's DuckDB-oracle comparison.

The driver canonicalizes both result sets as pandas DataFrames (columns
sorted by name, rows sorted by all columns) and hash-compares the raw
frames — no float re-rounding, dtype-sensitive hashing (DuckDB HUGEINT
vs Spark BIGINT hash differently), and array cells crash its sorter
(``TypeError: unhashable type: 'list'``). Round 1 shipped 3 locally-green
/ driver-red queries because this harness was more lenient; it now
reproduces the driver behavior:

- Spark results via ``toPandas()``, oracle via ``duckdb .df()`` — the
  same Arrow-backed frames the driver hashes;
- rows sorted with ``sort_values`` over every column (list/array cells
  raise, reported as an ERR exactly like the driver);
- values compared via ``pandas.util.hash_pandas_object`` — an object
  column of Python ints (DuckDB HUGEINT) will NOT match an int64 column,
  surfacing the SUM(int)→HUGEINT artifact locally;
- the only normalization applied is unifying datetime precision (both
  engines emit Arrow timestamps; ns-vs-us is a pandas-version artifact,
  not an engine difference).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from vector_knowledge_base_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted
    by all columns. Raises TypeError on unhashable (list) cells — the
    same failure the driver records as ERR."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _row_hashes(df: pd.DataFrame):
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


def compare(spark_df, con, sql) -> list[str]:
    """Return a list of problems (empty = the driver would record
    rows/schema/hash_match all true)."""
    sp = spark_df.toPandas()
    dk = con.sql(sql).df()

    problems: list[str] = []
    if sorted(sp.columns) != sorted(dk.columns):
        problems.append(
            f"schema mismatch: spark={sorted(sp.columns)} duckdb={sorted(dk.columns)}"
        )
        return problems
    if len(sp) != len(dk):
        problems.append(f"row count mismatch: spark={len(sp)} duckdb={len(dk)}")

    try:
        sp_c, dk_c = _canon(sp), _canon(dk)
    except TypeError as e:  # unhashable list cells — driver ERR
        problems.append(f"canonicalize ERR (driver would crash): {e}")
        return problems

    if problems:
        return problems

    sh, dh = _row_hashes(sp_c), _row_hashes(dk_c)
    if not (sh == dh).all():
        bad = (sh != dh).nonzero()[0][:5]
        diffs = [
            (sp_c.iloc[i].to_dict(), dk_c.iloc[i].to_dict()) for i in bad
        ]
        problems.append(
            f"hash mismatch on {int((sh != dh).sum())} rows; first diffs: "
            f"{diffs}; dtypes spark={sp_c.dtypes.to_dict()} "
            f"duckdb={dk_c.dtypes.to_dict()}"
        )
    return problems
