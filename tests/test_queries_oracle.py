"""Every registered query must match its DuckDB oracle at sf0.01 — the
driver's own scale factor (running the gate at a smaller SF hid 3
driver-red queries in round 1). Override with $VKB_ORACLE_SF_DIR."""

from __future__ import annotations

import os

import pytest

from vector_knowledge_base_spark import queries as q
from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import compare, duckdb_connection

ORACLE_SF_DIR = os.environ.get("VKB_ORACLE_SF_DIR", SF_DIR_CORRECTNESS)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(ORACLE_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(q.QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = q.QUERIES[name](spark, ORACLE_SF_DIR)
    if name not in q.ORACLES:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    problems = compare(df, con, q.ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_events_ts_loads_as_timestamp(spark):
    """Regression for the round-2 TIMESTAMP_NTZ crash: whatever parquet
    flavor the testdata ships (ns-as-long legacy or µs→NTZ), load_table
    must normalize events.ts to a session-tz TimestampType so
    unix_micros()/cast("long") work in every event-time query."""
    from pyspark.sql import types as T

    from vector_knowledge_base_spark.sources.tables import load_table

    df = load_table(spark, ORACLE_SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_driver_window_first50_all_oracled():
    """The driver hash-checks only the first 50 queries() entries; every
    one of those slots must carry a SQL oracle (rows-only entries belong
    past the window)."""
    first50 = list(q.all_queries())[:50]
    missing = [n for n in first50 if n not in q.all_oracles()]
    assert not missing, f"rows-only queries inside the driver window: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
