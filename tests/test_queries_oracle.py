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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
