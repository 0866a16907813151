"""Every registered query must match its DuckDB oracle at sf0.001 —
a faster local version of the driver's t2 gate (which runs sf0.01)."""

from __future__ import annotations

import pytest

from vector_knowledge_base_spark import queries as q
from tests.conftest import SF_DIR
from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(q.QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = q.QUERIES[name](spark, SF_DIR)
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
