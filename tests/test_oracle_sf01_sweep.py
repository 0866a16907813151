"""Opt-in full oracle sweep at an arbitrary scale factor.

The standard harness (test_queries_oracle.py) checks every oracled
query at sf0.01 — the driver's own gate SF. This sweep re-runs the
whole comparison at a LARGER scale factor, because some bug classes
only materialize with more data: rounding ties crossing a boundary,
window frames hitting duplicate timestamps, df-caps actually engaging,
quantile interpolation on longer value runs.

Skipped by default (it costs ~10-20 min at sf0.1); enable with::

    SPARK_GRAFT_SWEEP_SF=/root/testdata/sf0.1 python -m pytest \
        tests/test_oracle_sf01_sweep.py -q

Round-5 evidence: the sweep was run green at sf0.1 (261 queries,
0 fails) — recorded in ROADMAP.md.
"""

from __future__ import annotations

import os
import sys

import pytest

SWEEP_SF = os.environ.get("SPARK_GRAFT_SWEEP_SF")

pytestmark = pytest.mark.skipif(
    not SWEEP_SF, reason="set SPARK_GRAFT_SWEEP_SF=<sf_dir> to enable"
)


def _pairs():
    if not SWEEP_SF:
        return []
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    return [(n, qs[n], os_[n]) for n in sorted(qs) if n in os_]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_oracle_at_sweep_sf(spark, name, fn, sql):
    from oracle_harness import compare, duckdb_connection

    con = duckdb_connection(SWEEP_SF)
    problems = compare(fn(spark, SWEEP_SF), con, sql)
    assert not problems, f"{name} @ {SWEEP_SF}: {'; '.join(problems)}"
