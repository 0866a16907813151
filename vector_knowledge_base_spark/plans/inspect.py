"""Physical-plan inspection utilities — the engine's 100 TB guardrails.

The reference has no planner to inspect (SURVEY §4.1: every optimization
is hand-coded). Here the optimizer is Catalyst, and these helpers make
its decisions ASSERTABLE: tests pin that filters reach the parquet scan
(PushedFilters), projections prune columns (ReadSchema), dimension joins
broadcast, and nothing degenerates into a cartesian product. A plan
regression that would melt a 1000-executor job fails a unit test here
instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every file scan in the plan."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column sets read by each scan (ReadSchema) — column-pruning check."""
    txt = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    return "WholeStageCodegen" in explain_str(df)


def assert_no_cartesian(df: DataFrame) -> None:
    txt = explain_str(df)
    if "CartesianProduct" in txt:
        raise AssertionError("plan contains CartesianProduct:\n" + txt)
