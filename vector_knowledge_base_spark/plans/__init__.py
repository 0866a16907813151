from vector_knowledge_base_spark.plans.inspect import (
    assert_no_cartesian,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "assert_no_cartesian",
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "scan_read_schema",
]
