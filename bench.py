"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit", "queries": {name: sec}, "sf"}.

Each query is timed to full materialization (count of the result), not
plan construction. A warm-up query first absorbs JVM/codegen startup so
numbers reflect steady-state execution, which is what scales.
"""

from __future__ import annotations

import json
import os
import re
import time

HEADLINE = [
    "knn_topk_cosine",
    "knn_topk_filtered",
    "knn_batch",
    "embedding_neardup_cosine",
    "dedup_exact",
    "doc_fingerprint",
    "text_stats",
    "text_quality_score",
    "pricing_summary",
    "top_customers_by_spend",
    "customers_without_orders",
    "order_first_line",
    "events_tumbling_window",
    "events_session_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.session import get_spark

    spark = get_spark("vkb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: a tiny end-to-end job (JVM + codegen + parquet footer reads)
    q.QUERIES["cluster_stats"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in q.QUERIES:
            continue
        t0 = time.time()
        q.QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
