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
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_neardup",
    "simhash_fingerprint",
    "language_id_heuristic",
    "text_stats",
    "text_quality_score",
    "pipeline_chunk_documents",
    "pipeline_embed_knn",
    "pricing_summary",
    "top_customers_by_spend",
    "multiway_join_revenue",
    "customers_without_orders",
    "order_first_line",
    "rollup_sales",
    "asof_last_click_before_purchase",
    "range_join_clicks_after_purchase",
    "orders_above_customer_avg",
    "running_spend_per_customer",
    "shipping_priority_q3",
    "large_quantity_orders_q18",
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
    # plus one Python-UDF stage so the pool of Python workers is spawned
    # before timing begins — bench measures steady-state throughput, not
    # interpreter cold-start.
    q.QUERIES["cluster_stats"](spark, sf_dir).collect()
    par = spark.sparkContext.defaultParallelism
    warm = spark.range(par * 4).repartition(par)
    warm.mapInPandas(lambda it: it, "id long").count()

    # min of 2 runs per query: this container's CPU scheduling is noisy
    # (shared host) — the minimum is the honest steady-state number.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in q.QUERIES:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            q.QUERIES[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

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
