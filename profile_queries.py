"""Per-query profiler for the optimization round (guide §1).

For every HEADLINE bench row: time one noop-materialized run, count the
Spark jobs it dispatched (job-group scoped), and dump
``.explain("formatted")`` to plans/r14/<query>_<label>.txt.

Usage:
    python profile_queries.py before            # all headline rows
    python profile_queries.py before q1 q2 ...  # subset

Writes profile_<label>.json: {name: {secs, n_jobs}}.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from vector_knowledge_base_spark import queries as q
    from vector_knowledge_base_spark.session import get_spark

    spark = get_spark("vkb-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm-up identical to bench.py
    bench._materialize(q.QUERIES["cluster_stats"](spark, sf_dir))
    par = sc.defaultParallelism
    warm = spark.range(par * 4).repartition(par)
    warm.mapInPandas(lambda it: it, "id long").count()

    os.makedirs("plans/r14", exist_ok=True)
    names = [n for n in bench.HEADLINE if n in q.QUERIES]
    if only:
        names = [n for n in names if n in only]
    out: dict[str, dict] = {}
    for name in names:
        sc.setJobGroup(f"prof_{name}", name)
        t0 = time.time()
        try:
            df = q.QUERIES[name](spark, sf_dir)
            bench._materialize(df)
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        secs = time.time() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(f"prof_{name}")
        out[name] = {"secs": round(secs, 3), "n_jobs": len(jobs)}
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r14/{name}_{label}.txt", "w") as fh:
            fh.write(buf.getvalue())
        print(f"{secs:8.2f}s {len(jobs):4d} jobs  {name}", flush=True)
    with open(f"profile_{label}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
