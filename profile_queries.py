"""Per-query profiler for the optimization rounds (guide §1).

For every HEADLINE bench row: time one noop-materialized run, count the
Spark jobs it dispatched, and dump ``.explain("formatted")`` to
plans/<round>/<query>_<label>.txt.

Two job counts are recorded (r15):
- ``n_jobs``: job-group scoped (the r14 methodology) — misses jobs
  dispatched from ``_overlap`` driver threads (job groups are
  thread-local), so overlapped fixtures under-count.
- ``n_jobs_all``: global job-id delta (max job id after − before),
  which counts every job the row dispatched from any thread. This is
  the honest per-row cost number; the profiler runs rows sequentially
  so no other source of jobs exists between the two probes.

Usage:
    python profile_queries.py before            # all headline rows
    python profile_queries.py before q1 q2 ...  # subset

Writes profile_r15_<label>.json: {name: {secs, n_jobs, n_jobs_all}}.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

ROUND = "r15"


def _max_job_id(sc, start: int) -> int:
    """Highest job id the status tracker knows, probing upward from
    ``start`` (job ids are monotone; retainedJobs default 1000 far
    exceeds any single row's dispatch)."""
    tracker = sc.statusTracker()
    j = max(start, 0)
    last = start
    while True:
        info = tracker.getJobInfo(j)
        if info is None:
            # ids are dense; one miss past the end terminates
            return last
        last = j
        j += 1


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

    os.makedirs(f"plans/{ROUND}", exist_ok=True)
    names = [n for n in bench.HEADLINE if n in q.QUERIES]
    if only:
        names = [n for n in names if n in only]
    out: dict[str, dict] = {}
    jid = _max_job_id(sc, 0)
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
        jid_after = _max_job_id(sc, jid)
        out[name] = {
            "secs": round(secs, 3),
            "n_jobs": len(jobs),
            "n_jobs_all": jid_after - jid,
        }
        jid = jid_after
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/{ROUND}/{name}_{label}.txt", "w") as fh:
            fh.write(buf.getvalue())
        print(
            f"{secs:8.2f}s {out[name]['n_jobs']:4d}/"
            f"{out[name]['n_jobs_all']:4d} jobs  {name}",
            flush=True,
        )
    with open(f"profile_{ROUND}_{label}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
