"""Recorded full oracle sweep at an arbitrary scale factor (r12,
VERDICT r11 next-round #6: promote the opt-in sf0.1 sweep from pytest
archaeology to a committed per-round artifact).

Runs EVERY oracled registry query through the driver-style DuckDB
comparison (tests/oracle_harness.py — the same canonicalization and
hashing the driver gate uses) at ``$SPARK_GRAFT_SWEEP_SF`` (default
/root/testdata/sf0.1) and writes ``SWEEP_r{N}.json``::

    python sweep.py 12            # writes SWEEP_r12.json
    SPARK_GRAFT_SWEEP_SF=/root/testdata/sf0.01 python sweep.py 12

The record is one JSON object: per-query {ok, secs, problems} plus a
summary (n_oracled, n_ok, n_fail, sf_dir, elapsed) — every oracled row
gets fresh cross-SF evidence each round, committed in-tree. Rows-only
registrations (no SQL oracle) are listed by name so the record also
pins the oracle-coverage denominator.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "X"
    sf_dir = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.1")
    out_path = f"SWEEP_r{round_no}.json"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as e
    from oracle_harness import compare, duckdb_connection

    con = duckdb_connection(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    t_start = time.time()
    results: dict[str, dict] = {}
    n_fail = 0
    for name in sorted(qs):
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            problems = compare(qs[name](spark, sf_dir), con, oracles[name])
        except Exception as ex:  # noqa: BLE001 — record and keep sweeping
            problems = [f"ERR {type(ex).__name__}: {str(ex).splitlines()[0][:200]}"]
        ok = not problems
        n_fail += not ok
        results[name] = {
            "ok": ok,
            "secs": round(time.time() - t0, 2),
            **({"problems": problems} if problems else {}),
        }
        print(("OK  " if ok else "FAIL ") + name, flush=True)
    record = {
        "sf_dir": sf_dir,
        "round": round_no,
        "n_registered": len(qs),
        "n_oracled": len(results),
        "n_ok": len(results) - n_fail,
        "n_fail": n_fail,
        "elapsed_sec": round(time.time() - t_start, 1),
        "rows_only": sorted(n for n in qs if n not in oracles),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}: {record['n_ok']}/{record['n_oracled']} ok,",
          f"{record['elapsed_sec']}s", flush=True)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
