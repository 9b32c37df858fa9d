"""Run the driver contract under a VANILLA SparkSession.

The driver harness (the contract's real consumer) builds its own plain
``SparkSession.builder.getOrCreate()`` — no Arrow, default shuffle
partitions, no timezone/config curation.  Every in-repo check used to run
under ``frizbee_spark.session.get_spark``'s curated config, which is how
an Arrow-only ``createDataFrame`` conversion (numpy.float64 inside
array<double>) passed 270 tests and a clean oracle check, then broke
``ann_topk``/``ivf_topk`` in CORRECTNESS_r03 (VERDICT r3 "What's wrong"
#1).  This script is the missing environment: a bare session, `entry()`
plus every `queries()` entry executed via ``.toPandas()`` (the non-Arrow
collect path), per-query PASS/ERR lines and a JSON summary on stdout,
exit 1 on any failure.

Usage:  python scripts/vanilla_contract.py [sf_dir] [master]
        (defaults: /root/testdata/sf0.001, local[2])

Must be launched in a FRESH process — in a process that already holds a
configured SparkSession, getOrCreate() would silently reuse it and the
test would prove nothing.  tests/test_entry_contract.py does this via
subprocess.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[2]"

    from pyspark.sql import SparkSession

    if SparkSession.getActiveSession() is not None:
        print("FATAL: an active SparkSession already exists; run in a "
              "fresh process", file=sys.stderr)
        return 2

    # deliberately minimal: master + headless UI only.  No Arrow, no
    # shuffle-partition tuning, no timezone — the harness's environment.
    spark = (
        SparkSession.builder.master(master)
        .appName("vanilla-contract")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    assert spark.conf.get(
        "spark.sql.execution.arrow.pyspark.enabled", "false"
    ).lower() == "false", "session is not vanilla: Arrow is enabled"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E

    results: dict[str, dict] = {}
    failed = []

    def run_one(name, fn):
        t0 = time.time()
        try:
            pdf = fn().toPandas()
            results[name] = {
                "ok": True, "rows": int(len(pdf)),
                "cols": sorted(map(str, pdf.columns)),
                "sec": round(time.time() - t0, 2),
            }
            print(f"PASS {name} rows={len(pdf)} "
                  f"({results[name]['sec']}s)", flush=True)
        except Exception:
            results[name] = {"ok": False, "err": traceback.format_exc()[-1500:]}
            failed.append(name)
            print(f"ERR {name}\n{results[name]['err']}", flush=True)

    run_one("entry", lambda: E.entry(spark))
    for name, q in sorted(E.queries().items()):
        run_one(name, lambda q=q: q(spark, sf_dir))

    print("VANILLA_CONTRACT_JSON=" + json.dumps(
        {"sf_dir": sf_dir, "master": master, "failed": failed,
         "n_queries": len(results), "results": results}))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
