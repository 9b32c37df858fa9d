"""Profiling harness: per-stage wall + Spark job/stage counts for the e2e
dedup pipeline at a given corpus size and core count. Usage:

    python scripts/profile_pipeline.py <docs> <cores>

Prints one JSON line with per-stage walls and scheduler counters.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frizbee_spark.pipeline import NearDupPipeline, PipelineConfig
    from frizbee_spark.session import get_spark
    from frizbee_spark.sources.corpus import write_corpus

    corpus_dir = os.path.join(tempfile.gettempdir(), f"frizbee_bench_corpus_{docs}")
    t0 = time.monotonic()
    write_corpus(corpus_dir, docs)
    gen_wall = time.monotonic() - t0

    spark = get_spark("frizbee-profile", cores=cores)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    workdir = tempfile.mkdtemp(prefix="frizbee_profile_", dir="/dev/shm" if __import__("os").path.isdir("/dev/shm") else None)
    try:
        t0 = time.monotonic()
        pipe = NearDupPipeline(spark, PipelineConfig(workdir=workdir))
        out = pipe.run(input_path=corpus_dir)
        out["clusters"].count()
        wall = time.monotonic() - t0
        jobs = len(tracker.getJobIdsForGroup(None)) or len(tracker.getJobIdsForGroup("") or [])
        try:
            all_jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n_jobs = len(all_jobs)
        except Exception:
            n_jobs = -1
        metrics = [
            (r["stage"], r["rows_out"], round(r["wall_ms"] / 1e3, 2))
            for r in pipe.metrics().collect()
        ]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    print(json.dumps({
        "docs": docs, "cores": cores, "wall_sec": round(wall, 1),
        "corpus_gen_sec": round(gen_wall, 1),
        "n_jobs": n_jobs, "jobs_alt": jobs,
        "stage_walls": metrics,
    }))


if __name__ == "__main__":
    main()
