"""Per-stage wall-clock comparison across parallelism widths.

Runs the end-to-end dedup pipeline in a fresh subprocess per width
(taskset-pinned, like bench_scaling.py) on the same cached corpus, keeps
the workdir, and prints each stage's wall at every width plus its
individual scaling efficiency — the tool for finding WHICH stage fails to
scale, not just that the total does.

Usage: python scripts/stage_walls.py [docs] [width ...]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, tempfile
sys.path.insert(0, __REPO__)
from frizbee_spark.pipeline import NearDupPipeline, PipelineConfig
from frizbee_spark.session import get_spark

cpus = int(sys.argv[1]); corpus = sys.argv[2]; out_json = sys.argv[3]
spark = get_spark("stage-walls", cores=cpus)
work_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
workdir = tempfile.mkdtemp(prefix="stage_walls_", dir=work_root)
t0 = time.monotonic()
pipe = NearDupPipeline(spark, PipelineConfig(workdir=workdir))
out = pipe.run(input_path=corpus)
out["clusters"].count()
wall = time.monotonic() - t0
rows = pipe.metrics().collect()
json.dump(
    {"cpus": cpus, "total": round(wall, 2),
     "stages": {r["stage"]: round(r["wall_ms"] / 1e3, 2) for r in rows
                if r["rows_out"] >= 0}},
    open(out_json, "w"))
spark.stop()
import shutil; shutil.rmtree(workdir, ignore_errors=True)
""".replace("__REPO__", repr(REPO))


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    widths = [int(w) for w in sys.argv[2:]] or [8, 32]

    sys.path.insert(0, REPO)
    from frizbee_spark.sources.corpus import write_corpus

    corpus = os.path.join(tempfile.gettempdir(), f"frizbee_bench_corpus_{docs}")
    write_corpus(corpus, docs)

    results = {}
    for w in widths:
        fd, out_json = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        cmd = [sys.executable, "-c", CHILD, str(w), corpus, out_json]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{w - 1}"] + cmd
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        if r.returncode != 0:
            print(r.stdout[-3000:], r.stderr[-3000:])
            sys.exit(1)
        results[w] = json.load(open(out_json))
        os.unlink(out_json)

    stages = list(results[widths[0]]["stages"])
    w0, w1 = widths[0], widths[-1]
    speed = w1 / w0
    print(f"{'stage':<12}" + "".join(f"  c{w:<6}" for w in widths) + "  eff")
    for s in stages:
        t = [results[w]["stages"].get(s, float('nan')) for w in widths]
        eff = t[0] / (t[-1] * speed) if t[-1] else float("nan")
        print(f"{s:<12}" + "".join(f"  {x:<7.1f}" for x in t) + f"  {eff:.2f}")
    tot = [results[w]["total"] for w in widths]
    print(f"{'TOTAL':<12}" + "".join(f"  {x:<7.1f}" for x in tot)
          + f"  {tot[0] / (tot[-1] * speed):.2f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
