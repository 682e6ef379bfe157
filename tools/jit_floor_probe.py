"""Multi-rep post-JIT floor probe: the adjudication step after
tools/stream_bench.py when a 2-rep fresh-JVM warm still exceeds the
drift bar.  JIT-heavy plans (unrolled iterative graph queries, literal-
folded codebooks, many-join TPC-H shapes) keep compiling for 3-5
executions; the FLOOR over N reps in one fresh JVM is the number that
separates "the plan got slower" from "2 reps never reach the floor on
this container" (r11 precedent: weighted_median_price 2-rep 2.46 s vs
5-rep floor 1.68 s).

Merges ``{name}__{N}rep_r{round}`` rows into STREAM_BENCH_LOCAL.json:
{"reps": [...], "floor": min, "round": R}.  tools/bench_drift.py reads
suffixed ``floor`` receipts keyed by round (most recent round wins).

Usage: python tools/jit_floor_probe.py <round> [sf_dir] query...
  env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_FLOOR_REPS (default 6)

TIMING RUN: run alone, like bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES
from odp_dynamic_data_pipeline_spark.session import get_spark

name, sf_dir, cpus, reps = {name!r}, {sf_dir!r}, {cpus!r}, {reps}
spark = get_spark("jit_floor_" + name, master=f"local[{{cpus}}]")
spark.sparkContext.setLogLevel("ERROR")
walls = []
for _ in range(reps):
    t0 = time.time()
    SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 3))
print("JIT_FLOOR_RESULT " + json.dumps(walls))
spark.stop()
"""


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    rnd = int(sys.argv[1])
    rest = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    if os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("SPARK_GRAFT_FLOOR_REPS", "6"))
    out_path = os.path.join(REPO, "STREAM_BENCH_LOCAL.json")

    doc = {"queries": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    rows = doc.setdefault("queries", {})

    for name in rest:
        code = _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir, cpus=cpus, reps=reps)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
        )
        walls = None
        for ln in proc.stdout.splitlines():
            if ln.startswith("JIT_FLOOR_RESULT "):
                walls = json.loads(ln.split(" ", 1)[1])
        if walls is None:
            print(f"{name}: child failed\n{proc.stderr[-1200:]}", file=sys.stderr)
            continue
        row = {"reps": walls, "floor": min(walls), "round": rnd,
               "isolation": f"fresh JVM, {reps} consecutive reps, floor=min"}
        rows[f"{name}__{reps}rep_r{rnd}"] = row
        print(f"{name}: {json.dumps(row)}", file=sys.stderr)
        with open(out_path, "w") as f:
            f.write(json.dumps(doc) + "\n")

    print(json.dumps({n: r for n, r in rows.items() if n.endswith(f"_r{rnd}")}))


if __name__ == "__main__":
    main()
