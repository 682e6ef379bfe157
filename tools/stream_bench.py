"""Isolated streaming-twin benchmark (VERDICT r5 item 1).

The per-round ``bench.py`` times all 230 queries inside ONE shared JVM, so
a streaming twin's number carries whatever JVM pressure (code cache, GC,
state-store providers) the preceding batch queries created.  This harness
answers "what do the streaming twins cost on their own?": each ``*stream*``
query runs in its OWN fresh ``local[N]`` subprocess (new JVM, engine confs
from ``session.get_spark``, zero prior queries) and is timed twice --
cold (first execution, includes per-session micro-batch machinery: state
store provider init, checkpoint dir I/O paths, streaming codegen) and warm
(second execution in the same session, fresh checkpoint dir where the
query manages one internally).

Usage: python tools/stream_bench.py [sf_dir] [out_json] [query ...]
  env: SPARK_GRAFT_CPUS (default 32)
  With explicit query names, only those run (any registered query, not
  just ``*stream*`` -- the same fresh-JVM adjudication applies to batch
  queries whose shared-session numbers look inflated) and their rows are
  MERGED into an existing out_json instead of replacing it.

Writes ``out_json`` (default STREAM_BENCH_LOCAL.json at the repo root):
{"queries": {name: {"cold": s, "warm": s}}, "cpus": N, "sf": ..., "isolation": "fresh JVM per query"}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES
from odp_dynamic_data_pipeline_spark.session import get_spark

name, sf_dir, cpus = {name!r}, {sf_dir!r}, {cpus!r}
spark = get_spark("stream_bench_" + name, master=f"local[{{cpus}}]")
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for label in ("cold", "warm"):
    t0 = time.time()
    SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[label] = round(time.time() - t0, 3)
print("STREAM_BENCH_RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    # positional [sf_dir] [out_json] [query...] -- but a caller passing
    # query names FIRST used to get the first name as sf_dir and the
    # second as out_json (silently writing a stray file into the repo
    # root).  Anything that is not an existing directory / .json path is
    # treated as a query name instead.
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out_path = os.path.join(REPO, "STREAM_BENCH_LOCAL.json")
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
        if args and args[0].endswith(".json"):
            out_path = args.pop(0)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, REPO)
    from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES

    unknown = [n for n in args if n not in SPARK_QUERIES]
    if unknown:
        raise SystemExit(f"stream_bench: not registered queries: {unknown}")
    explicit = args
    names = explicit or [n for n in SPARK_QUERIES if "stream" in n]
    results: dict[str, dict] = {}
    if explicit and os.path.exists(out_path):
        try:
            with open(out_path) as f:
                results = json.load(f).get("queries", {})
        except (OSError, json.JSONDecodeError):
            results = {}
    for name in names:
        code = _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir, cpus=cpus)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=600
        )
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("STREAM_BENCH_RESULT "):
                row = json.loads(line.removeprefix("STREAM_BENCH_RESULT "))
        if row is None:
            row = {"error": (proc.stderr or "no output")[-500:]}
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    doc = {
        "queries": results,
        "cpus": int(cpus),
        "sf": sf,
        "isolation": "fresh JVM per query, timed twice (cold=first run incl. "
        "session streaming machinery, warm=second run same session)",
    }
    with open(out_path, "w") as f:
        f.write(json.dumps(doc) + "\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
