"""Cold-JIT probe (VERDICT r5 item 4): is the cold-run tax on the
literal-heavy queries (folded codebooks/constants -> huge whole-stage
codegen methods) reducible by config, without hurting warm time?

For each (query, conf-variant) pair, a FRESH JVM runs the query twice
(cold, warm).  Variants:
  default        -- the engine's session confs as shipped
  hugemethod1500 -- spark.sql.codegen.hugeMethodLimit=1500 (HotSpot's
                    inline threshold: any generated method bigger than
                    this falls back to interpreted expression eval
                    instead of being JIT-compiled)
  nowholestage   -- spark.sql.codegen.wholeStage=false (Volcano iterator
                    with per-expression codegen only)

Usage: python tools/cold_jit_probe.py [sf_dir] [query ...]
Prints one JSON line per (query, variant).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "default": {},
    "hugemethod1500": {"spark.sql.codegen.hugeMethodLimit": "1500"},
    "nowholestage": {"spark.sql.codegen.wholeStage": "false"},
}

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES
from odp_dynamic_data_pipeline_spark.session import get_spark

name, sf_dir, confs = {name!r}, {sf_dir!r}, {confs!r}
spark = get_spark("jit_probe", master="local[32]", extra_confs=confs)
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
for label in ("cold", "warm"):
    t0 = time.time()
    SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[label] = round(time.time() - t0, 3)
print("PROBE " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    queries = sys.argv[2:] or [
        "dedup_graph_pagerank",
        "multimodal_ahash_dedup",
        "semantic_dedup_clusters",
    ]
    for name in queries:
        for variant, confs in VARIANTS.items():
            code = _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir, confs=confs)
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True, timeout=600
            )
            row = None
            for line in proc.stdout.splitlines():
                if line.startswith("PROBE "):
                    row = json.loads(line.removeprefix("PROBE "))
            print(
                json.dumps(
                    {"query": name, "variant": variant, **(row or {"error": proc.stderr[-300:]})}
                )
            )


if __name__ == "__main__":
    main()
