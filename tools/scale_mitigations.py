"""Follow-up to tools/scale_rehearsal.py: measure the PRESCRIBED scale
levers for the two super-linear queries the rehearsal flagged.

1. semantic_dedup (exp ~1.16 at fixed k=8): the docstring's k ~ sqrt(N)
   prescription keeps expected per-cluster pair counts constant -- run
   the operator with k = round(8 * sqrt(m)) per scale and fit the
   exponent again.
2. adamic_adar_scores (exp ~1.31, output-bound wedge count): the
   max_degree hub cap drops wedges through boilerplate hubs -- run with
   max_degree=64 per scale.

Same corpus generator, scales, and timing protocol as the rehearsal.
Writes SCALE_MITIGATIONS.json.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scale_rehearsal import fit_exponent, gen_dataset  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_MITIGATIONS.json")
    scales = [int(s) for s in os.environ.get("SPARK_GRAFT_SCALES", "1,3,10").split(",")]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from odp_dynamic_data_pipeline_spark.operators import dedup as dd
    from odp_dynamic_data_pipeline_spark.operators import similarity as sim
    from odp_dynamic_data_pipeline_spark.session import get_spark
    from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

    spark = get_spark("scale_mitigations", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="scale_mitig_")
    dirs: dict[int, str] = {}
    for m in scales:
        d = f"{root}/m{m}"
        gen_dataset(spark, d, m)
        dirs[m] = d

    def semdedup_sqrtk(sf_dir: str, m: int):
        emb = load_table(spark, sf_dir, "embeddings")
        return sim.semantic_dedup(emb, k=round(8 * math.sqrt(m)), iters=3, threshold=0.2)

    def aa_capped(sf_dir: str, m: int):
        from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES

        edges = SPARK_QUERIES["dedup_minhash_md5"](spark, sf_dir).select("id_a", "id_b")
        return dd.adamic_adar_scores(edges, max_degree=64)

    variants = {
        "semantic_dedup_k_sqrtN": semdedup_sqrtk,
        "adamic_adar_maxdeg64": aa_capped,
    }
    results: dict[str, dict] = {}
    for name, fn in variants.items():
        fn(dirs[scales[0]], scales[0]).write.format("noop").mode("overwrite").save()
        ts: dict[int, float] = {}
        for m in scales:
            t0 = time.time()
            fn(dirs[m], m).write.format("noop").mode("overwrite").save()
            ts[m] = round(time.time() - t0, 3)
        results[name] = {"t": ts, "exponent": fit_exponent(ts)}
        print(f"{name}: {ts} exponent={results[name]['exponent']}", file=sys.stderr)
        with open(out_path, "w") as f:
            f.write(json.dumps({"queries": results, "scales_x_sf01": scales,
                                "cpus": int(cpus)}) + "\n")

    print(json.dumps({"queries": results}))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
