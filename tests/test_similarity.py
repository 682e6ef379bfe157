"""ANN quality gates: approximate methods must actually find neighbors.
(The single-table SRP-LSH this replaced had recall@5 = 0.02.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators import similarity as sim
from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _recall(exact, approx):
    return len(exact & approx) / len(exact)


def test_ann_recall_floors(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact = {(r["qid"], r["cand_id"]) for r in sim.cosine_topk(emb, q, k=5).collect()}
    assert len(exact) == 100

    lsh = {(r["qid"], r["cand_id"]) for r in sim.lsh_topk(emb, q, k=5).collect()}
    assert _recall(exact, lsh) >= 0.5, "multi-table SRP-LSH recall collapsed"

    ivf = {(r["qid"], r["cand_id"]) for r in sim.ivf_topk(emb, q, k=5, nlist=8, nprobe=2).collect()}
    assert _recall(exact, ivf) >= 0.5, "IVF nprobe=2 recall collapsed"


def test_exact_topk_selfconsistent(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    rows = sim.cosine_topk(emb, q, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["cosine"], r["cand_id"]))
    for qid, lst in by_q.items():
        lst.sort()
        cosines = [c for _, c, _ in lst]
        assert cosines == sorted(cosines, reverse=True)  # ranks follow cosine
        assert all(cid != qid for _, _, cid in lst)  # self excluded
