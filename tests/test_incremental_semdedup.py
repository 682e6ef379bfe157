"""Streaming SemDeDup (streaming.stream.run_incremental_semdedup):
stream == batch equality against operators.similarity.semantic_dedup's
election, retry idempotence, the id-high-water-mark guard, the config
pin (centroid fingerprint), and store compaction invariance.  The
registry query incremental_semdedup_stream additionally gates the full
pipeline (training included) against the DuckDB unrolled-Lloyd oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.similarity import quantized
from odp_dynamic_data_pipeline_spark.streaming.stream import (
    apply_incremental_semdedup_batch,
    compact_incremental_store,
)

# two tight cosine families (near-parallel vectors) + one outlier, ids
# chosen so the families straddle the batch split
VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.01, 0.0, 0.0]),   # dup of 0 (same cluster, cos ~ 1)
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.0, 1.0, 1.0]),
    (4, [0.98, 0.02, 0.0, 0.0]),   # dup of 0/1, arrives in batch 2
    (5, [0.01, 0.99, 0.0, 0.0]),   # dup of 2, arrives in batch 2
    (6, [0.0, 0.0, -1.0, 1.0]),
]
CENTS_SRC = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cents(spark):
    """Quantized integer centroids (same e6 quantization as the runner)."""
    df = _df(spark, [(i, v) for i, v in enumerate(CENTS_SRC)])
    rows = quantized(df).orderBy("vec_id").select("qvec").collect()
    return [list(r["qvec"]) for r in rows]


def _batch_expected(spark, cents, rows, threshold=0.9):
    """Reference election: semantic_dedup's pair logic with FIXED
    centroids (assignment + non-chained lowest-id witness)."""
    from odp_dynamic_data_pipeline_spark.operators.similarity import DOT, ivf_assign

    asg = ivf_assign(quantized(_df(spark, rows)), cents, nprobe=1).select(
        "vec_id", F.col("ivf_list").cast("int").alias("cluster_id"), "qvec", "qnorm"
    )
    a = asg.select(
        F.col("vec_id").alias("id_a"), "cluster_id",
        F.col("qvec").alias("qa"), F.col("qnorm").alias("na"),
    )
    b = asg.select(
        F.col("vec_id").alias("id_b"), "cluster_id",
        F.col("qvec").alias("qb"), F.col("qnorm").alias("nb"),
    )
    pairs = a.join(b, "cluster_id").where(F.col("id_a") < F.col("id_b"))
    cos = F.expr(DOT.format(a="qa", b="qb")).cast("double") / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    dups = {
        r["id_b"]
        for r in pairs.select("id_b", cos.alias("c")).where(F.col("c") >= threshold).collect()
    }
    return {
        r["vec_id"]: (r["cluster_id"], 1 if r["vec_id"] in dups else 0)
        for r in asg.collect()
    }


def _fold(spark, tmp, rows, batch_id, cents, threshold=0.9):
    apply_incremental_semdedup_batch(
        _df(spark, rows), batch_id,
        str(tmp / "store"), str(tmp / "out"),
        centroids=cents, threshold=threshold,
    )


def _out(spark, tmp):
    return {
        r["vec_id"]: (r["cluster_id"], r["is_dup"])
        for r in spark.read.parquet(str(tmp / "out")).collect()
    }


def test_stream_equals_batch_election(spark, tmp_path):
    cents = _cents(spark)
    b1, b2 = VECS[:4], VECS[4:]
    _fold(spark, tmp_path, b1, 0, cents)
    _fold(spark, tmp_path, b2, 1, cents)
    assert _out(spark, tmp_path) == _batch_expected(spark, cents, VECS)


def test_retry_is_idempotent(spark, tmp_path):
    """Re-applying a batch under the same batch_id (foreachBatch retry)
    must neither double-elect nor see its own failed attempt's vectors."""
    cents = _cents(spark)
    _fold(spark, tmp_path, VECS[:4], 0, cents)
    _fold(spark, tmp_path, VECS[4:], 1, cents)
    before = _out(spark, tmp_path)
    _fold(spark, tmp_path, VECS[4:], 1, cents)  # retry of batch 1
    assert _out(spark, tmp_path) == before


def test_hwm_guard_rejects_out_of_order_ids(spark, tmp_path):
    """A batch whose min id falls at or below the stored high-water mark
    would need retro-elections; the runner refuses loudly."""
    cents = _cents(spark)
    _fold(spark, tmp_path, VECS[4:], 0, cents)  # ids 4..6 first
    with pytest.raises(ValueError, match="high-water mark"):
        _fold(spark, tmp_path, VECS[:4], 1, cents)  # ids 0..3 arrive late


def test_config_pin_rejects_different_centroids(spark, tmp_path):
    cents = _cents(spark)
    _fold(spark, tmp_path, VECS[:4], 0, cents)
    other = [list(c) for c in cents]
    other[0] = [x + 1 for x in other[0]]
    with pytest.raises(ValueError, match="different layout"):
        _fold(spark, tmp_path, VECS[4:], 1, other)
    with pytest.raises(ValueError, match="different layout"):
        _fold(spark, tmp_path, VECS[4:], 1, cents, threshold=0.5)


def test_compaction_preserves_elections(spark, tmp_path):
    """Folding the vector store's batch partitions into the batch_id=-1
    baseline must not change any later election (duplicate witnesses
    survive distinct-fold because vector rows are unique per id)."""
    cents = _cents(spark)
    _fold(spark, tmp_path, VECS[:4], 0, cents)
    n = compact_incremental_store(spark, str(tmp_path / "store" / "vectors"))
    assert n == 1
    compact_incremental_store(spark, str(tmp_path / "store" / "meta"))
    _fold(spark, tmp_path, VECS[4:], 1, cents)
    assert _out(spark, tmp_path) == _batch_expected(spark, cents, VECS)


def test_empty_batch_is_a_noop(spark, tmp_path):
    cents = _cents(spark)
    _fold(spark, tmp_path, VECS[:4], 0, cents)
    before = _out(spark, tmp_path)
    _fold(spark, tmp_path, [], 1, cents)
    assert _out(spark, tmp_path) == before
