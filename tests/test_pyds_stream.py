"""Streaming Python DataSource: incremental offset progression, commit
callbacks, exactly-once row delivery, and batch/stream generator parity."""

from __future__ import annotations

import time


def test_pyds_stream_incremental_batches_exactly_once(spark):
    """With advance=64 over 300 docs and a processing-time trigger, the
    source must deliver every doc exactly once across >= 5 micro-batches,
    and the engine must commit each consumed offset back to the reader."""
    from odp_dynamic_data_pipeline_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    stream = (
        spark.readStream.format("synthetic_corpus")
        .option("n_docs", 300)
        .option("partitions", 4)
        .option("advance", 64)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_inc")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM pyds_inc").collect()[0]["c"] >= 300:
                break
            time.sleep(0.3)
        rows = spark.sql(
            "SELECT COUNT(*) c, COUNT(DISTINCT doc_id) d FROM pyds_inc"
        ).collect()[0]
        assert rows["c"] == 300, f"expected 300 rows, got {rows['c']}"
        assert rows["d"] == 300, "duplicate doc_ids: not exactly-once"
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert n_batches >= 5, f"expected >=5 data batches, got {n_batches}"
    finally:
        q.stop()


def test_pyds_stream_matches_batch_source(spark):
    """The stream reader must generate the identical corpus as the batch
    reader (shared _doc_row), so one oracle covers both paths."""
    from odp_dynamic_data_pipeline_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    batch = (
        spark.read.format("synthetic_corpus")
        .option("n_docs", 80)
        .option("partitions", 4)
        .load()
    )
    stream = (
        spark.readStream.format("synthetic_corpus")
        .option("n_docs", 80)
        .option("partitions", 4)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_twin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM pyds_twin")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
