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


def test_pyds_stream_sink_multibatch_exactly_once(spark, tmp_path):
    """The streaming Python SINK (DataSourceStreamWriter) must commit each
    micro-batch under batch-prefixed final names, deliver every row exactly
    once across >= 2 data batches, and leave no .tmp staging files."""
    import glob

    from odp_dynamic_data_pipeline_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.format("synthetic_corpus")
        .option("n_docs", 150)
        .option("partitions", 4)
        .option("advance", 60)
        .load()
    )
    q = (
        stream.selectExpr("doc_id", "md5(text) AS text_md5")
        .writeStream.format("jsonl_pysink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            n = 0
            for fn in glob.glob(f"{out}/batch-*.jsonl"):
                with open(fn) as f:
                    n += sum(1 for _ in f)
            if n >= 150:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()
    back = spark.read.schema("doc_id bigint, text_md5 string").json(out)
    rows = back.selectExpr("COUNT(*) c", "COUNT(DISTINCT doc_id) d").collect()[0]
    assert rows["c"] == 150 and rows["d"] == 150, (rows["c"], rows["d"])
    batch_ids = {f.rsplit("/", 1)[-1].split("-")[1] for f in glob.glob(f"{out}/batch-*.jsonl")}
    assert len(batch_ids) >= 2, batch_ids
    assert not glob.glob(f"{out}/*.tmp")


def test_pyds_stream_sink_replayed_batch_overwrites(tmp_path):
    """Driver-side replay idempotence: committing the SAME batch id twice
    (the crash-between-sink-commit-and-checkpoint-commit scenario) must
    replace the first attempt's files, not double the output."""
    import glob
    import os

    from odp_dynamic_data_pipeline_spark.sources.pyds import (
        JsonlStreamSinkWriter,
        _JsonlCommit,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)
    w = JsonlStreamSinkWriter({"path": out})

    def stage(contents):
        msgs = []
        for i, c in enumerate(contents):
            p = os.path.join(out, f"part-{i:05d}-attempt.jsonl.tmp")
            with open(p, "w") as f:
                f.write(c)
            msgs.append(_JsonlCommit(p))
        return msgs

    w.commit(stage(['{"doc_id": 1}\n', '{"doc_id": 2}\n']), 7)
    assert len(glob.glob(f"{out}/batch-00000007-*.jsonl")) == 2
    # replay of batch 7 with different partitioning: one file, new content
    w.commit(stage(['{"doc_id": 1}\n{"doc_id": 2}\n']), 7)
    files = sorted(glob.glob(f"{out}/batch-00000007-*.jsonl"))
    assert len(files) == 1, files
    assert open(files[0]).read() == '{"doc_id": 1}\n{"doc_id": 2}\n'
    # a different batch never touches batch 7's committed output
    w.commit(stage(['{"doc_id": 3}\n']), 8)
    assert len(glob.glob(f"{out}/batch-00000007-*.jsonl")) == 1
    assert len(glob.glob(f"{out}/batch-00000008-*.jsonl")) == 1
    assert not glob.glob(f"{out}/*.tmp")


def test_pyds_stream_sink_refuses_truncate_modes():
    """complete/update output modes pass overwrite=True expecting per-batch
    truncate; the sink's commit only replaces files of the SAME batch id,
    so honoring them would snapshot-duplicate rows -- it must refuse."""
    import pytest

    from odp_dynamic_data_pipeline_spark.sources.pyds import JsonlSinkDataSource

    ds = JsonlSinkDataSource(options={"path": "/tmp/never-used"})
    with pytest.raises(NotImplementedError):
        ds.streamWriter(None, True)
    assert ds.streamWriter(None, False) is not None
