"""Incremental streaming dedup: history-known and within-stream duplicates
must both be dropped; only genuinely new documents survive."""

from __future__ import annotations

import json

from pyspark.sql.types import LongType, StringType, StructField, StructType

from odp_dynamic_data_pipeline_spark.operators.text import fingerprint
from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
from odp_dynamic_data_pipeline_spark.streaming import run_available_now
from odp_dynamic_data_pipeline_spark.streaming.stream import dedup_incremental

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_incremental_dedup_closed_loop(spark, tmp_path):
    """Cross-batch dedup through the growing fingerprint store: a batch-2
    duplicate of a batch-1 document must be dropped."""
    import os
    import time

    from odp_dynamic_data_pipeline_spark.streaming.stream import run_incremental_dedup

    d = tmp_path / "loop_in"
    d.mkdir()
    now = time.time()
    b1 = [{"doc_id": 1, "text": "alpha body"}, {"doc_id": 2, "text": "beta body"}]
    b2 = [{"doc_id": 3, "text": "ALPHA   body"}, {"doc_id": 4, "text": "gamma body"}]
    for name, rows, mt in [("b1.json", b1, now - 60), ("b2.json", b2, now - 30)]:
        p = d / name
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (mt, mt))

    stream = read_file_stream(
        spark, str(d), DOC_SCHEMA, multiline=False, max_files_per_trigger=1
    )
    run_incremental_dedup(
        stream,
        store_path=str(tmp_path / "store"),
        out_path=str(tmp_path / "clean"),
        checkpoint=str(tmp_path / "ck_loop"),
    )
    survivors = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "clean")).collect()}
    assert survivors == {1, 2, 4}  # doc 3 is a normalized dup of doc 1 from batch 1
    store = spark.read.parquet(str(tmp_path / "store")).count()
    assert store == 3


def test_incremental_dedup(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    docs = [
        {"doc_id": 1, "text": "known document body"},     # already in history
        {"doc_id": 2, "text": "fresh document one"},
        {"doc_id": 3, "text": "Fresh   Document ONE"},    # normalized dup of 2
        {"doc_id": 4, "text": "fresh document two"},
    ]
    with open(d / "batch.json", "w") as f:
        for r in docs:
            f.write(json.dumps(r) + "\n")

    history = fingerprint(
        spark.createDataFrame([(0, "Known  document BODY")], "doc_id long, text string")
    ).select("fingerprint")

    stream = read_file_stream(spark, str(d), DOC_SCHEMA, multiline=False)
    fresh = dedup_incremental(stream, history)
    run_available_now(fresh, query_name="fresh_docs", checkpoint=str(tmp_path / "ck"))
    survivors = {r["doc_id"] for r in spark.sql("select * from fresh_docs").collect()}
    # doc 1 dropped (history), exactly one of {2,3} survives, doc 4 survives
    assert 1 not in survivors
    assert 4 in survivors
    assert len(survivors & {2, 3}) == 1 and len(survivors) == 2
