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
