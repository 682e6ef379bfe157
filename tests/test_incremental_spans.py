"""run_incremental_spans: ingest-gate ExactSubstr -- one-sided cross-batch
semantics (new docs span-checked against history, history never
retro-flagged), within-batch duplication, retry-ghost exclusion."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql.types import LongType, StringType, StructField, StructType

from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
from odp_dynamic_data_pipeline_spark.streaming.stream import run_incremental_spans

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _write_batches(tmp_path, batches):
    d = tmp_path / "sp_in"
    d.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (now - 60 + 30 * i, now - 60 + 30 * i))
    return str(d)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _run(spark, tmp_path, batches, **kw):
    src = _write_batches(tmp_path, batches)
    stream = read_file_stream(
        spark, src, SCHEMA, multiline=False, max_files_per_trigger=1
    )
    store, out = str(tmp_path / "sp_store"), str(tmp_path / "sp_out")
    run_incremental_spans(
        stream, store, out, checkpoint=str(tmp_path / "sp_ck"), **kw
    )
    acc = spark.read.parquet(out)
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, int(r.batch_id))
        for r in acc.collect()
    }, store


def test_one_sided_cross_batch_semantics(spark, tmp_path):
    passage = _words("p", 10)
    # batch 0: doc 1 carries the passage (first occurrence -- clean),
    #          doc 2 is unique
    # batch 1: doc 3 re-carries the passage -> doc 3 IS flagged via the
    #          store; doc 1 is NEVER retro-flagged
    b0 = [
        {"doc_id": 1, "text": _words("a", 2) + " " + passage},
        {"doc_id": 2, "text": _words("u", 12)},
    ]
    b1 = [{"doc_id": 3, "text": passage + " " + _words("z", 3)}]
    got, _ = _run(spark, tmp_path, [b0, b1], min_tokens=8)
    assert got == {(3, 1, 10, 10, 1)}


def test_within_batch_duplication_flags_both(spark, tmp_path):
    run = _words("r", 8)
    b0 = [
        {"doc_id": 1, "text": run + " " + _words("x", 2)},
        {"doc_id": 2, "text": _words("y", 2) + " " + run},
    ]
    got, _ = _run(spark, tmp_path, [b0], min_tokens=8)
    assert got == {(1, 1, 8, 8, 0), (2, 3, 10, 8, 0)}


def test_retry_excludes_own_ghost_partition(spark, tmp_path):
    # the store already holds THIS batch's windows under batch_id=0 (a
    # failed attempt): the retry must not count the batch against its own
    # ghost, so a clean first-occurrence doc stays unflagged
    from odp_dynamic_data_pipeline_spark.operators.text import token_windows

    passage = _words("p", 9)
    rows = [{"doc_id": 1, "text": passage}]
    store = str(tmp_path / "sp_store")
    ghost = token_windows(
        spark.createDataFrame([(1, passage)], "doc_id long, text string"),
        "text", min_tokens=8,
    )
    ghost.write.mode("overwrite").parquet(f"{store}/wins/batch_id=0")
    src = _write_batches(tmp_path, [rows])
    stream = read_file_stream(spark, src, SCHEMA, multiline=False)
    out = str(tmp_path / "sp_out")
    run_incremental_spans(
        stream, store, out, checkpoint=str(tmp_path / "sp_ck"), min_tokens=8
    )
    assert spark.read.parquet(out).count() == 0


def test_store_accretes_batch_keyed(spark, tmp_path):
    b0 = [{"doc_id": 1, "text": _words("a", 10)}]
    b1 = [{"doc_id": 2, "text": _words("b", 10)}]
    _, store = _run(spark, tmp_path, [b0, b1], min_tokens=8)
    assert sorted(os.listdir(f"{store}/wins")) == ["batch_id=0", "batch_id=1"]


def test_store_compaction_mid_stream_output_unchanged(spark, tmp_path):
    # fold the window store into the batch_id=-1 baseline between
    # AvailableNow runs: later batches must still count historical windows
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        compact_incremental_store,
    )

    passage = _words("p", 9)
    b0 = [{"doc_id": 1, "text": passage}]
    b1 = [{"doc_id": 2, "text": _words("x", 2) + " " + passage}]
    src = _write_batches(tmp_path, [b0])
    store, out, ck = (
        str(tmp_path / "sp_store"),
        str(tmp_path / "sp_out"),
        str(tmp_path / "sp_ck"),
    )
    stream = read_file_stream(spark, src, SCHEMA, multiline=False)
    run_incremental_spans(stream, store, out, checkpoint=ck, min_tokens=8)
    assert compact_incremental_store(spark, f"{store}/wins") == 1
    assert os.listdir(f"{store}/wins") == ["batch_id=-1"]
    # drop 2: doc 2 must pair against the COMPACTED baseline
    p = os.path.join(src, "b1.json")
    with open(p, "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    stream2 = read_file_stream(spark, src, SCHEMA, multiline=False)
    run_incremental_spans(stream2, store, out, checkpoint=ck, min_tokens=8)
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(2, 3, 11)}  # doc 1 stays unflagged (one-sided), doc 2 flagged
