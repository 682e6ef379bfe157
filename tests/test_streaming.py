"""Streaming surface tests: file source + AvailableNow trigger + memory sink,
stateful page-view pairing across micro-batches, stream-static enrichment."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
from odp_dynamic_data_pipeline_spark.sources.schemas import USER_EXP_SCHEMA, with_event_time
from odp_dynamic_data_pipeline_spark.streaming import (
    pair_page_views_stream,
    run_available_now,
    stream_enrich,
    windowed_event_counts,
)

EVENTS = [
    {"eventId": "e1", "clientId": "cA", "traceId": "t1",
     "timestamp": "2024-11-16T12:00:00Z", "page": "/h", "eventType": "page_view_start"},
    {"eventId": "e2", "clientId": "cA", "traceId": "t2",
     "timestamp": "2024-11-16T12:02:00Z", "page": "/h", "eventType": "page_view_end"},
    {"eventId": "e3", "clientId": "cB", "traceId": "t3",
     "timestamp": "2024-11-16T12:10:00Z", "page": "/h", "eventType": "page_view_start"},
    {"eventId": "e4", "clientId": "cB", "traceId": "t4",
     "timestamp": "2024-11-16T13:30:00Z", "page": "/h", "eventType": "page_view_end"},
]


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # two files = at least two discoverable chunks (JSONL, one file per "hour")
    with open(d / "part1.json", "w") as f:
        for r in EVENTS[:2]:
            f.write(json.dumps(r) + "\n")
    with open(d / "part2.json", "w") as f:
        for r in EVENTS[2:]:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_file_stream_available_now(spark, stream_dir, tmp_path):
    stream = read_file_stream(spark, stream_dir, USER_EXP_SCHEMA, multiline=False)
    assert stream.isStreaming
    ev = with_event_time(stream)
    counts = windowed_event_counts(ev, window="1 hour", group_cols=["eventType"])
    run_available_now(
        counts, query_name="wincounts", checkpoint=str(tmp_path / "ck1"), output_mode="complete"
    )
    rows = spark.sql("select * from wincounts").collect()
    got = {(r["window"].start.hour, r["eventType"]): r["n_events"] for r in rows}
    assert got[(12, "page_view_start")] == 2
    assert got[(12, "page_view_end")] == 1
    assert got[(13, "page_view_end")] == 1


def test_stateful_pairing_stream(spark, stream_dir, tmp_path):
    stream = with_event_time(read_file_stream(spark, stream_dir, USER_EXP_SCHEMA, multiline=False))
    paired = pair_page_views_stream(stream)
    run_available_now(paired, query_name="paired", checkpoint=str(tmp_path / "ck2"))
    rows = spark.sql("select * from paired").collect()
    got = {r["clientId"]: r["page_view_duration"] for r in rows}
    # cA pairs within one file; cB's start and end arrive in DIFFERENT files
    # (micro-batches) -- the register must survive in the state store
    assert got["cA"] == 120.0
    assert got["cB"] == 4800.0


def test_stream_static_enrich(spark, stream_dir, tmp_path):
    stream = read_file_stream(spark, stream_dir, USER_EXP_SCHEMA, multiline=False)
    mapping = spark.createDataFrame(
        [("t1", "sess-1"), ("t3", "sess-3")], "key string, sessionLabel string"
    )
    enriched = stream_enrich(stream, mapping, key_col="traceId")
    run_available_now(enriched, query_name="enriched", checkpoint=str(tmp_path / "ck3"))
    rows = {r["eventId"]: r["sessionLabel"] for r in spark.sql("select * from enriched").collect()}
    assert rows == {"e1": "sess-1", "e2": None, "e3": "sess-3", "e4": None}


def test_stateful_pairing_tws(spark, stream_dir, tmp_path):
    """Same W2 register semantics on the Spark 4 transformWithStateInPandas
    API: the ValueState register must survive micro-batch boundaries.

    Skipped where protobuf is unavailable: the transformWithState worker
    protocol needs google.protobuf (this container ships a broken stub);
    the applyInPandasWithState twin covers the semantics everywhere."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas worker protocol requires protobuf",
    )
    from odp_dynamic_data_pipeline_spark.streaming import pair_page_views_tws

    stream = with_event_time(read_file_stream(spark, stream_dir, USER_EXP_SCHEMA, multiline=False))
    paired = pair_page_views_tws(stream)
    run_available_now(paired, query_name="paired_tws", checkpoint=str(tmp_path / "ck_tws"))
    rows = spark.sql("select * from paired_tws").collect()
    got = {r["clientId"]: r["page_view_duration"] for r in rows}
    assert got["cA"] == 120.0
    assert got["cB"] == 4800.0
