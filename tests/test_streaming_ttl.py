"""State-TTL test: an unmatched start register must expire (event-time
timeout) once the watermark passes its TTL, and a later end event must then
find no register."""

from __future__ import annotations

import json
import os
import time

from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
from odp_dynamic_data_pipeline_spark.sources.schemas import USER_EXP_SCHEMA, with_event_time
from odp_dynamic_data_pipeline_spark.streaming import pair_page_views_stream, run_available_now


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def test_register_expires_after_ttl(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    now = time.time()
    # batch 1: cX opens a register at 12:00
    _write(
        d / "b1.json",
        [{"eventId": "s1", "clientId": "cX", "traceId": "t", "timestamp": "2024-11-16T12:00:00Z",
          "page": "/h", "eventType": "page_view_start"}],
        now - 60,
    )
    # batch 2: another client's event at 18:00 pushes the watermark far past
    # the 1-hour TTL -> cX's register times out
    _write(
        d / "b2.json",
        [{"eventId": "w1", "clientId": "cY", "traceId": "t", "timestamp": "2024-11-16T18:00:00Z",
          "page": "/h", "eventType": "page_view_start"}],
        now - 40,
    )
    # batch 3: filler (cY) -- timeouts fire for groups with NO new data in
    # the batch, so this is where cX's expired register is dropped
    _write(
        d / "b3.json",
        [{"eventId": "w2", "clientId": "cY", "traceId": "t", "timestamp": "2024-11-16T18:10:00Z",
          "page": "/h", "eventType": "page_view_start"}],
        now - 30,
    )
    # batch 4: cX's end at 18:30 -- its register expired, so NO pair emits
    _write(
        d / "b4.json",
        [{"eventId": "e1", "clientId": "cX", "traceId": "t", "timestamp": "2024-11-16T18:30:00Z",
          "page": "/h", "eventType": "page_view_end"}],
        now - 20,
    )

    stream = with_event_time(
        read_file_stream(spark, str(d), USER_EXP_SCHEMA, multiline=False, max_files_per_trigger=1)
    ).withWatermark("event_time", "0 seconds")
    paired = pair_page_views_stream(stream, state_ttl_ms=3600 * 1000)
    run_available_now(paired, query_name="ttl_out", checkpoint=str(tmp_path / "ck"))
    rows = spark.sql("select * from ttl_out").collect()
    assert rows == []  # expired register => end event ignored


def test_register_survives_within_ttl(spark, tmp_path):
    d = tmp_path / "in2"
    d.mkdir()
    now = time.time()
    _write(
        d / "b1.json",
        [{"eventId": "s1", "clientId": "cZ", "traceId": "t", "timestamp": "2024-11-16T12:00:00Z",
          "page": "/h", "eventType": "page_view_start"}],
        now - 60,
    )
    _write(
        d / "b2.json",
        [{"eventId": "e1", "clientId": "cZ", "traceId": "t", "timestamp": "2024-11-16T12:30:00Z",
          "page": "/h", "eventType": "page_view_end"}],
        now - 40,
    )
    stream = with_event_time(
        read_file_stream(spark, str(d), USER_EXP_SCHEMA, multiline=False, max_files_per_trigger=1)
    ).withWatermark("event_time", "0 seconds")
    paired = pair_page_views_stream(stream, state_ttl_ms=3600 * 1000)
    run_available_now(paired, query_name="ttl_ok", checkpoint=str(tmp_path / "ck2"))
    rows = spark.sql("select * from ttl_ok").collect()
    assert len(rows) == 1 and rows[0]["page_view_duration"] == 1800.0
