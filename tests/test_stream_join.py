"""Stream-stream join (watermarked, time-bounded) and bounded-state
streaming dedup (dropDuplicatesWithinWatermark)."""

from __future__ import annotations

import json

from pyspark.sql.types import StringType, StructField, StructType

from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
from odp_dynamic_data_pipeline_spark.streaming import run_available_now
from odp_dynamic_data_pipeline_spark.streaming.stream import (
    dedup_within_watermark,
    stream_stream_join,
)

from pyspark.sql import functions as F

CLICK_SCHEMA = StructType(
    [StructField("user", StringType()), StructField("click_id", StringType()),
     StructField("timestamp", StringType())]
)
IMP_SCHEMA = StructType(
    [StructField("user", StringType()), StructField("imp_id", StringType()),
     StructField("timestamp", StringType())]
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_join_within_bound(spark, tmp_path):
    """Impressions pair with clicks for the same user within 10 minutes;
    a click outside the bound stays unmatched (inner join drops it)."""
    imp_dir = tmp_path / "imp"
    clk_dir = tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    _write_jsonl(imp_dir / "a.json", [
        {"user": "u1", "imp_id": "i1", "timestamp": "2024-11-16T12:00:00Z"},
        {"user": "u2", "imp_id": "i2", "timestamp": "2024-11-16T12:00:00Z"},
    ])
    _write_jsonl(clk_dir / "a.json", [
        {"user": "u1", "click_id": "c1", "timestamp": "2024-11-16T12:05:00Z"},  # within
        {"user": "u2", "click_id": "c2", "timestamp": "2024-11-16T12:45:00Z"},  # outside
    ])

    imps = read_file_stream(spark, str(imp_dir), IMP_SCHEMA, multiline=False).withColumn(
        "event_time", F.to_timestamp("timestamp")
    )
    clks = read_file_stream(spark, str(clk_dir), CLICK_SCHEMA, multiline=False).withColumn(
        "event_time", F.to_timestamp("timestamp")
    )
    joined = stream_stream_join(
        imps, clks, on="user", within="10 minutes",
        left_watermark="1 hour", right_watermark="1 hour",
    )
    run_available_now(joined, query_name="ssj", checkpoint=str(tmp_path / "ck"))
    rows = spark.sql("select * from ssj").collect()
    got = {(r["user"], r["imp_id"], r["r_click_id"]) for r in rows}
    assert got == {("u1", "i1", "c1")}


def test_dedup_within_watermark(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_jsonl(d / "a.json", [
        {"user": "u1", "click_id": "c1", "timestamp": "2024-11-16T12:00:00Z"},
        {"user": "u1", "click_id": "c1", "timestamp": "2024-11-16T12:00:30Z"},  # dup in-window
        {"user": "u1", "click_id": "c2", "timestamp": "2024-11-16T12:01:00Z"},
    ])
    stream = read_file_stream(spark, str(d), CLICK_SCHEMA, multiline=False).withColumn(
        "event_time", F.to_timestamp("timestamp")
    )
    out = dedup_within_watermark(stream, ["user", "click_id"], watermark="30 minutes")
    run_available_now(out, query_name="ddwm", checkpoint=str(tmp_path / "ck2"))
    rows = spark.sql("select * from ddwm").collect()
    assert sorted(r["click_id"] for r in rows) == ["c1", "c2"]


def test_stream_stream_left_outer_emits_unmatched(spark, tmp_path):
    """Left-outer: an impression with no click inside the bound must emit
    with a NULL click once the watermark passes its eviction time (this is
    the state-store cleanup semantic -- unmatched rows surface exactly when
    they can no longer match)."""
    import os
    import time

    imp_dir = tmp_path / "imp_o"
    clk_dir = tmp_path / "clk_o"
    imp_dir.mkdir()
    clk_dir.mkdir()
    now = time.time()
    _write_jsonl(imp_dir / "a.json", [
        {"user": "u1", "imp_id": "i1", "timestamp": "2024-11-16T12:00:00Z"},
        {"user": "u3", "imp_id": "i3", "timestamp": "2024-11-16T12:00:00Z"},  # never clicked
    ])
    # second files: far-future rows on BOTH sides advance the watermark past
    # u3's eviction time (12:10 + delay) so the unmatched row can emit
    _write_jsonl(imp_dir / "b.json", [
        {"user": "zza", "imp_id": "ix", "timestamp": "2024-11-16T15:00:00Z"},
    ])
    _write_jsonl(clk_dir / "a.json", [
        {"user": "u1", "click_id": "c1", "timestamp": "2024-11-16T12:05:00Z"},
    ])
    _write_jsonl(clk_dir / "b.json", [
        {"user": "zzc", "click_id": "cx", "timestamp": "2024-11-16T15:00:00Z"},
    ])
    for i, p in enumerate([imp_dir / "a.json", clk_dir / "a.json", imp_dir / "b.json", clk_dir / "b.json"]):
        os.utime(p, (now - 60 + i, now - 60 + i))

    imps = read_file_stream(
        spark, str(imp_dir), IMP_SCHEMA, multiline=False, max_files_per_trigger=1
    ).withColumn("event_time", F.to_timestamp("timestamp"))
    clks = read_file_stream(
        spark, str(clk_dir), CLICK_SCHEMA, multiline=False, max_files_per_trigger=1
    ).withColumn("event_time", F.to_timestamp("timestamp"))
    joined = stream_stream_join(
        imps, clks, on="user", within="10 minutes",
        left_watermark="1 minute", right_watermark="1 minute", how="left_outer",
    )
    run_available_now(joined.select("user", "imp_id", "r_click_id"),
                      query_name="outer_join_out")
    rows = {(r["user"], r["imp_id"], r["r_click_id"])
            for r in spark.sql("SELECT * FROM outer_join_out").collect()}
    assert ("u1", "i1", "c1") in rows          # matched pair
    assert ("u3", "i3", None) in rows          # unmatched emits with NULL
