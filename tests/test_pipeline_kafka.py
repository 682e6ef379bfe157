"""Kafka-format stages in the YAML pipeline compiler (S4 as a declared
stage): broker-less wire REPLAY end-to-end (archive -> parse_kafka_value ->
stream-static enrich -> staged drain -> mapping extraction), incremental
re-compile over a second archive drop, and live-broker wiring (monkeypatch
-- the sandbox has no broker or connector jar)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from odp_dynamic_data_pipeline_spark.plans.pipeline import Pipeline
from odp_dynamic_data_pipeline_spark.sources import readers
from odp_dynamic_data_pipeline_spark.sources.writers import format_kafka_value

PAYLOAD = StructType(
    [StructField("order_id", LongType()), StructField("segment", StringType())]
)


def _write_wire(spark, rows, dest, mode="overwrite", topic="orders"):
    """Archive-dump fixture: typed rows -> the exact wire schema a broker
    delivers (format_kafka_value for key/value + synthetic metadata)."""
    df = spark.createDataFrame(rows, PAYLOAD)
    wire = (
        format_kafka_value(df, key_cols="order_id")
        .withColumn("topic", F.lit(topic))
        .withColumn("partition", F.lit(0).cast("int"))
        .withColumn("offset", F.monotonically_increasing_id())
        .withColumn("timestamp", F.to_timestamp(F.lit("2024-11-16 12:00:00")))
        .withColumn("timestampType", F.lit(0).cast("int"))
    )
    wire.write.mode(mode).parquet(dest)
    # the file-stream source orders discovery by modification time; make
    # appended drops strictly newer
    time.sleep(0.05)


def _spec(wire_dir, lookup_path):
    return {
        "pipeline_name": "kafka_demo",
        "stages": {
            "stage_k": {
                "input": {
                    "format": "kafka",
                    "wire_path": f"{wire_dir}/part*.parquet",
                    "wire_format": "parquet",
                    "schema": PAYLOAD,
                },
                "mappings": {
                    "write": [
                        {"name": "order_to_segment", "key": "order_id",
                         "value": "segment"}
                    ]
                },
            },
            "stage_b": {
                "input": {"format": "parquet", "path": lookup_path},
                "mappings": {
                    "read": [{"name": "order_to_segment", "key_field": "oid"}]
                },
            },
        },
    }


def test_kafka_replay_stage_end_to_end_and_incremental(spark, tmp_path):
    wire_dir = str(tmp_path / "wire")
    _write_wire(spark, [(1, "AUTO"), (2, "HOME")], wire_dir)
    lookup = str(tmp_path / "facts")
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "oid long, qty long"
    ).write.parquet(lookup)

    pipe = Pipeline(_spec(wire_dir, lookup))
    work = str(tmp_path / "work")
    outputs, mappings = pipe.compile(spark, work_dir=work)

    # the staged kafka table carries decoded payload + wire metadata
    staged = outputs["stage_k"]
    assert {"order_id", "segment", "topic", "partition", "offset", "kafka_ts"} <= set(
        staged.columns
    )
    assert staged.count() == 2
    got = {
        (r.oid, r.segment)
        for r in outputs["stage_b"].select("oid", "segment").collect()
    }
    assert got == {(1, "AUTO"), (2, "HOME"), (3, None)}

    # drop 2: a NEW archive file lands; the same work_dir re-compile
    # ingests ONLY the new offsets (checkpointed file source), so the
    # staging table accretes without double-ingest
    _write_wire(spark, [(3, "TOYS")], wire_dir, mode="append")
    outputs2, _ = pipe.compile(spark, work_dir=work)
    assert outputs2["stage_k"].count() == 3
    got2 = {
        (r.oid, r.segment)
        for r in outputs2["stage_b"].select("oid", "segment").collect()
    }
    assert got2 == {(1, "AUTO"), (2, "HOME"), (3, "TOYS")}


def test_kafka_broker_mode_compiles_to_read_kafka_stream(spark, tmp_path, monkeypatch):
    """Live-broker wiring: the compiler must hand bootstrap_servers, topic,
    schema and the option map straight to read_kafka_stream (whose option
    surface is broker-lessly unit-proven in test_sources_extra)."""
    seen = {}

    def fake(spark_, servers, topic, *, schema=None, **options):
        seen.update(servers=servers, topic=topic, schema=schema, options=options)
        # stand-in stream with the DECODED shape a real source yields
        wire_dir = str(tmp_path / "wire_b")
        _write_wire(spark_, [(9, "MISC")], wire_dir)
        return readers.read_kafka_wire_stream(spark_, wire_dir, schema)

    monkeypatch.setattr(readers, "read_kafka_stream", fake)
    lookup = str(tmp_path / "facts_b")
    spark.createDataFrame([(9, 1)], "oid long, qty long").write.parquet(lookup)
    spec = _spec("unused", lookup)
    spec["stages"]["stage_k"]["input"] = {
        "format": "kafka",
        "bootstrap_servers": "k1:9092,k2:9092",
        "topic": "orders",
        "schema": PAYLOAD,
        "options": {"starting_offsets": "earliest", "max_offsets_per_trigger": 500},
    }
    outputs, _ = Pipeline(spec).compile(spark, work_dir=str(tmp_path / "work_b"))
    assert seen["servers"] == "k1:9092,k2:9092" and seen["topic"] == "orders"
    assert seen["schema"] is PAYLOAD
    assert seen["options"] == {
        "starting_offsets": "earliest",
        "max_offsets_per_trigger": 500,
    }
    assert [(r.oid, r.segment) for r in outputs["stage_b"].collect()] == [(9, "MISC")]


def test_kafka_stage_spec_validation(spark):
    bad_schema = {
        "pipeline_name": "p",
        "stages": {"s": {"input": {"format": "kafka", "wire_path": "/x/*.parquet"}}},
    }
    with pytest.raises(ValueError, match="kafka input needs an explicit schema"):
        Pipeline(bad_schema).compile(spark)
    no_source = {
        "pipeline_name": "p",
        "stages": {"s": {"input": {"format": "kafka", "schema": PAYLOAD}}},
    }
    with pytest.raises(ValueError, match="bootstrap_servers"):
        Pipeline(no_source).compile(spark)
