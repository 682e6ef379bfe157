"""CSV source, parquet compaction, and materialized-mapping pipeline handoff."""

from __future__ import annotations

import glob

from pyspark.sql.types import LongType, StringType, StructField, StructType

from odp_dynamic_data_pipeline_spark.plans.pipeline import Pipeline
from odp_dynamic_data_pipeline_spark.sources.readers import read_csv
from odp_dynamic_data_pipeline_spark.sources.writers import compact_parquet


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name\n1,alpha\n2,beta\n")
    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    rows = {r["id"]: r["name"] for r in read_csv(spark, str(p), schema).collect()}
    assert rows == {1: "alpha", 2: "beta"}


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(10_000).repartition(16).write.parquet(path)
    assert len(glob.glob(f"{path}/part-*")) == 16
    compact_parquet(spark, path, target_files=2, sort_within_by=["id"])
    assert len(glob.glob(f"{path}/part-*")) == 2
    assert spark.read.parquet(path).count() == 10_000


def test_pipeline_materialized_mappings(spark, tmp_path):
    """Stages exchange mappings through parquet (separate-process style);
    results identical to the in-process plan."""
    spec = {
        "pipeline_name": "mat",
        "stages": {
            "a": {
                "input": {"format": "parquet", "path": "/root/testdata/sf0.001/customer.parquet"},
                "mappings": {"write": [{"name": "m", "key": "c_custkey", "value": "c_mktsegment"}]},
            },
            "b": {
                "input": {"format": "parquet", "path": "/root/testdata/sf0.001/orders.parquet"},
                "mappings": {"read": [{"name": "m", "key_field": "o_custkey"}]},
            },
        },
    }
    mdir = str(tmp_path / "mappings")
    out_mat, _ = Pipeline(spec).compile(spark, mappings_dir=mdir)
    out_mem, _ = Pipeline(spec).compile(spark)
    got_mat = {r["o_orderkey"]: r["c_mktsegment"] for r in out_mat["b"].collect()}
    got_mem = {r["o_orderkey"]: r["c_mktsegment"] for r in out_mem["b"].collect()}
    assert got_mat == got_mem and len(got_mat) == 1500
    assert glob.glob(f"{mdir}/m/part-*")  # the mapping is a real parquet table


def test_orc_roundtrip_partitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.sources.readers import read_orc
    from odp_dynamic_data_pipeline_spark.sources.writers import write_orc

    df = spark.range(100).select(
        "id",
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("h"), (F.col("id") % 2).cast("string")).alias("hour"),
    )
    path = str(tmp_path / "orc_data")
    write_orc(df, path, partition_by=["hour"])
    back = read_orc(spark, path)
    assert back.count() == 100
    assert set(back.columns) == {"id", "grp", "hour"}
    # hour filter prunes to one partition directory
    h0 = read_orc(spark, path, hour="h0")
    assert h0.count() == 50
    plan = h0._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(hour" in plan


def test_kafka_stream_options_surface():
    """No broker in the sandbox; the option map IS the Kafka surface, so it
    is asserted directly (S4)."""
    import pytest

    from odp_dynamic_data_pipeline_spark.sources.readers import kafka_stream_options

    opts = kafka_stream_options("k1:9092,k2:9092", "events")
    assert opts == {
        "kafka.bootstrap.servers": "k1:9092,k2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
        "failOnDataLoss": "true",
    }
    opts = kafka_stream_options(
        "k:9092", "t", starting_offsets="earliest", fail_on_data_loss=False,
        max_offsets_per_trigger=50_000, group_id_prefix="odp",
    )
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["groupIdPrefix"] == "odp"
    with pytest.raises(ValueError):
        kafka_stream_options("", "t")


def test_parse_kafka_value_wire_schema(spark):
    """Value decode runs on a hand-built DataFrame with Kafka's exact wire
    schema -- the same code path a real stream goes through after load()."""
    import datetime
    import json as _json

    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField,
        StructType, TimestampType,
    )

    from odp_dynamic_data_pipeline_spark.sources.readers import parse_kafka_value

    wire = StructType([
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
    ])
    ts = datetime.datetime(2024, 11, 16, 12, 0, 5)
    rows = [
        (b"k1", _json.dumps({"user": "a", "n": 7}).encode(), "events", 0, 41, ts),
        (b"k2", b'{"user":"b","n":"notint"}', "events", 1, 42, ts),
        (b"k3", b"not json at all", "events", 1, 43, ts),
    ]
    payload = StructType([
        StructField("user", StringType()),
        StructField("n", LongType()),
    ])
    out = parse_kafka_value(spark.createDataFrame(rows, wire), payload).collect()
    by_off = {r["offset"]: r for r in out}
    assert by_off[41]["user"] == "a" and by_off[41]["n"] == 7
    assert by_off[41]["topic"] == "events" and by_off[41]["partition"] == 0
    assert by_off[42]["user"] == "b" and by_off[42]["n"] is None  # type miss -> null
    assert by_off[43]["user"] is None  # unparseable -> all-null row, offset kept
    assert by_off[43]["offset"] == 43


def test_read_json_filesystem_scheme_path(spark, tmp_path):
    """S2: the s3a route is schema-declared read over a Hadoop FileSystem
    URI; exercised with the file: scheme (the only FS in the sandbox) --
    same URI resolution, path templating, and schema application as
    s3a://bucket/prefix/data_{hour}.json."""
    import json as _json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from odp_dynamic_data_pipeline_spark.sources.readers import read_json

    bucket = tmp_path / "bucket" / "prefix"
    bucket.mkdir(parents=True)
    for hour, rows in [
        ("2024111612", [{"id": 1, "v": "x"}, {"id": 2, "v": "y"}]),
        ("2024111613", [{"id": 3, "v": "z"}]),
    ]:
        (bucket / f"data_{hour}.json").write_text(_json.dumps(rows))
    schema = StructType([StructField("id", LongType()), StructField("v", StringType())])
    uri_template = f"file://{bucket}/data_{{hour}}.json"
    df = read_json(spark, uri_template, schema, hour="2024111612")
    got = sorted((r["id"], r["v"]) for r in df.collect())
    assert got == [(1, "x"), (2, "y")]
    # unresolved template + no hour must not silently glob everything
    df13 = read_json(spark, uri_template, schema, hour="2024111613")
    assert df13.count() == 1


def test_read_parquet_schema_evolution(spark, tmp_path):
    """Additive schema change across hour partitions: mergeSchema unions the
    footers; rows from before the change surface the new column as null."""
    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.sources.readers import read_parquet

    base = str(tmp_path / "evolving")
    spark.range(3).select("id", F.lit("h0").alias("hour")).write.partitionBy(
        "hour"
    ).parquet(base)
    spark.range(3, 5).select(
        "id", F.lit(9).alias("extra"), F.lit("h1").alias("hour")
    ).write.mode("append").partitionBy("hour").parquet(base)

    merged = read_parquet(spark, base, merge_schema=True)
    assert set(merged.columns) == {"id", "extra", "hour"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows[0] is None and rows[4] == 9
    # hour filter still prunes on the evolved table
    h1 = read_parquet(spark, base, hour="h1", merge_schema=True)
    assert sorted(r["id"] for r in h1.collect()) == [3, 4]


def test_s3a_confs_deployment_shape():
    """The s3a deployment config builder (S2 scale path) is type-checked
    here since the sandbox has no object-store endpoint: committer wiring
    must bind Spark's cloud commit protocol, magic mode must flip its
    enable flag, and invalid dials must fail loudly instead of producing a
    silently-broken cluster profile."""
    import pytest

    from odp_dynamic_data_pipeline_spark.session import s3a_confs

    c = s3a_confs()
    assert c["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert c["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert c["spark.sql.sources.commitProtocolClass"].endswith(
        "PathOutputCommitProtocol"
    )
    assert c["spark.sql.parquet.output.committer.class"].endswith(
        "BindingParquetOutputCommitter"
    )
    assert "spark.hadoop.fs.s3a.endpoint" not in c
    assert "spark.hadoop.fs.s3a.path.style.access" not in c
    # every value must be a string (SparkConf contract)
    assert all(isinstance(v, str) for v in c.values())

    minio = s3a_confs(
        endpoint="http://localhost:9000", path_style_access=True, committer="directory"
    )
    assert minio["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert minio["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert minio["spark.hadoop.fs.s3a.committer.magic.enabled"] == "false"

    with pytest.raises(ValueError, match="committer must be one of"):
        s3a_confs(committer="rename")
    with pytest.raises(ValueError, match="endpoint must be an http"):
        s3a_confs(endpoint="localhost:9000")
    with pytest.raises(ValueError, match="invalid upload_buffer"):
        s3a_confs(upload_buffer="heap")


def test_kafka_sink_roundtrip_and_options(spark):
    """Kafka SINK halves, broker-less: format_kafka_value must be the
    exact inverse of parse_kafka_value (typed rows -> wire bytes -> typed
    rows is identity), the key must drive per-entity partitioning
    deterministically, and the sink option builder must reject empty
    coordinates."""
    import pytest

    from odp_dynamic_data_pipeline_spark.sources.readers import parse_kafka_value
    from odp_dynamic_data_pipeline_spark.sources.writers import (
        format_kafka_value,
        kafka_sink_options,
    )

    rows = [(1, "alice", 12.5), (2, "bob", -3.0)]
    df = spark.createDataFrame(rows, "id long, name string, score double")
    wire = format_kafka_value(df, key_cols="id")
    assert wire.columns == ["key", "value"]
    got_keys = sorted(bytes(r["key"]).decode() for r in wire.collect())
    assert got_keys == ['{"id":1}', '{"id":2}']
    # a key column may also be dropped from the value (key-only-in-key)
    wire2 = format_kafka_value(df, key_cols="id", drop_cols=["id"])
    assert sorted(bytes(r["key"]).decode() for r in wire2.collect()) == got_keys
    assert all(b'"id"' not in bytes(r["value"]) for r in wire2.collect())
    # NULL key parts and delimiter-looking data must stay distinct keys
    tricky = spark.createDataFrame(
        [("x|y", None), ("x", "y")], "a string, b string"
    )
    keys = {bytes(r["key"]).decode() for r in format_kafka_value(tricky, key_cols=["a", "b"]).collect()}
    assert len(keys) == 2

    # round trip through the READER half: add the metadata columns a real
    # broker would attach, then parse back to typed rows
    from pyspark.sql import functions as F

    broker = wire.select(
        "value",
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    back = parse_kafka_value(broker, "id long, name string, score double")
    assert sorted(
        (r["id"], r["name"], r["score"]) for r in back.collect()
    ) == rows

    opts = kafka_sink_options("b:9092", "events", checkpoint="/ck", include_headers=True)
    assert opts["topic"] == "events"
    assert opts["checkpointLocation"] == "/ck"
    assert opts["includeHeaders"] == "true"
    with pytest.raises(ValueError, match="kafka sink needs"):
        kafka_sink_options("", "events")


def test_python_datasource_synthetic_corpus(spark):
    """Spark 4 Python DataSource API surface: the custom source must plan
    its strided partitions (parallel generation, no driver bottleneck),
    generate deterministically (two reads identical), and honor options."""
    from odp_dynamic_data_pipeline_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    df = (
        spark.read.format("synthetic_corpus")
        .option("n_docs", 40)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows1 = sorted((r["doc_id"], r["text"]) for r in df.collect())
    rows2 = sorted((r["doc_id"], r["text"]) for r in df.collect())
    assert rows1 == rows2 and len(rows1) == 40
    assert {r[0] for r in rows1} == set(range(40))
    # partition layout must not change content: same corpus at 1 partition
    one = (
        spark.read.format("synthetic_corpus")
        .option("n_docs", 40)
        .option("partitions", 1)
        .load()
    )
    assert sorted((r["doc_id"], r["text"]) for r in one.collect()) == rows1
    # token lengths follow the md5 derivation (5..24)
    lens = {len(t.split()) for _, t in rows1}
    assert lens <= set(range(5, 25))
