"""Schema-declared readers (SURVEY.md section 2.1: S1, S2, S3-batch).

The reference reads one JSON array file per hour from a templated local path
(reference: src/data_processor.py:44-48) or curls a fixed URL pretending to
be S3 (reference: src/data_processor.py:56-88).  Spark-native replacement:
``spark.read.schema(...).json`` over a path or glob -- the S3A filesystem
makes ``s3a://bucket/prefix/`` just another path, no transfer code needed.

Hour handling: instead of string-templating ``{hour}`` into each path
(reference: src/data_processor.py:37,46,51), data lives in
hour-partitioned directories (``.../hour=YYYYMMDDHH/``) and an hour filter
becomes a pruned partition -- at 100 TB this is the difference between
scanning one hour and scanning the dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as _T
from pyspark.sql.types import StructType

from odp_dynamic_data_pipeline_spark.session import ensure_runtime_confs


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    multiline: bool = True,
    hour: str | None = None,
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """Read a JSON source with a declared schema (S1/S2).

    ``multiline=True`` because the reference's files are JSON *arrays*, not
    JSONL.  ``hour`` filters on a ``hour`` partition column when present,
    else is interpolated into the path template.  ``corrupt_record_col``
    opts into PERMISSIVE bad-record capture: malformed rows land in that
    column instead of nulling silently (the reference logs-and-skips,
    src/data_processor.py:104-107; at 100 TB you quarantine, not drop).
    """
    ensure_runtime_confs(spark)
    if hour is not None and "{hour}" in path:
        path = path.format(hour=hour)
        hour = None
    reader = spark.read
    if corrupt_record_col:
        from pyspark.sql.types import StringType as _S, StructField as _F

        schema = StructType(list(schema.fields) + [_F(corrupt_record_col, _S(), True)])
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_record_col
        )
    df = reader.schema(schema).option("multiLine", multiline).json(path)
    if hour is not None and "hour" in df.columns:
        df = df.where(df["hour"] == hour)  # partition pruning
    return df


def read_orc(
    spark: SparkSession,
    path: str,
    *,
    hour: str | None = None,
) -> DataFrame:
    """ORC source (columnar, self-describing -- schema comes from the file
    footer like parquet; no declaration needed).  Same predicate/column
    pushdown and partition-pruning behavior as the parquet path, so a lake
    that standardized on ORC plugs in without a format migration."""
    ensure_runtime_confs(spark)
    df = spark.read.orc(path)
    if hour is not None and "hour" in df.columns:
        df = df.where(df["hour"] == hour)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    sep: str = ",",
    hour: str | None = None,
) -> DataFrame:
    """CSV source with a declared schema (inference over 100 TB of CSV means
    reading it twice -- never infer in production paths)."""
    ensure_runtime_confs(spark)
    if hour is not None and "{hour}" in path:
        path = path.format(hour=hour)
        hour = None
    df = spark.read.schema(schema).option("header", header).option("sep", sep).csv(path)
    if hour is not None and "hour" in df.columns:
        df = df.where(df["hour"] == hour)
    return df


def read_parquet(
    spark: SparkSession,
    path: str,
    hour: str | None = None,
    *,
    merge_schema: bool = False,
) -> DataFrame:
    """Parquet source.  ``merge_schema=True`` unions the schemas of every
    footer instead of trusting the first file -- required to read a table
    across an additive schema change (hour N wrote 5 columns, hour N+1
    writes 6; old files surface the new column as null).  Off by default:
    merging reads every footer at planning time, a real cost at 100 TB of
    files, so tables with settled schemas skip it."""
    ensure_runtime_confs(spark)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    if hour is not None and "hour" in df.columns:
        df = df.where(df["hour"] == hour)
    return df


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw media ingest via Spark's built-in binaryFile source: one row per
    file with (path, modificationTime, length, content binary) -- the entry
    point that feeds operators.multimodal (decode / frame-sample / feature
    extraction) from a directory of .wav/.ppm/.jpg files on any Hadoop
    filesystem (file:, hdfs:, s3a:).

    ``glob`` filters by filename pattern AT THE LISTING (pathGlobFilter --
    files that do not match are never opened); ``max_bytes`` guards against
    a stray multi-GB file entering an Arrow batch (filter on the length
    METADATA column -- Spark's binaryFile reader prunes content reads for
    rows dropped on length alone)."""
    ensure_runtime_confs(spark)
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(df["length"] <= max_bytes)
    return df


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    fmt: str = "json",
    multiline: bool = True,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
):
    """S3 file-arrival as a stream: replaces the reference's HttpSensor
    polling loop (reference: src/pipeline_dag.py:65-88) -- the streaming
    file source discovers new files, no polling code.

    ``path`` must be a DIRECTORY (the source's basePath); ``glob`` filters
    file names within it (pathGlobFilter) -- a caller holding a file-style
    template like ``dir/user_exp_2024111612.json`` splits it into
    (dir, filename-glob) because the streaming source rejects a bare file
    as basePath."""
    ensure_runtime_confs(spark)
    reader = spark.readStream.schema(schema)
    if fmt == "json":
        reader = reader.option("multiLine", multiline)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.format(fmt).load(path)


def kafka_stream_options(
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
    group_id_prefix: str | None = None,
) -> dict[str, str]:
    """The exact option map a Kafka readStream gets -- split out so the
    surface is unit-testable without a broker (the sandbox has none).
    ``fail_on_data_loss=False`` is for topics with aggressive retention
    where offsets can expire mid-run; ``max_offsets_per_trigger`` bounds
    micro-batch size so one huge backlog doesn't become one huge batch."""
    if not bootstrap_servers or not topic:
        raise ValueError("kafka source needs bootstrap_servers and topic")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if group_id_prefix is not None:
        opts["groupIdPrefix"] = group_id_prefix
    return opts


def parse_kafka_value(df: DataFrame, schema: StructType) -> DataFrame:
    """Decode the Kafka wire columns (value: binary JSON) into typed rows,
    keeping the metadata columns a pipeline needs for lineage/dedup
    (topic, partition, offset, timestamp).  Works identically on a real
    Kafka stream and on any DataFrame with the same wire schema, which is
    how it is tested without a broker."""
    from pyspark.sql import functions as SF

    return df.select(
        SF.from_json(SF.col("value").cast("string"), schema).alias("v"),
        "topic",
        "partition",
        "offset",
        SF.col("timestamp").alias("kafka_ts"),
    ).select("v.*", "topic", "partition", "offset", "kafka_ts")


# the exact column set Spark's Kafka source delivers (and a Kafka-connect
# style archive dump preserves) -- the schema of a broker-less wire REPLAY
# (built with explicit constructors: fromDDL needs a live session and this
# constant must be importable before one exists)
KAFKA_WIRE_SCHEMA = StructType(
    [
        _T.StructField("key", _T.BinaryType()),
        _T.StructField("value", _T.BinaryType()),
        _T.StructField("topic", _T.StringType()),
        _T.StructField("partition", _T.IntegerType()),
        _T.StructField("offset", _T.LongType()),
        _T.StructField("timestamp", _T.TimestampType()),
        _T.StructField("timestampType", _T.IntegerType()),
    ]
)


def read_kafka_wire_stream(
    spark: SparkSession,
    path: str,
    schema,
    *,
    wire_format: str = "parquet",
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Broker-less Kafka REPLAY source: stream ARCHIVED Kafka-wire rows
    (the Kafka-connect / tiered-storage dump layout -- files of
    ``KAFKA_WIRE_SCHEMA`` rows) through the file source and decode them
    with the same :func:`parse_kafka_value` a live broker stream uses.
    Downstream of the decode, the plan is IDENTICAL to a broker-fed one,
    so enrichment joins, watermarks and staging-table drains exercised
    against a replay transfer verbatim to a real topic -- which is how the
    Kafka path is proven end-to-end in a sandbox with no broker, and how a
    production backfill replays expired offsets from the archive."""
    wire = read_file_stream(
        spark,
        path,
        KAFKA_WIRE_SCHEMA,
        fmt=wire_format,
        multiline=False,
        glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    )
    return parse_kafka_value(wire, schema)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    *,
    schema: StructType | None = None,
    **options,
):
    """Kafka source (reference intent: src/setup.py:4-17).  With ``schema``,
    the binary value column is decoded to typed rows via
    :func:`parse_kafka_value`."""
    ensure_runtime_confs(spark)
    reader = spark.readStream.format("kafka")
    for k, v in kafka_stream_options(bootstrap_servers, topic, **options).items():
        reader = reader.option(k, v)
    df = reader.load()
    return parse_kafka_value(df, schema) if schema is not None else df
