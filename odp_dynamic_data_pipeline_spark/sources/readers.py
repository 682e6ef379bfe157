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


def read_parquet(spark: SparkSession, path: str, hour: str | None = None) -> DataFrame:
    ensure_runtime_confs(spark)
    df = spark.read.parquet(path)
    if hour is not None and "hour" in df.columns:
        df = df.where(df["hour"] == hour)
    return df


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    fmt: str = "json",
    multiline: bool = True,
    max_files_per_trigger: int | None = None,
):
    """S3 file-arrival as a stream: replaces the reference's HttpSensor
    polling loop (reference: src/pipeline_dag.py:65-88) -- the streaming
    file source discovers new files, no polling code."""
    ensure_runtime_confs(spark)
    reader = spark.readStream.schema(schema)
    if fmt == "json":
        reader = reader.option("multiLine", multiline)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def read_kafka_stream(spark: SparkSession, bootstrap_servers: str, topic: str):
    """Kafka source (reference intent only: src/setup.py:4-17)."""
    ensure_runtime_confs(spark)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
