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
