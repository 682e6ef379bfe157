"""Table catalog over the driver testdata (TESTDATA.md).

Normalizes physical quirks at the scan boundary so every operator sees clean
logical types:

* ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it as
  long nanos (see session.RUNTIME_CONFS) and we convert to TimestampType by
  integer-truncating to microseconds -- the same truncation DuckDB applies,
  which keeps ordering and second-level arithmetic bit-identical between the
  engine and the oracle.

Scans stay fully pushdown-friendly: the conversion is a projection on top of
the parquet scan, so filters on other columns still reach the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with normalized types."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # long nanos -> TimestampType (micros), integer truncation
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view (for the SQL frontend)."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
