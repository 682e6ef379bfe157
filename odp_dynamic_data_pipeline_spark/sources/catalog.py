"""Table catalog over the driver testdata (TESTDATA.md).

Normalizes physical quirks at the scan boundary so every operator sees clean
logical types:

* Timestamp columns (``events.ts``, ``orders.o_orderdate``,
  ``lineitem.l_shipdate``) have shipped in two physical flavors across
  testdata generations: parquet TIMESTAMP(NANOS) -- which Spark reads as
  long nanos under the ``nanosAsLong`` flag (session.RUNTIME_CONFS) -- and
  plain TIMESTAMP(MICROS) without UTC adjustment, which Spark 4 reads as
  TIMESTAMP_NTZ.  Both normalize to TimestampType here: nanos by integer
  truncation to micros (the same truncation DuckDB applies), NTZ by a cast
  that, under the UTC session timezone, reinterprets the wall-clock as the
  identical instant DuckDB's naive timestamps denote.  Downstream operators
  therefore always see TimestampType and ``unix_micros`` et al. just work.

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
    """Load one testdata table as a DataFrame with normalized types.

    Normalization covers TOP-LEVEL columns only (``df.dtypes``); the
    testdata has no timestamps nested in structs/arrays, and a source that
    does should normalize them at its own boundary.

    Pushdown: with ``spark.sql.parquet.inferTimestampNTZ.enabled=false``
    (session.RUNTIME_CONFS) the NTZ-flavored date columns scan directly as
    TimestampType, so date predicates reach the parquet reader for
    row-group pruning and the NTZ branch below never fires.  On a host
    session where that conf is locked, the cast fallback still normalizes
    types but its filters compare against a projection (no row-group
    pruning on those columns) -- date-range-heavy workloads there should
    partition on the date column, as the hour layout does.
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # long nanos -> TimestampType (micros), integer truncation
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        # NTZ wall-clock == UTC instant ONLY under the UTC session timezone;
        # ensure_runtime_confs sets it but swallows failures on a host
        # session with locked confs, so verify before relying on the cast --
        # a silent non-UTC session would shift every instant by the offset.
        tz = spark.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            raise RuntimeError(
                f"timestamp_ntz normalization requires a UTC session timezone, "
                f"got {tz!r}: spark.sql.session.timeZone could not be set on "
                "this session (locked by the host?)"
            )
    for c in ntz_cols:
        # still a projection over the scan, pushdown unaffected for other cols
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view (for the SQL frontend)."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
