"""Z-order (Morton) layout: interleave correctness + clustering effect."""

from __future__ import annotations

from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.partitioning import (
    write_zordered,
    zorder_value,
)


def _morton2(x: int, y: int, bits: int = 31) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_value_matches_reference(spark):
    rows = [(x, y) for x in range(8) for y in range(8)] + [(1 << 20, 12345)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_value(["x", "y"]).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    # 32x32 grid; z-ordered into 4 files -> each file covers ~a quadrant,
    # so a range predicate on EITHER column excludes most files via min/max
    df = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    path = str(tmp_path / "zdata")
    write_zordered(df, path, ["x", "y"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    # per-file min/max of x AND y must both be narrow (quadrant-sized, not
    # full-range): the defining property a linear sort on x cannot give y
    stats = (
        back.withColumn("f", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("xspan"),
            (F.max("y") - F.min("y")).alias("yspan"),
        )
        .collect()
    )
    assert len(stats) == 4
    for r in stats:
        assert r["xspan"] <= 16, stats
        assert r["yspan"] <= 16, stats
