from __future__ import annotations

from odp_dynamic_data_pipeline_spark.functions.udfs import register_engine_udfs


def test_pandas_udf_and_udtf_from_sql(spark):
    register_engine_udfs(spark)
    spark.createDataFrame(
        [("a b c d",), ("x y",)], "text string"
    ).createOrReplaceTempView("t_udf")
    rows = spark.sql("SELECT token_count_udf(text) AS n FROM t_udf ORDER BY n").collect()
    assert [r["n"] for r in rows] == [2, 4]

    shingles = spark.sql("SELECT s.shingle FROM shingle_udtf('a b c d') s ORDER BY s.idx").collect()
    assert [r["shingle"] for r in shingles] == ["a b c", "b c d"]


def test_grouped_agg_pandas_udaf(spark):
    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.functions.udfs import median_abs_dev_udf

    register_engine_udfs(spark)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0), ("b", 5.0), ("b", 5.0)],
        "k string, v double",
    )
    got = {
        r["k"]: r["mad"]
        for r in df.groupBy("k").agg(median_abs_dev_udf("v").alias("mad")).collect()
    }
    # a: median 2.5, |v - 2.5| = [1.5, 0.5, 0.5, 97.5] -> median 1.0 (robust to the outlier)
    assert got == {"a": 1.0, "b": 0.0}
    sql_got = {
        r["k"]: r["mad"]
        for r in spark.sql(
            "SELECT k, median_abs_dev_udf(v) AS mad FROM {df} GROUP BY k", df=df
        ).collect()
    }
    assert sql_got == got
