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
