"""Bucketed-join test: same-key same-count bucketed tables must join with
no shuffle exchange on either side."""

from __future__ import annotations

import re

from odp_dynamic_data_pipeline_spark.sources.catalog import load_table
from odp_dynamic_data_pipeline_spark.sources.writers import write_bucketed_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_no_shuffle(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    write_bucketed_table(li, "li_b", "l_orderkey", num_buckets=4)
    write_bucketed_table(o, "o_b", "o_orderkey", num_buckets=4)
    try:
        # AQE can hide bucket scans behind adaptive plans; read final plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("li_b").join(
            spark.table("o_b"), spark.table("li_b")["l_orderkey"] == spark.table("o_b")["o_orderkey"]
        )
        j.write.format("noop").mode("overwrite").save()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert not re.search(r"Exchange hashpartitioning", plan), "bucketed join shuffled"
        assert j.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
