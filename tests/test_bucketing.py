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


def test_bucketed_orphan_cleanup_db_qualified(spark):
    """A crashed run's orphaned location under <warehouse>/<db>.db/<table>
    must be detected for DB-QUALIFIED names too (the pre-r5 path resolver
    only looked at <warehouse>/<table>, so saveAsTable kept throwing
    LOCATION_ALREADY_EXISTS), and the deletion must be announced."""
    import os
    import warnings
    from urllib.parse import urlparse

    li = load_table(spark, SF, "lineitem").select("l_orderkey").limit(10)
    spark.sql("CREATE DATABASE IF NOT EXISTS odp_tdb")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    loc = os.path.join(wh.path or wh.netloc, "odp_tdb.db", "orph_b")
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "junk"), "w") as f:
        f.write("x")
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            write_bucketed_table(li, "odp_tdb.orph_b", "l_orderkey", num_buckets=2)
        assert any("orphaned location" in str(w.message) for w in caught)
        assert spark.table("odp_tdb.orph_b").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS odp_tdb.orph_b")
        spark.sql("DROP DATABASE IF EXISTS odp_tdb")
