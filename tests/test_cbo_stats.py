"""Cost-based optimization from ANALYZE TABLE statistics.

Without column statistics Spark estimates a Filter's output at its
input's size, so a highly selective dim filter still looks "big" and the
join plans as SMJ — at 100 TB that is a full fact-side shuffle that the
statistics would have avoided.  With `ANALYZE TABLE ... COMPUTE
STATISTICS FOR COLUMNS` + `spark.sql.cbo.enabled`, equality/range
selectivities shrink the estimate below the broadcast threshold and the
same query plans as BroadcastHashJoin.  This is the zero-code-change
lever a deployment applies after each corpus load (stats collection is
one scan, amortized over every downstream query); the test pins that the
engine's plans actually respond to it.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, temp_confs

CONFS = {
    # 64 KB: small enough that the UNFILTERED dim never broadcasts
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024),
    "spark.sql.cbo.enabled": "false",
    "spark.sql.cbo.joinReorder.enabled": "false",
}

QUERY = """
SELECT o.o_orderpriority, COUNT(*) AS n
FROM li_cbo l JOIN o_cbo o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 300000
GROUP BY o.o_orderpriority
"""


@pytest.fixture
def cbo_tables(spark):
    from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

    with temp_confs(spark, CONFS):
        load_table(spark, SF_CORRECT, "orders").write.mode("overwrite").saveAsTable("o_cbo")
        load_table(spark, SF_CORRECT, "lineitem").select("l_orderkey").write.mode(
            "overwrite"
        ).saveAsTable("li_cbo")
        yield
        spark.sql("DROP TABLE IF EXISTS o_cbo")
        spark.sql("DROP TABLE IF EXISTS li_cbo")


def _plan(spark):
    return spark.sql(QUERY)._jdf.queryExecution().executedPlan().toString()


def test_stats_plus_cbo_flip_smj_to_broadcast(spark, cbo_tables):
    # baseline: no stats, no CBO -> the filtered dim is estimated at full
    # size and the join stays a shuffle join
    assert "BroadcastHashJoin" not in _plan(spark)

    spark.sql(
        "ANALYZE TABLE o_cbo COMPUTE STATISTICS FOR COLUMNS"
        " o_orderkey, o_orderpriority, o_totalprice"
    )
    spark.sql("ANALYZE TABLE li_cbo COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    assert "BroadcastHashJoin" in _plan(spark)

    # stats alone are not consulted for filter selectivity without CBO
    spark.conf.set("spark.sql.cbo.enabled", "false")
    assert "BroadcastHashJoin" not in _plan(spark)


def test_cbo_preserves_results(spark, cbo_tables):
    spark.sql(
        "ANALYZE TABLE o_cbo COMPUTE STATISTICS FOR COLUMNS"
        " o_orderkey, o_orderpriority, o_totalprice"
    )
    base = {tuple(r) for r in spark.sql(QUERY).collect()}
    spark.conf.set("spark.sql.cbo.enabled", "true")
    with_cbo = {tuple(r) for r in spark.sql(QUERY).collect()}
    assert base == with_cbo and base
