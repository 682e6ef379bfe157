"""Dynamic partition pruning (DPP): the runtime scale lever that prunes a
PARTITIONED fact scan by a filter that only exists on the dim side of a
join.  At 100 TB the fact table is always partitioned (hour/day/source); a
query like "events joined to the hours-of-interest dim" must read ONLY the
matching partition directories, discovered at runtime from the dim filter --
a static planner cannot prune them because the fact query has no literal
predicate on the partition column.

Pinned here on real partitioned files: the fact scan's plan carries a
``dynamicpruning`` expression in its PartitionFilters, the pruned run reads
fewer rows than the unpruned run (scan metrics), and results are identical
with the optimization disabled.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, temp_confs


@pytest.fixture(scope="module")
def dpp_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("dpp")
    from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "hour_bucket", F.hour("ts").cast("int")
    )
    fact_path = str(base / "events_by_hour")
    ev.write.partitionBy("hour_bucket").parquet(fact_path)
    dim = spark.createDataFrame(
        [(h, "keep" if h < 2 else "drop") for h in range(24)],
        "hour_bucket int, tag string",
    )
    dim_path = str(base / "hours_dim")
    dim.write.parquet(dim_path)
    return fact_path, dim_path


def _join_count(spark, fact_path, dim_path):
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "keep")
    joined = fact.join(dim, "hour_bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("value") * 100).alias("s")
    )
    return joined


def test_dpp_prunes_partitioned_fact_scan(spark, dpp_tables):
    fact_path, dim_path = dpp_tables
    with temp_confs(
        spark,
        {
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
            # keep the dim broadcastable so DPP reuses the broadcast result
            "spark.sql.autoBroadcastJoinThreshold": "10485760",
        },
    ):
        df = _join_count(spark, fact_path, dim_path)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        [on] = df.collect()

    with temp_confs(
        spark, {"spark.sql.optimizer.dynamicPartitionPruning.enabled": "false"}
    ):
        df_off = _join_count(spark, fact_path, dim_path)
        plan_off = df_off._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" not in plan_off.lower()
        [off] = df_off.collect()

    assert (on.n, on.s) == (off.n, off.s)
    assert on.n > 0


def test_dpp_reads_fewer_rows_than_full_scan(spark, dpp_tables):
    """The pruned fact scan's output row count equals the matching
    partitions' rows, strictly less than the table's -- proof the pruning
    happened at the SCAN, not in the join."""
    fact_path, dim_path = dpp_tables
    fact = spark.read.parquet(fact_path)
    total = fact.count()
    kept = fact.where(F.col("hour_bucket") < 2).count()
    assert 0 < kept < total

    with temp_confs(
        spark,
        {
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "10485760",
            # plain (non-AQE) plan: QueryStage wrappers hide children from
            # the JVM-tree walk below; DPP itself is independent of AQE
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        df = _join_count(spark, fact_path, dim_path)
        df.collect()
        ex = df._jdf.queryExecution().executedPlan()
        # find the partitioned fact scan node and read its output-rows metric
        rows_out = None
        nodes = [ex]
        while nodes:
            n = nodes.pop()
            s = n.nodeName()
            if "Scan" in s and "events_by_hour" in n.toString():
                m = n.metrics()
                it = m.iterator()
                while it.hasNext():
                    kv = it.next()
                    if kv._1() == "numOutputRows":
                        rows_out = kv._2().value()
                it2 = n.children().iterator()
                while it2.hasNext():
                    nodes.append(it2.next())
            else:
                it2 = n.children().iterator()
                while it2.hasNext():
                    nodes.append(it2.next())
        assert rows_out is not None, "fact scan node not found in plan"
        assert rows_out == kept, (rows_out, kept, total)
