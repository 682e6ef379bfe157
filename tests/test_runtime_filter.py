"""Runtime bloom-filter join pruning (InjectRuntimeFilter).

At 100 TB the dominant cost of `big_fact JOIN selective_dim` is shuffling
the fact side; Spark can build a bloom filter over the dim side's join
keys at runtime and push `might_contain(...)` into the fact scan, pruning
most probe rows BEFORE the shuffle.  The feature is gated by
`spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
(default 10 GB) precisely so it only engages when the probe side is big
enough to pay for the extra filter-building aggregate — at bench scale we
must lower the threshold to observe the plan.  SCALE.md ("Runtime
bloom-filter join pruning") records the sf0.1 measurement: wall-time
neutral at toy scale, ~12× fewer probe-side shuffle rows.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT, temp_confs

BLOOM_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@pytest.fixture
def bloom_confs(spark):
    with temp_confs(spark, BLOOM_CONFS):
        yield


def _selective_join(spark):
    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, SF_CORRECT, "lineitem")
    o = load_table(spark, SF_CORRECT, "orders").where(
        "o_orderpriority = '1-URGENT' AND o_totalprice > 300000"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_injected_into_probe_scan(spark, bloom_confs):
    j = _selective_join(spark)
    phys = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in phys, phys[:2000]
    assert "bloom_filter_agg" in phys, phys[:2000]
    # the runtime filter must sit on the FACT (lineitem) side's key
    opt = j._jdf.queryExecution().optimizedPlan().toString()
    filter_lines = [ln for ln in opt.splitlines() if "might_contain" in ln]
    assert filter_lines and all("l_orderkey" in ln for ln in filter_lines)


def test_bloom_filter_preserves_results(spark, bloom_confs):
    with_bloom = {tuple(r) for r in _selective_join(spark).collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = {tuple(r) for r in _selective_join(spark).collect()}
    assert with_bloom == without and with_bloom
