"""AQE skew-join handling: with a hot key dominating one side, AQE must
split the skewed partition at runtime (OptimizeSkewedJoin), keeping the plan
correct without manual salting.  (Manual salting is also available and
oracle-verified -- salted_join_agg.)"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # hot key 0 carries 200k rows; keys 1..999 carry ~200 each
        left = spark.range(400_000).select(
            F.when(F.col("id") < 200_000, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000, 1, 8).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        j = left.join(right, "k")
        # the action must run THIS DataFrame's QueryExecution (df.write/count
        # build separate ones whose AQE result we can't inspect)
        assert len(j.collect()) == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not mark the skewed join"
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
