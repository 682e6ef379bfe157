"""global_rank == row_number() OVER (ORDER BY ...) on a total order."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.partitioning import global_rank


def test_global_rank_matches_window(spark):
    rng = random.Random(7)
    rows = [(rng.randint(0, 50), i) for i in range(997)]  # heavy ties on v
    df = spark.createDataFrame(rows, "v long, k long")
    got = global_rank(df, ["v", "k"], rank_col="i", num_partitions=5)
    exp = df.withColumn("i", F.row_number().over(Window.orderBy("v", "k")).cast("long"))
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_global_rank_empty_and_single_partition(spark):
    empty = spark.createDataFrame([], "v long, k long")
    assert global_rank(empty, ["v", "k"]).count() == 0
    one = spark.createDataFrame([(3, 1), (1, 2)], "v long, k long")
    got = {(r["v"], r["rank"]) for r in global_rank(one, ["v", "k"], num_partitions=4).collect()}
    assert got == {(1, 1), (3, 2)}


def test_global_prefix_sum_matches_single_window(spark):
    """global_prefix_sum == sum() OVER (ORDER BY ...) across partition
    boundaries, for multiple sum columns at once."""
    import random

    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.operators.partitioning import (
        global_prefix_sum,
    )

    rng = random.Random(5)
    rows = [(i, rng.randint(0, 9), rng.randint(-3, 3)) for i in range(200)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, a long, b long")
    got = {
        r["k"]: (r["a_cum"], r["b_cum"])
        for r in global_prefix_sum(df, ["k"], ["a", "b"], num_partitions=7).collect()
    }
    acc_a = acc_b = 0
    for k, a, b in sorted(rows):
        acc_a += a
        acc_b += b
        assert got[k] == (acc_a, acc_b), k


def test_global_prefix_sum_empty(spark):
    from odp_dynamic_data_pipeline_spark.operators.partitioning import (
        global_prefix_sum,
    )

    df = spark.createDataFrame([], "k long, a long")
    assert global_prefix_sum(df, ["k"], ["a"]).count() == 0
