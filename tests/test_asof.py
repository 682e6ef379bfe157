from __future__ import annotations

import datetime as dt

from odp_dynamic_data_pipeline_spark.operators.asof import asof_join

T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [("u1", T(10), "p1"), ("u1", T(20), "p2"), ("u2", T(5), "p3")],
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", T(8), 100), ("u1", T(15), 200), ("u2", T(9), 300)],
        "user string, ts timestamp, val int",
    )
    out = {r["pid"]: (r["val"], r["asof_ts"]) for r in
           asof_join(left, right, on="user", ts_col="ts").collect()}
    assert out["p1"] == (100, T(8))   # latest right <= t10 is t8
    assert out["p2"] == (200, T(15))  # t15 beats t8
    assert out["p3"] == (None, None)  # u2 has no right row <= t5


def test_asof_inclusive_equality(spark):
    left = spark.createDataFrame([("u1", T(10), "p1")], "user string, ts timestamp, pid string")
    right = spark.createDataFrame([("u1", T(10), 7)], "user string, ts timestamp, val int")
    [r] = asof_join(left, right, on="user", ts_col="ts").collect()
    assert r["val"] == 7  # same-instant right row matches


def test_asof_forward_basic(spark):
    left = spark.createDataFrame(
        [("u1", T(10), "p1"), ("u1", T(25), "p2"), ("u2", T(5), "p3")],
        "user string, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [("u1", T(20), 100), ("u1", T(30), 200), ("u2", T(2), 300)],
        "user string, ts timestamp, val int",
    )
    out = {r["pid"]: (r["val"], r["asof_ts"]) for r in
           asof_join(left, right, on="user", ts_col="ts", direction="forward").collect()}
    assert out["p1"] == (100, T(20))  # earliest right >= t10 is t20
    assert out["p2"] == (200, T(30))  # t30 is the next after t25
    assert out["p3"] == (None, None)  # u2 has no right row >= t5


def test_asof_forward_inclusive_equality(spark):
    left = spark.createDataFrame([("u1", T(10), "p1")], "user string, ts timestamp, pid string")
    right = spark.createDataFrame([("u1", T(10), 7)], "user string, ts timestamp, val int")
    [r] = asof_join(left, right, on="user", ts_col="ts", direction="forward").collect()
    assert r["val"] == 7  # same-instant right row matches forward too


def test_asof_bad_direction(spark):
    import pytest

    left = spark.createDataFrame([("u1", T(1), "p")], "user string, ts timestamp, pid string")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left.select("user", "ts"), on="user", ts_col="ts", direction="sideways")
