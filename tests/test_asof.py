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


def test_asof_tie_deterministic_and_row_coherent(spark):
    # Three right rows at the SAME (key, ts): the tiebreak must make the
    # pick a pure function of the data (backward -> max by value columns,
    # forward -> min), and both value columns must come from the SAME row
    # even when one column holds a genuine NULL.
    left = spark.createDataFrame(
        [("u1", T(10), "p1")], "user string, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [("u1", T(8), 1, "a"), ("u1", T(8), 3, None), ("u1", T(8), 2, "b")],
        "user string, ts timestamp, val int, tag string",
    ).repartition(4)
    [r] = asof_join(left, right, on="user", ts_col="ts").collect()
    # backward: last in (val, tag) order -> (3, None); tag must be the
    # NULL from that same row, not 'b' leaked from the (2, 'b') row
    assert (r["val"], r["tag"]) == (3, None)
    right_fwd = spark.createDataFrame(
        [("u1", T(12), 1, "a"), ("u1", T(12), 3, None), ("u1", T(12), 2, "b")],
        "user string, ts timestamp, val int, tag string",
    ).repartition(4)
    [r] = asof_join(
        left, right_fwd, on="user", ts_col="ts", direction="forward"
    ).collect()
    # forward: first in (val, tag) order -> (1, 'a')
    assert (r["val"], r["tag"]) == (1, "a")


def test_asof_null_in_picked_row_not_backfilled(spark):
    # The MATCHED right row has a NULL value column; an older row has a
    # non-null one.  Struct-atomic pick must report the NULL, not reach
    # back to the older row per-column.
    left = spark.createDataFrame(
        [("u1", T(20), "p1")], "user string, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [("u1", T(5), 100, "old"), ("u1", T(15), None, "new")],
        "user string, ts timestamp, val int, tag string",
    )
    [r] = asof_join(left, right, on="user", ts_col="ts").collect()
    assert (r["val"], r["tag"], r["asof_ts"]) == (None, "new", T(15))
