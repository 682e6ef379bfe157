"""MERGE upsert semantics (operators/merge.py)."""

from __future__ import annotations

import pytest

from odp_dynamic_data_pipeline_spark.operators.merge import merge_upsert


def test_merge_upsert_all_ops(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    chg = spark.createDataFrame(
        [(2, "U", "b2", 21), (3, "D", None, None), (9, "I", "new", 90)],
        "k long, op string, name string, v long",
    )
    got = {r["k"]: (r["name"], r["v"]) for r in merge_upsert(snap, chg, "k").collect()}
    assert got == {1: ("a", 10), 2: ("b2", 21), 9: ("new", 90)}


def test_merge_upsert_missing_payload_raises(spark):
    snap = spark.createDataFrame([(1, 5)], "k long, v long")
    chg = spark.createDataFrame([(1, "U")], "k long, op string")
    with pytest.raises(ValueError, match="payload"):
        merge_upsert(snap, chg, "k")
