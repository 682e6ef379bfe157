"""The timestamp_ntz -> timestamp cast is only meaning-preserving under a
UTC session timezone; on a host session where the conf is locked non-UTC,
load_table must refuse loudly instead of silently shifting every instant."""

from __future__ import annotations

import pytest

from odp_dynamic_data_pipeline_spark.sources import catalog

SF = "/root/testdata/sf0.001"


def test_non_utc_session_raises(spark, monkeypatch):
    # simulate a host session whose confs cannot be (re)set: neuter the
    # defensive ensure_runtime_confs and pin a non-UTC zone
    monkeypatch.setattr(catalog, "ensure_runtime_confs", lambda s: s)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    # a locked host session would also leave NTZ inference at its default
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        with pytest.raises(RuntimeError, match="UTC session timezone"):
            catalog.load_table(spark, SF, "orders")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_utc_session_loads(spark):
    df = catalog.load_table(spark, SF, "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"


def test_stream_shuffle_restores_on_error(spark):
    """The replay-stream shuffle cap must restore the session value even
    when the streaming job dies mid-run."""
    import pytest as _pytest

    from odp_dynamic_data_pipeline_spark.queries.core import _stream_shuffle

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with _pytest.raises(ValueError):
        with _stream_shuffle(spark, 8):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
            raise ValueError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
