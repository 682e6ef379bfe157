from __future__ import annotations

from contextlib import contextmanager

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odp_dynamic_data_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # Isolated warehouse: a crashed run must not poison later runs with
    # orphaned saveAsTable locations (LOCATION_ALREADY_EXISTS).
    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.sql.warehouse.dir": wh},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@contextmanager
def temp_confs(spark, confs: dict[str, str]):
    """Set session confs for a test and restore the EXACT prior state on
    exit -- including unsetting keys that had no session value (a plain
    save/set-back loop silently leaks values like
    autoBroadcastJoinThreshold=-1 into the rest of the shared session)."""
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
