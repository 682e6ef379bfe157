"""Gating-cadence registry annotation (VERDICT r11 item 6): the
adversarial-maintenance correctness gates are tagged, and each has a
production-cadence twin in the registry so bench totals always carry a
default-threshold comparable."""

from __future__ import annotations

from odp_dynamic_data_pipeline_spark.queries import (
    GATING_CADENCE,
    ORACLE_SQL,
    SPARK_QUERIES,
)

PRODUCTION_TWIN = {
    "cdc_upsert_expiry_replay_stream": "cdc_upsert_deletes_stream",
    "incremental_clusters_compacted_stream": "incremental_clusters_stream",
}


def test_gating_set_matches_contract():
    assert GATING_CADENCE == set(PRODUCTION_TWIN)


def test_every_gating_query_has_registered_production_twin():
    for gate, twin in PRODUCTION_TWIN.items():
        assert gate in SPARK_QUERIES and gate in ORACLE_SQL
        assert twin in SPARK_QUERIES and twin in ORACLE_SQL
        assert twin not in GATING_CADENCE
