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


def test_store_family_table_is_consistent():
    """r12 advisor: the drift gate's fixed-drain-cost subtraction keys on
    an EXPLICIT query->family table, not substrings.  Every key must be a
    registered stream query; every family must have a measured
    stream_cost_split receipt family name; and the known native-state
    queries whose names merely CONTAIN a family substring must stay
    untagged (the silent-wrong-family cases the substring heuristic hit)."""
    import json
    import os

    from odp_dynamic_data_pipeline_spark.queries import STORE_FAMILY

    for name in STORE_FAMILY:
        assert name in SPARK_QUERIES, name
        assert "stream" in name, name
    measured = {"agg", "dedup", "neardup", "upsert", "sessions", "cc", "semdedup"}
    assert set(STORE_FAMILY.values()) <= measured
    # native Spark streaming state, NOT the kvstore protocol:
    for native in ("session_gap_windows_stream", "tlb_session_metrics_stream",
                   "watermark_dedup_stream"):
        assert native in SPARK_QUERIES
        assert native not in STORE_FAMILY
    # the receipt file actually carries a split row for every used family
    path = os.path.join(os.path.dirname(__file__), "..", "STREAM_BENCH_LOCAL.json")
    with open(path) as f:
        rows = json.loads(f.read().strip().splitlines()[-1])["queries"]
    have = {n.split("__", 1)[1] for n in rows if n.startswith("stream_cost_split__")}
    assert set(STORE_FAMILY.values()) <= have


def test_drift_gate_prefers_artifact_family_map():
    """stream_families() uses the map bench.py embedded in the artifact
    when present (measurement-time truth) and only falls back to the live
    registry for artifacts predating the field."""
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from bench_drift import stream_families

    embedded = {"incremental_agg_stream": "agg"}
    assert stream_families({"stream_families": embedded}) == embedded
    fallback = stream_families({})
    from odp_dynamic_data_pipeline_spark.queries import STORE_FAMILY

    assert fallback == STORE_FAMILY
