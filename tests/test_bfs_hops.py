"""bfs_hops (multi-source BFS with hop cap): minimum-hop semantics on a
hand-built graph -- multi-seed min, cycles, max_hops truncation, isolated
seeds, unreachable nodes, early-exit on an exhausted frontier."""

from __future__ import annotations

from odp_dynamic_data_pipeline_spark.operators.dedup import bfs_hops

#    0 - 1 - 2 - 3 - 4 - 5      (path)
#    6 - 7, 7 - 8, 8 - 6        (triangle, disconnected from the path)
#    9                          (isolated)
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (8, 6)]


def _run(spark, seeds, max_hops):
    e = spark.createDataFrame(EDGES, "id_a long, id_b long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    out = bfs_hops(s, e, id_col="id", max_hops=max_hops)
    return {r.id: r.hops for r in out.collect()}


def test_single_seed_path_hops(spark):
    assert _run(spark, [0], 3) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_multi_seed_takes_minimum(spark):
    # node 2 is 2 hops from seed 0 but 1 hop from seed 3
    assert _run(spark, [0, 3], 2) == {0: 0, 3: 0, 1: 1, 2: 1, 4: 1, 5: 2}


def test_cycle_terminates_and_labels_once(spark):
    assert _run(spark, [6], 10) == {6: 0, 7: 1, 8: 1}


def test_isolated_seed_labels_itself(spark):
    assert _run(spark, [9], 4) == {9: 0}


def test_zero_hops_returns_seeds_only(spark):
    assert _run(spark, [0, 9], 0) == {0: 0, 9: 0}


def test_unreachable_component_absent(spark):
    got = _run(spark, [0], 10)
    assert set(got) == {0, 1, 2, 3, 4, 5}
