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


def test_random_graphs_match_reference_bfs(spark):
    import random
    from collections import deque

    rng = random.Random(3)
    for trial in range(3):
        n = rng.randint(5, 14)
        m = rng.randint(0, n * 2)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)] or [(0, 0)]
        seeds = sorted(rng.sample(range(n), rng.randint(1, 3)))
        max_hops = rng.randint(0, 4)
        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want, dq = {s: 0 for s in seeds}, deque(seeds)
        while dq:
            u = dq.popleft()
            if want[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in want:
                    want[v] = want[u] + 1
                    dq.append(v)
        e = spark.createDataFrame(edges, "id_a long, id_b long")
        s = spark.createDataFrame([(x,) for x in seeds], "id long")
        got = {
            r.id: r.hops
            for r in bfs_hops(s, e, id_col="id", max_hops=max_hops).collect()
        }
        assert got == want, (trial, n, edges, seeds, max_hops)
