"""Connected components vs a union-find reference on deterministic
pseudo-random graphs (including self-loops, duplicate and reversed edges)."""

from __future__ import annotations

import random

from odp_dynamic_data_pipeline_spark.operators.dedup import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    return {i: find(i) for i in range(n_nodes)}


def test_cc_matches_union_find(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(4, 12)
        m = rng.randint(0, n * 2)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        want = _union_find(n, edges)
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(nodes, edf).collect()
        }
        # union-find roots are already min-ids after path compression with
        # min-directed unions
        assert got == want, (trial, n, edges)
