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


def test_cc_star_matches_union_find(spark):
    """Large-star/small-star CC == union-find on the same random graphs
    (self-loops, duplicates, reversed edges), and == the min-label
    implementation -- the bit-identical-output contract both queries
    share one oracle under."""
    from odp_dynamic_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    rng = random.Random(13)
    for trial in range(4):
        n = rng.randint(4, 12)
        m = rng.randint(0, n * 2)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        want = _union_find(n, edges)
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edf = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components_star(nodes, edf).collect()
        }
        assert got == want, (trial, n, edges)


def test_cc_star_long_chain_converges(spark):
    """A pure chain (worst case for min-label propagation: diameter = n)
    must converge within the O(log n) star budget -- the scenario the
    algorithm exists for.  strict=True turns an unconverged superset into
    a hard failure."""
    from odp_dynamic_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = connected_components_star(
        nodes, chain, max_iterations=8, strict=True
    ).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == n


def test_cc_star_string_ids_and_isolated(spark):
    """String node ids (greatest/least order lexicographic) and isolated
    nodes labeled as their own singleton components."""
    from odp_dynamic_data_pipeline_spark.operators.dedup import (
        connected_components_star,
    )

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("zz",)], "id string"
    )
    edges = spark.createDataFrame([("b", "c")], "id_a string, id_b string")
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(nodes, edges).collect()
    }
    assert got == {"a": "a", "b": "b", "c": "b", "zz": "zz"}


def test_pagerank_matches_reference(spark):
    """Fixed-point PageRank == a pure-Python integer reference on random
    graphs (same truncating arithmetic), including multi-edges (the
    candidate-pair graph weights shared bands via duplicate edges)."""
    import random

    from odp_dynamic_data_pipeline_spark.operators.dedup import pagerank

    rng = random.Random(31)
    for trial in range(4):
        n_nodes = rng.randint(2, 15)
        edges = [
            (rng.randint(0, n_nodes - 1), rng.randint(0, n_nodes - 1))
            for _ in range(rng.randint(1, 25))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        # python reference (same integer truncation)
        sym = edges + [(b, a) for a, b in edges]
        deg = {}
        for s, _ in sym:
            deg[s] = deg.get(s, 0) + 1
        n = len(deg)
        scale = 1_000_000_000
        base = (15 * scale) // (100 * n)
        r = {v: scale // n for v in deg}
        for _ in range(5):
            s = {}
            for u, v in sym:
                s[v] = s.get(v, 0) + r[u] // deg[u]
            r = {v: base + (85 * s.get(v, 0)) // 100 for v in deg}
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {row["nid"]: row["rank"] for row in pagerank(df, iters=5).collect()}
        assert got == r, f"trial {trial} diverged"
