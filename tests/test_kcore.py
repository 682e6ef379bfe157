"""kcore_peel unit semantics on crafted graphs (the oracle-gated query
covers the minhash-graph integration; these pin the peel rules)."""

from __future__ import annotations

from odp_dynamic_data_pipeline_spark.operators.dedup import kcore_peel


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["nid"]: (r["deg0"], r["removed_round"], r["in_core"])
        for r in kcore_peel(df, **kw).collect()
    }


def test_kcore_triangle_with_tail(spark):
    # triangle 1-2-3 (2-core) with a tail 3-4-5: the tail peels inward
    # one hop per round (5 in round 1, then 4), the triangle survives
    got = _run(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], k=2, rounds=5)
    assert got == {
        1: (2, 0, True),
        2: (2, 0, True),
        3: (3, 0, True),
        4: (2, 2, False),  # degree 2 until 5 is removed, then peels
        5: (1, 1, False),
    }


def test_kcore_chain_dissolves_entirely(spark):
    # a path graph has no 2-core; both endpoints peel each round
    got = _run(spark, [(1, 2), (2, 3), (3, 4)], k=2, rounds=5)
    assert all(not in_core for _, _, in_core in got.values())
    assert got[1][1] == 1 and got[4][1] == 1  # endpoints first
    assert got[2][1] == 2 and got[3][1] == 2  # then the middle pair


def test_kcore_bounded_rounds_leave_superset(spark):
    # with rounds=1 the long tail is only partially peeled: survivors are
    # a SUPERSET of the true 2-core (documented contract)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    got1 = _run(spark, edges, k=2, rounds=1)
    got4 = _run(spark, edges, k=2, rounds=4)
    core1 = {n for n, (_, _, c) in got1.items() if c}
    core4 = {n for n, (_, _, c) in got4.items() if c}
    assert core4 == {1, 2, 3}
    assert core4 <= core1 and 5 in core1 - core4  # 5 still alive after 1 round


def _peel_reference(edges, k, rounds):
    """Pure-python fixed-round peel: the operator's spec."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg0 = {n: len(v) for n, v in adj.items()}
    alive = set(adj)
    removed_round = {}
    for r in range(1, rounds + 1):
        doomed = {n for n in alive if len(adj[n] & alive) < k}
        for n in doomed:
            removed_round[n] = r
        alive -= doomed
    return {
        n: (deg0[n], removed_round.get(n, 0), n not in removed_round) for n in adj
    }


def test_kcore_matches_reference_on_random_graphs(spark):
    import random

    rng = random.Random(13)
    for trial in range(3):
        n = rng.randint(5, 14)
        m = rng.randint(4, 22)
        edges = set()
        while len(edges) < m:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        k = rng.choice([2, 3])
        rounds = rng.choice([2, 4])
        got = _run(spark, edges, k=k, rounds=rounds)
        assert got == _peel_reference(edges, k, rounds), (trial, k, rounds, edges)


def test_kcore_string_node_ids(spark):
    """The removed-round accumulator derives its nid type from the edge
    schema, so non-long ids (string doc keys) work end-to-end."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], "id_a string, id_b string"
    )
    got = {
        r["nid"]: (r["removed_round"], r["in_core"])
        for r in kcore_peel(df, k=2, rounds=3).collect()
    }
    assert got == {"a": (0, True), "b": (0, True), "c": (0, True), "d": (1, False)}
