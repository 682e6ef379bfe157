"""Crafted-graph tests for synchronous label propagation (the community
layer of the dedup-graph family).  The hand-computed traces pin the exact
update rule -- neighbor labels only, max count then MIN label -- so a
refactor that sneaks in self-labels or a different tie-break fails here
before it reaches the oracle gate."""

from __future__ import annotations

from odp_dynamic_data_pipeline_spark.operators.dedup import label_propagation


def _lpa(spark, pairs, rounds, schema="id_a long, id_b long"):
    edges = spark.createDataFrame(pairs, schema)
    rows = label_propagation(edges, rounds=rounds).collect()
    return {r["nid"]: (r["lbl"], r["community_size"]) for r in rows}


def test_bridged_triangles_split_into_two_communities(spark):
    # two triangles joined by one bridge (3-4): connected components would
    # merge all six nodes; LPA converges to two communities of three.
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    out = _lpa(spark, pairs, rounds=4)
    assert out == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        4: (3, 3), 5: (3, 3), 6: (3, 3),
    }


def test_single_round_trace(spark):
    # hand-computed synchronous round 1 on the bridged triangles: every
    # node sees all-distinct neighbor labels, so min-label wins each tie.
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    out = _lpa(spark, pairs, rounds=1)
    labels = {n: l for n, (l, _) in out.items()}
    assert labels == {1: 2, 2: 1, 3: 1, 4: 3, 5: 4, 6: 4}


def test_pair_oscillates_under_synchronous_updates(spark):
    # a lone edge swaps labels every synchronous round -- the documented,
    # replayable outcome of fixed-round synchronous LPA (not a bug: the
    # oracle unrolls the identical rounds).
    assert {n: l for n, (l, _) in _lpa(spark, [(1, 2)], rounds=1).items()} == {1: 2, 2: 1}
    assert {n: l for n, (l, _) in _lpa(spark, [(1, 2)], rounds=2).items()} == {1: 1, 2: 2}


def test_string_node_ids(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "e"), ("d", "f"), ("e", "f"), ("c", "d")]
    out = _lpa(spark, pairs, rounds=4, schema="id_a string, id_b string")
    assert out == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
        "d": ("c", 3), "e": ("c", 3), "f": ("c", 3),
    }


def _lpa_reference(edges, rounds):
    """Pure-python synchronous LPA: the operator's spec (neighbor labels
    only, max count then min label, isolated nodes keep their label)."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            counts: dict[int, int] = {}
            for nb in adj[n]:
                counts[lbl[nb]] = counts.get(lbl[nb], 0) + 1
            if counts:
                mc = max(counts.values())
                nxt[n] = min(l for l, c in counts.items() if c == mc)
            else:
                nxt[n] = lbl[n]
        lbl = nxt
    sizes: dict[int, int] = {}
    for l in lbl.values():
        sizes[l] = sizes.get(l, 0) + 1
    return {n: (l, sizes[l]) for n, l in lbl.items()}


def test_labelprop_matches_reference_on_random_graphs(spark):
    import random

    rng = random.Random(29)
    for trial in range(3):
        n = rng.randint(5, 14)
        m = rng.randint(4, 22)
        edges = set()
        while len(edges) < m:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        rounds = rng.choice([1, 2, 4])
        got = _lpa(spark, edges, rounds=rounds)
        assert got == _lpa_reference(edges, rounds), (trial, rounds, edges)
