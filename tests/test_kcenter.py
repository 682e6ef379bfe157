"""kcenter_coreset (Gonzalez farthest-point traversal): trace equality vs
a Python reference on deterministic vector sets -- exact quantized
arithmetic, lowest-id tiebreaks, k > n truncation, empty input."""

from __future__ import annotations

import random

from odp_dynamic_data_pipeline_spark.operators.similarity import kcenter_coreset


def _quant(v: list[float]) -> list[int]:
    # mirrors QUANT on an array<float> column: the stored value is
    # float32, widened to double, then ROUND half-away-from-zero
    import math

    import numpy as np

    out = []
    for x in v:
        d = float(np.float32(x)) * 1_000_000
        out.append(int(math.copysign(math.floor(abs(d) + 0.5), d)))
    return out


def _reference(rows: list[tuple[int, list[float]]], k: int) -> list[tuple[int, int, int]]:
    q = {i: _quant(v) for i, v in rows}
    ids = sorted(q)
    if not ids or k < 1:
        return []
    chosen = [(1, ids[0], 0)]
    rem = [i for i in ids if i != ids[0]]
    mind2 = {
        i: sum((a - b) * (a - b) for a, b in zip(q[i], q[ids[0]])) for i in rem
    }
    for t in range(2, k + 1):
        if not rem:
            break
        pick = max(rem, key=lambda i: (mind2[i], -i))
        chosen.append((t, pick, mind2[pick]))
        rem.remove(pick)
        for i in rem:
            d2 = sum((a - b) * (a - b) for a, b in zip(q[i], q[pick]))
            mind2[i] = min(mind2[i], d2)
    return chosen


def _got(spark, rows, k):
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    out = kcenter_coreset(df, k=k)
    return [(r.sel_order, r.vec_id, r.d2) for r in out.orderBy("sel_order").collect()]


def test_random_vectors_match_reference(spark):
    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-0.37, 0.37) for _ in range(6)]) for i in range(15)
    ]
    assert _got(spark, rows, 6) == _reference(rows, 6)


def test_duplicate_vectors_tiebreak_by_id(spark):
    # two exact duplicates of the seed: zero distance, never picked before
    # genuinely far points; id tiebreak once only duplicates remain
    rows = [(0, [0.1, 0.1]), (1, [0.1, 0.1]), (2, [0.3, -0.2]), (3, [0.1, 0.1])]
    assert _got(spark, rows, 4) == _reference(rows, 4)


def test_k_exceeds_n_truncates(spark):
    rows = [(7, [0.2, 0.2]), (3, [-0.1, 0.3])]
    got = _got(spark, rows, 5)
    assert got == _reference(rows, 5)
    assert len(got) == 2 and got[0][1] == 3  # seed = lowest id


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kcenter_coreset(df, k=3).count() == 0


def test_string_id_column_round_trips(spark):
    # ADVICE r7: the result schema hardcoded bigint ids; the algorithm is
    # id-type-agnostic (seed = lowest id lexicographically for strings)
    rows = [("a", [0.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = kcenter_coreset(df, id_col="vec_id", vec_col="embedding", k=3).collect()
    assert [r.vec_id for r in sorted(out, key=lambda r: r.sel_order)] == ["a", "c", "b"]
    assert out[0].d2 == 0 and {type(r.vec_id) for r in out} == {str}


# ---------------------------------------------------------------------------
# kcenter_coreset_batched (VERDICT r7 item 2: over-sampled selection for
# large k)
# ---------------------------------------------------------------------------

from odp_dynamic_data_pipeline_spark.operators.similarity import (  # noqa: E402
    kcenter_coreset_batched,
)


def _got_batched(spark, rows, k, batch):
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    out = kcenter_coreset_batched(df, k=k, batch=batch)
    return [(r.sel_order, r.vec_id, r.d2) for r in out.orderBy("sel_order").collect()]


def _radius(rows, selected_ids):
    """Coverage radius: max over points of exact min quantized d2 to the
    selected set."""
    q = {i: _quant(v) for i, v in rows}
    cs = [q[i] for i in selected_ids]
    return max(
        min(sum((a - b) * (a - b) for a, b in zip(q[i], c)) for c in cs)
        for i in q
    )


def test_batch_one_is_sequential_greedy(spark):
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-0.37, 0.37) for _ in range(5)]) for i in range(14)]
    assert _got_batched(spark, rows, 6, 1) == _reference(rows, 6)


def test_batched_d2_trace_is_exact(spark):
    # every emitted d2 must be the TRUE quantized distance from the pick to
    # the set selected before it -- replay the emitted order in Python
    rng = random.Random(13)
    rows = [(i, [rng.uniform(-0.3, 0.3) for _ in range(4)]) for i in range(20)]
    q = {i: _quant(v) for i, v in rows}
    trace = _got_batched(spark, rows, 9, 4)
    assert [t[0] for t in trace] == list(range(1, len(trace) + 1))
    for t, (order, vid, d2) in enumerate(trace):
        if t == 0:
            assert d2 == 0
            continue
        prev = [q[v] for _, v, _ in trace[:t]]
        want = min(sum((a - b) * (a - b) for a, b in zip(q[vid], c)) for c in prev)
        assert d2 == want, (order, vid)


def test_batched_radius_within_2x_of_greedy(spark):
    # the quality contract the docstring promises: over-sampled coverage
    # radius <= 2x sequential greedy's, across random instances and shapes
    for seed, n, k, batch in [(1, 30, 8, 4), (2, 40, 10, 5), (3, 25, 12, 3)]:
        rng = random.Random(seed)
        rows = [(i, [rng.uniform(-0.37, 0.37) for _ in range(4)]) for i in range(n)]
        greedy_ids = [v for _, v, _ in _reference(rows, k)]
        batched = _got_batched(spark, rows, k, batch)
        assert len(batched) == k
        r_g = _radius(rows, greedy_ids)
        r_b = _radius(rows, [v for _, v, _ in batched])
        assert r_b <= 2 * r_g, (seed, r_b, r_g)


def test_batched_k_exceeds_n_and_validation(spark):
    import pytest

    rows = [(7, [0.2, 0.2]), (3, [-0.1, 0.3]), (5, [0.0, 0.0])]
    got = _got_batched(spark, rows, 9, 4)
    assert len(got) == 3 and got[0][1] == 3  # full ordering, seed = lowest id
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="batch"):
        kcenter_coreset_batched(df, k=2, batch=0)
    with pytest.raises(ValueError, match="k must"):
        kcenter_coreset_batched(df, k=0, batch=2)
