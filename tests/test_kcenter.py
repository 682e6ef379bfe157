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
