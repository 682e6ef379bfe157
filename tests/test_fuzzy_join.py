"""edit_distance_join (FastSS deletion-neighborhood blocking): exactness
vs a brute-force Levenshtein oracle, including the edge cases the blocking
has to survive -- empty strings, 1-char strings, exact-duplicate strings
(dist-0 id pairs), and insert/delete (not just substitute) edits."""

from __future__ import annotations

import itertools
import random

import pytest

from odp_dynamic_data_pipeline_spark.operators.dedup import edit_distance_join


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _brute(rows: list[tuple[int, str]], d: int) -> set[tuple]:
    return {
        (a, b, sa, sb, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= d
    }


def _got(spark, rows: list[tuple[int, str]], d: int) -> set[tuple]:
    df = spark.createDataFrame(rows, "id long, name string")
    out = edit_distance_join(df, id_col="id", str_col="name", max_dist=d)
    return {(r.id_a, r.id_b, r.name_a, r.name_b, r.dist) for r in out.collect()}


EDGE_ROWS = [
    (0, "alpha"),
    (1, "alphq"),   # substitution
    (2, "alpa"),    # deletion
    (3, "aalpha"),  # insertion
    (4, "beta"),
    (5, "betta"),
    (6, "bet"),
    (7, ""),        # empty: sequence(1, 0) is DESCENDING in Spark
    (8, "x"),       # 1-char: within dist 1 of ""
    (9, "xy"),
    (10, "alpha"),  # exact duplicate of id 0: dist-0 pair
]


@pytest.mark.parametrize("d", [1, 2])
def test_edge_rows_match_brute_force(spark, d):
    assert _got(spark, EDGE_ROWS, d) == _brute(EDGE_ROWS, d)


@pytest.mark.parametrize("d", [1, 2])
def test_random_edits_match_brute_force(spark, d):
    rng = random.Random(42)
    alpha = "ab0"
    base = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 8))) for _ in range(12)]
    rows = []
    for s in base:
        rows.append(s)
        # one random edit of each kind off every base string
        if s:
            i = rng.randrange(len(s))
            rows.append(s[:i] + rng.choice(alpha) + s[i + 1 :])  # substitute
            rows.append(s[:i] + s[i + 1 :])                      # delete
        i = rng.randrange(len(s) + 1)
        rows.append(s[:i] + rng.choice(alpha) + s[i:])           # insert
    indexed = list(enumerate(rows))
    assert _got(spark, indexed, d) == _brute(indexed, d)


def test_null_strings_dropped(spark):
    rows = [(0, "abc"), (1, None), (2, "abd")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = edit_distance_join(df, id_col="id", str_col="name", max_dist=1)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(0, 2)}


def test_rejects_unsupported_distance(spark):
    df = spark.createDataFrame([(0, "a")], "id long, name string")
    with pytest.raises(ValueError):
        edit_distance_join(df, id_col="id", str_col="name", max_dist=3)


def test_duplicate_rows_and_multi_name_ids_no_self_pairs(spark):
    # ADVICE r7: an id appearing with TWO names within max_dist must not
    # self-pair, and duplicate (id, name) input rows must not duplicate
    # output rows -- output is the unique a.id < b.id pair set
    rows = [
        (1, "acme"),
        (1, "acmo"),  # same id, lev("acme","acmo") = 1 -> NOT a pair
        (2, "acme"),
        (2, "acme"),  # exact duplicate row
        (3, "acmz"),
    ]
    out = _got(spark, rows, 1)
    assert all(a != b for a, b, *_ in out)
    collected = [
        (r.id_a, r.id_b, r.name_a, r.name_b, r.dist)
        for r in edit_distance_join(
            spark.createDataFrame(rows, "id long, name string"),
            id_col="id", str_col="name", max_dist=1,
        ).collect()
    ]
    assert len(collected) == len(set(collected))  # no duplicate rows
    # the distinct-id pair set matches brute force over DISTINCT rows
    assert out == _brute(sorted(set(rows)), 1) - {
        t for t in _brute(sorted(set(rows)), 1) if t[0] == t[1]
    }
