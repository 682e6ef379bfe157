"""Cogroup attribution kernel + the cogroup API path end-to-end."""

from __future__ import annotations

import pandas as pd

from odp_dynamic_data_pipeline_spark.queries.surfaces import align_attribution_windows

US = 1_000_000
HOUR = 3600 * US


def _p(rows):
    return pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us"])


def _v(rows):
    return pd.DataFrame(rows, columns=["user_id", "v_us", "cents"])


def test_kernel_window_bounds_and_gap():
    # views at t-2h, t-30m, t-1s, t (equal), t+1s relative to purchase t=3h
    t = 3 * HOUR
    views = _v(
        [
            (1, t - 2 * HOUR, 100),
            (1, t - 30 * 60 * US, 200),
            (1, t - US, 400),
            (1, t, 800),  # equal ts: NOT prior (strict <)
            (1, t + US, 1600),
        ]
    )
    out = align_attribution_windows(_p([(10, 1, t)]), views)
    r = out.iloc[0]
    # 1h window [t-1h, t): the -30m and -1s views only
    assert r["n_views_1h"] == 2
    assert r["sum_view_cents_1h"] == 600
    assert r["last_view_gap_us"] == US  # gap to the -1s view


def test_kernel_no_views_and_empty_sides():
    t = HOUR
    out = align_attribution_windows(_p([(10, 1, t)]), _v([]))
    r = out.iloc[0]
    assert r["n_views_1h"] == 0 and r["sum_view_cents_1h"] == 0
    assert pd.isna(r["last_view_gap_us"])
    # user with views but no purchases: empty, correctly-typed frame
    out2 = align_attribution_windows(_p([]), _v([(2, t, 5)]))
    assert len(out2) == 0
    assert str(out2["last_view_gap_us"].dtype) == "Int64"


def test_kernel_unsorted_views_are_sorted():
    t = 2 * HOUR
    views = _v([(1, t - US, 50), (1, t - 2 * US, 20)])  # reverse order in
    out = align_attribution_windows(_p([(10, 1, t)]), views)
    assert out.iloc[0]["n_views_1h"] == 2
    assert out.iloc[0]["last_view_gap_us"] == US


def test_cogroup_api_end_to_end(spark):
    p = spark.createDataFrame(
        [(10, 1, 2 * HOUR), (11, 2, 2 * HOUR)], "event_id long, user_id long, ts_us long"
    )
    v = spark.createDataFrame([(1, 2 * HOUR - US, 30)], "user_id long, v_us long, cents long")
    out = (
        p.groupBy("user_id")
        .cogroup(v.groupBy("user_id"))
        .applyInPandas(
            align_attribution_windows,
            "event_id bigint, user_id bigint, ts_us bigint, n_views_1h bigint, "
            "sum_view_cents_1h bigint, last_view_gap_us bigint",
        )
    )
    got = {r["event_id"]: (r["n_views_1h"], r["last_view_gap_us"]) for r in out.collect()}
    assert got == {10: (1, US), 11: (0, None)}


def test_kernel_multi_user_isolation():
    """The composite-key fast path must never let one user's views leak
    into another's window, count, sum, or gap -- including when user B has
    no views at all and user A's views are adjacent in the sorted array."""
    t = 5 * HOUR
    views = _v(
        [
            (1, t - 2 * US, 10),
            (1, t - US, 20),
            (3, t - US, 999),  # user 3's view must not affect user 2
        ]
    )
    purchases = _p([(10, 1, t), (11, 2, t), (12, 3, t)])
    out = align_attribution_windows(purchases, views).set_index("event_id")
    assert out.loc[10, "n_views_1h"] == 2
    assert out.loc[10, "sum_view_cents_1h"] == 30
    assert out.loc[10, "last_view_gap_us"] == US
    # user 2: no views anywhere; nearest array neighbors belong to 1 and 3
    assert out.loc[11, "n_views_1h"] == 0
    assert out.loc[11, "sum_view_cents_1h"] == 0
    assert pd.isna(out.loc[11, "last_view_gap_us"])
    assert out.loc[12, "n_views_1h"] == 1
    assert out.loc[12, "sum_view_cents_1h"] == 999


def test_kernel_window_start_clamps_at_batch_base():
    """A purchase within 1h of the batch's earliest timestamp must clamp
    its window start to the user's own range, not escape into the previous
    user's composite-key region."""
    views = _v([(1, 100, 7), (2, 50, 11)])  # user 2's view is the batch min
    out = align_attribution_windows(_p([(10, 2, 200)]), views).iloc[0]
    assert out["n_views_1h"] == 1 and out["sum_view_cents_1h"] == 11
    assert out["last_view_gap_us"] == 150


def _attribution_reference(purchases, views):
    """Brute-force spec: per purchase, scan every view of the same user."""
    out = {}
    for eid, uid, t in purchases:
        mine = [(ts, c) for u, ts, c in views if u == uid]
        win = [(ts, c) for ts, c in mine if t - 3_600_000_000 <= ts < t]
        prior = [ts for ts, _ in mine if ts < t]
        out[eid] = (
            len(win),
            sum(c for _, c in win),
            (t - max(prior)) if prior else None,
        )
    return out


def test_kernel_matches_bruteforce_on_random_streams():
    import random

    rng = random.Random(29)
    for trial in range(25):
        n_users = rng.randint(1, 5)
        purchases = [
            (i, rng.randrange(n_users), rng.randrange(0, 10**10))
            for i in range(rng.randint(1, 12))
        ]
        views = [
            (rng.randrange(n_users), rng.randrange(0, 10**10), rng.randint(-50, 500))
            for _ in range(rng.randint(0, 20))
        ]
        out = align_attribution_windows(_p(purchases), _v(views))
        got = {
            int(r["event_id"]): (
                int(r["n_views_1h"]),
                int(r["sum_view_cents_1h"]),
                None if pd.isna(r["last_view_gap_us"]) else int(r["last_view_gap_us"]),
            )
            for _, r in out.iterrows()
        }
        assert got == _attribution_reference(purchases, views), (trial, purchases, views)


def test_registered_query_survives_downstream_pruning(spark):
    """Regression: a self-cogroup over ONE shared events scan loses the
    right side's pass-through user_id whenever the downstream plan
    narrows the output (count/aggregate) -- Catalyst's relation-dedup +
    column-pruning interplay.  The registered query loads each side as
    its own relation; count(), an aggregate, AND collect() must all
    work and agree."""
    from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES

    from tests.conftest import SF_SMOKE

    df = SPARK_QUERIES["cogroup_attribution_windows"](spark, SF_SMOKE)
    n_count = df.count()
    n_rows = len(df.collect())
    agg = df.selectExpr("sum(n_views_1h) AS s", "count(*) AS n").collect()[0]
    assert n_count == n_rows == agg["n"] > 0
