"""W2 hard-part tests (SURVEY.md section 7): the window-algebra pairing must
match the literal register-walk on every edge case."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from odp_dynamic_data_pipeline_spark.operators.sessionize import (
    pair_page_views,
    pair_page_views_exact,
)

T0 = dt.datetime(2024, 11, 16, 12, 0, 0)


def mk_events(spark, seq):
    """seq: list of (client, offset_seconds, event_type)."""
    rows = [
        (c, f"e{i}", T0 + dt.timedelta(seconds=off), t)
        for i, (c, off, t) in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "clientId string, eventId string, event_time timestamp, eventType string")


def reference_walk(seq):
    """The reference's 13-line register loop (src/batch_tlb.py:50-62), in
    plain Python, as ground truth."""
    out = {}
    by_client = {}
    for c, off, t in seq:
        by_client.setdefault(c, []).append((off, t))
    for c, evs in by_client.items():
        evs.sort()
        last_start = None
        total = []
        for off, t in evs:
            if t == "page_view_start":
                last_start = off
            elif t == "page_view_end" and last_start is not None:
                total.append(float(off - last_start))
                last_start = None
        out[c] = total
    return out


CASES = {
    "simple_pair": [("a", 0, "page_view_start"), ("a", 10, "page_view_end")],
    "unmatched_trailing_start": [("a", 0, "page_view_start")],
    "end_without_start": [("a", 5, "page_view_end")],
    "double_start_overwrites": [
        ("a", 0, "page_view_start"),
        ("a", 5, "page_view_start"),
        ("a", 12, "page_view_end"),
    ],
    "consume_once": [
        ("a", 0, "page_view_start"),
        ("a", 5, "page_view_end"),
        ("a", 7, "page_view_end"),
    ],
    "other_events_ignored": [
        ("a", 0, "page_view_start"),
        ("a", 3, "error"),
        ("a", 9, "page_view_end"),
    ],
    "multi_client": [
        ("a", 0, "page_view_start"),
        ("b", 1, "page_view_start"),
        ("a", 4, "page_view_end"),
        ("b", 9, "page_view_end"),
        ("b", 11, "page_view_end"),
    ],
    "restart_after_consume": [
        ("a", 0, "page_view_start"),
        ("a", 2, "page_view_end"),
        ("a", 5, "page_view_start"),
        ("a", 11, "page_view_end"),
    ],
}


@pytest.mark.parametrize("case", CASES)
def test_window_algebra_matches_reference(spark, case):
    seq = CASES[case]
    df = mk_events(spark, seq)
    got = pair_page_views(df, tiebreak_col="eventId")
    actual = {}
    for r in got.collect():
        actual.setdefault(r["clientId"], []).append(r["page_view_duration"])
    expected = {c: d for c, d in reference_walk(seq).items() if d}
    assert {k: sorted(v) for k, v in actual.items()} == {
        k: sorted(v) for k, v in expected.items()
    }


@pytest.mark.parametrize("case", CASES)
def test_exact_pandas_matches_reference(spark, case):
    seq = CASES[case]
    df = mk_events(spark, seq)
    got = pair_page_views_exact(df)
    actual = {}
    for r in got.collect():
        actual.setdefault(r["clientId"], []).append(r["page_view_duration"])
    expected = {c: d for c, d in reference_walk(seq).items() if d}
    assert {k: sorted(v) for k, v in actual.items()} == {
        k: sorted(v) for k, v in expected.items()
    }


def test_property_random_sequences(spark):
    """Randomized property test: both implementations == plain-Python
    reference on arbitrary event soups (unique timestamps per client)."""
    rng = random.Random(42)
    seq = []
    for c in ["a", "b", "c", "d"]:
        offs = rng.sample(range(10_000), 120)
        for off in offs:
            t = rng.choice(["page_view_start", "page_view_end", "error", "click"])
            seq.append((c, off, t))
    df = mk_events(spark, seq)
    expected = {c: sorted(d) for c, d in reference_walk(seq).items() if d}

    for impl in (lambda d: pair_page_views(d, tiebreak_col="eventId"), pair_page_views_exact):
        actual = {}
        for r in impl(df).collect():
            actual.setdefault(r["clientId"], []).append(r["page_view_duration"])
        assert {k: sorted(v) for k, v in actual.items()} == expected


def test_bucketed_walk_equals_per_key_walk(spark):
    """buckets=N must be a pure physical re-keying: outputs identical to
    the one-group-per-key shape on random multi-user event streams
    (including users sharing a bucket, empty-pair users, tied handling
    via the deterministic sort)."""
    import random

    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.operators.sessionize import pair_page_views_exact

    rng = random.Random(41)
    rows = []
    for uid in range(17):  # 17 users across 4 buckets
        t = 0
        for _ in range(rng.randint(0, 14)):
            t += rng.randint(1, 50)
            rows.append(
                (str(uid), t, rng.choice(["page_view_start", "page_view_end", "other"]))
            )
    df = spark.createDataFrame(rows, "k string, t long, event_type string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "event_type"
    )
    kw = dict(group_col="k", ts_col="ts", type_col="event_type")
    base = pair_page_views_exact(df, **kw)
    bucketed = pair_page_views_exact(df, buckets=4, **kw)
    key = lambda r: (r["k"], r["end_ts"], r["page_view_duration"])  # noqa: E731
    assert sorted(map(key, base.collect())) == sorted(map(key, bucketed.collect()))
