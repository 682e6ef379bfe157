"""Crafted-journey tests for markov_attribution_report /
operators.correlate.markov_removal_attribution: hand-computed absorption
values, purchase-first journeys, no-conversion corpora, and a pure-Python
agreement check on a random corpus."""

from __future__ import annotations

import datetime

from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
E9 = 1_000_000_000
E6 = 1_000_000


def _write(spark, tmp_path, journeys):
    """journeys: list of per-user event-type sequences."""
    rows, eid = [], 0
    for u, seq in enumerate(journeys, 1):
        for t, typ in enumerate(seq):
            rows.append((eid, T0 + datetime.timedelta(minutes=eid), u, typ, 1.0))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))


def _report(spark, tmp_path):
    return {
        r.channel: (r.base_conv_e9, r.removed_conv_e9, r.removal_effect_e6,
                    r.attribution_share_e6)
        for r in SPARK_QUERIES["markov_attribution_report"](spark, str(tmp_path)).collect()
    }


def test_hand_computed_two_journeys(spark, tmp_path):
    # u1: a -> b -> purchase (converts); u2: a (no purchase).
    # Chain: START->a (x2), a->{b, NULL}, b->CONV.
    # p(b)=1e9, p(a)=(1e9+0)//2=5e8, p(START)=(2*5e8)//2=5e8.
    # Removing a or b each kills ALL conversion -> effect 1e6 each,
    # shares split 5e5/5e5.
    _write(spark, tmp_path, [["a", "b", "purchase"], ["a"]])
    got = _report(spark, tmp_path)
    assert got == {
        "a": (E9 // 2, 0, E6, E6 // 2),
        "b": (E9 // 2, 0, E6, E6 // 2),
    }


def test_purchase_first_user_is_start_to_conv(spark, tmp_path):
    # u1 converts with no prior channel (START->CONV); u2: c (no purchase).
    # Removing c cannot touch the START->CONV mass: p_base(START) =
    # (1*1e9 + 1*0)//2 = 5e8 and removal of c leaves it unchanged ->
    # effect 0, share 0.
    _write(spark, tmp_path, [["purchase"], ["c"]])
    got = _report(spark, tmp_path)
    assert got == {"c": (E9 // 2, E9 // 2, 0, 0)}


def test_no_conversions_all_zero(spark, tmp_path):
    _write(spark, tmp_path, [["a", "b"], ["b"]])
    got = _report(spark, tmp_path)
    assert set(got) == {"a", "b"}
    for base, removed, eff, share in got.values():
        assert (base, removed, eff, share) == (0, 0, 0, 0)


def test_events_after_first_purchase_ignored(spark, tmp_path):
    # channels after the first purchase must not create transitions:
    # identical to the two-journey hand case despite trailing noise.
    _write(
        spark, tmp_path,
        [["a", "b", "purchase", "z", "z", "purchase"], ["a"]],
    )
    got = _report(spark, tmp_path)
    assert set(got) == {"a", "b"}  # 'z' never enters the chain
    assert got["a"] == (E9 // 2, 0, E6, E6 // 2)


def test_random_corpus_agrees_with_pure_python(spark, tmp_path):
    import random

    rng = random.Random(20260815)
    types = ["a", "b", "c", "d"]
    journeys = []
    for _ in range(40):
        n = rng.randint(1, 8)
        seq = [rng.choice(types) for _ in range(n)]
        if rng.random() < 0.5:
            seq.insert(rng.randint(0, len(seq)), "purchase")
        journeys.append(seq)
    _write(spark, tmp_path, journeys)

    # independent reference: journeys -> transitions -> 8-step absorption
    cnt = {}
    for seq in journeys:
        fp = seq.index("purchase") if "purchase" in seq else None
        chans = [t for t in (seq[:fp] if fp is not None else seq) if t != "purchase"]
        if not chans:
            if fp is not None:
                cnt[("START", "CONV")] = cnt.get(("START", "CONV"), 0) + 1
            continue
        prev = "START"
        for c in chans:
            cnt[(prev, c)] = cnt.get((prev, c), 0) + 1
            prev = c
        dst = "CONV" if fp is not None else "NULL"
        cnt[(prev, dst)] = cnt.get((prev, dst), 0) + 1
    out = {}
    for (s, _), c in cnt.items():
        out[s] = out.get(s, 0) + c
    channels = sorted({s for s, _ in cnt if s != "START"})
    states = channels + ["START", "CONV", "NULL"]

    def absorb(removed):
        p = {s: 0 for s in states}
        p["CONV"] = E9
        for _ in range(8):
            nxt = {}
            for s in states:
                if s == "CONV":
                    nxt[s] = E9
                elif s == "NULL" or s == removed:
                    nxt[s] = 0
                else:
                    o = out.get(s, 0)
                    nxt[s] = (
                        sum(c * p[d] for (src, d), c in cnt.items() if src == s) // o
                        if o else 0
                    )
            p = nxt
        return p["START"]

    base = absorb(None)
    eff = {c: (1_000_000 * (base - absorb(c))) // base if base > 0 else 0
           for c in channels}
    tot = sum(eff.values())
    got = _report(spark, tmp_path)
    assert set(got) == set(channels)
    for c in channels:
        b, r, e, sh = got[c]
        assert b == base and e == eff[c]
        assert sh == ((1_000_000 * e) // tot if tot > 0 else 0)


def test_caller_built_trans_with_dst_only_state(spark):
    # A caller-supplied (src, dst, cnt) table may contain a channel that
    # appears ONLY as dst (no outgoing edges).  The operator must not
    # KeyError: the sink channel absorbs at 0 (like NULL), so mass
    # routed through it dies.  START->a->CONV (1) and START->a->x (1)
    # where x has no outgoing row: p(a) = (1e9 + 0)//2 = 5e8.
    from odp_dynamic_data_pipeline_spark.operators.correlate import (
        markov_removal_attribution,
    )

    trans = spark.createDataFrame(
        [("START", "a", 2), ("a", "CONV", 1), ("a", "x", 1)],
        "src string, dst string, cnt long",
    )
    got = {
        r.channel: (r.base_conv_e9, r.removed_conv_e9)
        for r in markov_removal_attribution(trans).collect()
    }
    assert set(got) == {"a", "x"}
    assert got["a"] == (E9 // 2, 0)       # removing a kills everything
    assert got["x"] == (E9 // 2, E9 // 2) # x carried no conversion mass
