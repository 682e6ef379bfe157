"""Crafted-input tests for mannwhitney_value_shift, pareto_frontier_parts,
and ewma_user_values -- hand-computed expectations that pin the exact-integer
math (tie-averaged doubled ranks, skyline dominance incl. ties/duplicates,
binary-decay fold + 16-row truncation) independently of the DuckDB oracle.
"""

from __future__ import annotations

import datetime

from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: int) -> datetime.datetime:
    return T0 + datetime.timedelta(minutes=minutes)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_mannwhitney_hand_computed(spark, tmp_path):
    # purchase = {1,2,3} cents, view = {2,3,4} cents.  Pooled tie-averaged
    # ranks: 1->1, 2->2.5, 3->4.5, 4->6.  R_a = 8, R_b = 13 =>
    # u2_a = 2*R_a - n_a(n_a+1) = 16 - 12 = 4; u2_b = 26 - 12 = 14.
    # tie_term = (2^3-2) twice = 12.  Rank-biserial r = (2*U_a - na*nb)
    # / (na*nb), and u2_a is ALREADY 2*U_a, so
    # abs_rb_e6 = 1e6*|u2_a - na*nb| // (na*nb) = 1e6*|4 - 9| // 9 = 555555.
    rows = [
        (i, _ts(i), 1, g, v)
        for i, (g, v) in enumerate(
            [("purchase", 0.01), ("purchase", 0.02), ("purchase", 0.03),
             ("view", 0.02), ("view", 0.03), ("view", 0.04),
             ("click", 99.0)]  # other types must be excluded
        )
    ]
    _write_events(spark, tmp_path, rows)
    [r] = SPARK_QUERIES["mannwhitney_value_shift"](spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.u2_a, r.u2_b, r.tie_term, r.abs_rb_e6) == (
        3, 3, 4, 14, 12, 555555,
    )
    # structural invariant: U_a + U_b == n_a * n_b (doubled)
    assert r.u2_a + r.u2_b == 2 * r.n_a * r.n_b


def test_pareto_frontier_dominance_ties_and_duplicates(spark, tmp_path):
    # maximize size, minimize price; dominance requires one STRICT edge.
    parts = [
        (1, 5, 3.00),   # frontier: no larger size at price <= 3.00
        (2, 2, 2.50),   # frontier: global cheapest
        (3, 10, 4.00),  # dominated by 5/6: larger size, equal price
        (4, 10, 4.00),  # same point as 3 -- also dominated
        (5, 20, 4.00),  # frontier
        (6, 20, 4.00),  # duplicate frontier point -- BOTH returned
        (7, 30, 10.00), # frontier: largest size
        (8, 10, 5.00),  # dominated within size 10 (higher price)
        (9, 1, 3.00),   # dominated by 1: larger size, equal price
    ]
    spark.createDataFrame(
        [(k, f"p{k}", "B", "T", s, p) for k, s, p in parts],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    ).write.parquet(str(tmp_path / "part.parquet"))
    out = SPARK_QUERIES["pareto_frontier_parts"](spark, str(tmp_path)).collect()
    assert sorted(r.p_partkey for r in out) == [1, 2, 5, 6, 7]
    got = {r.p_partkey: (r.p_size, r.price_cents) for r in out}
    assert got[5] == (20, 400) and got[6] == (20, 400)


def test_ewma_hand_computed(spark, tmp_path):
    # cents [100, 200, 400] oldest->newest: num = 100*1 + 200*2 + 400*4 =
    # 2100, den = 7 => ewma_millicents = 1000*2100 // 7 = 300000.
    _write_events(
        spark, tmp_path,
        [(1, _ts(1), 7, "view", 1.00), (2, _ts(2), 7, "view", 2.00), (3, _ts(3), 7, "view", 4.00)],
    )
    [r] = SPARK_QUERIES["ewma_user_values"](spark, str(tmp_path)).collect()
    assert (r.user_id, r.n_events, r.last_event_id, r.last_cents) == (7, 3, 3, 400)
    assert (r.frame_len, r.ewma_millicents) == (3, 300000)


def test_ewma_truncates_to_16_events(spark, tmp_path):
    # 4 huge early values followed by 16 zeros: the frame holds only the
    # trailing 16 rows, so the smoothed level is exactly 0.
    rows = [(i, _ts(i), 7, "view", 9999.0 if i < 4 else 0.0) for i in range(20)]
    _write_events(spark, tmp_path, rows)
    [r] = SPARK_QUERIES["ewma_user_values"](spark, str(tmp_path)).collect()
    assert (r.n_events, r.frame_len, r.ewma_millicents) == (20, 16, 0)


def test_ewma_ts_ties_broken_by_event_id(spark, tmp_path):
    # same timestamp: event_id orders the frame => [100, 200], num = 500,
    # den = 3 => 166666 (floor).
    _write_events(
        spark, tmp_path,
        [(2, _ts(1), 7, "view", 2.00), (1, _ts(1), 7, "view", 1.00)],
    )
    [r] = SPARK_QUERIES["ewma_user_values"](spark, str(tmp_path)).collect()
    assert (r.last_event_id, r.frame_len, r.ewma_millicents) == (2, 2, 166666)


def _rand_label(perm: int, event_id: int, n: int, na: int) -> int:
    import hashlib

    h = int(hashlib.md5(f"{perm}|{event_id}".encode()).hexdigest()[:15], 16)
    return 1 if h % n < na else 0


def test_randomization_test_matches_pure_python_reference(spark, tmp_path):
    # independent reference: replay the hashed relabelings and the exact
    # rational comparisons in plain Python over a small crafted sample.
    data = [
        ("purchase", 9.00), ("purchase", 8.50), ("purchase", 9.75),
        ("purchase", 7.25), ("view", 1.00), ("view", 2.00),
        ("view", 1.50), ("view", 0.75), ("view", 1.25), ("click", 99.0),
    ]
    rows = [(i, _ts(i), 1, g, v) for i, (g, v) in enumerate(data)]
    _write_events(spark, tmp_path, rows)

    pool = [(i, round(v * 100), 1 if g == "purchase" else 0)
            for i, (g, v) in enumerate(data) if g in ("purchase", "view")]
    na = sum(a for _, _, a in pool)
    nb = len(pool) - na
    sa = sum(c for _, c, a in pool if a)
    sb = sum(c for _, c, a in pool if not a)
    t0_num, t0_den = abs(sa * nb - sb * na), na * nb
    n_ge = 0
    for perm in range(32):
        labs = [(_rand_label(perm, i, na + nb, na), c) for i, c, _ in pool]
        pna = sum(a for a, _ in labs)
        pnb = len(labs) - pna
        psa = sum(c for a, c in labs if a)
        psb = sum(c for a, c in labs if not a)
        if pna == 0 or pnb == 0:
            n_ge += 1
        elif abs(psa * pnb - psb * pna) * t0_den >= t0_num * (pna * pnb):
            n_ge += 1
    [r] = SPARK_QUERIES["randomization_test_means"](spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.t0_num_abs, r.t0_den) == (na, nb, t0_num, t0_den)
    assert (r.n_perms, r.n_ge, r.p_e6) == (32, n_ge, 1000000 * (n_ge + 1) // 33)
    # the crafted shift is blatant: few relabelings should look as extreme
    assert r.n_ge <= 8


def test_exact_quantiles_hand_computed(spark, tmp_path):
    # 10 values 1..10 cents: k50 = ceil(5.0) = 5 -> 5th smallest = 5;
    # k90 = 9 -> 9; k99 = ceil(9.9) = 10 -> 10.
    rows = [(i, _ts(i), 1, "view", (i + 1) / 100.0) for i in range(10)]
    _write_events(spark, tmp_path, rows)
    [r] = SPARK_QUERIES["exact_quantiles_events"](spark, str(tmp_path)).collect()
    assert (r.n, r.p50_cents, r.p90_cents, r.p99_cents) == (10, 5, 9, 10)


def test_exact_quantiles_tie_heavy(spark, tmp_path):
    # 9 copies of 7 cents and one 9: every quantile (k=5,9,9) lands on 7
    # except p99 (k = ceil(9.9) = 10) which is the single 9.
    rows = [(i, _ts(i), 1, "view", 0.07 if i < 9 else 0.09) for i in range(10)]
    _write_events(spark, tmp_path, rows)
    [r] = SPARK_QUERIES["exact_quantiles_events"](spark, str(tmp_path)).collect()
    assert (r.n, r.p50_cents, r.p90_cents, r.p99_cents) == (10, 7, 7, 9)


def test_pareto_random_agrees_with_brute_force(spark, tmp_path):
    """Seeded random catalog: the rollup-based frontier must equal the
    O(n^2) brute-force dominance filter."""
    import random

    rng = random.Random(20260815)
    parts = [
        (k, rng.randint(1, 12), rng.randint(200, 600) / 100.0)
        for k in range(1, 121)
    ]
    spark.createDataFrame(
        [(k, f"p{k}", "B", "T", s, p) for k, s, p in parts],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    ).write.parquet(str(tmp_path / "part.parquet"))
    pts = [(k, s, round(p * 100)) for k, s, p in parts]
    expect = sorted(
        k
        for k, s, c in pts
        if not any(
            (s2 >= s and c2 <= c and (s2 > s or c2 < c)) for _, s2, c2 in pts
        )
    )
    out = SPARK_QUERIES["pareto_frontier_parts"](spark, str(tmp_path)).collect()
    assert sorted(r.p_partkey for r in out) == expect


def test_ewma_random_agrees_with_pure_fold(spark, tmp_path):
    """Seeded random per-user event streams: the window/array-fold EWMA
    must equal a direct pure-Python binary-decay fold over the trailing
    16 values."""
    import random

    rng = random.Random(20260815)
    rows, series = [], {}
    eid = 0
    for u in (1, 2, 3):
        n = rng.randint(1, 40)
        for t in range(n):
            v = rng.randint(0, 50000) / 100.0
            rows.append((eid, _ts(eid), u, "view", v))
            series.setdefault(u, []).append(round(v * 100))
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = {
        r.user_id: (r.n_events, r.frame_len, r.ewma_millicents)
        for r in SPARK_QUERIES["ewma_user_values"](spark, str(tmp_path)).collect()
    }
    for u, cents in series.items():
        frame = cents[-16:]
        num = sum(c << i for i, c in enumerate(frame))
        den = (1 << len(frame)) - 1
        assert got[u] == (len(cents), len(frame), 1000 * num // den)


def test_mannwhitney_random_agrees_with_pure_ranks(spark, tmp_path):
    """Seeded random two-sample data with heavy ties: the distributed U
    must equal a direct tie-averaged rank computation."""
    import random

    rng = random.Random(20260815)
    a = [rng.randint(1, 30) for _ in range(80)]   # heavy ties: 30 values
    b = [rng.randint(5, 35) for _ in range(70)]
    rows = [(i, _ts(i), 1, "purchase", v / 100.0) for i, v in enumerate(a)]
    rows += [(1000 + i, _ts(200 + i), 1, "view", v / 100.0) for i, v in enumerate(b)]
    _write_events(spark, tmp_path, rows)
    pooled = sorted(a + b)
    # doubled tie-averaged rank of value v: lo + hi over its run
    first = {}
    for idx, v in enumerate(pooled, 1):
        first.setdefault(v, idx)
    count = {}
    for v in pooled:
        count[v] = count.get(v, 0) + 1
    r2 = {v: 2 * first[v] + count[v] - 1 for v in count}  # lo + hi
    u2a = sum(r2[v] for v in a) - len(a) * (len(a) + 1)
    u2b = sum(r2[v] for v in b) - len(b) * (len(b) + 1)
    tie = sum(c**3 - c for c in count.values())
    [r] = SPARK_QUERIES["mannwhitney_value_shift"](spark, str(tmp_path)).collect()
    assert (r.n_a, r.n_b, r.u2_a, r.u2_b, r.tie_term) == (
        len(a), len(b), u2a, u2b, tie,
    )


def test_exact_quantiles_random_agrees_with_sort(spark, tmp_path):
    """Seeded random values: distributed order statistics must equal the
    k-th smallest of the sorted list for k = ceil(q*n)."""
    import random

    rng = random.Random(20260815)
    vals = [rng.randint(0, 9999) for _ in range(137)]
    rows = [(i, _ts(i), 1, "view", v / 100.0) for i, v in enumerate(vals)]
    _write_events(spark, tmp_path, rows)
    s = sorted(vals)
    n = len(s)
    exp = {q: s[(q * n + 99) // 100 - 1] for q in (50, 90, 99)}
    [r] = SPARK_QUERIES["exact_quantiles_events"](spark, str(tmp_path)).collect()
    assert (r.n, r.p50_cents, r.p90_cents, r.p99_cents) == (
        n, exp[50], exp[90], exp[99],
    )


def test_fim_transform_matches_pure_python(spark, tmp_path):
    """Crafted docs: replicate the md5-derived cuts and the PSM string in
    plain Python, assert the manifest row-for-row, plus the in-row
    losslessness invariant."""
    import hashlib

    texts = {
        0: "alpha beta gamma delta epsilon",
        4: "one two",
        8: "solo",
        12: "a b c d e f g h i j",
        3: "never selected (doc_id % 4 != 0)",
    }
    spark.createDataFrame(
        [(k, v, "en", "s", len(v)) for k, v in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    def h(tag, doc, mod):
        return int(hashlib.md5(f"{tag}|{doc}".encode()).hexdigest()[:15], 16) % mod

    out = {
        r.doc_id: r
        for r in SPARK_QUERIES["fim_transform_manifest"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 4, 8, 12}
    for doc in (0, 4, 8, 12):
        tk = texts[doc].split()
        n = len(tk)
        c1, c2 = h("fim1", doc, n + 1), h("fim2", doc, n + 1)
        lo, hi = min(c1, c2), max(c1, c2)
        psm = "<PRE>" + " ".join(tk[:lo]) + "<SUF>" + " ".join(tk[hi:]) + "<MID>" + " ".join(tk[lo:hi])
        r = out[doc]
        assert (r.n_tokens, r.cut_lo, r.cut_hi) == (n, lo, hi)
        assert r.n_reassembled == n  # lossless across the three spans
        assert r.psm_md5 == hashlib.md5(psm.encode()).hexdigest()
