"""containment_join (asymmetric Jaccard containment, prefix-filtered):
exactness vs a brute-force shingle-set oracle on constructed quote data --
short docs verbatim-contained in long ones must be found even when plain
Jaccard is far below threshold."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.dedup import containment_join


def _shingle_set(text: str, n: int) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute(rows: list[tuple[int, str]], needle_ids: set[int], n: int, tau: float) -> set[tuple]:
    out = set()
    for (a, ta), (b, tb) in itertools.permutations(rows, 2):
        if a not in needle_ids:
            continue
        sa, sb = _shingle_set(ta, n), _shingle_set(tb, n)
        if not sa:
            continue
        inter = len(sa & sb)
        if 1_000_000 * inter >= int(tau * 1_000_000) * len(sa):
            out.add((a, b, inter, len(sa), len(sb)))
    return out


def test_quote_containment_matches_brute_force(spark):
    long_doc = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 32))          # verbatim slice
    near_quote = " ".join(f"w{i}" for i in range(20, 31)) + " zz"  # one token off
    unrelated = " ".join(f"u{i}" for i in range(12))
    rows = [(0, long_doc), (1, quote), (2, near_quote), (3, unrelated), (4, quote)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    needles = df.where(F.col("doc_id") != 0)  # short docs
    got = {
        (r.id_a, r.id_b, r.inter, r.na, r.nb)
        for r in containment_join(needles, df, n=3, tau_e6=800_000).collect()
    }
    want = _brute(rows, {1, 2, 3, 4}, n=3, tau=0.8)
    assert got == want
    # the verbatim quote IS found inside the long doc (Jaccard would miss it:
    # J = 10/58 ~ 0.17) and found in its exact duplicate, both directions
    assert (1, 0) in {(a, b) for a, b, *_ in got}
    assert {(1, 4), (4, 1)} <= {(a, b) for a, b, *_ in got}


def test_containment_values_exact(spark):
    rows = [(0, "a b c d e f"), (1, "a b c d e f g h i j")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_join(df, df, n=3, tau_e6=500_000).collect()
    by_pair = {(r.id_a, r.id_b): r for r in out}
    # doc 0 has 4 3-gram shingles, all inside doc 1 (8 shingles): C = 1.0
    r = by_pair[(0, 1)]
    assert (r.inter, r.na, r.nb, r.cont_e6) == (4, 4, 8, 1_000_000)
    # reverse direction: C = 4/8 = 0.5 exactly, kept at tau = 0.5
    r = by_pair[(1, 0)]
    assert (r.inter, r.na, r.nb, r.cont_e6) == (4, 8, 4, 500_000)


def test_random_corpora_match_brute_force(spark):
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    for trial, (n_gram, tau) in enumerate([(2, 0.5), (3, 0.8)]):
        rows = []
        for i in range(14):
            length = rng.randint(0, 10)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(length))))
        # guarantee a few real containments: doc gets a verbatim slice child
        for base_id in (0, 1):
            toks = rows[base_id][1].split()
            if len(toks) >= n_gram + 2:
                lo = rng.randrange(len(toks) - n_gram - 1)
                rows.append((100 + base_id, " ".join(toks[lo : lo + n_gram + 2])))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b, r.inter, r.na, r.nb)
            for r in containment_join(
                df, df, n=n_gram, tau_e6=int(tau * 1_000_000)
            ).collect()
        }
        want = _brute(rows, {i for i, _ in rows}, n=n_gram, tau=tau)
        assert got == want, (trial, rows)


def test_tau_e6_validated_and_lazy_mode_takes_no_cache(spark):
    # ADVICE r7: tau_e6 > 1e6 made the prefix length non-positive (opaque
    # slice() runtime error) -> now a clear ValueError; and eager=False
    # must not leak persisted shingle caches into the shared session
    import pytest

    docs = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
    for bad in (0, -5, 1_000_001):
        with pytest.raises(ValueError, match="tau_e6"):
            containment_join(docs, docs, n=2, tau_e6=bad)
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    lazy = containment_join(docs, docs, n=2, tau_e6=500_000, eager=False)
    lazy.count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    # no NEW cache may appear; the async ContextCleaner may legitimately
    # drop entries persisted by EARLIER tests between the two snapshots,
    # so equality would flake under a full-suite run
    assert not (after - before)
