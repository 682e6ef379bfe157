"""Unit tests for the r9 second-wave operators: retrieval evaluation
(nDCG/MRR/P/R), reciprocal-rank fusion, blocking-scheme quality,
approximate-FD g3, and gap+cap sessionization -- crafted inputs with
hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.quality_checks import (
    approx_fd_report,
    blocking_quality,
)
from odp_dynamic_data_pipeline_spark.operators.ranking import (
    ndcg_discounts_fp20,
    retrieval_eval,
    rrf_fuse,
)
from odp_dynamic_data_pipeline_spark.operators.sessionize import sessionize_capped
from odp_dynamic_data_pipeline_spark.operators.text import ilog2_fp20


def test_ndcg_discounts_exact():
    # rank 1 -> 1/log2(2) = 1.0 exactly in fp20
    d = dict(ndcg_discounts_fp20(3))
    assert d[1] == 1 << 20
    # rank 3 -> 1/log2(4) = 0.5 exactly
    assert d[3] == (1 << 40) // ilog2_fp20(4) == (1 << 20) // 2
    # monotone decreasing
    vals = [v for _, v in ndcg_discounts_fp20(10)]
    assert vals == sorted(vals, reverse=True)


def test_retrieval_eval_crafted(spark):
    # d1: 'cat' x3 (relevant, high tf); d2: 'cat' x1 (hit but NOT relevant);
    # d3: 'cat' x2 'dog' x2 (relevant, gain 2); d4: no query terms.
    rows = [
        (1, "cat cat cat filler filler"),
        (2, "cat filler filler filler"),
        (3, "cat cat dog dog filler"),
        (4, "filler filler filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval_eval(df, {"q": ["cat", "dog"]}, k=3, rel_tf=2)
    r = out.collect()[0]
    assert r["query_id"] == "q"
    assert r["n_retrieved"] == 3  # d1, d2, d3 have hits
    assert r["n_rel_total"] == 2  # d1 (gain 1), d3 (gain 2)
    assert r["n_rel_topk"] == 2
    assert r["p_at_k_e6"] == 2 * 1000000 // 3
    assert r["r_at_k_e6"] == 1000000
    assert r["first_rel_rank"] >= 1
    assert r["mrr_e6"] == 1000000 // r["first_rel_rank"]
    # ideal ordering is gain desc => idcg >= dcg => ndcg <= 1
    assert 0 < r["ndcg_e6"] <= 1000000


def test_retrieval_eval_perfect_ranking_is_1(spark):
    # single relevant doc ranked first => DCG == IDCG exactly
    rows = [(1, "cat cat cat"), (2, "filler words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = retrieval_eval(df, {"q": ["cat"]}, k=5, rel_tf=2).collect()[0]
    assert r["ndcg_e6"] == 1000000
    assert r["mrr_e6"] == 1000000
    assert r["first_rel_rank"] == 1


def test_rrf_fuse_exact(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank long")
    b = spark.createDataFrame([(20, 1), (10, 2), (40, 3)], "doc_id long, rank long")
    out = rrf_fuse({"a": a, "b": b}, id_col="doc_id", k=4, c=60).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 10: 1e9//61 + 1e9//62; doc 20 identical sum; tie broken by id
    s = 10**9 // 61 + 10**9 // 62
    assert by_id[10]["rrf_e9"] == s and by_id[20]["rrf_e9"] == s
    assert [r["doc_id"] for r in out[:2]] == [10, 20]
    assert by_id[30]["rrf_e9"] == 10**9 // 63
    assert by_id[40]["rank_a"] is None and by_id[40]["rank_b"] == 3


def test_blocking_quality_counts(spark):
    # truth groups: {1,2} (same tokens, different order), {3}, {4}
    # block 'first char': 1,3 share 'a...'; 2 'b...'; 4 'c...'
    rows = [
        (1, "aa bb"),
        (2, "bb aa"),
        (3, "aa zz"),
        (4, "cc dd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
    out = blocking_quality(
        df,
        schemes={"first2": F.expr("substring(text, 1, 2)")},
        truth_key=F.expr(f"array_join(array_sort({toks}), ' ')"),
    ).collect()
    r = out[0]
    # blocks: 'aa' -> {1,3}, 'bb' -> {2}, 'cc' -> {4}; cand pairs = 1
    assert r["n_blocks"] == 3 and r["cand_pairs"] == 1
    # true pairs: (1,2); captured: none (1 and 2 in different blocks)
    assert r["true_pairs"] == 1 and r["captured_pairs"] == 0
    assert r["completeness_e6"] == 0
    # reduction: 1 - 1/6
    assert r["reduction_e6"] == 1000000 * 5 // 6


def test_approx_fd_g3(spark):
    # key A: 3 rows, values x,x,y -> max 2, removals 1, violating
    # key B: 2 rows, values z,z -> holds
    rows = [("A", "x"), ("A", "x"), ("A", "y"), ("B", "z"), ("B", "z")]
    df = spark.createDataFrame(rows, "k string, v string")
    r = approx_fd_report(df, "t.k->v", ["k"], "v").collect()[0]
    assert r["n_rows"] == 5 and r["n_keys"] == 2
    assert r["n_violating_keys"] == 1 and r["g3_removals"] == 1
    assert r["g3_e6"] == 1000000 // 5


def _ts(h: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_sessionize_capped_gap_and_cap(spark):
    # user 1: events at 0h,1h,2h then 20h (gap 18h > 8h) -> gap split;
    # user 2: events every 5h from 0h to 30h (all gaps < 8h) -> cap at 24h
    #   splits after the event at 20h is in (25h > 24h from anchor 0h):
    #   anchor 0h, events 0,5,10,15,20 in session 1 (25h breaks: 25-0>24),
    #   session 2 anchor 25h: events 25,30.
    rows = [(1, _ts(0.0)), (1, _ts(1.0)), (1, _ts(2.0)), (1, _ts(20.0))] + [
        (2, _ts(float(h))) for h in range(0, 31, 5)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize_capped(df, group_col="user_id", ts_col="ts", gap_s=8 * 3600, cap_s=24 * 3600)
    got = {(r["user_id"], r["session_n"]): (r["n_events"], r["start_us"], r["end_us"]) for r in out.collect()}
    # the walk reads the SESSION-NAIVE datetime64 values, so expectations
    # are naive-as-epoch too (independent of the host zone)
    us = lambda h: int((_ts(h) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)  # noqa: E731
    assert got[(1, 1)] == (3, us(0), us(2))
    assert got[(1, 2)] == (1, us(20), us(20))
    assert got[(2, 1)] == (5, us(0), us(20))
    assert got[(2, 2)] == (2, us(25), us(30))


def test_sessionize_capped_boundary_inclusive(spark):
    # an event EXACTLY cap seconds after the anchor stays in the session
    # (break requires ts - anchor > cap), matching the oracle recurrence
    rows = [(1, _ts(0.0)), (1, _ts(24.0)), (1, _ts(24.5))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize_capped(df, group_col="user_id", ts_col="ts", gap_s=30 * 3600, cap_s=24 * 3600)
    rows_out = sorted([tuple(r) for r in out.collect()])
    assert rows_out[0][1:3] == (1, 2)  # session 1 has 2 events
    assert rows_out[1][1:3] == (2, 1)  # 24.5h broke (24.5 - 0 > 24)


def test_pmi_collocations_crafted(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import (
        ilog2_fp20,
        pmi_collocations,
    )

    # 'aa bb' occurs 4x (always together); 'cc' pairs with dd/ee evenly
    rows = [(i, "aa bb cc dd cc ee aa bb") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["a"], r["b"]): r for r in pmi_collocations(df, min_count=2, k=10).collect()}
    r = out[("aa", "bb")]
    # bigrams per doc: 7 -> N = 14; aa->bb 4 times; aa first 4, bb second 4
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (4, 4, 4)
    assert r["pmi_fp20"] == ilog2_fp20(14 * 4) - ilog2_fp20(4 * 4)
    # 'bb cc' happens 2x; bb-as-first 2, cc-as-second 4 (bb cc + dd cc)
    r2 = out[("bb", "cc")]
    assert (r2["n_ab"], r2["n_a"], r2["n_b"]) == (2, 2, 4)
    assert r2["pmi_fp20"] == ilog2_fp20(14 * 2) - ilog2_fp20(2 * 4)


def test_mad_outliers_crafted(spark):
    from odp_dynamic_data_pipeline_spark.operators.quality_checks import mad_outliers

    # values 1..9 plus an outlier 1000 (cents): median of 10 values = 5.5
    # -> med_x2 = 11; deviations |x-5.5| = 4.5,3.5,...,3.5,994.5 ->
    # dev_x4 = 2*|2x - 11|; mad = median of devs
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]]
    df = spark.createDataFrame(rows, "g string, cents long")
    r = mad_outliers(df, "g", "cents", k=3).collect()[0]
    assert r["n"] == 10 and r["median_cents_x2"] == 11
    devs4 = sorted(2 * abs(2 * v - 11) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])
    mad4 = (devs4[4] + devs4[5]) // 2  # even count, both even values
    assert r["mad_cents_x4"] == mad4
    assert r["n_outliers"] == sum(1 for d in devs4 if d > 3 * mad4)
    assert r["max_dev_x4"] == devs4[-1]


def test_weighted_median_crafted(spark):
    from odp_dynamic_data_pipeline_spark.operators.aggregate import weighted_median

    # prices 10 (w 1), 20 (w 2), 30 (w 7): total 10, half 5 -> cum at 30
    # reaches 10 >= 5... cum: 10->1, 20->3, 30->10; first 2*cum >= 10 is 30
    rows = [("g", 10, 1), ("g", 20, 2), ("g", 30, 7), ("h", 5, 4), ("h", 9, 1)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    out = {r["g"]: r for r in weighted_median(df, ["g"], "v", "w").collect()}
    assert out["g"]["wmedian"] == 30 and out["g"]["total_w"] == 10
    # h: cum 5->4 (2*4 >= 5) -> wmedian 5
    assert out["h"]["wmedian"] == 5 and out["h"]["n_distinct_values"] == 2


def test_incremental_upsert_out_of_order_and_retry(spark, tmp_path):
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_upsert_batch,
        read_incremental_upsert,
    )

    store = f"{tmp_path}/store"
    mk = lambda rows: spark.createDataFrame(rows, "k long, seq long, val string")  # noqa: E731
    # batch 0 carries the NEWEST rows; batch 1 older + a new key: last-wins
    # by seq must hold regardless of arrival order
    apply_incremental_upsert_batch(
        mk([(1, 10, "new1"), (2, 20, "new2"), (1, 9, "mid1")]), 0, store,
        key_cols=["k"], seq_cols=["seq"], n_buckets=8,
    )
    apply_incremental_upsert_batch(
        mk([(1, 5, "old1"), (3, 1, "only3"), (2, 25, "newer2")]), 1, store,
        key_cols=["k"], seq_cols=["seq"], n_buckets=8,
    )
    # post-flip retry of batch 1: identical result
    apply_incremental_upsert_batch(
        mk([(1, 5, "old1"), (3, 1, "only3"), (2, 25, "newer2")]), 1, store,
        key_cols=["k"], seq_cols=["seq"], n_buckets=8,
    )
    got = {r["k"]: (r["seq"], r["val"]) for r in read_incremental_upsert(spark, store).collect()}
    assert got == {1: (10, "new1"), 2: (25, "newer2"), 3: (1, "only3")}


def test_incremental_upsert_seq_tiebreak(spark, tmp_path):
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_upsert_batch,
        read_incremental_upsert,
    )

    store = f"{tmp_path}/store"
    mk = lambda rows: spark.createDataFrame(rows, "k long, seq long, tie long, val string")  # noqa: E731
    apply_incremental_upsert_batch(
        mk([(1, 10, 1, "a"), (1, 10, 2, "b")]), 0, store,
        key_cols=["k"], seq_cols=["seq", "tie"], n_buckets=4,
    )
    [r] = read_incremental_upsert(spark, store).collect()
    assert (r["tie"], r["val"]) == (2, "b")  # deterministic tiebreak on the 2nd seq col


def test_pr_curve_crafted(spark):
    from odp_dynamic_data_pipeline_spark.operators.quality_checks import pr_curve

    # scores 0..9 in a [0, 10) domain with 5 buckets (width 2);
    # labels: positives at scores 6..9
    rows = [(s, s >= 6) for s in range(10)]
    df = spark.createDataFrame(rows, "score long, lab boolean")
    out = {r["threshold_e6"]: r for r in pr_curve(df, "score", "lab", lo=0, hi=10, n_buckets=5).collect()}
    # threshold 8 (bucket 4): scores 8,9 -> n_ge 2, tp 2, precision 1.0, recall 2/4
    assert (out[8]["n_ge"], out[8]["tp_ge"]) == (2, 2)
    assert out[8]["precision_e6"] == 1000000 and out[8]["recall_e6"] == 500000
    # threshold 4 (bucket 2): scores 4..9 -> n 6, tp 4 -> precision 4/6, recall 1.0
    assert (out[4]["n_ge"], out[4]["tp_ge"]) == (6, 4)
    assert out[4]["precision_e6"] == 4 * 1000000 // 6 and out[4]["recall_e6"] == 1000000
    # threshold 0: everything -> precision = base rate
    assert out[0]["n_ge"] == 10 and out[0]["precision_e6"] == 400000


def test_winsorized_stats_crafted(spark):
    from odp_dynamic_data_pipeline_spark.operators.aggregate import winsorized_stats

    # 1..10: nearest-rank p10 bound = ceil(0.1*10)=1st value -> 1;
    # p90 = 9th value -> 9; clip 10 -> 9
    rows = [("g", v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = winsorized_stats(df, ["g"], "v", p_lo=10, p_hi=90).collect()[0]
    assert (r["lo_bound"], r["hi_bound"]) == (1, 9)
    assert (r["n_clipped_low"], r["n_clipped_high"]) == (0, 1)
    assert r["wins_sum"] == sum(range(1, 10)) + 9  # 10 clipped to 9
    assert r["wins_mean_e6"] == 1000000 * r["wins_sum"] // 10


def test_sessionize_capped_buckets_mode_identical(spark):
    # buckets=N reshapes the Arrow stage, never the result
    rows = [(u, _ts(float(h + u))) for u in range(7) for h in range(0, 40, 5)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    kw = dict(group_col="user_id", ts_col="ts", gap_s=6 * 3600, cap_s=20 * 3600)
    a = {tuple(r) for r in sessionize_capped(df, **kw).collect()}
    b = {tuple(r) for r in sessionize_capped(df, buckets=3, **kw).collect()}
    assert a == b and len(a) > 7


def test_pr_curve_degenerate_domain_raises(spark):
    import pytest

    from odp_dynamic_data_pipeline_spark.operators.quality_checks import pr_curve

    df = spark.createDataFrame([(1, True)], "score long, lab boolean")
    with pytest.raises(ValueError, match="n_buckets"):
        pr_curve(df, "score", "lab", lo=0, hi=5, n_buckets=10)


def test_retrieval_eval_empty_corpus_raises(spark):
    import pytest

    from odp_dynamic_data_pipeline_spark.operators.ranking import retrieval_eval

    docs = spark.createDataFrame([], "doc_id string, text string")
    with pytest.raises(ValueError, match="empty"):
        retrieval_eval(docs, queries={"q1": ["hello"]})


def test_blocking_quality_null_truth_not_an_entity(spark):
    # Two NULL-truth rows share a block: they must NOT count as a true
    # pair (or a captured pair), but they DO stay in n_docs/cand space.
    rows = [
        (1, "e1", "blk"),
        (2, "e1", "blk"),
        (3, None, "blk"),
        (4, None, "blk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ent string, blk string")
    r = blocking_quality(
        df, schemes={"s": F.col("blk")}, truth_key=F.col("ent")
    ).collect()[0]
    # truth pairs: only (1,2); the two NULL rows are unlabeled
    assert r["true_pairs"] == 1 and r["captured_pairs"] == 1
    # candidate space counts all 4 docs: one block of 4 -> C(4,2)=6 pairs
    assert r["cand_pairs"] == 6 and r["reduction_e6"] == 0
    assert r["completeness_e6"] == 1000000


def test_upsert_delete_tombstone_blocks_resurrection(spark, tmp_path):
    """A winning DELETE must be retained as a tombstone: a LATE batch
    carrying a lower-seq update for the same key must NOT resurrect it.
    The live read filters the tombstone; expire_upsert_tombstones then
    reclaims it (and only then), dropping emptied buckets from the map."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_upsert_batch,
        expire_upsert_tombstones,
        read_incremental_upsert,
    )

    store = f"{tmp_path}/store"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, seq long, val string, del boolean"
    )
    # batch 0: k=1 deleted at seq 5; k=2 live at seq 1
    apply_incremental_upsert_batch(
        mk([(1, 5, "x", True), (2, 1, "two", False)]), 0, store,
        key_cols=["k"], seq_cols=["seq"], n_buckets=4, delete_col="del",
    )
    # batch 1 (LATE, out of order): k=1 update with seq 3 < 5
    apply_incremental_upsert_batch(
        mk([(1, 3, "late", False)]), 1, store,
        key_cols=["k"], seq_cols=["seq"], n_buckets=4, delete_col="del",
    )
    live = {r["k"]: r["val"] for r in
            read_incremental_upsert(spark, store, delete_col="del").collect()}
    assert live == {2: "two"}  # k=1 stays deleted -- no resurrection
    raw = {r["k"]: (r["seq"], r["del"]) for r in
           read_incremental_upsert(spark, store).collect()}
    assert raw[1] == (5, True)  # the tombstone is physically retained
    # expiry reclaims exactly the tombstone; live view unchanged
    assert expire_upsert_tombstones(
        spark, store, key_cols=["k"], delete_col="del", n_buckets=4
    ) == 1
    raw2 = {r["k"] for r in read_incremental_upsert(spark, store).collect()}
    assert raw2 == {2}
    live2 = {r["k"]: r["val"] for r in
             read_incremental_upsert(spark, store, delete_col="del").collect()}
    assert live2 == {2: "two"}
    # idempotent: nothing left to expire
    assert expire_upsert_tombstones(
        spark, store, key_cols=["k"], delete_col="del", n_buckets=4
    ) == 0
    # folds keep working on the compacted store: a fresh higher-seq update
    # re-creates k=1 cleanly
    apply_incremental_upsert_batch(
        mk([(1, 9, "back", False)]), 2, store,
        key_cols=["k"], seq_cols=["seq"], n_buckets=4, delete_col="del",
    )
    live3 = {r["k"]: r["val"] for r in
             read_incremental_upsert(spark, store, delete_col="del").collect()}
    assert live3 == {1: "back", 2: "two"}


def test_expire_tombstones_drops_emptied_buckets(spark, tmp_path):
    """A bucket whose rows are ALL tombstones vanishes from the bucket
    map after expiry (an unmapped bucket reads as absent), while buckets
    without tombstones keep their existing version mapping untouched."""
    from odp_dynamic_data_pipeline_spark.streaming.kvstore import ManifestStore
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_upsert_batch,
        expire_upsert_tombstones,
        read_incremental_upsert,
    )

    store = f"{tmp_path}/store"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, seq long, del boolean"
    )
    # many keys so several buckets exist; delete EVERY key in the batch
    # except k=0 (k=0's bucket keeps a survivor)
    rows = [(k, 1, k != 0) for k in range(20)]
    apply_incremental_upsert_batch(
        mk(rows), 0, store, key_cols=["k"], seq_cols=["seq"], n_buckets=4,
        delete_col="del",
    )
    before = ManifestStore(spark, store, n_extras=2).read_manifest()
    assert expire_upsert_tombstones(
        spark, store, key_cols=["k"], delete_col="del", n_buckets=4
    ) == 19
    after = ManifestStore(spark, store, n_extras=2).read_manifest()
    assert set(after.cur_map) <= set(before.cur_map)
    got = {r["k"] for r in read_incremental_upsert(spark, store).collect()}
    assert got == {0}


def test_expire_then_vacuum_never_strands_pre_expire_reader(spark, tmp_path):
    """Expire is a manifest flip like any fold: a reader that resolved the
    PRE-expire manifest must still collect its consistent old view (raw,
    tombstones included) after expire + vacuum run -- expire writes a new
    version and flips, vacuum retains current + parent, and the pre-expire
    current IS the new parent."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_upsert_batch,
        expire_upsert_tombstones,
        read_incremental_upsert,
        vacuum_incremental_kv,
    )

    store = f"{tmp_path}/store"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k long, seq long, del boolean"
    )
    apply_incremental_upsert_batch(
        mk([(1, 5, True), (2, 1, False), (3, 2, False)]), 0, store,
        key_cols=["k"], seq_cols=["seq"], n_buckets=4, delete_col="del",
    )
    reader = read_incremental_upsert(spark, store)  # pre-expire manifest
    assert expire_upsert_tombstones(
        spark, store, key_cols=["k"], delete_col="del", n_buckets=4
    ) == 1
    vacuum_incremental_kv(spark, store)
    got = {r["k"] for r in reader.collect()}
    assert got == {1, 2, 3}  # the old raw view, tombstone included
    assert {r["k"] for r in read_incremental_upsert(spark, store).collect()} == {2, 3}
