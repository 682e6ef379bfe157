"""kmv_sketch / kmv_merge (k-minimum-values distinct sketch): merge
algebra (shard sketches fold to the global sketch exactly), exact-below-k
behavior, estimate accuracy, determinism; cross_duplicate_spans
(span-level decontamination) crafted-doc semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.text import (
    cross_duplicate_spans,
    kmv_merge,
    kmv_sketch,
)


def _ids(spark, n, offset=0):
    return spark.range(offset, offset + n).select(F.col("id").alias("v"))


def test_exact_below_k_and_deterministic(spark):
    df = _ids(spark, 40)
    a = kmv_sketch(df, "v", k=64).collect()[0]
    b = kmv_sketch(df, "v", k=64).collect()[0]
    assert a.n_sketch == 40 and a.est_distinct == 40  # exact below k
    assert a.sketch == b.sketch  # deterministic md5, no RNG
    assert a.sketch == sorted(a.sketch)


def test_estimate_within_tolerance_above_k(spark):
    # KMV standard error ~ 1/sqrt(k-2); at k=64 and n=5000 the estimate
    # should land well inside 3 sigma (~38%) -- use 25% as the gate
    df = _ids(spark, 5000)
    r = kmv_sketch(df, "v", k=64).collect()[0]
    assert r.n_sketch == 64
    assert abs(r.est_distinct - 5000) <= 1250, r.est_distinct


def test_merge_of_shard_sketches_equals_global(spark):
    # the mergeability contract: sketch(A union B) == merge(sketch(A),
    # sketch(B)) EXACTLY (k smallest of the union = k smallest of the
    # concatenated k-smallest lists), including overlapping shards
    whole = _ids(spark, 3000)
    s_global = kmv_sketch(whole, "v", k=32).collect()[0]
    shard_a = kmv_sketch(_ids(spark, 2000), "v", k=32)  # ids 0..1999
    shard_b = kmv_sketch(_ids(spark, 2000, offset=1000), "v", k=32)  # 1000..2999
    merged = kmv_merge(shard_a.unionByName(shard_b), k=32).collect()[0]
    assert merged.sketch == s_global.sketch
    assert merged.est_distinct == s_global.est_distinct


def test_grouped_sketch_and_validation(spark):
    df = spark.range(200).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    rows = {r.g: r for r in kmv_sketch(df, "v", k=16, group_cols=["g"]).collect()}
    assert set(rows) == {0, 1} and all(r.n_sketch == 16 for r in rows.values())
    with pytest.raises(ValueError, match="k must"):
        kmv_sketch(df, "v", k=1)


# ---------------------------------------------------------------------------
# cross_duplicate_spans (span-level decontamination)
# ---------------------------------------------------------------------------


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_cross_spans_find_benchmark_leaks_only(spark):
    leak = _words("q", 10)  # a 10-token benchmark passage
    bench = spark.createDataFrame(
        [(100, _words("b", 3) + " " + leak)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, _words("a", 2) + " " + leak + " " + _words("c", 3)),  # leaked
            (2, _words("u", 20)),  # clean
            (3, leak),  # fully leaked
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in cross_duplicate_spans(corpus, bench, min_tokens=8).collect()
    }
    assert got == {(1, 3, 12, 10), (3, 1, 10, 10)}


def test_cross_spans_corpus_internal_dups_ignored(spark):
    # two corpus docs sharing a passage the benchmark does NOT contain:
    # decontamination must stay silent (that is duplicate_spans' job)
    shared = _words("s", 9)
    bench = spark.createDataFrame([(100, _words("b", 12))], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, shared), (2, shared)], "doc_id long, text string"
    )
    assert cross_duplicate_spans(corpus, bench, min_tokens=8).count() == 0


# ---------------------------------------------------------------------------
# run_incremental_kmv (streaming twin)
# ---------------------------------------------------------------------------


def test_incremental_kmv_final_equals_batch(spark, tmp_path):
    import json
    import os
    import time

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
    from odp_dynamic_data_pipeline_spark.streaming.stream import run_incremental_kmv

    schema = StructType(
        [StructField("g", StringType()), StructField("v", LongType())]
    )
    b0 = [{"g": "x", "v": i} for i in range(300)]
    b1 = [{"g": "x", "v": i} for i in range(150, 450)] + [
        {"g": "y", "v": i} for i in range(20)
    ]
    d = tmp_path / "kmv_in"
    d.mkdir()
    now = time.time()
    for i, rows in enumerate([b0, b1]):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (now - 60 + 30 * i, now - 60 + 30 * i))
    stream = read_file_stream(
        spark, str(d), schema, multiline=False, max_files_per_trigger=1
    )
    store, out = str(tmp_path / "kmv_store"), str(tmp_path / "kmv_out")
    run_incremental_kmv(
        stream, store, out, checkpoint=str(tmp_path / "kmv_ck"),
        col="v", k=32, group_cols=["g"],
    )
    # final batch's merged sketch == one-shot batch sketch on the union
    # (overlapping batches on purpose: order-independence must dedupe)
    final = {
        r.g: (r.sketch, r.n_sketch, r.est_distinct)
        for r in spark.read.parquet(f"{out}/batch_id=1").collect()
    }
    union = spark.createDataFrame(
        [(r["g"], r["v"]) for r in b0 + b1], "g string, v long"
    )
    want = {
        r.g: (r.sketch, r.n_sketch, r.est_distinct)
        for r in kmv_sketch(union, "v", k=32, group_cols=["g"]).collect()
    }
    assert final == want
    assert final["y"][1] == 20 and final["y"][2] == 20  # below-k exact
    # the evolving series: batch 0's estimate only saw batch 0
    first = {
        r.g: r.est_distinct
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    b0_only = {
        r.g: r.est_distinct
        for r in kmv_sketch(
            spark.createDataFrame([(r["g"], r["v"]) for r in b0], "g string, v long"),
            "v", k=32, group_cols=["g"],
        ).collect()
    }
    assert first == b0_only


# ---------------------------------------------------------------------------
# kmv_overlap (Theta-sketch set algebra)
# ---------------------------------------------------------------------------

from odp_dynamic_data_pipeline_spark.operators.text import kmv_overlap  # noqa: E402


def test_overlap_exact_below_k_and_accuracy(spark):
    # groups small enough that sketches are exhaustive: estimates are EXACT
    rows = (
        [("a", i) for i in range(30)]
        + [("b", i) for i in range(20, 50)]  # |a ∩ b| = 10, |a ∪ b| = 50
        + [("c", i) for i in range(100, 110)]  # disjoint from both
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        (r.g_a, r.g_b): (r.est_union, r.n_common, r.est_inter, r.est_jaccard_e6)
        for r in kmv_overlap(df, "v", "g", k=64).collect()
    }
    assert got[("a", "b")] == (50, 10, 10, 200_000)  # J = 10/50 exactly
    assert got[("a", "c")][1] == 0 and got[("a", "c")][2] == 0
    assert got[("b", "c")][3] == 0


def test_overlap_estimates_above_k_within_tolerance(spark):
    # 3000-element groups with 50% overlap at k=64: KMV jaccard std err
    # ~ sqrt(J(1-J)/k) ~ 6%; union std err ~ 1/sqrt(k-2) ~ 13%. 3-sigma
    # gates.
    rows = [("a", i) for i in range(3000)] + [("b", i) for i in range(1500, 4500)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_overlap(df, "v", "g", k=64).collect()[0]
    assert abs(r.est_union - 4500) <= 1800
    assert abs(r.est_jaccard_e6 - 333_333) <= 200_000
    assert abs(r.est_inter - 1500) <= 1000


def test_overlap_validation(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    import pytest

    with pytest.raises(ValueError, match="k must"):
        kmv_overlap(df, "v", "g", k=1)


def test_incremental_kmv_store_compaction_estimate_unchanged(spark, tmp_path):
    # folding the min-hash store into batch_id=-1 between runs must leave
    # the merged sketch (k smallest distinct of the union) identical
    import json as _json
    import os as _os
    import time as _time

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        compact_incremental_store,
        run_incremental_kmv,
    )

    schema = StructType([StructField("g", StringType()), StructField("v", LongType())])
    d = tmp_path / "kc_in"
    d.mkdir()
    now = _time.time()

    def _drop(name, rows, age):
        p = d / name
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        _os.utime(p, (now - age, now - age))

    _drop("b0.json", [{"g": "x", "v": i} for i in range(200)], 60)
    store, out, ck = (
        str(tmp_path / "kc_store"),
        str(tmp_path / "kc_out"),
        str(tmp_path / "kc_ck"),
    )
    stream = read_file_stream(spark, str(d), schema, multiline=False)
    run_incremental_kmv(stream, store, out, checkpoint=ck, col="v", k=32, group_cols=["g"])
    assert compact_incremental_store(spark, f"{store}/mins") == 1
    _drop("b1.json", [{"g": "x", "v": i} for i in range(100, 300)], 20)
    stream2 = read_file_stream(spark, str(d), schema, multiline=False)
    run_incremental_kmv(stream2, store, out, checkpoint=ck, col="v", k=32, group_cols=["g"])
    batches = sorted(
        int(p.split("=")[1]) for p in _os.listdir(out) if p.startswith("batch_id=")
    )
    final = spark.read.parquet(f"{out}/batch_id={batches[-1]}").collect()[0]
    union = spark.createDataFrame([("x", i) for i in range(300)], "g string, v long")
    want = kmv_sketch(union, "v", k=32, group_cols=["g"]).collect()[0]
    assert final.sketch == want.sketch and final.est_distinct == want.est_distinct


# ---------------------------------------------------------------------------
# ungrouped two-level (shard-then-fold) path -- VERDICT r8 item 2
# ---------------------------------------------------------------------------


def test_ungrouped_two_level_bit_identical(spark):
    # the shard/fold rewrite must equal the naive global top-k EXACTLY,
    # across awkward partition layouts (including partitions with < k rows)
    for n, parts, k in [(5000, 16, 64), (40, 7, 64), (300, 1, 16), (65, 32, 64)]:
        df = _ids(spark, n).repartition(parts)
        got = kmv_sketch(df, "v", k=k).collect()[0]
        h = F.expr("CAST(conv(substr(md5(CAST(v AS STRING)), 1, 13), 16, 10) AS BIGINT)")
        ref = [r.h for r in df.select(h.alias("h")).distinct().orderBy("h").limit(k).collect()]
        assert got.sketch == ref, (n, parts, k)
        assert got.n_sketch == min(n, k)
        if n >= k:
            assert got.est_distinct == (k - 1) * (1 << 52) // ref[-1]
        else:
            assert got.est_distinct == n


def test_ungrouped_plan_has_no_single_partition_window(spark):
    df = _ids(spark, 100)
    plan = kmv_sketch(df, "v", k=8)._jdf.queryExecution().executedPlan().toString()
    assert "__shard" in plan  # sharded level-1 window
    # every Window node must carry a partition spec: the node prints as
    # "Window [exprs], [partition cols], [order]" when partitioned and
    # "Window [exprs], [order]" when global -- count comma-separated
    # bracket groups per Window line
    for line in plan.splitlines():
        ls = line.strip().lstrip("+-* ")
        if ls.startswith("Window "):
            assert ls.count("], [") >= 2, f"single-partition window: {ls}"


def test_ungrouped_empty_input(spark):
    empty = spark.range(0).select(F.col("id").alias("v"))
    r = kmv_sketch(empty, "v", k=8).collect()[0]
    assert list(r.sketch) == [] and r.n_sketch == 0 and r.est_distinct == 0


def test_k_upper_bound_validation(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="2048"):
        kmv_sketch(df, "v", k=4096)
    with pytest.raises(ValueError, match="2048"):
        kmv_merge(df.select(F.array(F.lit(1)).alias("sketch")), k=4096)
    with pytest.raises(ValueError, match="2048"):
        kmv_overlap(df, "v", "g", k=4096)
