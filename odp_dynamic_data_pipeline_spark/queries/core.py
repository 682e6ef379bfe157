"""Reference-shaped + relational query surface (SURVEY.md section 2).

Each query maps a reference operator family onto the driver testdata
(FIXTURES.md section 2): events plays the user_exp stream (user_id=clientId,
event_type=eventType), the star schema plays the correlation joins, and
documents/embeddings host the LLM-data operators (queries.llm).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.aggregate import conditional_counts
from odp_dynamic_data_pipeline_spark.operators.enrich import enrich
from odp_dynamic_data_pipeline_spark.operators.mappings import extract_mapping
from odp_dynamic_data_pipeline_spark.queries import register
from odp_dynamic_data_pipeline_spark.sources.catalog import load_table


def _cents(col: str) -> Column:
    """double -> exact integer cents (both engines round identically away
    from .5-free inputs; source doubles carry <=2 decimals)."""
    return F.expr(f"CAST(ROUND({col} * 100, 0) AS BIGINT)")


# ---------------------------------------------------------------------------
# W1/W2 + A1-A4: the flagship TLB-style session metrics
# (reference: src/batch_tlb.py:20-85)
# ---------------------------------------------------------------------------

TLB_ORACLE = """
WITH w AS (
  SELECT user_id, event_id, event_type, ts,
         MAX(CASE WHEN event_type = 'view' THEN ts END) OVER win AS prev_start,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER win AS prev_end
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), d AS (
  SELECT user_id, event_type,
         CASE WHEN event_type = 'purchase' AND prev_start IS NOT NULL
                   AND (prev_end IS NULL OR prev_start > prev_end)
              THEN epoch_us(ts) - epoch_us(prev_start) END AS dur_us
  FROM w
)
SELECT user_id,
       CAST(COALESCE(SUM(dur_us), 0) AS DOUBLE) / 1000000.0 AS page_view_time,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_count,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_count,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click_count
FROM d
GROUP BY user_id
"""


@register("tlb_session_metrics", TLB_ORACLE)
def tlb_session_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-view pairing (W2 register semantics: 'view' starts/overwrites,
    'purchase' consumes-once, unmatched ends ignored) + per-user conditional
    counts with zero defaults (A2/A4).

    Window identity: the register is live iff the latest prior start is newer
    than the latest prior end; see operators.sessionize."""
    ev = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_start = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(win)
    prev_end = F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(win)
    emit = (
        (F.col("event_type") == "purchase")
        & prev_start.isNotNull()
        & (prev_end.isNull() | (prev_start > prev_end))
    )
    dur_us = F.when(emit, F.unix_micros(F.col("ts")) - F.unix_micros(prev_start))
    return (
        ev.withColumn("dur_us", dur_us)
        .groupBy("user_id")
        .agg(
            (F.coalesce(F.sum("dur_us"), F.lit(0)).cast("double") / F.lit(1000000.0)).alias(
                "page_view_time"
            ),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("error_count"),
            F.count(F.when(F.col("event_type") == "signup", 1)).alias("signup_count"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("click_count"),
        )
    )


def _replay_stream(spark: SparkSession, df: DataFrame, tmp: str):
    """Materialize a batch DataFrame to parquet and re-read it as a file
    STREAM -- the local stand-in for the production file-arrival source, so
    streaming queries can be driver-checked against batch oracles."""
    src = f"{tmp}/in"
    df.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(df.schema).parquet(src)


_STREAM_TMP_ROOT: str | None = None


def _stream_tmpdir(name: str) -> str:
    """Scratch dir for a streaming-twin query.  One session-scoped root,
    removed at interpreter exit; the per-query subdir is WIPED at the start
    of each invocation (a reused checkpoint would make AvailableNow skip
    already-seen files and silently drop rows), so repeated bench/parity
    runs hold one run's worth of disk instead of accumulating mkdtemp
    orphans.  Cleanup cannot happen at the END of a call: the returned
    DataFrame lazily reads the stream's parquet output."""
    global _STREAM_TMP_ROOT
    import atexit
    import os
    import shutil
    import tempfile

    if _STREAM_TMP_ROOT is None:
        _STREAM_TMP_ROOT = tempfile.mkdtemp(prefix="odp_stream_twins_")
        atexit.register(shutil.rmtree, _STREAM_TMP_ROOT, ignore_errors=True)
    d = os.path.join(_STREAM_TMP_ROOT, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


@contextmanager
def _stream_shuffle(spark: SparkSession, n: int = 8):
    """Cap shuffle (= state store) partitions while a local replay stream
    runs: every state-store partition pays provider init + delta-file I/O
    per micro-batch, which dominates these seconds-long AvailableNow
    catch-ups.  The partition count is baked into each checkpoint at stream
    start, and these queries use fresh single-run checkpoints, so capping
    is safe here; a production deployment sizes it to the cluster instead.
    Restores the session value afterwards (the batch plans around the
    stream keep the session's parallelism)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@register("tlb_session_metrics_stream", TLB_ORACLE)
def tlb_session_metrics_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of tlb_session_metrics, checked against the SAME
    oracle: events replayed through the file-stream source, page-view
    pairing done by pair_page_views_stream (register in the state store,
    Trigger.AvailableNow -- SURVEY section 2.7 W2), then the per-user
    conditional counts joined on.  A green row here is the driver-verified
    proof that stream == batch == oracle for the stateful operator.

    Durations cross the stream boundary as exact integer microseconds and
    are divided once after the batch sum, so the double result is
    bit-identical to the batch path."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        pair_page_views_stream,
        run_available_now,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    tmp = _stream_tmpdir("tlb_stream")
    out, ckpt = f"{tmp}/pairs", f"{tmp}/ckpt"
    stream = _replay_stream(spark, ev, tmp)
    pairs = pair_page_views_stream(
        stream,
        group_col="user_id",
        ts_col="ts",
        type_col="event_type",
        start_type="view",
        end_type="purchase",
        order_cols=["ts", "event_id"],
        group_type="bigint",
        duration_unit="us",
    )
    with _stream_shuffle(spark):
        run_available_now(pairs, format="parquet", query_name="", path=out, checkpoint=ckpt)
    pair_durs = (
        spark.read.schema("user_id bigint, end_ts timestamp, dur_us long")
        .parquet(out)
        .groupBy("user_id")
        .agg(F.sum("dur_us").alias("dur_us"))
    )
    counts = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("error_count"),
        F.count(F.when(F.col("event_type") == "signup", 1)).alias("signup_count"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click_count"),
    )
    return counts.join(pair_durs, "user_id", "left").select(
        "user_id",
        (F.coalesce(F.col("dur_us"), F.lit(0)).cast("double") / F.lit(1000000.0)).alias(
            "page_view_time"
        ),
        "error_count",
        "signup_count",
        "click_count",
    )


@register(
    "hourly_event_counts_stream",
    """
SELECT date_trunc('hour', ts) AS hour_ts, event_type,
       COUNT(*) AS n_events
FROM events GROUP BY hour_ts, event_type
""",
)
def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of the hourly aggregation (SURVEY section 2.7
    windowed aggs): events replayed through the file-stream source, tumbling
    1-hour windows with a watermark, Trigger.AvailableNow in complete mode,
    checked against the batch GROUP BY date_trunc oracle.  Proves the
    window/watermark path end-to-end, not just unit-level."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_available_now,
        windowed_event_counts,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    tmp = _stream_tmpdir("hourly_stream")
    stream = _replay_stream(spark, ev, tmp)
    counts = windowed_event_counts(
        stream, ts_col="ts", window="1 hour", watermark="2 hours", group_cols=["event_type"]
    )
    with _stream_shuffle(spark):
        run_available_now(
            counts,
            query_name="hourly_counts_stream_mem",
            checkpoint=f"{tmp}/ckpt",
            output_mode="complete",
        )
    return spark.table("hourly_counts_stream_mem").select(
        F.col("window.start").alias("hour_ts"), "event_type", "n_events"
    )


@register(
    "incremental_dedup_stream",
    r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) FROM documents WHERE doc_id % 3 = 0
),
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
  FROM corpus
)
SELECT MIN(doc_id) AS doc_id, fingerprint
FROM fp GROUP BY fingerprint
""",
)
def incremental_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING corpus ingestion == batch dedup, driver-verified: the
    corpus (documents plus an UPPERCASED echo of every third document, so
    real normalized duplicates exist and land in the LATER batch) is
    replayed as TWO micro-batches (doc_id split, one file per trigger,
    oldest-first), through run_incremental_dedup's persistent fingerprint
    store with the deterministic keep-min-doc_id policy.  The surviving
    (doc_id, fingerprint) set must equal the batch exact-dedup oracle: min
    doc_id per normalized-text md5 -- proving the incremental path drops
    cross-batch duplicates and admits exactly one, earliest, survivor per
    fingerprint."""
    import glob
    import os
    import shutil

    from odp_dynamic_data_pipeline_spark.streaming.stream import run_incremental_dedup

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = base.unionAll(
        base.where(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), F.upper("text").alias("text")
        )
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = (lo + hi) // 2
    tmp = _stream_tmpdir("incdedup_stream")
    src = f"{tmp}/in"
    os.makedirs(src)
    # one file per batch, mtimes forcing oldest-first = ascending doc_id
    for i, pred in enumerate((F.col("doc_id") <= cut, F.col("doc_id") > cut)):
        part_dir = f"{tmp}/part{i}"
        docs.where(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
        (part_file,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(part_file, dst)
        os.utime(dst, (1_700_000_000 + i * 600, 1_700_000_000 + i * 600))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_dedup(
            stream,
            f"{tmp}/store",
            f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            order_col="doc_id",
        )
    return spark.read.parquet(f"{tmp}/out").select("doc_id", "fingerprint")


@register(
    "incremental_agg_stream",
    """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
""",
)
def incremental_agg_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL materialized aggregate == batch aggregate, driver-
    verified: events replayed as multiple micro-batches folded into
    run_incremental_agg's versioned store (manifest-flip exactly-once), the
    final store version checked against the one-shot batch GROUP BY oracle.
    Sums travel in exact integer cents, so equality is bitwise."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        read_incremental_agg,
        run_incremental_agg,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("ts", "event_type", _cents("value").alias("cents"))
        .repartition(4)
    )
    tmp = _stream_tmpdir("incagg_stream")
    src = f"{tmp}/in"
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_agg(
            stream,
            f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            key_cols=["event_type"],
            sum_col="cents",
        )
    return read_incremental_agg(spark, f"{tmp}/store").select(
        "event_type", "n", F.col("sum_cents").cast("long").alias("sum_cents")
    )


@register(
    "incremental_agg_bucketed_stream",
    """
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events WHERE user_id IS NOT NULL GROUP BY user_id
""",
)
def incremental_agg_bucketed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKETED delta-merge materialized aggregate == batch aggregate,
    driver-verified: per-USER totals (a large keyspace, the case the
    legacy whole-rewrite store is wrong for) folded across micro-batches
    with run_incremental_agg(n_buckets=64) -- each batch reads and
    rewrites ONLY the key-hash buckets it touches, and the manifest's
    bucket->version map assembles the final store across version
    directories.  The final read is checked against the one-shot batch
    GROUP BY oracle; integer cents make equality bitwise.  Together with
    incremental_agg_stream (legacy path, same fold algebra) this pins
    both store protocols against the same semantics."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        read_incremental_agg,
        run_incremental_agg,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("ts", "user_id", _cents("value").alias("cents"))
        .repartition(4)
    )
    tmp = _stream_tmpdir("incaggbk_stream")
    src = f"{tmp}/in"
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_agg(
            stream,
            f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            key_cols=["user_id"],
            sum_col="cents",
            n_buckets=64,
        )
    return read_incremental_agg(spark, f"{tmp}/store").select(
        "user_id", "n", F.col("sum_cents").cast("long").alias("sum_cents")
    )


@register(
    "stream_stream_join_pairs",
    """
SELECT l.event_id AS view_id, r.event_id AS purchase_id, l.user_id
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'view' AND r.event_type = 'purchase'
 AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
WHERE l.user_id % 3 = 0
""",
)
def stream_stream_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM time-bounded join, driver-verified against the batch
    range-join oracle: views and purchases replayed as two streams, joined
    on user within +/-30 minutes of event time (watermarks on both sides
    bound the join state -- SURVEY section 2.7), AvailableNow to parquet.
    The deterministic user thinning keeps the pair count proportional
    rather than quadratic in scale factor."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_available_now,
        stream_stream_join,
    )

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 3 == 0)
    tmp = _stream_tmpdir("ssj_stream")
    views = _replay_stream(
        spark,
        ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts"),
        f"{tmp}/v",
    )
    purchases = _replay_stream(
        spark,
        ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts"),
        f"{tmp}/p",
    )
    joined = stream_stream_join(
        views,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        left_watermark="1 hour",
        right_watermark="1 hour",
        within="30 minutes",
    ).select(
        F.col("event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
        "user_id",
    )
    with _stream_shuffle(spark):
        run_available_now(
            joined, format="parquet", query_name="", path=f"{tmp}/out", checkpoint=f"{tmp}/ckpt"
        )
    return spark.read.schema("view_id bigint, purchase_id bigint, user_id bigint").parquet(
        f"{tmp}/out"
    )


@register(
    "pivot_event_counts",
    """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup
FROM events GROUP BY user_id
""",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide) with an explicit value list -- at scale always
    enumerate pivot values; value discovery is an extra job."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error", "signup"])
        .count()
        .na.fill(0)
    )


@register(
    "customer_order_gaps",
    """
SELECT o_custkey, o_orderkey,
       epoch_us(o_orderdate) - epoch_us(lag(o_orderdate) OVER w) AS gap_us
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window: microseconds since the customer's previous order
    (null for the first)."""
    # o_orderdate reads as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP --
    # the cast is exact under the engine's UTC session timezone
    o = load_table(spark, sf_dir, "orders").withColumn(
        "ots", F.col("o_orderdate").cast("timestamp")
    )
    w = Window.partitionBy("o_custkey").orderBy("ots", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.unix_micros("ots") - F.unix_micros(F.lag("ots").over(w))).alias("gap_us"),
    )


@register(
    "data_quality_report",
    """
SELECT 'not_null:o_custkey' AS check_name,
       COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_violations FROM orders
UNION ALL
SELECT 'condition:positive_price' AS check_name,
       COUNT(CASE WHEN NOT (o_totalprice > 0) THEN 1 END) AS n_violations FROM orders
UNION ALL
SELECT 'unique:o_orderkey' AS check_name,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'ref:o_custkey->c_custkey' AS check_name, COUNT(*) AS n_violations
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
""",
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality sweep (operators.quality_checks): null /
    invariant checks fused into ONE scan, plus uniqueness and referential
    checks with their own shuffles; unioned into a (check, violations)
    report."""
    from odp_dynamic_data_pipeline_spark.operators import quality_checks as qc

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    single = qc.run_single_pass_checks(
        o,
        {
            **qc.violations_not_null(o, ["o_custkey"]),
            **qc.violations_condition(o, "positive_price", F.col("o_totalprice") > 0),
        },
    )
    return qc.union_reports(
        [
            single,
            qc.violations_unique(o, ["o_orderkey"]),
            qc.violations_referential(o, "o_custkey", c, "c_custkey"),
        ]
    )


@register(
    "sessionize_exact_pandas",
    """
WITH w AS (
  SELECT user_id, event_id, event_type, ts,
         MAX(CASE WHEN event_type = 'view' THEN ts END) OVER win AS prev_start,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER win AS prev_end
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, epoch_us(ts) AS end_us, epoch_us(ts) - epoch_us(prev_start) AS dur_us
FROM w
WHERE event_type = 'purchase' AND prev_start IS NOT NULL
  AND (prev_end IS NULL OR prev_start > prev_end)
""",
)
def sessionize_exact_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandas register-walk sessionizer (the reference's literal
    13-line loop, operators.sessionize.pair_page_views_exact) behind the
    oracle gate: the Arrow-batched Python path must produce exactly the
    pairs the window-algebra identity predicts."""
    from odp_dynamic_data_pipeline_spark.operators.sessionize import pair_page_views_exact

    ev = load_table(spark, sf_dir, "events")
    pairs = pair_page_views_exact(
        ev.select(F.col("user_id").cast("string").alias("user_key"), "ts", "event_type"),
        group_col="user_key",
        ts_col="ts",
        type_col="event_type",
        start_type="view",
        end_type="purchase",
        # high-cardinality key: bucket the Arrow stage (see PLANS.md
        # cogroup adjudication -- ~4 ms/group machinery otherwise)
        buckets=64,
    )
    return pairs.select(
        F.col("user_key").cast("long").alias("user_id"),
        F.unix_micros("end_ts").alias("end_us"),
        # duration seconds -> exact integer micros: the true value is an
        # integer count of micros, so rounding undoes the double's last-ulp
        # error; a bare cast would truncate one low
        F.round(F.col("page_view_duration") * 1_000_000, 0).cast("long").alias("dur_us"),
    )


@register(
    "q19_or_pushdown",
    """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 10 AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size <= 20 AND l.l_quantity >= 10 AND l.l_quantity <= 30)
""",
)
def q19_or_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across a join
    -- Catalyst factors the OR into per-side pushable filters."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias("rev_e4"),
    )
    # no broadcast hint: part scales with the corpus (unlike nation/region);
    # the autoBroadcastJoinThreshold/AQE picks broadcast at small scale and
    # falls back to shuffle join at 100 TB instead of OOMing on a forced hint
    j = l.join(p, l["l_partkey"] == p["p_partkey"])
    cond = (
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20)
    ) | (
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20)
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)
    )
    return j.where(cond).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.col("rev_e4").cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias("revenue"),
    )


@register(
    "conditional_counts_by_user",
    """
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY user_id
""",
)
def conditional_counts_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A4: grouped conditional counters (reference:
    src/batch_tlb.py:72-77), map-side-combinable single shuffle."""
    ev = load_table(spark, sf_dir, "events").withColumn("value_cents", _cents("value"))
    t = F.col("event_type")
    return conditional_counts(
        ev,
        "user_id",
        {
            "n_click": t == "click",
            "n_view": t == "view",
            "n_purchase": t == "purchase",
            "n_error": t == "error",
            "n_signup": t == "signup",
        },
        extra_aggs={"sum_value_cents": F.sum("value_cents")},
    ).select(
        "user_id",
        (F.col("n_click") + F.col("n_view") + F.col("n_purchase") + F.col("n_error") + F.col("n_signup")).alias("n_events"),
        "n_click",
        "n_view",
        "n_purchase",
        "n_error",
        "n_signup",
        "sum_value_cents",
    )


# ---------------------------------------------------------------------------
# P3/J1/J2: enrichment joins (reference: src/data_processor.py:100-112)
# ---------------------------------------------------------------------------


@register(
    "enrich_orders_customer",
    """
SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, n.n_name
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
""",
)
def enrich_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two chained broadcast enrichment lookups (orders enriched with
    customer attributes, then nation name) -- the Spark-native replacement
    for the reference's Redis mapping hop."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = enrich(orders, customer, key_col="o_custkey", mapping_key="c_custkey")
    out = enrich(out, nation, key_col="c_nationkey", mapping_key="n_nationkey")
    return out.select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "n_name")


@register(
    "mapping_last_wins",
    """
SELECT user_id AS key,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       event_type
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def mapping_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: mapping extraction with last-writer-wins (reference:
    src/data_processor.py:114-155) -- key=user_id, value from the JSON props
    column (F3) plus event_type, 'last' = latest (ts, event_id)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return extract_mapping(
        ev, "user_id", ["k", "event_type"], order_col=F.struct("ts", "event_id")
    )


@register(
    "nested_spans_roundtrip",
    "SELECT l_orderkey, l_partkey AS partkey FROM lineitem",
)
def nested_spans_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: nested array-of-struct dot-path projection.  Builds a spans-like
    nested table (order -> array<struct<partkey,linenumber>>), projects
    through the array (``spans.l_partkey`` maps over elements, the
    reference's _get_nested_field semantics), explodes back out."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_partkey", "l_linenumber")).alias("spans")
    )
    return nested.select(
        "l_orderkey", F.explode(F.col("spans.l_partkey")).alias("partkey")
    )


@register(
    "correlate_star_3way",
    """
SELECT c.c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_mktsegment
""",
)
def correlate_star_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J6: 3-way inner correlation join, multiplicity-preserving (no
    dedup; reference probes per event, src/batch_tlb.py:65-77)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias("rev_e4"),
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("rev_e4").cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Relational/analytical surface (free in Spark, SURVEY.md sections 2.4-2.5)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS qty_c,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_c,
         CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc_pct,
         CAST(ROUND(l_tax * 100, 0) AS BIGINT) AS tax_pct
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(price_c * (100 - disc_pct)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(price_c * (100 - disc_pct) * (100 + tax_pct)) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(qty_c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
       CAST(SUM(price_c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
       CAST(SUM(disc_pct) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM s GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate.  Filter reaches the parquet
    scan (PushedFilters); one shuffle on a 6-value group key; all arithmetic
    on exact scaled integers."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.expr("TIMESTAMP '1998-09-02 00:00:00'")
    )
    s = li.select(
        "l_returnflag",
        "l_linestatus",
        _cents("l_quantity").alias("qty_c"),
        _cents("l_extendedprice").alias("price_c"),
        _cents("l_discount").alias("disc_pct"),
        _cents("l_tax").alias("tax_pct"),
    )
    agg = s.groupBy("l_returnflag", "l_linestatus").agg(
        # decimal(38,0) accumulators: per-row terms reach 1e11 (charge_e6);
        # an int64 sum overflows past ~1e7 rows per group -- a morning of
        # data at 100 TB.  Exact and order-independent either way.
        F.sum(F.col("qty_c").cast("decimal(38,0)")).alias("sum_qty_c"),
        F.sum(F.col("price_c").cast("decimal(38,0)")).alias("sum_price_c"),
        F.sum((F.col("price_c") * (F.lit(100) - F.col("disc_pct"))).cast("decimal(38,0)")).alias("sum_disc_e4"),
        F.sum(
            (F.col("price_c") * (F.lit(100) - F.col("disc_pct")) * (F.lit(100) + F.col("tax_pct"))).cast("decimal(38,0)")
        ).alias("sum_charge_e6"),
        F.sum(F.col("disc_pct").cast("decimal(38,0)")).alias("sum_disc_pct"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sum_qty_c").cast("double") / F.lit(100.0)).alias("sum_qty"),
        (F.col("sum_price_c").cast("double") / F.lit(100.0)).alias("sum_base_price"),
        (F.col("sum_disc_e4").cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
        (F.col("sum_charge_e6").cast("double") / F.lit(1000000.0)).alias("sum_charge"),
        (F.col("sum_qty_c").cast("double") / F.lit(100.0) / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_price_c").cast("double") / F.lit(100.0) / F.col("count_order")).alias("avg_price"),
        (F.col("sum_disc_pct").cast("double") / F.lit(100.0) / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


@register(
    "q3_shipping_priority",
    """
SELECT l.l_orderkey,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) DESC,
         o.o_orderdate, l.l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective join + top-k.  Deterministic LIMIT via
    integer revenue + orderkey tie-break."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.expr("TIMESTAMP '1997-06-01 00:00:00'")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.expr("TIMESTAMP '1997-06-01 00:00:00'")
    )
    joined = (
        c.select("c_custkey")
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
              c["c_custkey"] == o["o_custkey"])
        .join(
            l.select(
                "l_orderkey",
                (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias("rev_e4"),
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum("rev_e4").alias("rev_e4")
    )
    return (
        agg.orderBy(F.col("rev_e4").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            (F.col("rev_e4").cast("double") / F.lit(10000.0)).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "q5_regional_revenue",
    """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join; dims broadcast, fact shuffles once."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    joined = (
        l.select("l_orderkey", "l_suppkey",
                 (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias("rev_e4"))
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        # customer/supplier scale with the data -- no forced broadcast; the
        # size threshold/AQE broadcasts them while small, shuffles at 100 TB
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s.select("s_suppkey", "s_nationkey"),
            (F.col("s_suppkey") == F.col("l_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        (F.sum(F.col("rev_e4").cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias("revenue")
    )


@register(
    "window_topk_customers",
    """
SELECT c_mktsegment, c_custkey, total_cents, rk FROM (
  SELECT c.c_mktsegment, c.c_custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) DESC,
                    c.c_custkey
         ) AS rk
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
) WHERE rk <= 3
""",
)
def window_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-family: per-group top-k via ranking window over an aggregate."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", _cents("o_totalprice").alias("cents"))
    totals = (
        o.join(c, o["o_custkey"] == c["c_custkey"])  # customer scales: no forced broadcast
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum("cents").alias("total_cents"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("total_cents").desc(), F.col("c_custkey"))
    return (
        totals.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "total_cents", "rk")
    )


@register(
    "running_total_orders",
    """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_cents
FROM orders
""",
)
def running_total_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-family: running aggregate window (ordered, frame-bounded)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_cents("o_totalprice")).over(w).alias("running_cents"),
    )


@register(
    "trailing_30d_revenue",
    """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
         RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_cents
FROM orders
""",
)
def trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: 30-day trailing revenue per customer -- the frame
    is defined by event-time VALUE distance (micros), not row count, so
    same-day orders aggregate together regardless of ordering."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "ts_us", F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ts_us")
        .rangeBetween(-30 * 24 * 3600 * 1_000_000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_cents("o_totalprice")).over(w).alias("trailing_cents"),
    )


@register(
    "customer_quartiles",
    """
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY CAST(ROUND(c_acctbal * 100, 0) AS BIGINT), c_custkey)
""",
)
def customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: ntile + percent_rank over a deterministic total
    order (cents, custkey tie-break)."""
    c = load_table(spark, sf_dir, "customer").withColumn("cents", _cents("c_acctbal"))
    w = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


@register(
    "rollup_revenue",
    """
SELECT COALESCE(r.r_name, 'ALL') AS region_name,
       COALESCE(n.n_name, 'ALL') AS nation_name,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup aggregation (region -> nation -> total)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", _cents("o_totalprice").alias("cents"))
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])  # customer scales: no forced broadcast
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.sum("cents").alias("revenue_cents"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "revenue_cents",
            "n_orders",
        )
    )


@register(
    "set_except_customers",
    """
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: EXCEPT (distinct) -- customers with open but no
    finished orders."""
    o = load_table(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    fin_c = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return open_c.subtract(fin_c)


@register(
    "set_intersect_customers",
    """
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    fin_c = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return open_c.intersect(fin_c)


@register(
    "anti_join_customers",
    """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no pending orders."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_anti")


@register(
    "semi_join_parts",
    """
SELECT p_partkey, p_brand FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
""",
)
def semi_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: parts that appear on a high-quantity lineitem."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45).select(
        F.col("l_partkey").alias("p_partkey")
    )
    return p.join(l, "p_partkey", "left_semi")


@register(
    "cube_order_stats",
    """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over (status, priority) -- all 2^2 grouping sets."""
    o = load_table(spark, sf_dir, "orders").withColumn("cents", _cents("o_totalprice"))
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("total_cents"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_cents",
        )
    )


@register(
    "union_all_activity",
    """
SELECT 'order' AS kind, o_custkey AS entity_id FROM orders
UNION ALL
SELECT 'event' AS kind, user_id AS entity_id FROM events
""",
)
def union_all_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics UNION ALL across heterogeneous sources."""
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"), F.col("o_custkey").alias("entity_id")
    )
    e = load_table(spark, sf_dir, "events").select(
        F.lit("event").alias("kind"), F.col("user_id").alias("entity_id")
    )
    return o.unionAll(e)


@register(
    "scalar_functions",
    """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       split_part(c_name, '#', -1) AS name_suffix,
       CAST(length(c_name) AS INTEGER) AS name_len,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation
FROM customer
""",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (F1/F2-family): case mapping, separator
    split (the Redis key-prefix strip, functions.strip_key_prefix),
    length, templated concatenation."""
    from odp_dynamic_data_pipeline_spark.functions import strip_key_prefix

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        strip_key_prefix(F.col("c_name"), "#").alias("name_suffix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


@register(
    "distinct_nation_stats",
    """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS total_acctbal_cents
FROM customer GROUP BY c_mktsegment
""",
)
def distinct_nation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand+two-phase under the hood)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_cents("c_acctbal")).alias("total_acctbal_cents"),
    )


@register(
    "q12_priority_shipping",
    """
SELECT l.l_linestatus,
       COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + case-conditional counts."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
    ).select("l_orderkey", "l_linestatus")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_share",
    """
WITH j AS (
  SELECT CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)) AS rev_e4,
         p.p_type
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
)
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS DOUBLE) * 100.0
         / CAST(SUM(rev_e4) AS DOUBLE) AS promo_share_pct,
       COUNT(*) AS n_rows
FROM j
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio (promo share)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-09-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-10-01 00:00:00'"))
    ).select(
        "l_partkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))).alias("rev_e4"),
    )
    # no broadcast hint: part scales with the corpus (unlike nation/region);
    # the autoBroadcastJoinThreshold/AQE picks broadcast at small scale and
    # falls back to shuffle join at 100 TB instead of OOMing on a forced hint
    j = l.join(p, l["l_partkey"] == p["p_partkey"])
    return j.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(F.lit(0)).cast("decimal(38,0)")).cast("double")
            * F.lit(100.0)
            / F.sum(F.col("rev_e4").cast("decimal(38,0)")).cast("double")
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q17_small_quantity_revenue",
    """
WITH avgq AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0
         AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l JOIN avgq a ON l.l_partkey = a.l_partkey
WHERE 5 * CAST(ROUND(l.l_quantity * 100, 0) AS BIGINT) * a.n < a.sum_qty_c
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (qty < 0.2 * per-part
    average) rewritten as an aggregate join with an EXACT integer predicate:
    qty < 0.2 * sum/n  <=>  5 * qty * n < sum -- no float threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    avgq = li.groupBy("l_partkey").agg(
        F.sum(_cents("l_quantity")).alias("sum_qty_c"), F.count(F.lit(1)).alias("n")
    )
    j = li.select("l_partkey", _cents("l_quantity").alias("qty_c"), _cents("l_extendedprice").alias("price_c")).join(
        avgq, "l_partkey"
    )
    small = j.where(F.lit(5) * F.col("qty_c") * F.col("n") < F.col("sum_qty_c"))
    return small.agg(
        (F.sum("price_c").cast("double") / F.lit(100.0) / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q18_large_orders",
    """
SELECT o.o_orderkey, o.o_custkey,
       CAST(SUM(CAST(ROUND(l.l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_custkey
HAVING SUM(CAST(ROUND(l.l_quantity * 100, 0) AS BIGINT)) >= 15000
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped join (large-quantity orders)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", _cents("l_quantity").alias("qty_c"))
    g = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.sum("qty_c").alias("sum_qty_c"))
        .where(F.col("sum_qty_c") >= 15000)
    )
    return g.select(
        "o_orderkey", "o_custkey", (F.col("sum_qty_c").cast("double") / F.lit(100.0)).alias("total_qty")
    )


@register(
    "sql_frontend_returns",
    """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
""",
)
def sql_frontend_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL frontend (TPC-H Q10 shape): tables registered as temp views,
    query expressed in Spark SQL text -- same Catalyst plan as the
    DataFrame API, demonstrating the engine's second query surface."""
    from odp_dynamic_data_pipeline_spark.sources.catalog import register_views

    register_views(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        """
    )


APPROX_DISTINCT_ORACLE = """
WITH agg AS (
  SELECT event_type,
         COUNT(DISTINCT user_id) AS exact_users,
         approx_count_distinct(user_id) AS hll,
         approx_quantile(value, 0.5) AS p50,
         approx_quantile(value, 0.95) AS p95,
         COUNT(*) AS n_events,
         COUNT(value) AS n_val
  FROM events GROUP BY event_type
),
rk AS (
  SELECT e.event_type,
         SUM(CASE WHEN e.value <= a.p50 THEN 1 ELSE 0 END) AS le_p50,
         SUM(CASE WHEN e.value <  a.p50 THEN 1 ELSE 0 END) AS lt_p50,
         SUM(CASE WHEN e.value <= a.p95 THEN 1 ELSE 0 END) AS le_p95,
         SUM(CASE WHEN e.value <  a.p95 THEN 1 ELSE 0 END) AS lt_p95
  FROM events e JOIN agg a USING (event_type)
  GROUP BY e.event_type
)
SELECT a.event_type, a.n_events, a.exact_users,
       100 * abs(a.hll - a.exact_users) <= 15 * a.exact_users AS hll_ok,
       (100 * r.le_p50 >= 47 * a.n_val) AND (100 * r.lt_p50 <= 53 * a.n_val) AS p50_ok,
       (100 * r.le_p95 >= 92 * a.n_val) AND (100 * r.lt_p95 <= 98 * a.n_val) AS p95_ok
FROM agg a JOIN rk r USING (event_type)
"""


@register("approx_distinct_stats", APPROX_DISTINCT_ORACLE)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct count, approximate quantiles)
    -- the sketches a 100 TB profiling pass uses instead of exact
    shuffle-heavy versions.

    The sketch VALUES are implementation-defined (Spark HLL++/GK vs DuckDB
    HLL/t-digest), so they cannot hash-match across engines; what CAN is
    the error-bound contract.  The output carries the exact answers plus
    booleans asserting each engine's own sketch lands inside a shared
    bound (HLL within 15 percent relative error -- 3x the default 5
    percent rsd -- and each approximate quantile within 3 rank-percent of
    its target, integer arithmetic on both sides).  The driver hash then
    gates: exact groups match AND both engines' sketches honor the bound
    -- the accuracy check is data, not a skipped column."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("__hll"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("__p50"),
        F.expr("approx_percentile(value, 0.95, 1000)").alias("__p95"),
        F.count(F.lit(1)).alias("n_events"),
        F.count("value").alias("__n_val"),
    )
    rk = (
        ev.join(F.broadcast(agg.select("event_type", "__p50", "__p95")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") <= F.col("__p50")).cast("long")).alias("__le_p50"),
            F.sum((F.col("value") < F.col("__p50")).cast("long")).alias("__lt_p50"),
            F.sum((F.col("value") <= F.col("__p95")).cast("long")).alias("__le_p95"),
            F.sum((F.col("value") < F.col("__p95")).cast("long")).alias("__lt_p95"),
        )
    )
    return agg.join(rk, "event_type").select(
        "event_type",
        "n_events",
        "exact_users",
        (100 * F.abs(F.col("__hll") - F.col("exact_users")) <= 15 * F.col("exact_users")).alias("hll_ok"),
        (
            (100 * F.col("__le_p50") >= 47 * F.col("__n_val"))
            & (100 * F.col("__lt_p50") <= 53 * F.col("__n_val"))
        ).alias("p50_ok"),
        (
            (100 * F.col("__le_p95") >= 92 * F.col("__n_val"))
            & (100 * F.col("__lt_p95") <= 98 * F.col("__n_val"))
        ).alias("p95_ok"),
    )


@register(
    "asof_last_view",
    """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS view_value_cents
      FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS ts_us,
       epoch_us(v.ts) AS view_ts_us,
       v.view_value_cents
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.asof): each purchase matched to the user's most
    recent prior 'view' event -- union + ordered window, no range explosion.
    Oracle: DuckDB's native ASOF JOIN."""
    from odp_dynamic_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", _cents("value").alias("view_value_cents")
    )
    out = asof_join(purchases, views, on="user_id", ts_col="ts", right_ts_alias="view_ts")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("view_ts").alias("view_ts_us"),
        "view_value_cents",
    )


@register(
    "percentile_prices",
    """
SELECT p_brand,
       quantile_cont(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT), 0.25) AS p25,
       quantile_cont(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT), 0.5) AS p50,
       quantile_cont(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT), 0.75) AS p75
FROM part GROUP BY p_brand
""",
)
def percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles over integer cents (both engines use
    the same linear interpolation on identical exact inputs)."""
    p = load_table(spark, sf_dir, "part").withColumn("cents", _cents("p_retailprice"))
    return p.groupBy("p_brand").agg(
        F.expr("percentile(cents, 0.25)").alias("p25"),
        F.expr("percentile(cents, 0.5)").alias("p50"),
        F.expr("percentile(cents, 0.75)").alias("p75"),
    )


@register(
    "stats_moments",
    """
WITH s AS (
  SELECT c_mktsegment, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
), a AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS s1,
         CAST(SUM(cents * cents) AS BIGINT) AS s2
  FROM s GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
       sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0 AS stddev_acctbal
FROM a
""",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample standard deviation from exact integer moments (sum, sum of
    squares) -- deterministic across engines, unlike streaming-update
    stddev implementations whose result depends on accumulation order."""
    c = load_table(spark, sf_dir, "customer").withColumn("cents", _cents("c_acctbal"))
    a = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("s2"),
    )
    n, s1, s2 = F.col("n").cast("double"), F.col("s1").cast("double"), F.col("s2").cast("double")
    return a.select(
        "c_mktsegment",
        "n",
        (F.sqrt((n * s2 - s1 * s1) / (n * (n - F.lit(1.0)))) / F.lit(100.0)).alias("stddev_acctbal"),
    )


@register(
    "salted_join_agg",
    """
SELECT o.o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
)
def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern behind the oracle gate: the fact side carries
    a deterministic salt, the dim side is exploded across all salt values,
    and the join key becomes (key, salt) -- spreading a hot key over N
    partitions.  Result provably identical to the unsalted join (the
    oracle runs the plain join)."""
    salts = 8
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        _cents("l_extendedprice").alias("price_cents"),
        (F.col("l_linenumber") % salts).alias("salt"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.explode(F.array(*[F.lit(i) for i in range(salts)])).alias("salt")
    )
    joined = l.join(o, (l["l_orderkey"] == o["o_orderkey"]) & (l["salt"] == o["salt"]))
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("price_cents").cast("decimal(38,0)")).cast("long").alias("price_cents")
    )


@register(
    "skew_zipf_salted",
    """
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0 ELSE l_orderkey % 10000 END AS k,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents
  FROM lineitem
),
dim AS (
  SELECT DISTINCT o_orderkey % 10000 AS k FROM orders
)
SELECT CAST(d.k % 7 AS BIGINT) AS grp,
       COUNT(*) AS n_rows,
       CAST(SUM(f.price_cents) AS BIGINT) AS price_cents
FROM fact f JOIN dim d ON f.k = d.k
GROUP BY grp
""",
)
def skew_zipf_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under DELIBERATE Zipf-grade skew, behind the oracle gate:
    75 percent of the fact rows collapse onto hot key 0 (the worst single-
    key skew a shuffle join can see), the fact side carries a hash salt,
    the dim side explodes across all salt values, and the join runs as a
    forced SHUFFLE join (hinted -- broadcast would sidestep the skew and
    the demonstration).  The hot key spreads over `salts` partitions
    instead of one; the oracle proves the result identical to the plain
    unsalted join.  Measured wall times for salted vs unsalted vs AQE-skew
    at sf0.1 live in SCALE.md section "Skew".
    """
    salts = 16
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CASE WHEN l_orderkey % 4 <> 0 THEN CAST(0 AS BIGINT) "
            "ELSE l_orderkey % 10000 END"
        ).alias("k"),
        _cents("l_extendedprice").alias("price_cents"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(salts)).alias("salt"),
    )
    dim = (
        load_table(spark, sf_dir, "orders")
        .select((F.col("o_orderkey") % 10000).alias("k"))
        .distinct()
        .select(
            "k",
            F.explode(F.array(*[F.lit(i) for i in range(salts)])).alias("salt"),
        )
        .hint("shuffle_hash")
    )
    joined = li.join(dim, ["k", "salt"])
    return joined.groupBy((F.col("k") % 7).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("price_cents").cast("decimal(38,0)")).cast("long").alias("price_cents"),
    )


@register(
    "q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum; every predicate must reach the
    parquet reader (PushedFilters) -- the 100 TB fast path."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        (F.sum((_cents("l_extendedprice") * _cents("l_discount")).cast("decimal(38,0)")).cast("double") / F.lit(10000.0)).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "session_gap_windows",
    """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 7200000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) + 7200000000 AS session_end_us,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
""",
)
def session_gap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's native session_window (2-hour
    gap) -- the batch twin of streaming.session_window_metrics.  The oracle
    reconstructs the same sessions with lag/cumsum window algebra."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "2 hours"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )


SESSION_GAP_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 7200000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) + 7200000000 AS session_end_us,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
"""


@register("session_gap_windows_stream", SESSION_GAP_ORACLE)
def session_gap_windows_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of session_gap_windows, checked against the SAME
    lag/cumsum oracle: events replayed through the file-stream source,
    native session_window (2-hour gap) merged in the state store across
    micro-batches, Trigger.AvailableNow in complete mode.  The sixth
    stream==batch==oracle family: native session-window state merging
    (distinct from the custom register pairing of
    tlb_session_metrics_stream)."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_available_now,
        session_window_metrics,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    tmp = _stream_tmpdir("sessgap_stream")
    stream = _replay_stream(spark, ev, tmp)
    sess = session_window_metrics(
        stream, ts_col="ts", gap="2 hours", group_col="user_id", watermark="4 hours"
    )
    with _stream_shuffle(spark):
        run_available_now(
            sess,
            query_name="session_gap_stream_mem",
            checkpoint=f"{tmp}/ckpt",
            output_mode="complete",
        )
    return spark.table("session_gap_stream_mem").select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        "n_events",
    )


@register(
    "pipeline_dynamic_enrich",
    """
SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def pipeline_dynamic_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-pipeline compiler end-to-end (plans.pipeline): a two-stage
    YAML-style spec -- stage_a derives a custkey->segment mapping, stage_b
    enriches orders through it -- compiled to one lazy broadcast-join plan."""
    from odp_dynamic_data_pipeline_spark.plans.pipeline import Pipeline

    spec = {
        "pipeline_name": "dynamic_enrich_demo",
        "stages": {
            # declared consumer-first on purpose: order comes from the
            # mapping dependency graph, not dict order
            "stage_b": {
                "input": {"format": "parquet", "path": "{sf_dir}/orders.parquet"},
                "mappings": {"read": [{"name": "cust_to_segment", "key_field": "o_custkey"}]},
            },
            "stage_a": {
                "input": {"format": "parquet", "path": "{sf_dir}/customer.parquet"},
                "mappings": {
                    "write": [{"name": "cust_to_segment", "key": "c_custkey", "value": "c_mktsegment"}]
                },
            },
        },
    }
    outputs, _ = Pipeline(spec).compile(spark, path_vars={"sf_dir": sf_dir})
    return outputs["stage_b"].select("o_orderkey", "o_custkey", "c_mktsegment")


@register(
    "pipeline_stream_stage_enrich",
    """
SELECT o.o_custkey AS custkey,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def pipeline_stream_stage_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YAML compiler's STREAMING stage end-to-end (plans.pipeline,
    ``input.format: stream`` -- the reference runs its stage_1 as a stream
    consumer behind a file sensor, reference yaml:4 /
    src/pipeline_dag.py:26,65-88): orders arrive as JSON files in TWO
    separate drops, a stream stage drains each drop AvailableNow into its
    checkpointed staging table (the second compile ingests ONLY the new
    files -- the file-source checkpoint skips the first drop), the
    orderkey->custkey mapping is extracted from the staged table, and a
    batch stage enriches lineitem through it.  Every lineitem finds its
    order, so the inner-join oracle over the original tables reproduces
    the result exactly IFF neither drop was lost or double-ingested --
    the incremental-ingest contract is what the hash pins."""
    from pyspark.sql.types import LongType, StructField, StructType

    from odp_dynamic_data_pipeline_spark.plans.pipeline import Pipeline

    tmp = _stream_tmpdir("pipeline_stream_stage")
    src = f"{tmp}/src"
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    orders.where(F.col("o_orderkey") % 2 == 0).write.mode("overwrite").json(src)
    spec = {
        "pipeline_name": "stream_stage_demo",
        "stages": {
            "stage_s": {
                "input": {
                    "format": "stream",
                    "stream_format": "json",
                    # Spark's json writer emits JSONL part files, not
                    # multiline arrays
                    "multiline": False,
                    "path": f"{src}/part*.json",
                    "schema": StructType([
                        StructField("o_orderkey", LongType()),
                        StructField("o_custkey", LongType()),
                    ]),
                },
                "mappings": {
                    "write": [{"name": "order_to_cust", "key": "o_orderkey",
                               "value": "o_custkey"}]
                },
            },
            "stage_b": {
                "input": {"format": "parquet", "path": "{sf_dir}/lineitem.parquet"},
                "mappings": {"read": [{"name": "order_to_cust",
                                       "key_field": "l_orderkey"}]},
            },
        },
    }
    pipe = Pipeline(spec)
    work = f"{tmp}/work"
    # drop 1: even orderkeys only -- drains into the staging table
    pipe.compile(spark, path_vars={"sf_dir": sf_dir}, work_dir=work)
    # drop 2: the odd orderkeys land as NEW part files; the same work_dir
    # makes this compile incremental (only the new files are read)
    orders.where(F.col("o_orderkey") % 2 == 1).write.mode("append").json(src)
    outputs, _ = pipe.compile(spark, path_vars={"sf_dir": sf_dir}, work_dir=work)
    return (
        outputs["stage_b"]
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


@register(
    "pipeline_kafka_wire_stream_enrich",
    """
SELECT o.o_custkey AS custkey,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_price_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def pipeline_kafka_wire_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YAML compiler's KAFKA stage end-to-end (plans.pipeline,
    ``input.format: kafka`` -- the reference's declared ingestion intent,
    src/setup.py:4-17 / src/config.py:2-3), proven broker-lessly through
    the wire-REPLAY mode: orders are encoded to the exact Kafka wire schema
    (format_kafka_value + archive metadata) in TWO separate topic dumps, a
    kafka stage decodes each through parse_kafka_value and drains it
    AvailableNow into its checkpointed staging table (the second compile
    ingests ONLY the new archive files), the orderkey->custkey mapping is
    extracted from the staged table, and a batch stage enriches lineitem
    through it.  Every lineitem finds its order, so the inner-join oracle
    reproduces the result exactly IFF no offset was lost or double-ingested
    -- the same incremental-ingest contract as pipeline_stream_stage_enrich,
    now over the Kafka wire path (decode included)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from odp_dynamic_data_pipeline_spark.plans.pipeline import Pipeline
    from odp_dynamic_data_pipeline_spark.sources.writers import format_kafka_value

    tmp = _stream_tmpdir("pipeline_kafka_wire")
    wire_dir = f"{tmp}/wire"
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")

    def _dump(df: DataFrame, mode: str) -> None:
        (
            format_kafka_value(df, key_cols="o_orderkey")
            .withColumn("topic", F.lit("orders"))
            .withColumn("partition", F.lit(0).cast("int"))
            .withColumn("offset", F.monotonically_increasing_id())
            .withColumn("timestamp", F.to_timestamp(F.lit("2024-11-16 12:00:00")))
            .withColumn("timestampType", F.lit(0).cast("int"))
            .write.mode(mode)
            .parquet(wire_dir)
        )

    payload = StructType(
        [StructField("o_orderkey", LongType()), StructField("o_custkey", LongType())]
    )
    spec = {
        "pipeline_name": "kafka_wire_demo",
        "stages": {
            "stage_k": {
                "input": {
                    "format": "kafka",
                    "wire_path": f"{wire_dir}/part*.parquet",
                    "wire_format": "parquet",
                    "schema": payload,
                },
                "mappings": {
                    "write": [{"name": "order_to_cust", "key": "o_orderkey",
                               "value": "o_custkey"}]
                },
            },
            "stage_b": {
                "input": {"format": "parquet", "path": "{sf_dir}/lineitem.parquet"},
                "mappings": {"read": [{"name": "order_to_cust",
                                       "key_field": "l_orderkey"}]},
            },
        },
    }
    pipe = Pipeline(spec)
    work = f"{tmp}/work"
    # dump 1: even orderkeys -- drains into the staging table
    _dump(orders.where(F.col("o_orderkey") % 2 == 0), "overwrite")
    pipe.compile(spark, path_vars={"sf_dir": sf_dir}, work_dir=work)
    # dump 2: odd orderkeys land as NEW archive files; same work_dir =>
    # the checkpointed source reads only the new files
    _dump(orders.where(F.col("o_orderkey") % 2 == 1), "append")
    outputs, _ = pipe.compile(spark, path_vars={"sf_dir": sf_dir}, work_dir=work)
    return (
        outputs["stage_b"]
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_cents("l_extendedprice")).alias("sum_price_cents"),
        )
    )


@register(
    "hour_partition_counts",
    """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
""",
)
def hour_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: hour bucketing -- the reference's ``{hour}`` path token as a
    partition-friendly derived column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour_epoch", F.unix_timestamp(F.date_trunc("hour", F.col("ts"))))
        .groupBy("hour_epoch")
        .agg(F.count(F.lit(1)).alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "hopping_window_counts",
    """
WITH e AS (SELECT epoch_us(ts) AS t_us, CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events),
w AS (
  SELECT ((t_us // 1800000000) - k) * 1800000000 AS win_start_us, t_us, c
  FROM e CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
  WHERE t_us < ((t_us // 1800000000) - k) * 1800000000 + 3600000000
    AND ((t_us // 1800000000) - k) * 1800000000 >= 0
)
SELECT win_start_us, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sum_cents
FROM w GROUP BY win_start_us
""",
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows -- 1-hour windows every 30 minutes, so
    each event lands in exactly two -- via the native window() generator
    (the same operator Structured Streaming uses; here batch, so the
    DuckDB oracle can mirror it with shifted floor-bucket arithmetic)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("value")).alias("sum_cents"),
        )
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"), "n", "sum_cents")
    )


@register(
    "unpivot_event_metrics",
    """
WITH wide AS (
  SELECT user_id,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase
  FROM events GROUP BY user_id
)
SELECT user_id, metric, n FROM wide
UNPIVOT (n FOR metric IN (click, view, purchase))
""",
)
def unpivot_event_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long melt), the inverse of pivot_event_counts:
    Spark's native unpivot/melt against DuckDB's UNPIVOT.  The long form
    is what metric stores and plotting layers consume."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .count()
        .na.fill(0)
    )
    return wide.unpivot("user_id", ["click", "view", "purchase"], "metric", "n")


@register(
    "bitwise_agg_flags",
    """
SELECT user_id,
       bit_and(CAST(event_id % 256 AS BIGINT)) AS flags_and,
       bit_or(CAST(event_id % 256 AS BIGINT)) AS flags_or,
       bit_xor(CAST(event_id % 256 AS BIGINT)) AS flags_xor
FROM events GROUP BY user_id
""",
)
def bitwise_agg_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (flag-set folding: AND = flags always on,
    OR = flags ever on, XOR = parity) -- order-independent, so exact on any
    engine/partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", (F.col("event_id") % 256).cast("long").alias("f")
    )
    return ev.groupBy("user_id").agg(
        F.bit_and("f").alias("flags_and"),
        F.bit_or("f").alias("flags_or"),
        F.bit_xor("f").alias("flags_xor"),
    )


@register(
    "watermark_dedup_stream",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
""",
)
def watermark_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEVENTH stream==batch==oracle family: in-flight bounded-state dedup
    (dropDuplicatesWithinWatermark, SURVEY section 2.7).  The replay emits
    every event in batch 0 and re-emits every fifth event in batch 1
    (cross-micro-batch duplicates, the case plain per-batch dedup misses);
    the stream must drop exactly the echoes, so the surviving set equals
    the original events table and the per-type count/id-checksum/cents
    aggregate matches the batch oracle bit-for-bit.  The watermark is set
    beyond the data's span so no state is evicted mid-replay (eviction
    semantics are covered by tests/test_streaming_ttl.py); a checksum
    mismatch would catch either a leaked duplicate or a dropped
    original."""
    import glob
    import os
    import shutil

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        dedup_within_watermark,
        run_available_now,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    tmp = _stream_tmpdir("wm_dedup_stream")
    src = f"{tmp}/in"
    os.makedirs(src)
    echoes = ev.where(F.col("event_id") % 5 == 0)
    for i, part in enumerate((ev, echoes)):
        part_dir = f"{tmp}/part{i}"
        part.coalesce(1).write.mode("overwrite").parquet(part_dir)
        (part_file,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(part_file, dst)
        os.utime(dst, (1_700_000_000 + i * 600, 1_700_000_000 + i * 600))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = dedup_within_watermark(stream, keys=["event_id"], ts_col="ts", watermark="3650 days")
    out, ckpt = f"{tmp}/out", f"{tmp}/ckpt"
    with _stream_shuffle(spark):
        run_available_now(deduped, format="parquet", query_name="", path=out, checkpoint=ckpt)
    survived = spark.read.schema(ev.schema).parquet(out)
    return survived.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").cast("long").alias("id_checksum"),
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).cast("long").alias("sum_cents"),
    )


@register(
    "hopping_window_stream",
    """
WITH e AS (SELECT epoch_us(ts) AS t_us FROM events),
w AS (
  SELECT ((t_us // 1800000000) - k) * 1800000000 AS win_start_us
  FROM e CROSS JOIN (SELECT UNNEST([0, 1]) AS k)
  WHERE t_us < ((t_us // 1800000000) - k) * 1800000000 + 3600000000
    AND ((t_us // 1800000000) - k) * 1800000000 >= 0
)
SELECT win_start_us, COUNT(*) AS n_events
FROM w GROUP BY win_start_us
""",
)
def hopping_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EIGHTH stream==batch==oracle family: HOPPING windows on a stream --
    1-hour windows sliding every 30 minutes, each event counted in two
    overlapping state rows, complete-mode AvailableNow replay -- against
    the same shifted floor-bucket oracle as the batch hopping query.
    Proves the overlapping-window state path (distinct from the tumbling
    twin hourly_event_counts_stream)."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_available_now,
        windowed_event_counts,
    )

    ev = load_table(spark, sf_dir, "events").select("ts")
    tmp = _stream_tmpdir("hopping_stream")
    stream = _replay_stream(spark, ev, tmp)
    counts = windowed_event_counts(
        stream, ts_col="ts", window="1 hour", watermark="2 hours", slide="30 minutes"
    )
    with _stream_shuffle(spark):
        run_available_now(
            counts,
            query_name="hopping_stream_mem",
            checkpoint=f"{tmp}/ckpt",
            output_mode="complete",
        )
    return spark.table("hopping_stream_mem").select(
        F.unix_micros(F.col("window.start")).alias("win_start_us"), "n_events"
    )


@register(
    "stream_stream_left_outer",
    """
WITH v AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'view' AND user_id % 3 = 1),
p AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id % 3 = 1)
SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
FROM v LEFT JOIN p
  ON v.user_id = p.user_id
 AND p.ts BETWEEN v.ts - INTERVAL 30 MINUTE AND v.ts + INTERVAL 30 MINUTE
""",
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join twin (ninth stream==batch family):
    views without a purchase within +/-30 min must ALSO emit, with NULL on
    the right -- the semantics Spark only allows when both watermarks and a
    time-range condition bound the state, because an unmatched row is
    provably unmatched only once the watermark passes its join window.

    The replay nuance this query exists to pin down: outer-null rows are
    emitted by the WATERMARK advancing, and the final watermark of a finite
    replay stops at max(event_time) - delay, so trailing unmatched rows
    would be silently dropped and stream != batch.  Each input therefore
    appends one far-future SENTINEL row (user_id -1, filtered from the
    output; the two sentinels are 10 days apart so they never pair) that
    pushes the global watermark past every real row's join window before
    the no-data flush batch.  At 100 TB the sentinel is unnecessary --
    production streams keep running and the watermark keeps moving; it is
    the finite-replay equivalence harness, same role as AvailableNow."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_available_now,
        stream_stream_join,
    )

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 3 == 1)
    tmp = _stream_tmpdir("ssloj_stream")
    sent_v = spark.sql(
        "SELECT CAST(-1 AS BIGINT) AS event_id, CAST(-1 AS BIGINT) AS user_id,"
        " TIMESTAMP'2030-01-01 00:00:00' AS ts"
    )
    sent_p = spark.sql(
        "SELECT CAST(-1 AS BIGINT) AS event_id, CAST(-1 AS BIGINT) AS user_id,"
        " TIMESTAMP'2030-01-11 00:00:00' AS ts"
    )
    views = _replay_stream(
        spark,
        ev.where(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts")
        .unionByName(sent_v),
        f"{tmp}/v",
    )
    purchases = _replay_stream(
        spark,
        ev.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .unionByName(sent_p),
        f"{tmp}/p",
    )
    # The sentinel filter MUST stay OUT of the streaming plan: Catalyst
    # pushes a post-join `user_id >= 0` below the join and below the
    # watermark node into the view source, so the sentinel never lifts the
    # view-side watermark and the last real unmatched view (whose own ts IS
    # that side's max event time) can never flush.  Filter on the read-back
    # instead; the sink simply also writes the two sentinel rows.
    joined = stream_stream_join(
        views,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        left_watermark="1 hour",
        right_watermark="1 hour",
        within="30 minutes",
        how="left_outer",
    ).select(
        F.col("event_id").alias("view_id"),
        F.col("r_event_id").alias("purchase_id"),
        "user_id",
    )
    with _stream_shuffle(spark):
        run_available_now(
            joined, format="parquet", query_name="", path=f"{tmp}/out", checkpoint=f"{tmp}/ckpt"
        )
    return (
        spark.read.schema("view_id bigint, purchase_id bigint, user_id bigint")
        .parquet(f"{tmp}/out")
        .where(F.col("user_id") >= 0)
    )


@register(
    "orc_roundtrip_stats",
    """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(doc_id * doc_id) AS BIGINT) AS id_checksum
FROM documents GROUP BY source
""",
)
def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: documents written to ORC (dictionary + zlib, the
    Hadoop-ecosystem columnar sibling of parquet), re-read through Spark's
    native vectorized ORC reader, then aggregated -- the oracle computes
    the same aggregate from the original parquet, so hash parity proves
    the format conversion is lossless.  Column pruning and predicate
    pushdown work the same as parquet (orc.filterPushdown is on by
    default); at 100 TB the round-trip is the standard interchange path
    with Hive/Trino warehouses that standardized on ORC."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    tmp = _stream_tmpdir("orc_roundtrip")
    docs.write.mode("overwrite").orc(f"{tmp}/docs_orc")
    back = spark.read.orc(f"{tmp}/docs_orc")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.col("doc_id") * F.col("doc_id")).alias("id_checksum"),
    )


@contextmanager
def _rocksdb_state_store(spark: SparkSession):
    """Swap the streaming state store to the RocksDB provider for one
    query, restoring the previous provider after.  The provider class is a
    session conf read at STREAM START and baked into the checkpoint, so a
    context manager around a fresh-checkpoint AvailableNow run is the
    correct scoping."""
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:  # noqa: BLE001 - unset -> restore to default HDFS provider
        old = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        yield
    finally:
        spark.conf.set(key, old)


@register(
    "hourly_counts_rocksdb_stream",
    """
SELECT date_trunc('hour', ts) AS hour_ts, event_type,
       COUNT(*) AS n_events
FROM events GROUP BY hour_ts, event_type
""",
)
def hourly_counts_rocksdb_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly windowed-agg twin re-run on the ROCKSDB state store
    provider -- the production state backend for large stateful topologies
    (state spills to local SSD instead of living on the JVM heap, so
    per-partition state is bounded by disk, not executor memory; changelog
    checkpointing ships deltas).  Same tumbling-window plan, same batch
    oracle, so the hash gate proves provider swap changes WHERE state
    lives, never WHAT it computes.  At 100 TB stateful jobs default to
    this provider; the HDFS-backed heap store is the small-state path."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_available_now,
        windowed_event_counts,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    tmp = _stream_tmpdir("hourly_rocksdb_stream")
    stream = _replay_stream(spark, ev, tmp)
    counts = windowed_event_counts(
        stream, ts_col="ts", window="1 hour", watermark="2 hours", group_cols=["event_type"]
    )
    with _rocksdb_state_store(spark), _stream_shuffle(spark):
        run_available_now(
            counts,
            query_name="hourly_counts_rocksdb_mem",
            checkpoint=f"{tmp}/ckpt",
            output_mode="complete",
        )
    return spark.table("hourly_counts_rocksdb_mem").select(
        F.col("window.start").alias("hour_ts"), "event_type", "n_events"
    )


@register(
    "checkpoint_resume_stream",
    """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
""",
)
def checkpoint_resume_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint RESUME across two separate stream launches -- the
    exactly-once property a production pipeline actually relies on: run 1
    ingests the first half of the source directory and STOPS; more files
    land; run 2 starts from the SAME checkpoint, must skip every
    already-committed file (the file-stream source tracks seen files in the
    checkpoint's offset log, so the re-listed old files are not re-read)
    and ingest only the new ones.  The ingest is a stateless projection in
    append mode; the returned aggregate over the sink equals the one-shot
    batch GROUP BY, proving no row was lost or duplicated across the
    restart boundary.  This is the recovery contract that makes AvailableNow
    catch-up jobs idempotent at any scale -- rerunning after a crash costs
    only the uncommitted tail."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import run_available_now

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", _cents("value").alias("cents")
    )
    tmp = _stream_tmpdir("ckpt_resume")
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    half_a = ev.where(F.col("event_id") % 2 == 0)
    half_b = ev.where(F.col("event_id") % 2 == 1)
    half_a.write.parquet(src)  # run 1 sees only half A's files
    schema = "event_id bigint, event_type string, cents bigint"

    def _run():
        stream = spark.readStream.schema(schema).parquet(src)
        run_available_now(
            stream, format="parquet", query_name="", path=out, checkpoint=ckpt
        )

    _run()
    half_b.write.mode("append").parquet(src)  # new files land; old ones still listed
    _run()
    return (
        spark.read.schema(schema)
        .parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
    )


@register(
    "pyds_sink_roundtrip",
    """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents WHERE doc_id % 4 = 0 GROUP BY lang
""",
)
def pyds_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource WRITE path (the outbound twin of
    pyds_synthetic_corpus): a thinned documents projection flows through
    the registered pure-Python ``jsonl_pysink`` -- per-partition .tmp
    spill, driver-side two-phase commit rename, task-retry orphans never
    visible -- then is re-read as schema-declared JSONL and aggregated;
    the oracle aggregates the parquet directly, so the hash gate proves
    the custom sink's write-commit-read cycle is lossless and
    exactly-once.  Python at the EGRESS boundary by design (sinks are
    where bespoke protocols live); the per-row cost is bounded by the
    released subset, never the corpus."""
    from odp_dynamic_data_pipeline_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 0)
        .select("doc_id", "lang", "n_chars")
    )
    tmp = _stream_tmpdir("pyds_sink")
    out = f"{tmp}/jsonl"
    docs.write.format("jsonl_pysink").option("path", out).mode("append").save()
    back = (
        spark.read.schema("doc_id bigint, lang string, n_chars bigint")
        .option("pathGlobFilter", "*.jsonl")
        .json(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("doc_id").alias("id_sum"),
    )


@register(
    "ab_test_conversion",
    """
WITH u AS (
  SELECT user_id,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND CAST(ROUND(value * 100, 0) AS BIGINT) >= 15000 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
s AS (
  SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
  FROM u GROUP BY arm
),
w AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 0 THEN conv END) AS c0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 1 THEN conv END) AS c1
  FROM s
)
SELECT n0, c0, n1, c1,
       (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
       / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z_stat
FROM w
""",
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-split into two
    arms (md5 parity -- the same stable bucketing a real assignment service
    uses, and one the oracle can replay), per-arm conversion = any high-value
    purchase (>= $150, which splits this corpus near 50/50), pooled two-proportion z statistic.  Counts are exact
    integers; the z-stat is one identically-shaped double expression
    (single sqrt, single division chain) evaluated from those integers, so
    it is bit-identical across engines.  The per-user reduction is one
    map-side-combined GROUP BY; the arm rollup is 2 rows."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (_cents("value") >= 15000), 1
            ).otherwise(0)
        ).alias("converted")
    ).select(
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 2"
        ).alias("arm"),
        "converted",
    )
    s = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").cast("long").alias("conv")
    )
    w = s.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    n0, c0, n1, c1 = (F.col(x).cast("double") for x in ("n0", "c0", "n1", "c1"))
    pooled = (c0 + c1) / (n0 + n1)
    return w.select(
        "n0",
        "c0",
        "n1",
        "c1",
        (
            (c1 / n1 - c0 / n0)
            / F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
        ).alias("z_stat"),
    )


@register(
    "stream_static_enrich_stream",
    """
WITH ev AS (SELECT user_id, event_type,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events),
dim AS (SELECT c_custkey AS user_id, c_mktsegment AS segment FROM customer)
SELECT COALESCE(d.segment, 'UNKNOWN') AS segment, ev.event_type,
       COUNT(*) AS n, CAST(SUM(ev.cents) AS BIGINT) AS sum_cents
FROM ev LEFT JOIN dim d ON ev.user_id = d.user_id
GROUP BY segment, ev.event_type
""",
)
def stream_static_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment twin (SURVEY section 2.7; the streaming
    form of the reference's per-event Redis lookup): events replay as a
    file stream, every micro-batch broadcast-joins the static customer
    dimension (streaming/stream.py `stream_enrich`), unmatched users keep
    flowing with an UNKNOWN segment (left join -- enrichment must never
    drop events), and the enriched stream lands in parquet for a
    batch-equal rollup.  Upgrades this survey row from unit-tested to
    driver-hash-verified.  The static side re-broadcasts per micro-batch,
    which is exactly the production contract for slowly-changing dims:
    restart (or use foreachBatch re-read) to pick up a new snapshot."""

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        run_available_now,
        stream_enrich,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", _cents("value").alias("cents"))
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_mktsegment").alias("segment")
    )
    tmp = _stream_tmpdir("sse_stream")
    stream = _replay_stream(spark, ev, tmp)
    enriched = stream_enrich(stream, dim, key_col="user_id").select(
        F.coalesce(F.col("segment"), F.lit("UNKNOWN")).alias("segment"),
        "event_type",
        "cents",
    )
    with _stream_shuffle(spark):
        run_available_now(
            enriched, format="parquet", query_name="", path=f"{tmp}/out", checkpoint=f"{tmp}/ckpt"
        )
    return (
        spark.read.schema("segment string, event_type string, cents bigint")
        .parquet(f"{tmp}/out")
        .groupBy("segment", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
    )


@register(
    "interval_overlap_incidents",
    """
WITH v AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 7200000000
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE event_type = 'view'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM v
),
s AS (
  SELECT user_id, epoch_us(MIN(ts)) AS s0, epoch_us(MAX(ts)) AS s1
  FROM sess GROUP BY user_id, sid
),
i AS (
  SELECT user_id, event_id,
         epoch_us(ts) - 1800000000 AS i0, epoch_us(ts) + 1800000000 AS i1
  FROM events WHERE event_type = 'error'
),
pairs AS (
  SELECT s.user_id, s.s0, i.event_id,
         least(s.s1, i.i1) - greatest(s.s0, i.i0) AS ov_us
  FROM s JOIN i ON s.user_id = i.user_id
  WHERE s.s0 <= i.i1 AND i.i0 <= s.s1
)
SELECT user_id, COUNT(*) AS n_pairs,
       CAST(SUM(ov_us) AS BIGINT) AS total_overlap_us
FROM pairs GROUP BY user_id
""",
)
def interval_overlap_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big INTERVAL OVERLAP join without a nested loop: view-sessions
    (2-hour-gap sessionization) against error-incident windows (+/-30 min
    around each error), overlap seconds per user.

    The naive plan is an inequality join -- a cartesian per user at best.
    The scale shape used here is TIME BUCKETING: both interval sets
    explode to the 1-hour buckets they cover, overlap candidates come
    from an EQUI-join on (user, bucket), the exact predicate then filters
    and a distinct collapses intervals that met in several buckets.
    Shuffle volume is O(intervals x buckets-covered), never |left|x|right|
    per key -- the same coarse-bucket-then-refine trick as the LSH band
    join and the SCD2 as-of.  The oracle runs the plain inequality join
    (fine at gate scale) -- both must agree exactly, all-integer micros."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) >= 7200000000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = v.withColumn(
        "sid",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    s = sess.groupBy("user_id", "sid").agg(
        F.unix_micros(F.min("ts")).alias("s0"), F.unix_micros(F.max("ts")).alias("s1")
    )
    i = ev.where(F.col("event_type") == "error").select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - 1800000000).alias("i0"),
        (F.unix_micros("ts") + 1800000000).alias("i1"),
    )
    hour = 3600 * 1000 * 1000
    sb = s.withColumn("bucket", F.explode(F.expr(f"sequence(s0 div {hour}, s1 div {hour})")))
    ib = i.withColumn("bucket", F.explode(F.expr(f"sequence(i0 div {hour}, i1 div {hour})")))
    pairs = (
        sb.join(ib, ["user_id", "bucket"])
        .where((F.col("s0") <= F.col("i1")) & (F.col("i0") <= F.col("s1")))
        .select(
            "user_id",
            "s0",
            "event_id",
            (F.least("s1", "i1") - F.greatest("s0", "i0")).alias("ov_us"),
        )
        .distinct()  # an (interval, incident) pair can meet in several buckets
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum("ov_us").cast("long").alias("total_overlap_us")
    )


@register(
    "event_disorder_report",
    """
WITH arr AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN hwm > t THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(MAX(hwm - t) AS BIGINT) AS max_lateness_us,
       CAST(SUM(hwm - t) AS BIGINT) AS total_lateness_us
FROM arr GROUP BY user_id
""",
)
def event_disorder_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit: per key, how far events arrive BEHIND the
    running event-time high-water mark in arrival order (event_id) -- the
    measurement that SIZES a watermark delay from data instead of
    folklore: max_lateness is the delay that loses nothing, the lateness
    histogram tail is the loss/latency trade.  One per-key ordered window
    (shuffle on user_id), all-integer micros.  The streaming twins in this
    registry use '1 hour'; this report is where such a number must come
    from."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t"),
        F.max(F.unix_micros("ts")).over(w).alias("hwm"),
    )
    return arr.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("hwm") > F.col("t"), 1).otherwise(0)).cast("long").alias("n_late"),
        F.max(F.col("hwm") - F.col("t")).cast("long").alias("max_lateness_us"),
        F.sum(F.col("hwm") - F.col("t")).cast("long").alias("total_lateness_us"),
    )


@register(
    "event_transition_matrix",
    """
WITH seq AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
c AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS row_n FROM c GROUP BY src)
SELECT c.src, c.dst, c.n,
       CAST(c.n * 1000000 // tot.row_n AS BIGINT) AS p_e6
FROM c JOIN tot ON c.src = tot.src
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (what follows what): lead() pairs within each user's timeline, exact
    transition counts, row-normalized probabilities in e6 fixed point --
    the building block behind next-event prediction features and journey
    analysis.  One shuffle on user_id for the window, a T x T (=25)
    aggregate after; row totals join back broadcast-small."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst"))
    c = seq.where(F.col("dst").isNotNull()).groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.groupBy("src").agg(F.sum("n").cast("long").alias("row_n"))
    return c.join(F.broadcast(tot), "src").select(
        "src", "dst", "n", F.expr("CAST(n * 1000000 div row_n AS BIGINT)").alias("p_e6")
    )


@register(
    "cohort_retention_weeks",
    """
WITH f AS (
  SELECT user_id,
         MIN(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7) AS cohort_week
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id,
         date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) // 7 AS week
  FROM events e
),
joined AS (
  SELECT f.cohort_week, act.week - f.cohort_week AS week_k, act.user_id
  FROM act JOIN f ON act.user_id = f.user_id
),
size_ AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM f GROUP BY cohort_week)
SELECT j.cohort_week, j.week_k,
       COUNT(DISTINCT j.user_id) AS n_active,
       MAX(s.cohort_size) AS cohort_size,
       CAST(COUNT(DISTINCT j.user_id) * 1000000 // MAX(s.cohort_size) AS BIGINT)
         AS retention_e6
FROM joined j JOIN size_ s ON j.cohort_week = s.cohort_week
GROUP BY j.cohort_week, j.week_k
""",
)
def cohort_retention_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity week,
    then for each (cohort, weeks-since-joining) the share still active --
    the canonical product-analytics report.  First-activity is a min-agg
    (no window over raw events), activity de-dupes to (user, week) BEFORE
    the cohort join, so the join input is bounded by users x weeks, not
    events; retention is exact e6 integer division."""
    ev = load_table(spark, sf_dir, "events")
    # FLOOR division, not `div`: Spark's `div` truncates toward zero while
    # the DuckDB oracle's `//` floors, so the two diverge on any event
    # before the 2024-01-01 epoch; floor(d/7) is exact for |d| < 2^52 and
    # matches `//` for negative days too
    wk = F.floor(F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / F.lit(7))
    f = ev.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    act = ev.select("user_id", wk.alias("week")).distinct()
    joined = act.join(f, "user_id").select(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_k"), "user_id"
    )
    size_ = f.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        joined.groupBy("cohort_week", "week_k")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(size_), "cohort_week")
        .select(
            "cohort_week",
            "week_k",
            "n_active",
            "cohort_size",
            F.expr("CAST(n_active * 1000000 div cohort_size AS BIGINT)").alias("retention_e6"),
        )
    )


@register(
    "activity_heatmap",
    """
SELECT dayofweek(CAST(ts AS DATE)) AS dow, hour(ts) AS hod,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY dow, hod
""",
)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap (the capacity-planning /
    seasonality primitive).  Spark's dayofweek is 1=Sunday vs DuckDB's
    0=Sunday -- normalized here exactly as date_functions_zoo pins it;
    hour() truncation of the nanos timestamp matches on both engines.
    168-cell aggregate, map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek(F.to_date("ts")) - 1).alias("dow"), F.hour("ts").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_cents("value")).cast("long").alias("sum_cents"),
    )


@register(
    "incremental_spans_stream",
    """
WITH toks AS (SELECT doc_id, CAST(doc_id % 2 AS BIGINT) AS bt,
                     regexp_extract_all(text, '\\S+') AS t
              FROM documents),
win AS (
  SELECT doc_id, bt, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(list_slice(t, i, i + 7), ' ')) AS wh
  FROM (SELECT doc_id, bt, t,
               unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i
        FROM toks)
),
cnt AS (SELECT wh, bt, COUNT(*) AS c FROM win GROUP BY wh, bt),
vis AS (
  SELECT wh, bt,
         SUM(c) OVER (PARTITION BY wh ORDER BY bt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccum
  FROM cnt
),
dup AS (
  SELECT w.doc_id, w.pos
  FROM win w JOIN vis ON vis.wh = w.wh AND vis.bt = w.bt
  WHERE vis.ccum >= 2
),
g AS (
  SELECT doc_id, pos,
         CASE WHEN pos - COALESCE(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                                  CAST(-100 AS BIGINT)) > 8
              THEN 1 ELSE 0 END AS ng
  FROM dup
),
s AS (
  SELECT doc_id, pos,
         SUM(ng) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM g
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 7 - MIN(pos) + 1 AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM s GROUP BY doc_id, grp
""",
)
def incremental_spans_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of exactsubstr_dup_spans with the INGEST-GATE
    semantics (streaming.run_incremental_spans): documents arrive in two
    deterministic micro-batches (even doc_ids, then odd), each batch's
    docs get their maximal duplicated spans against the accreted window
    store + the batch itself, and history is never retro-flagged.  Because
    the gate is "window occurrences over batches <= mine", the accumulated
    output is FULLY replayable in SQL: the oracle computes the per-batch
    cumulative window counts (SUM(c) OVER bt) and re-derives every span --
    a complete hash oracle for one-sided streaming semantics, the 22nd
    streaming query and the 5th with an exact-value oracle."""
    import glob
    import os
    import shutil

    from odp_dynamic_data_pipeline_spark.streaming.stream import run_incremental_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = _stream_tmpdir("incspans_stream")
    src = f"{tmp}/in"
    os.makedirs(src)
    # one file per batch, mtimes forcing oldest-first = even docs first
    for i, pred in enumerate((F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1)):
        part_dir = f"{tmp}/part{i}"
        docs.where(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
        (part_file,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(part_file, dst)
        os.utime(dst, (1_700_000_000 + i * 600, 1_700_000_000 + i * 600))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_spans(
            stream,
            f"{tmp}/store",
            f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            min_tokens=8,
            min_count=2,
        )
    return spark.read.parquet(f"{tmp}/out").select(
        "doc_id", "span_start", "span_end", "span_tokens", "n_windows"
    )


@register(
    "kmv_distinct_users",
    """
WITH d AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
),
topk AS (SELECT event_type, h FROM r WHERE rn <= 64),
agg AS (
  SELECT event_type, LIST(h ORDER BY h) AS sketch,
         CAST(COUNT(*) AS BIGINT) AS n_sketch, MAX(h) AS hk
  FROM topk GROUP BY event_type
),
ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
       FROM events WHERE user_id IS NOT NULL GROUP BY event_type)
SELECT a.event_type, a.n_sketch,
       CASE WHEN a.n_sketch < 64 THEN a.n_sketch
            ELSE CAST(63 AS BIGINT) * (CAST(1 AS BIGINT) << 52) // a.hk END
         AS est_distinct,
       e.exact_users
FROM agg a JOIN ex e USING (event_type)
""",
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (operators.text.kmv_sketch,
    Bar-Yossef et al. 2002 / the Theta-sketch core) over per-event-type
    distinct users, k = 64, WITH the exact count alongside for error
    inspection.  Unlike the HLL family (whose register layout is
    library-specific, so those oracles check a 5%% tolerance boolean),
    the KMV sketch is deterministic md5 arithmetic -- the DuckDB oracle
    reproduces n_sketch AND the (k-1) * 2^52 / h_k estimate value-for-
    value, making this the only distinct-count sketch in the registry
    whose ESTIMATE is hash-gated.  Mergeability (shard sketches fold to
    the global sketch) is pinned by property tests."""
    from odp_dynamic_data_pipeline_spark.operators.text import kmv_sketch

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = kmv_sketch(ev, "user_id", k=64, group_cols=["event_type"])
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return sk.join(exact, "event_type").select(
        "event_type", "n_sketch", "est_distinct", "exact_users"
    )


@register(
    "incremental_kmv_stream",
    """
WITH d AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM d
),
topk AS (SELECT event_type, h FROM r WHERE rn <= 64),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sketch, MAX(h) AS hk
  FROM topk GROUP BY event_type
)
SELECT event_type, n_sketch,
       CASE WHEN n_sketch < 64 THEN n_sketch
            ELSE CAST(63 AS BIGINT) * (CAST(1 AS BIGINT) << 52) // hk END
         AS est_distinct
FROM agg
""",
)
def incremental_kmv_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of kmv_distinct_users (streaming.run_incremental_kmv):
    events arrive in two micro-batches, each batch's per-event-type KMV
    sketch folds into the accreted min-hash store, and the evolving merged
    sketch + estimate is emitted per batch.  KMV is ORDER-INDEPENDENT --
    the k smallest hashes of a union do not care how the union arrived --
    so the FINAL batch's emitted estimate equals the one-shot batch sketch
    over all events, and the oracle hash-pins the estimate VALUE (the HLL
    streaming twin can only assert a tolerance boolean).  O(k) state per
    group instead of O(distinct users)."""
    import glob
    import os
    import shutil

    from odp_dynamic_data_pipeline_spark.streaming.stream import run_incremental_kmv

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "event_id")
    tmp = _stream_tmpdir("inckmv_stream")
    src = f"{tmp}/in"
    os.makedirs(src)
    for i, pred in enumerate((F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1)):
        part_dir = f"{tmp}/part{i}"
        ev.where(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
        (part_file,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(part_file, dst)
        os.utime(dst, (1_700_000_000 + i * 600, 1_700_000_000 + i * 600))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_kmv(
            stream,
            f"{tmp}/store",
            f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            col="user_id",
            k=64,
            group_cols=["event_type"],
        )
    batches = sorted(
        int(p.split("=")[1]) for p in os.listdir(f"{tmp}/out") if p.startswith("batch_id=")
    )
    return spark.read.parquet(f"{tmp}/out/batch_id={batches[-1]}").select(
        "event_type", "n_sketch", "est_distinct"
    )


@register(
    "kmv_overlap_matrix",
    """
WITH d AS (
  SELECT DISTINCT event_type AS g,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
sk AS (
  SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d)
  WHERE rn <= 64
),
gs AS (SELECT DISTINCT g FROM sk),
prs AS (SELECT a.g AS g_a, b.g AS g_b FROM gs a JOIN gs b ON a.g < b.g),
u AS (
  SELECT p.g_a, p.g_b, s.h FROM prs p JOIN sk s ON s.g = p.g_a
  UNION
  SELECT p.g_a, p.g_b, s.h FROM prs p JOIN sk s ON s.g = p.g_b
),
uk AS (
  SELECT g_a, g_b, h FROM (
    SELECT g_a, g_b, h,
           row_number() OVER (PARTITION BY g_a, g_b ORDER BY h) AS rn FROM u)
  WHERE rn <= 64
),
m AS (
  SELECT uk.g_a, uk.g_b, uk.h,
         CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END AS bth
  FROM uk
  LEFT JOIN sk sa ON sa.g = uk.g_a AND sa.h = uk.h
  LEFT JOIN sk sb ON sb.g = uk.g_b AND sb.h = uk.h
),
agg AS (
  SELECT g_a, g_b, CAST(COUNT(*) AS BIGINT) AS n_union_sketch, MAX(h) AS hk,
         CAST(SUM(bth) AS BIGINT) AS n_common
  FROM m GROUP BY g_a, g_b
),
est AS (
  SELECT g_a, g_b, n_union_sketch, n_common,
         CASE WHEN n_union_sketch < 64 THEN n_union_sketch
              ELSE CAST(63 AS BIGINT) * (CAST(1 AS BIGINT) << 52) // hk END
           AS est_union
  FROM agg
)
SELECT g_a, g_b, n_union_sketch, est_union, n_common,
       (n_common * est_union) // n_union_sketch AS est_inter,
       (1000000 * n_common) // n_union_sketch AS est_jaccard_e6
FROM est
""",
)
def kmv_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-USER overlap between event types from KMV
    sketches (operators.text.kmv_overlap -- Theta-sketch set algebra on
    the deterministic 52-bit md5 space): union sketch = k smallest of the
    pair's combined sketches, n_common = union members present in BOTH,
    est_jaccard = n_common/|U|, est_inter = est_jaccard * est_union.  The
    cross-source audience-overlap matrix at 100 TB: each source sketched
    once, pairs operate on k-row sketches.  Every estimate is exact
    integer arithmetic, so the oracle hash-pins the VALUES -- an
    HLL-based overlap (inclusion-exclusion over three ~2%% estimates)
    could not be hash-gated."""
    from odp_dynamic_data_pipeline_spark.operators.text import kmv_overlap

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_overlap(ev, "user_id", "event_type", k=64)


def _fd_block(tag: str, table: str, lhs: list[str], rhs: str, name: str) -> str:
    """One approximate-FD g3 block (operators.quality_checks.approx_fd_report
    twin): per-(lhs, rhs) counts, per-lhs rollup, single-row fold."""
    lhs_sql = ", ".join(lhs)
    return f"""
{tag}v AS (
  SELECT {lhs_sql}, {rhs}, CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} GROUP BY {lhs_sql}, {rhs}
),
{tag}k AS (
  SELECT {lhs_sql}, SUM(c) AS tot, MAX(c) AS mx, COUNT(*) AS nv
  FROM {tag}v GROUP BY {lhs_sql}
),
{tag} AS (
  SELECT '{name}' AS fd,
         CAST(SUM(tot) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_keys,
         CAST(SUM(tot - mx) AS BIGINT) AS g3_removals,
         CAST((1000000 * SUM(tot - mx)) // SUM(tot) AS BIGINT) AS g3_e6
  FROM {tag}k
)"""


_FD_ORACLE = (
    "WITH "
    + ",".join(
        [
            _fd_block("fd1", "documents", ["source"], "lang", "documents.source->lang"),
            _fd_block("fd2", "documents", ["lang"], "source", "documents.lang->source"),
            _fd_block(
                "fd3", "orders JOIN customer ON o_custkey = c_custkey",
                ["o_custkey"], "c_mktsegment", "orders*customer.o_custkey->c_mktsegment",
            ),
            _fd_block(
                "fd4", "customer", ["c_nationkey"], "c_mktsegment",
                "customer.c_nationkey->c_mktsegment",
            ),
            _fd_block("fd5", "events", ["event_type"], "user_id", "events.event_type->user_id"),
        ]
    )
    + """
SELECT * FROM fd1 UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3
UNION ALL SELECT * FROM fd4 UNION ALL SELECT * FROM fd5
"""
)


@register("fd_violation_report", _FD_ORACLE)
def fd_violation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-functional-dependency audit
    (operators.quality_checks.approx_fd_report): the g3 error measure
    (minimum row deletions for the FD to hold -- the metric TANE-style FD
    discovery ranks by) for five candidate dependencies, one holding
    exactly over a DERIVED relation (orders x customer: o_custkey ->
    c_mktsegment, g3 = 0) and four violated to different degrees.  Each
    FD costs two partial-aggregated shuffles over DISTINCT value
    combinations, never data rows twice -- the profiling pass you run
    before trusting a key for dedup or enrichment joins."""
    from odp_dynamic_data_pipeline_spark.operators.quality_checks import (
        approx_fd_report,
        union_reports,
    )

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    oc = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    return union_reports(
        [
            approx_fd_report(docs, "documents.source->lang", ["source"], "lang"),
            approx_fd_report(docs, "documents.lang->source", ["lang"], "source"),
            approx_fd_report(
                oc, "orders*customer.o_custkey->c_mktsegment", ["o_custkey"], "c_mktsegment"
            ),
            approx_fd_report(
                cust, "customer.c_nationkey->c_mktsegment", ["c_nationkey"], "c_mktsegment"
            ),
            approx_fd_report(ev, "events.event_type->user_id", ["event_type"], "user_id"),
        ]
    )


@register(
    "session_cap_windows",
    """
WITH RECURSIVE e AS (
  SELECT user_id, epoch_us(ts) AS tu,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
),
walk(user_id, rn, tu, sess, anchor) AS (
  SELECT user_id, rn, tu, CAST(1 AS BIGINT), tu FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.tu,
         w.sess + CASE WHEN e.tu - w.tu > 28800000000 OR e.tu - w.anchor > 86400000000
                       THEN 1 ELSE 0 END,
         CASE WHEN e.tu - w.tu > 28800000000 OR e.tu - w.anchor > 86400000000
              THEN e.tu ELSE w.anchor END
  FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(sess AS BIGINT) AS session_n,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(tu) AS BIGINT) AS start_us,
       CAST(MAX(tu) AS BIGINT) AS end_us
FROM walk GROUP BY user_id, sess
""",
)
def session_cap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap + duration-cap sessionization (operators.sessionize.
    sessionize_capped): a session ends after 8 h of inactivity OR once it
    has lasted 24 h since its FIRST event.  The cap makes the walk a
    data-dependent recurrence (each split moves the anchor the next split
    is measured from) with no window-algebra closed form, so it runs as
    the per-group Arrow-batched pattern -- greedy searchsorted jumps, one
    iteration per SESSION.  The DuckDB oracle replays the recurrence as a
    recursive CTE stepping every user's timeline in lockstep, so session
    numbering, sizes, and boundaries are value-exact."""
    from odp_dynamic_data_pipeline_spark.operators.sessionize import sessionize_capped

    ev = load_table(spark, sf_dir, "events")
    return sessionize_capped(
        ev, group_col="user_id", ts_col="ts", gap_s=28800, cap_s=86400, buckets=32
    )


@register(
    "session_cap_windows_stream",
    """
WITH RECURSIVE e AS (
  SELECT user_id, epoch_us(ts) AS tu,
         row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
),
walk(user_id, rn, tu, sess, anchor) AS (
  SELECT user_id, rn, tu, CAST(1 AS BIGINT), tu FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.tu,
         w.sess + CASE WHEN e.tu - w.tu > 28800000000 OR e.tu - w.anchor > 86400000000
                       THEN 1 ELSE 0 END,
         CASE WHEN e.tu - w.tu > 28800000000 OR e.tu - w.anchor > 86400000000
              THEN e.tu ELSE w.anchor END
  FROM walk w JOIN e ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, CAST(sess AS BIGINT) AS session_n,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(tu) AS BIGINT) AS start_us,
       CAST(MAX(tu) AS BIGINT) AS end_us
FROM walk GROUP BY user_id, sess
""",
)
def session_cap_windows_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING twin of session_cap_windows, checked against the SAME
    recursive-CTE oracle (stream == batch == oracle): events arrive in two
    CHRONOLOGICAL micro-batches (first half of the month, then the rest),
    streaming.run_incremental_sessions carries one open session per user
    in a bucketed delta-merge store (per-batch cost reads/rewrites only
    the buckets the batch touches) and emits sessions the moment a later
    event closes them on the gap or the cap.  Because a session boundary
    depends only on (previous event time, current anchor) -- both in the
    store -- ANY chronological split replays to exactly the one-shot
    batch result: emitted closed sessions + final open sessions hash-match
    sessionize_capped."""
    import glob
    import os
    import shutil

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        read_incremental_sessions,
        run_incremental_sessions,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    tmp = _stream_tmpdir("sesscap_stream")
    src = f"{tmp}/in"
    os.makedirs(src)
    cutoff = F.lit("2024-01-16").cast("timestamp")
    for i, pred in enumerate((F.col("ts") < cutoff, F.col("ts") >= cutoff)):
        part_dir = f"{tmp}/part{i}"
        ev.where(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
        (part_file,) = glob.glob(f"{part_dir}/part-*.parquet")
        dst = f"{src}/batch{i}.parquet"
        shutil.move(part_file, dst)
        os.utime(dst, (1_700_000_000 + i * 600, 1_700_000_000 + i * 600))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_sessions(
            stream,
            f"{tmp}/store",
            f"{tmp}/out",
            checkpoint=f"{tmp}/ckpt",
            group_col="user_id",
            ts_col="ts",
            gap_s=28800,
            cap_s=86400,
            # bucket count sized to the 1.5k-user keyspace (see SCALE.md:
            # per-batch IO ~= touched_buckets * store/B)
            n_buckets=16,
        )
    return read_incremental_sessions(spark, f"{tmp}/store", f"{tmp}/out")


@register(
    "asof_next_purchase",
    """
WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS purchase_value_cents
      FROM events WHERE event_type = 'purchase')
SELECT v.event_id, v.user_id,
       epoch_us(v.ts) AS ts_us,
       epoch_us(p.ts) AS purchase_ts_us,
       p.purchase_value_cents
FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts <= p.ts
""",
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators.asof.asof_join direction='forward'):
    each 'view' matched to the user's NEXT 'purchase' at-or-after it --
    the attribution-lookahead mirror of asof_last_view, same union +
    ordered-window shape (one shuffle on the key, no range explosion),
    frame flipped to current-row-to-end with FIRST ignorenulls.  Oracle:
    DuckDB's native ASOF with the <= inequality."""
    from odp_dynamic_data_pipeline_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", _cents("value").alias("purchase_value_cents")
    )
    out = asof_join(
        views, purchases, on="user_id", ts_col="ts",
        right_ts_alias="purchase_ts", direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        "purchase_value_cents",
    )


@register(
    "mad_outlier_report",
    """
WITH x AS (
  SELECT event_type, 2 * CAST(ROUND(value * 100, 0) AS BIGINT) AS x2 FROM events
),
m AS (
  SELECT event_type, CAST(quantile_cont(x2, 0.5) AS BIGINT) AS med2
  FROM x GROUP BY event_type
),
d AS (
  SELECT x.event_type, med2, 2 * ABS(x2 - med2) AS dev4
  FROM x JOIN m USING (event_type)
),
md AS (
  SELECT event_type, CAST(quantile_cont(dev4, 0.5) AS BIGINT) AS mad4
  FROM d GROUP BY event_type
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(med2) AS BIGINT) AS median_cents_x2,
       CAST(MAX(mad4) AS BIGINT) AS mad_cents_x4,
       CAST(SUM(CASE WHEN dev4 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(MAX(dev4) AS BIGINT) AS max_dev_x4
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
""",
)
def mad_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit (operators.quality_checks.mad_outliers):
    per event type, median / MAD and the count of values beyond 3 MADs --
    the scale-free gate that survives heavy tails where mean/stddev
    z-scores drown.  Values pre-scale x2 (then deviations x2 again) so
    both interpolated medians stay integer-exact; every number replays
    bit-for-bit in the oracle.  This exact variant IS the oracle twin; a
    100 TB pass swaps percentile -> approx_percentile and keeps the gate."""
    from odp_dynamic_data_pipeline_spark.operators.quality_checks import mad_outliers

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", _cents("value").alias("cents")
    )
    return mad_outliers(ev, "event_type", "cents", k=3)


@register(
    "weighted_median_price",
    """
WITH pv AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2, 3
),
c AS (
  SELECT l_returnflag, l_linestatus, price_cents, w,
         SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus
                      ORDER BY price_cents
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot
  FROM pv
),
nd AS (
  SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_distinct_values
  FROM pv GROUP BY 1, 2
)
SELECT c.l_returnflag, c.l_linestatus,
       CAST(MAX(tot) AS BIGINT) AS total_w,
       nd.n_distinct_values,
       CAST(MIN(price_cents) AS BIGINT) AS wmedian
FROM c JOIN nd USING (l_returnflag, l_linestatus)
WHERE 2 * cum >= tot
GROUP BY c.l_returnflag, c.l_linestatus, nd.n_distinct_values
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per (returnflag, linestatus)
    (operators.aggregate.weighted_median): the lower weighted median --
    smallest price whose cumulative quantity reaches half the group's
    total -- so the result is an actual data value and everything stays
    integer-exact.  Ties collapse FIRST (map-side partial agg); the
    cumulative window runs over the distinct-price rollup, never data
    rows."""
    from odp_dynamic_data_pipeline_spark.operators.aggregate import weighted_median

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        _cents("l_extendedprice").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    out = weighted_median(li, ["l_returnflag", "l_linestatus"], "price_cents", "qty")
    return out.select(
        "l_returnflag", "l_linestatus", "total_w", "n_distinct_values",
        F.col("wmedian").cast("long").alias("wmedian"),
    )


@register(
    "cdc_upsert_stream",
    """
SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
       CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents
FROM (
  SELECT user_id, ts, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id IS NOT NULL
) WHERE rn = 1
""",
)
def cdc_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC upsert == batch latest-row-per-key, driver-verified
    (streaming.run_incremental_upsert): events replayed as micro-batches
    in ARBITRARY order (no chronology requirement -- max-by-seq is
    commutative, deliberately unlike the sessionizer's guard) folded into
    a bucketed last-wins store; the final store is checked against the
    one-shot window oracle.  The streaming face of MERGE WHEN MATCHED
    UPDATE (batch twin merge_cdc_snapshot), with (ts, event_id) as the
    deterministic sequence."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        read_incremental_upsert,
        run_incremental_upsert,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_id", "event_type", _cents("value").alias("value_cents"))
        .repartition(4)
    )
    tmp = _stream_tmpdir("cdc_upsert_stream")
    src = f"{tmp}/in"
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_upsert(
            stream,
            f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            key_cols=["user_id"],
            seq_cols=["ts", "event_id"],
            # B sizes to the keyspace (1.5k users here): a bucket should
            # stay ~file-sized -- the same knob the rehearsal runs at 1024
            # over 3M keys
            n_buckets=32,
        )
    return read_incremental_upsert(spark, f"{tmp}/store").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        F.col("value_cents").cast("long").alias("value_cents"),
    )


@register(
    "cdc_upsert_deletes_stream",
    """
SELECT user_id, ts_us, event_id, value_cents FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id IS NOT NULL
) WHERE rn = 1 AND event_type <> 'purchase'
""",
)
def cdc_upsert_deletes_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert WITH DELETE TOMBSTONES == batch latest-live-row-per-key,
    driver-verified: 'purchase' events act as the MERGE WHEN MATCHED
    DELETE half -- a delete competes by (ts, event_id) like any update
    and, when it wins, the key disappears from the LIVE view but its
    tombstone is RETAINED in the store so a late lower-seq update cannot
    resurrect it (the log-compaction delete-retention semantics;
    resurrection pinned by crafted test).  The query then runs
    expire_upsert_tombstones -- the retention compaction that rewrites
    only tombstone-bearing buckets and DROPS emptied buckets from the
    map -- and reads the live view from the COMPACTED store, so the one
    oracle hash-gates winner election, tombstone filtering, and the
    expiry rewrite together."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        expire_upsert_tombstones,
        read_incremental_upsert,
        run_incremental_upsert,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.col("event_type") == "purchase").alias("__del"),
            _cents("value").alias("value_cents"),
        )
        .repartition(4)
    )
    tmp = _stream_tmpdir("cdc_upsert_del_stream")
    src = f"{tmp}/in"
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_upsert(
            stream,
            f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            key_cols=["user_id"],
            seq_cols=["ts", "event_id"],
            n_buckets=32,
            delete_col="__del",
        )
    expire_upsert_tombstones(
        spark, f"{tmp}/store", key_cols=["user_id"], delete_col="__del", n_buckets=32
    )
    return read_incremental_upsert(spark, f"{tmp}/store", delete_col="__del").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.col("value_cents").cast("long").alias("value_cents"),
    )


@register(
    "cdc_upsert_expiry_replay_stream",
    """
SELECT user_id, ts_us, event_id, value_cents FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS value_cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id IS NOT NULL
) WHERE rn = 1 AND event_type <> 'purchase'
""",
    gating_cadence=True,
)
def cdc_upsert_expiry_replay_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert with tombstone expiry AND a post-maintenance REPLAY ==
    batch latest-live-row-per-key, driver-verified: after the streaming
    fold and the retention compaction (expire_upsert_tombstones, which
    flips to a reserved ``v{B}m{k}`` maintenance version), the full
    event set is RE-FOLDED under the same batch id B -- the post-flip
    retry scenario the advisor's r10 finding targeted.  The maintenance
    namespace makes base_for_batch resolve that replay to the EXPIRED
    state (a ``v{B}_r{k}`` name would have matched the retry rule and
    rebuilt from the pre-expiry parent, resurrecting every tombstone);
    max-by-seq re-folding is idempotent, the re-inserted delete winners
    are filtered at read, and a second expiry reclaims them again.  One
    oracle hash-gates winner election, expiry, maintenance-replay, and
    re-expiry idempotence together (r11)."""
    from odp_dynamic_data_pipeline_spark.streaming.kvstore import ManifestStore
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_upsert_batch,
        expire_upsert_tombstones,
        read_incremental_upsert,
        run_incremental_upsert,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.col("event_type") == "purchase").alias("__del"),
            _cents("value").alias("value_cents"),
        )
        .repartition(4)
    )
    tmp = _stream_tmpdir("cdc_upsert_expiry_replay")
    src = f"{tmp}/in"
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_upsert(
            stream,
            f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            key_cols=["user_id"],
            seq_cols=["ts", "event_id"],
            n_buckets=32,
            delete_col="__del",
        )
        expire_upsert_tombstones(
            spark, f"{tmp}/store", key_cols=["user_id"], delete_col="__del", n_buckets=32
        )
        m = ManifestStore(spark, f"{tmp}/store", n_extras=2)
        last_bid = m.version_batch_id(m.read_manifest().current)
        # superset replay under the maintenance flip's own batch id: the
        # most adversarial retry (every row already folded, every expired
        # tombstone re-arriving)
        apply_incremental_upsert_batch(
            ev, last_bid, f"{tmp}/store",
            key_cols=["user_id"], seq_cols=["ts", "event_id"], n_buckets=32,
            delete_col="__del",
        )
        expire_upsert_tombstones(
            spark, f"{tmp}/store", key_cols=["user_id"], delete_col="__del", n_buckets=32
        )
    return read_incremental_upsert(spark, f"{tmp}/store", delete_col="__del").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.col("value_cents").cast("long").alias("value_cents"),
    )


@register(
    "winsorized_value_stats",
    """
WITH x AS (
  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events
),
pv AS (
  SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents,
         SUM(c) OVER (PARTITION BY event_type ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumc,
         SUM(c) OVER (PARTITION BY event_type) AS tot
  FROM pv
),
bounds AS (
  SELECT event_type,
         MIN(CASE WHEN 100 * cumc >= 5 * tot THEN cents END) AS lo_bound,
         MIN(CASE WHEN 100 * cumc >= 95 * tot THEN cents END) AS hi_bound
  FROM cum GROUP BY event_type
)
SELECT x.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(lo_bound) AS BIGINT) AS lo_bound,
       CAST(MAX(hi_bound) AS BIGINT) AS hi_bound,
       CAST(SUM(CASE WHEN cents < lo_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN cents > hi_bound THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       CAST(SUM(GREATEST(lo_bound, LEAST(hi_bound, cents))) AS BIGINT) AS wins_sum,
       CAST((1000000 * SUM(GREATEST(lo_bound, LEAST(hi_bound, cents)))) // COUNT(*) AS BIGINT) AS wins_mean_e6
FROM x JOIN bounds USING (event_type)
GROUP BY x.event_type
""",
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value statistics
    (operators.aggregate.winsorized_stats): values clamped to the
    nearest-rank p05/p95 bounds before summing -- the robust mean that
    tames heavy tails without dropping rows (action-side sibling of the
    MAD outlier report).  Nearest-rank bounds are actual data values, so
    the clipped sum stays integer-exact end to end -- deliberately NOT
    the interpolated quantile, whose fractional bounds would push the
    sum into float territory."""
    from odp_dynamic_data_pipeline_spark.operators.aggregate import winsorized_stats

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", _cents("value").alias("cents")
    )
    return winsorized_stats(ev, ["event_type"], "cents", p_lo=5, p_hi=95)


@register(
    "incremental_postings_stream",
    r"""
WITH tok AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
    FROM documents
  ) GROUP BY doc_id, t
)
SELECT t, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
FROM tok GROUP BY t
""",
)
def incremental_postings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL inverted-index statistics == batch statistics,
    driver-verified: per-(doc, term) tf rows stream in micro-batches into
    run_incremental_agg's versioned store keyed by term -- df folds as a
    plain count (each doc lives in exactly one drop, so (doc, term) rows
    never repeat across batches) and cf as a sum -- and the final store
    is checked against the one-shot corpus rollup.  This is the index-
    maintenance loop of a retrieval stack: the SAME (term, df, cf) table
    bm25_scores derives per query is kept current per arriving batch
    instead of recomputed corpus-wide."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        read_incremental_agg,
        run_incremental_agg,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .repartition(4)
    )
    tmp = _stream_tmpdir("incpostings_stream")
    src = f"{tmp}/in"
    tok.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(tok.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        # bucketed store: a real vocabulary is a LARGE keyspace (millions
        # of terms at corpus scale), exactly the case the legacy whole-
        # rewrite store is wrong for -- per-batch IO must be the buckets
        # the batch's terms hash into, not the whole index
        run_incremental_agg(
            stream,
            f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            key_cols=["t"],
            count_col="df",
            sum_col="tf",
            n_buckets=64,
        )
    return read_incremental_agg(spark, f"{tmp}/store").select(
        "t", F.col("df").cast("long").alias("df"), F.col("sum_tf").cast("long").alias("cf")
    )


@register(
    "incremental_topk_stream",
    """
WITH agg AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events WHERE user_id IS NOT NULL GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, sum_cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY sum_cents DESC, user_id) AS rnk
  FROM agg
)
SELECT event_type, CAST(rnk AS BIGINT) AS rnk, user_id, sum_cents
FROM r WHERE rnk <= 3
""",
)
def incremental_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k SERVED off an incrementally maintained view == batch top-k,
    driver-verified: per-(type, user) cent totals fold across micro-batches
    into the BUCKETED delta-merge store (per-batch IO bounded by touched
    buckets), and the top-3 spenders per event type are read from the
    final store through a WindowGroupLimit rank -- the dashboard pattern
    where the expensive aggregate is maintained, not recomputed, and the
    cheap rank runs at read time."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        read_incremental_agg,
        run_incremental_agg,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("event_type", "user_id", _cents("value").alias("cents"))
        .repartition(4)
    )
    tmp = _stream_tmpdir("inctopk_stream")
    src = f"{tmp}/in"
    ev.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    with _stream_shuffle(spark):
        run_incremental_agg(
            stream,
            f"{tmp}/store",
            checkpoint=f"{tmp}/ckpt",
            key_cols=["event_type", "user_id"],
            sum_col="cents",
            n_buckets=32,
        )
    agg = read_incremental_agg(spark, f"{tmp}/store")
    w = Window.partitionBy("event_type").orderBy(
        F.col("sum_cents").desc(), F.col("user_id").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("event_type", "rnk", "user_id", F.col("sum_cents").cast("long").alias("sum_cents"))
    )
