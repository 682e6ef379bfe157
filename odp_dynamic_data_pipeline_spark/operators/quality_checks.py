"""Data-quality checks: declarative constraints evaluated as one pass per
table (the pipeline-engine feature the reference approximates by
log-and-skip, src/data_processor.py:104-107).

Each check compiles to a count aggregation; a table's checks fuse into a
single scan with conditional-count legs, so a 100 TB validation sweep costs
one read per table, not one per constraint.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def violations_not_null(df: DataFrame, cols: list[str]) -> dict[str, Column]:
    return {f"not_null:{c}": F.count(F.when(F.col(c).isNull(), 1)) for c in cols}


def violations_condition(df: DataFrame, name: str, cond: Column) -> dict[str, Column]:
    """Rows violating an arbitrary boolean invariant."""
    return {f"condition:{name}": F.count(F.when(~cond, 1))}


def run_single_pass_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate all count-style checks in ONE aggregation over one scan.
    Returns (check_name, n_violations) rows."""
    agg = df.agg(*[expr.alias(name) for name, expr in checks.items()])
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("check_name"), F.col(name).cast("long").alias("n_violations"))
            for name in checks
        ]
    )
    return agg.select(F.explode(pairs).alias("p")).select("p.check_name", "p.n_violations")


def violations_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows beyond the first per key (needs its own shuffle -- cannot fuse
    into the single-pass scan)."""
    name = "unique:" + ",".join(key_cols)
    extra = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("n_violations"))
        .select(F.lit(name).alias("check_name"), "n_violations")
    )
    return extra


def violations_referential(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """Orphaned foreign keys (anti-join count)."""
    name = f"ref:{child_key}->{parent_key}"
    orphans = (
        child.select(F.col(child_key).alias("k"))
        .join(parent.select(F.col(parent_key).alias("k")).distinct(), "k", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit(name).alias("check_name"), "n_violations")
    )
    return orphans


def union_reports(reports: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), reports)


def binary_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    *,
    out_col: str = "auc_e6",
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney rank-sum identity, with
    standard average-rank tie handling -- the evaluation loop for
    model-based data filtering (does the cheap classifier rank documents
    the way the trusted gate labels them?).

    AUC = (sum of positive ranks - P(P+1)/2) / (P*N).  Ties take the
    average rank of their run; ``2*avgrank = 2*rank_min + n_ties - 1`` is
    an integer, so the whole computation stays integer-exact: the returned
    ``out_col`` is floor(1e6 * 2U / (2PN)).  Two windows over one shuffle
    on the group key (rank and tie-count share the partitioning), then one
    groupBy -- no per-threshold ROC sweep, no Python.

    Groups where either class is empty (AUC undefined) are dropped.
    Output: (group_col, n_pos, n_neg, out_col)."""
    w_rank = Window.partitionBy(group_col).orderBy(score_col)
    w_tie = Window.partitionBy(group_col, score_col)
    ranked = df.select(
        group_col,
        F.col(label_col).cast("boolean").alias("__lab"),
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1).alias("__r2"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.sum(F.when(F.col("__lab"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("__lab"), 0).otherwise(1)).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__lab"), F.col("__r2")).otherwise(0)).cast("long").alias("__r2sum"),
    )
    return (
        agg.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            group_col,
            "n_pos",
            "n_neg",
            F.expr(
                "(1000000 * (__r2sum - n_pos * (n_pos + 1)))"
                f" div (2 * n_pos * n_neg)"
            ).alias(out_col),
        )
    )


def approx_fd_report(df: DataFrame, name: str, lhs: list[str], rhs: str) -> DataFrame:
    """Approximate-functional-dependency check with the g3 error measure
    (Kivinen/Mannila 1995; the metric TANE-style FD discovery minimizes):
    g3 = the minimum number of rows to delete so that ``lhs -> rhs`` holds
    exactly = sum over lhs-keys of (rows_under_key - max single-rhs count).

    Shape: one groupBy(lhs+rhs) with map-side partial aggregation, one
    groupBy(lhs) over the (key, value, count) rollup -- the second shuffle
    moves one row per DISTINCT (lhs, rhs) pair, never data rows -- then a
    single-row fold.  No majority tiebreak is needed: g3 depends only on
    the per-key MAX count.  Output one row:
    (fd, n_rows, n_keys, n_violating_keys, g3_removals, g3_e6)."""
    per_val = df.groupBy(*lhs, rhs).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    per_key = per_val.groupBy(*lhs).agg(
        F.sum("__c").cast("long").alias("__tot"),
        F.max("__c").cast("long").alias("__mx"),
        F.count(F.lit(1)).cast("long").alias("__nv"),
    )
    return per_key.agg(
        F.sum("__tot").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum((F.col("__nv") > 1).cast("long")).cast("long").alias("n_violating_keys"),
        F.sum(F.col("__tot") - F.col("__mx")).cast("long").alias("g3_removals"),
    ).select(
        F.lit(name).alias("fd"),
        "n_rows",
        "n_keys",
        "n_violating_keys",
        "g3_removals",
        F.expr("(1000000 * g3_removals) div n_rows").cast("long").alias("g3_e6"),
    )


def blocking_quality(
    df: DataFrame,
    schemes: "dict[str, Column]",
    truth_key: "Column",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocking-scheme evaluation for entity resolution (Christen 2012):
    for each candidate blocking key, report the two numbers that decide
    whether a blocking pass is safe before an O(n^2)-ish matcher --
    reduction ratio (pairs pruned vs the full cross product) and pairs
    completeness (ground-truth duplicate pairs whose two members still
    share a block).

    Everything is COUNTING on group sizes -- no pair is ever materialized:
    candidate pairs = sum over blocks of C(n,2); captured true pairs =
    sum over (block, truth) cells of C(n,2) (single-key blocking: a truth
    pair survives iff both rows land in the same block).  One explode to
    (scheme, block) rows, two groupBy rollups, one broadcast of the
    2-row totals.  Output one row per scheme:
    (scheme, n_blocks, cand_pairs, reduction_e6, true_pairs,
    captured_pairs, completeness_e6)."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(name).alias("scheme"), key.cast("string").alias("block"))
                for name, key in schemes.items()
            ]
        )
    ).alias("sb")
    base = df.select(F.col(id_col), truth_key.cast("string").alias("__truth"), pairs).select(
        id_col, "__truth", "sb.scheme", "sb.block"
    )

    # NULL truth keys carry no ground-truth identity: they must NOT form a
    # single C(n,2) pseudo-entity (which would inflate true_pairs and skew
    # completeness).  n_docs still counts every record -- reduction ratio is
    # about the candidate space, which includes unlabeled rows.
    truth_rows = df.select(truth_key.cast("string").alias("__truth")).where(
        F.col("__truth").isNotNull()
    )
    totals = (
        df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(
            F.broadcast(
                truth_rows.groupBy("__truth")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .agg(
                    F.coalesce(
                        F.sum(F.expr("n * (n - 1) div 2")), F.lit(0)
                    ).cast("long").alias("true_pairs")
                )
            )
        )
    )

    per_block = base.groupBy("scheme", "block").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cand = per_block.groupBy("scheme").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("cand_pairs"),
    )
    per_cell = (
        base.where(F.col("__truth").isNotNull())
        .groupBy("scheme", "block", "__truth")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    captured = per_cell.groupBy("scheme").agg(
        F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("__cap")
    )
    return (
        cand.join(captured, "scheme", "left")
        .withColumn("captured_pairs", F.coalesce(F.col("__cap"), F.lit(0)).cast("long"))
        .drop("__cap")
        .crossJoin(F.broadcast(totals))
        .select(
            "scheme",
            "n_blocks",
            "cand_pairs",
            F.expr(
                "(1000000 * (n_docs * (n_docs - 1) div 2 - cand_pairs))"
                " div (n_docs * (n_docs - 1) div 2)"
            )
            .cast("long")
            .alias("reduction_e6"),
            "true_pairs",
            "captured_pairs",
            F.when(
                F.col("true_pairs") > 0,
                F.expr("(1000000 * captured_pairs) div true_pairs"),
            )
            .otherwise(1000000)
            .cast("long")
            .alias("completeness_e6"),
        )
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Robust outlier report per group: median / MAD (median absolute
    deviation) and the count of points beyond ``k`` MADs -- the
    scale-free outlier gate that survives the heavy tails a mean/stddev
    z-score drowns in.

    Exactness: interpolated medians of integers can land on halves, so
    values are pre-scaled x2 before the first median (med_x2 is integer)
    and deviations x2 again before the second (mad_x4 is integer); the
    gate ``dev > k * mad`` compares the same scale on both sides, so the
    whole report is integer-exact and engine-portable.  Two exact
    percentile aggregations + two joins back on the group key; for a
    100 TB pass swap percentile -> approx_percentile and keep the gate
    (documented trade -- this is the oracle-exact variant).

    Output: (group_col, n, median_cents_x2, mad_cents_x4, n_outliers,
    max_dev_x4)."""
    x = df.select(group_col, (2 * F.col(cents_col)).cast("long").alias("__x2"))
    med = x.groupBy(group_col).agg(
        F.expr("CAST(percentile(__x2, 0.5) AS BIGINT)").alias("__med2")
    )
    d = x.join(med, group_col).select(
        group_col,
        "__med2",
        (2 * F.abs(F.col("__x2") - F.col("__med2"))).cast("long").alias("__dev4"),
    )
    mad = d.groupBy(group_col).agg(
        F.expr("CAST(percentile(__dev4, 0.5) AS BIGINT)").alias("__mad4")
    )
    return (
        d.join(mad, group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("__med2").cast("long").alias("median_cents_x2"),
            F.max("__mad4").cast("long").alias("mad_cents_x4"),
            F.sum((F.col("__dev4") > k * F.col("__mad4")).cast("long"))
            .cast("long")
            .alias("n_outliers"),
            F.max("__dev4").cast("long").alias("max_dev_x4"),
        )
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    lo: int,
    hi: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact precision/recall curve over a FIXED threshold grid: scores
    bucket into ``n_buckets`` equi-width bins over the declared [lo, hi)
    integer domain, and each non-empty bucket's lower bound becomes a
    threshold t with precision/recall of the rule ``score >= t`` -- the
    companion artifact to the scalar ROC-AUC (binary_auc): AUC says the
    ranking is good, the curve says WHERE to cut it.

    The grid is domain-fixed (not data-quantiles), so the heavy reduction
    is one groupBy(bucket) with map-side partial aggregation; the
    cumulative pass runs over <= n_buckets pre-aggregated rows (a bounded
    global window, the cusum/pareto class).  All integer: precision_e6 =
    1e6*tp // pred_pos, recall_e6 = 1e6*tp // total_pos.

    Output per non-empty bucket, highest threshold first:
    (threshold_e6, n_ge, tp_ge, precision_e6, recall_e6)."""
    width = (hi - lo) // n_buckets
    if width <= 0:
        raise ValueError(
            f"pr_curve: domain [{lo}, {hi}) narrower than n_buckets={n_buckets} "
            f"(width {width}); widen the domain or lower n_buckets -- a zero "
            f"width would silently collapse every row into bucket 0"
        )
    b = df.select(
        (F.col(score_col) - F.lit(lo)).cast("long").alias("__d"),
        F.col(label_col).cast("boolean").alias("__lab"),
    ).select(
        F.least(
            F.lit(n_buckets - 1).cast("long"),
            F.greatest(F.lit(0).cast("long"), F.expr(f"__d div {width}")),
        ).alias("__b"),
        "__lab",
    )
    agg = b.groupBy("__b").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__lab").cast("long")).cast("long").alias("__pos"),
    )
    w = (
        Window.orderBy(F.col("__b").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy()
    return (
        agg.select(
            "__b",
            F.sum("__n").over(w).cast("long").alias("n_ge"),
            F.sum("__pos").over(w).cast("long").alias("tp_ge"),
            F.sum("__pos").over(wtot).cast("long").alias("__totpos"),
        )
        .select(
            (F.lit(lo) + F.col("__b") * width).cast("long").alias("threshold_e6"),
            "n_ge",
            "tp_ge",
            F.expr("(1000000 * tp_ge) div n_ge").cast("long").alias("precision_e6"),
            F.when(F.col("__totpos") > 0, F.expr("(1000000 * tp_ge) div __totpos"))
            .otherwise(0)
            .cast("long")
            .alias("recall_e6"),
        )
    )
