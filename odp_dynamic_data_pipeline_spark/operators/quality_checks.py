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
