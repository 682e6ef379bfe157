"""Physical-layout helpers shared by compute-heavy operators.

A parquet file with one row group scans as ONE partition no matter how many
cores the cluster has -- Spark assigns each row group to a single split.  A
small-but-compute-dense table (a document corpus feeding shingling, an
embedding table feeding vector math) then runs its whole per-row pipeline on
one core.  Measured at sf0.1 on local[32]: the exploded-shingle stage of
MinHash went from 2.5 s single-partition to <0.4 s after fanning out.

``ensure_min_parallelism`` widens only when the scan is narrower than the
session's default parallelism, so on a real cluster -- where a 100 TB input
already arrives in thousands of splits -- it is a no-op and never introduces
an extra shuffle of the wide payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session default parallelism iff its
    current partitioning is narrower (round-robin; no key assumption)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def zorder_value(cols: list[str], *, bits_per_col: int | None = None):
    """Morton (Z-order) interleave of non-negative integer columns into one
    bigint sort key.

    Sorting/range-partitioning by this key clusters rows that are close in
    EVERY dimension into the same parquet row groups, so min/max statistics
    prune multi-column range predicates -- single-column sort only prunes
    its leading column.  This is the layout step behind Delta/Iceberg
    OPTIMIZE ZORDER BY, expressed as a plain column: at 100 TB run
    ``df.repartitionByRange(N, z).sortWithinPartitions(z).write...``
    periodically, same cadence as compaction.

    Columns must already be mapped to non-negative ints of at most
    ``bits_per_col`` bits (rank/bucketize first for skewed or signed data --
    interleaving only preserves locality, not distribution).  Bit budget:
    ``bits_per_col * len(cols) <= 63``.
    """
    from pyspark.sql import functions as F

    ncols = len(cols)
    if ncols < 2:
        raise ValueError("zorder_value needs at least 2 columns")
    bits = bits_per_col or 63 // ncols
    if bits * ncols > 63:
        raise ValueError(f"{bits} bits x {ncols} cols overflows a signed 64-bit key")
    # one OR-fold over (bit, col): result bit (b*ncols + c) = bit b of col c
    terms = " | ".join(
        f"(shiftleft(shiftright(CAST({c} AS BIGINT), {b}) & 1, {b * ncols + ci}))"
        for b in range(bits)
        for ci, c in enumerate(cols)
    )
    return F.expr(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    *,
    num_files: int,
    bits_per_col: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files range-partitioned and
    sorted by the Z-order key of ``zorder_cols`` (dropped from the output;
    derive it again to re-cluster).  Files then hold hyper-rectangles of the
    key space: a predicate on any zorder column skips most files on
    min/max stats alone."""
    z = zorder_value(zorder_cols, bits_per_col=bits_per_col)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    rank_col: str = "rank",
    num_partitions: int = 16,
) -> DataFrame:
    """Distributed global row_number over a TOTAL order (order_cols must be
    a strict tiebroken key) -- the scalable replacement for
    ``row_number() OVER (ORDER BY ...)``, whose empty PARTITION BY funnels
    every row through one task.

    Classic two-pass ranking: range-partition on the sort key so partition
    i holds keys strictly below partition i+1, count rows per partition,
    prefix-sum those K counts on the driver (K = num_partitions, a bounded
    constant, the one collect this operator is allowed), then final rank =
    partition offset + intra-partition row_number.  The repartitioned
    input is eagerly localCheckpoint-ed first: the count job and the rank
    job MUST see the identical partitioning (range bounds come from
    sampling; re-planning between jobs could shift a boundary and corrupt
    every downstream offset).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .localCheckpoint(eager=True)
        .withColumn("__pid", F.spark_partition_id())
    )
    counts = {
        row["__pid"]: row["cnt"]
        for row in r.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offset_map, acc = [], 0
    for pid in sorted(counts):
        offset_map += [F.lit(pid), F.lit(acc)]
        acc += counts[pid]
    # empty input: no partitions were observed -> no offsets to add (the
    # zero-arg create_map() analyzes as map<void,void> and cannot be indexed)
    offsets = F.create_map(*offset_map)[F.col("__pid")] if offset_map else F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return r.withColumn(
        rank_col, (offsets + F.row_number().over(w)).cast("long")
    ).drop("__pid")


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    sum_cols: list[str],
    *,
    num_partitions: int = 16,
) -> DataFrame:
    """Distributed RUNNING SUM over a total order -- the cumulative-
    distribution sibling of :func:`global_rank`, replacing
    ``sum(x) OVER (ORDER BY ...)`` whose empty PARTITION BY funnels every
    row through one task.

    Same two-pass offset pattern: range-partition on the (strictly
    tiebroken) sort key, eagerly localCheckpoint so both jobs see the
    identical partitioning, aggregate each partition's per-column totals,
    prefix-sum the K x |sum_cols| totals on the driver (the one bounded
    collect), then each row's running sum = its partition's offset + the
    intra-partition window sum.  Each ``c`` in ``sum_cols`` gains a
    ``c + '_cum'`` long column (inclusive: the row's own value counts)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .localCheckpoint(eager=True)
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = {
        row["__pid"]: row
        for row in r.groupBy("__pid")
        .agg(*[F.sum(F.col(c)).alias(c) for c in sum_cols])
        .collect()
    }
    out = r
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in sum_cols:
        offset_map, acc = [], 0
        for pid in sorted(totals):
            offset_map += [F.lit(pid), F.lit(acc)]
            acc += totals[pid][c] or 0
        offsets = F.create_map(*offset_map)[F.col("__pid")] if offset_map else F.lit(0)
        out = out.withColumn(
            f"{c}_cum", (offsets + F.sum(F.col(c)).over(w)).cast("long")
        )
    return out.drop("__pid")
