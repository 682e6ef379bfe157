"""As-of (nearest-previous) join -- an operator Spark lacks natively.

Implemented as a composition of existing DataFrame ops (SURVEY.md custom-
operator guidance (a)): tag both sides, union, and take the last-seen right
row per key via an ordered window with ``last(..., ignorenulls=True)``.

Why this shape at 100 TB: a naive range join (l.ts >= r.ts) explodes to a
cross product per key before picking the max; the union-window form is one
shuffle on the key + one sort -- the same cost as a window aggregation, and
AQE handles skewed keys.  This is the standard point-in-time-correct
feature-store join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    right_ts_alias: str = "asof_ts",
    right_suffix: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the columns of the latest right row with
    ``right.ts <= left.ts`` and the same ``on`` key; left rows with no prior
    right row get nulls.  Equal timestamps match (inclusive): right rows
    order before left rows at the same instant.

    ``direction='forward'`` flips the match to the EARLIEST right row with
    ``right.ts >= left.ts`` (still inclusive) -- the "next event after"
    lookup (next maintenance window, next price tick, next purchase after
    a view).  Same single-shuffle union-window shape, mirrored: the frame
    looks at following rows and takes the FIRST future right row.

    If a right value column shares its name with a left payload column the
    join raises, unless ``right_suffix`` is given -- then every colliding
    right column is emitted as ``<name><right_suffix>`` and the left column
    is preserved."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts_col)]
    left_payload = [c for c in left.columns if c not in (on, ts_col)]

    collisions = sorted(set(value_cols) & set(left_payload))
    out_name = {c: c for c in value_cols}
    if collisions:
        if right_suffix is None:
            raise ValueError(
                f"asof_join: right value columns {collisions} collide with left "
                f"payload columns; pass right_suffix=... to disambiguate"
            )
        for c in collisions:
            out_name[c] = f"{c}{right_suffix}"

    lt = left.select(on, ts_col, *left_payload, F.lit(1).alias("__side"))
    for c in value_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))

    rt = right.select(
        on, ts_col, *[F.col(c).alias(f"__r_{c}") for c in value_cols], F.lit(0).alias("__side")
    )
    for c in left_payload:
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward|forward, got {direction!r}")

    unioned = lt.unionByName(rt.select(*lt.columns))

    # Deterministic tiebreak when several RIGHT rows share (key, ts): order
    # them by their value columns (non-orderable types hash via xxhash64) so
    # the picked row is a pure function of the data, not of partition order.
    # Backward takes the LAST in-frame right row -> max by value; forward
    # takes the FIRST -> min by value.  Left rows carry NULL __r_ columns,
    # so the tiebreak never reorders a left row relative to right rows.
    from pyspark.sql.types import MapType

    def _tb(c: str):
        dt = right.schema[c].dataType
        col = F.col(f"__r_{c}")
        return F.xxhash64(col) if isinstance(dt, MapType) else col

    tiebreak = [_tb(c) for c in value_cols]

    if direction == "backward":
        # right rows sort BEFORE left at the same instant -> inclusive
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col), F.col("__side"), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda col: F.last(col, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left rows sort BEFORE right at the same instant (side desc) ->
        # the current-row-to-end frame still sees an equal-ts right row
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts_col), F.col("__side").desc(), *tiebreak)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda col: F.first(col, ignorenulls=True).over(w)  # noqa: E731
    # Pick the matched right row ATOMICALLY as one struct: per-column
    # last/first(ignorenulls) would mix values from different right rows
    # whenever a right value column contains a genuine NULL (the null skips
    # back to an older row for that column only).  The struct is non-null
    # for every right row even when its fields are null, so all output
    # columns come from the same matched row -- ASOF semantics.
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col(ts_col).alias("__ts"),
            *[F.col(f"__r_{c}").alias(f"__v_{c}") for c in value_cols],
        ),
    )
    out = unioned.withColumn("__pick", pick(payload)).withColumn(
        right_ts_alias, F.col("__pick.__ts")
    )
    for c in value_cols:
        out = out.withColumn(out_name[c], F.col(f"__pick.__v_{c}"))
    return out.where(F.col("__side") == 1).drop(
        "__side", "__pick", *[f"__r_{c}" for c in value_cols]
    )
