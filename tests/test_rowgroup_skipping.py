"""Parquet row-group min/max skipping: the layout contract, measured on
real footers.

zorder_layout_report models the min/max spans a clustered layout gives;
this test closes the loop on REAL files: the same data written sorted
vs unsorted by the predicate column, footers read back with pyarrow,
and the row groups a min/max-pruning reader must touch counted for a
narrow range predicate.  Sorted layout -> the predicate's rows live in
a contiguous handful of groups; unsorted -> every group's [min,max]
straddles the range and nothing prunes.  At 100 TB this is the entire
case for sort-on-write compaction: the scan cost of a selective query
is proportional to the groups that OVERLAP the predicate, not to the
table.  The Spark side of the contract (predicate reaches the scan) is
pinned via PushedFilters.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.1"
LO, HI = 10.0, 15.0


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

    tmp = str(tmp_path_factory.mktemp("layouts"))
    ev = load_table(spark, SF_DIR, "events").select("event_id", "value")
    # small block size so the 100k-row fixture produces many row groups
    (
        ev.orderBy("value")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(f"{tmp}/sorted")
    )
    (
        ev.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(f"{tmp}/unsorted")
    )
    return tmp


def _overlapping_groups(path: str) -> tuple[int, int]:
    hit = tot = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        value_idx = md.schema.names.index("value")
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(value_idx).statistics
            tot += 1
            if st.min <= HI and st.max >= LO:
                hit += 1
    return hit, tot


def test_sorted_layout_prunes_row_groups(layouts):
    s_hit, s_tot = _overlapping_groups(f"{layouts}/sorted")
    u_hit, u_tot = _overlapping_groups(f"{layouts}/unsorted")
    assert s_tot >= 10 and u_tot >= 10  # the fixture actually made many groups
    # unsorted: value spans ~0..560 in every group -> nothing prunes
    assert u_hit == u_tot
    # sorted: the 10..15 band lives in a contiguous sliver of groups
    assert s_hit <= s_tot // 4, (s_hit, s_tot)


def test_filter_reaches_the_scan(spark, layouts):
    df = spark.read.parquet(f"{layouts}/sorted").where(f"value >= {LO} AND value <= {HI}")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(value," in plan, plan[:1500]


def test_both_layouts_agree_on_results(spark, layouts):
    a = spark.read.parquet(f"{layouts}/sorted").where(f"value >= {LO} AND value <= {HI}")
    b = spark.read.parquet(f"{layouts}/unsorted").where(f"value >= {LO} AND value <= {HI}")
    assert sorted(r["event_id"] for r in a.collect()) == sorted(
        r["event_id"] for r in b.collect()
    )

def test_zorder_prunes_both_dimensions_on_real_footers(spark, tmp_path_factory):
    """2-D upgrade of the sorted-vs-unsorted measurement, on real footers:
    the SAME events written (a) linear-sorted by user_id, (b) linear-sorted
    by hour, (c) Z-ordered on RANGE-NORMALIZED 5-bit bins of both, and (d)
    Z-ordered on the RAW values.  Measured here (sf0.1, 64 KB groups):

      layout      2-D box   user-only   hour-only
      by_user       3/31       3/31       31/31   <- other dim never prunes
      by_hour       5/31      31/31        5/31
      z-normalized  3/31      10/31        9/31   <- ONE layout serves all
      z-raw         4/31       4/31       31/31   <- degenerate footgun

    Two pinned claims: (1) the normalized z-order layout prunes BOTH
    single-dimension predicates and matches the best linear sort on the
    2-D box -- the measured version of zorder_layout_report's model; and
    (2) interleaving RAW values with unbalanced bit widths (11-bit
    user_id vs 5-bit hour) DEGENERATES to the wide dimension's linear
    sort -- hour never prunes -- which is exactly why production
    OPTIMIZE ZORDER range-bins every dimension to equal-width ranks
    before interleaving.  Bin first, interleave second."""
    from pyspark.sql import functions as F

    from odp_dynamic_data_pipeline_spark.operators.partitioning import zorder_value
    from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

    tmp = str(tmp_path_factory.mktemp("zorder2d"))
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", F.hour("ts").alias("hour"), "event_id"
    )
    opts = {"parquet.block.size": str(64 * 1024)}
    ev.orderBy("user_id").coalesce(1).write.mode("overwrite").options(
        **opts
    ).parquet(f"{tmp}/by_user")
    ev.orderBy("hour").coalesce(1).write.mode("overwrite").options(
        **opts
    ).parquet(f"{tmp}/by_hour")
    # normalized: both dims binned to ~32 equal-width ranks (5 bits)
    b = ev.withColumn("ub", F.expr("CAST(user_id div 47 AS BIGINT)")).withColumn(
        "hb", F.expr("CAST(hour * 32 div 24 AS BIGINT)")
    )
    zn = zorder_value(["ub", "hb"], bits_per_col=5)
    b.withColumn("__z", zn).orderBy("__z", "user_id", "hour").drop(
        "__z", "ub", "hb"
    ).coalesce(1).write.mode("overwrite").options(**opts).parquet(f"{tmp}/znorm")
    # raw: unbalanced bit widths, the footgun
    zr = zorder_value(["user_id", "hour"], bits_per_col=16)
    ev.withColumn("__z", zr).orderBy("__z").drop("__z").coalesce(1).write.mode(
        "overwrite"
    ).options(**opts).parquet(f"{tmp}/zraw")

    u_lo, u_hi, h_lo, h_hi = 100, 200, 3, 5

    def overlap(path, use_u, use_h):
        hit = tot = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ui = md.schema.names.index("user_id")
            hj = md.schema.names.index("hour")
            for i in range(md.num_row_groups):
                su = md.row_group(i).column(ui).statistics
                sh = md.row_group(i).column(hj).statistics
                tot += 1
                ok_u = (not use_u) or (su.min <= u_hi and su.max >= u_lo)
                ok_h = (not use_h) or (sh.min <= h_hi and sh.max >= h_lo)
                if ok_u and ok_h:
                    hit += 1
        return hit, tot

    m = {
        lay: {
            "box": overlap(f"{tmp}/{lay}", True, True),
            "u": overlap(f"{tmp}/{lay}", True, False),
            "h": overlap(f"{tmp}/{lay}", False, True),
        }
        for lay in ("by_user", "by_hour", "znorm", "zraw")
    }
    tot = m["znorm"]["box"][1]
    assert tot > 10, m
    # each linear sort reads EVERYTHING for the other dimension's predicate
    assert m["by_user"]["h"][0] == m["by_user"]["h"][1], m
    assert m["by_hour"]["u"][0] == m["by_hour"]["u"][1], m
    # normalized z-order prunes BOTH single-dim predicates substantially
    assert m["znorm"]["u"][0] <= tot // 2, m
    assert m["znorm"]["h"][0] <= tot // 2, m
    # and stays competitive with the best linear sort on the 2-D box
    best_linear = min(m["by_user"]["box"][0], m["by_hour"]["box"][0])
    assert m["znorm"]["box"][0] <= best_linear + 2, m
    # the raw-interleave footgun: hour never prunes (degenerates to by_user)
    assert m["zraw"]["h"][0] == m["zraw"]["h"][1], m
