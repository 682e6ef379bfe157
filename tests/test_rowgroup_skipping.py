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
