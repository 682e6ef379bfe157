"""Window-hash skew receipt (VERDICT r8 item 8): a mega-viral
boilerplate window is ONE hot key on the ExactSubstr family's ``wh``
shuffle.  The crafted corpus here gives one window 20,000 occurrences
(the 10^6 receipt is recorded in SCALE.md -- same plan, bigger n) and
pins the two properties that keep the hot key harmless:

  1. the occurrence count partial-aggregates map-side (the hot key
     crosses the shuffle as one row per upstream partition);
  2. the join-back of duplicated hashes onto the window table finishes
     as a BroadcastHashJoin under AQE -- the corpus-scale window table
     is never re-shuffled on the hot key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.text import (
    occurrence_duplicate_spans,
    window_heavy_hitters,
)

PASSAGE = " ".join(f"P{i}" for i in range(8))
N = 20_000


def _corpus(spark):
    # every doc: two unique filler tokens, then the shared 8-token
    # passage -> ONE window hash with N occurrences, 2N unique-ish others
    return spark.range(N).selectExpr(
        "id AS doc_id",
        f"concat('u', id, 'a u', id, 'b {PASSAGE}') AS text",
    )


def test_hot_window_spans_correct_and_joinback_broadcast(spark):
    spans = occurrence_duplicate_spans(_corpus(spark), "text", min_tokens=8)
    spans = spans.persist()
    assert spans.count() == N  # every doc flagged exactly once
    assert {
        (r.span_start, r.span_end, r.span_tokens)
        for r in spans.select("span_start", "span_end", "span_tokens")
        .distinct()
        .collect()
    } == {(3, 10, 8)}
    plan = spans._jdf.queryExecution().executedPlan().toString()
    spans.unpersist()
    assert "isFinalPlan=true" in plan
    # join-back of the (tiny) duplicated-hash set onto the window table:
    # broadcast, never a shuffle of the exploded window side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the occurrence count partial-aggregates before its exchange (the
    # hot key is combined map-side)
    assert "partial_count" in plan


def test_heavy_hitter_report_finds_the_hot_key(spark):
    top = window_heavy_hitters(_corpus(spark), "text", min_tokens=8, top=5).collect()
    assert top[0].n_occurrences == N and top[0].n_docs == N
    # the filler windows are unique -- nothing else passes the >=2 gate
    assert len(top) == 1


def test_heavy_hitter_validation(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="top"):
        window_heavy_hitters(docs, "text", top=0)
