"""J3-J6: multi-source correlation (event -> trace -> span -> log).

Reference semantics (src/batch_tlb.py:27-35,65-77): build trace->spans and
span->logs indexes, then for each event probe
event.traceId -> trace.spans -> logs, accumulating conditional counters.
The probe *multiplies*: N events on the same trace count that trace's logs N
times -- a plain chain of inner joins reproduces this, so we do NOT dedup
(SURVEY.md section 2.3 note a).

Spark-native: explode the nested spans array once, then a 3-way equi-join.
The exploded trace->span table is typically dimension-sized relative to the
log/event fact tables; joins shuffle on traceId/spanId (or broadcast when
small) and Catalyst/AQE pick the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(traces: DataFrame) -> DataFrame:
    """trace(traceId, spans:array<struct>) -> one row per (traceId, spanId)
    (J3 without materializing per-trace lists)."""
    return traces.select("traceId", F.explode("spans").alias("span")).select(
        "traceId", F.col("span.spanId").alias("spanId")
    )


def correlate_events_logs(
    events: DataFrame,
    traces: DataFrame,
    logs: DataFrame,
    *,
    event_cols: list[str] | None = None,
    log_cols: list[str] | None = None,
) -> DataFrame:
    """events |><| trace_spans |><| logs (inner, multiplicity-preserving)."""
    spans = explode_spans(traces)
    ev = events.select(*(event_cols or events.columns))
    lg = logs.select("spanId", *[c for c in (log_cols or logs.columns) if c != "spanId"])
    return ev.join(spans, "traceId", "inner").join(lg, "spanId", "inner")
