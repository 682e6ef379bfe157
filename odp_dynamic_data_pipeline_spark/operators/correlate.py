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


def markov_removal_attribution(trans: DataFrame, iters: int = 8) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2016) over a
    journey transition-count table ``(src, dst, cnt)`` whose states are
    channel names plus the absorbing 'CONV'/'NULL' and the virtual
    'START'.  For the base chain and one removal scenario per channel
    (the channel forced to absorb at 0 -- journeys through it die), run
    ``iters`` synchronous steps of the k-step absorption recurrence
    p(s) = sum_t cnt(s,t) * p(t) div out(s) in e9 fixed point -- integer
    truncating arithmetic every step, so a SQL oracle replays every
    iteration bit-for-bit.  The k-step truncation is the DEFINED
    statistic (it converges geometrically and both engines compute the
    identical value; asymptotics are not the contract).

    Scale shape: the transition table is bounded by the CHANNEL DOMAIN
    squared (schema, not data), so after the one heavy distributed pass
    that builds ``trans``, the matrix is collected and iterated on the
    driver in exact Python integers -- the same bounded-collect license
    as global_rank's partition offsets and the k-means/PQ codebooks.  An
    8-iteration lattice of a few dozen rows is driver arithmetic, not a
    distributed job (the DataFrame-loop form measured 40 s of pure plan
    overhead for identical values).

    Removal monotonicity holds exactly: forcing p[c]=0 can only lower
    every later p pointwise (nonnegative coefficients, truncating div is
    monotone), so removal_effect_e6 is never negative even in fixed
    point.  Output: one row per channel with the base and removed k-step
    conversion, the removal effect, and the effect-normalized
    attribution share."""
    e9 = 1_000_000_000
    rows = trans.select("src", "dst", "cnt").collect()  # bounded: |domain|^2
    cnt: dict[tuple[str, str], int] = {(r.src, r.dst): int(r.cnt) for r in rows}
    out: dict[str, int] = {}
    for (s, _), c in cnt.items():
        out[s] = out.get(s, 0) + c
    # states come from BOTH columns: a caller-built trans may contain a
    # dst channel that never occurs as src (no outgoing edges -- it
    # absorbs to 0 like NULL); deriving from src alone made p[d] a
    # KeyError on such malformed-but-acceptable input
    channels = sorted(
        {s for s, _ in cnt if s != "START"}
        | {d for _, d in cnt if d not in ("START", "CONV", "NULL")}
    )
    states = channels + ["START", "CONV", "NULL"]
    by_src: dict[str, list[tuple[str, int]]] = {}
    for (s, d), c in cnt.items():
        by_src.setdefault(s, []).append((d, c))

    def absorb(removed: str | None) -> int:
        p = {s: 0 for s in states}
        p["CONV"] = e9
        for _ in range(iters):
            nxt = {}
            for s in states:
                if s == "CONV":
                    nxt[s] = e9
                elif s == "NULL" or s == removed:
                    nxt[s] = 0
                else:
                    o = out.get(s, 0)
                    nxt[s] = (
                        sum(c * p[d] for d, c in by_src.get(s, ())) // o
                        if o
                        else 0
                    )
            p = nxt
        return p["START"]

    base = absorb(None)
    eff = []
    for c in channels:
        removed = absorb(c)
        effect = (1_000_000 * (base - removed)) // base if base > 0 else 0
        eff.append((c, base, removed, effect))
    tot = sum(e for *_, e in eff)
    out_rows = [
        (c, b, r, e, (1_000_000 * e) // tot if tot > 0 else 0)
        for c, b, r, e in eff
    ]
    from odp_dynamic_data_pipeline_spark.functions.localrel import local_relation

    return local_relation(
        trans.sparkSession,
        out_rows,
        "channel string, base_conv_e9 long, removed_conv_e9 long,"
        " removal_effect_e6 long, attribution_share_e6 long",
    )
