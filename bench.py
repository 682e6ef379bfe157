"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Each query materializes fully via the noop sink (all columns computed, no
collect bottleneck at the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from odp_dynamic_data_pipeline_spark.queries import SPARK_QUERIES  # noqa: E402
from odp_dynamic_data_pipeline_spark.session import get_spark  # noqa: E402

# every registered query is a headline query; order: cheap scans first.
# SPARK_GRAFT_BENCH_ONLY=name1,name2 restricts the run (harness smoke
# tests / single-query probes); round artifacts always use the full set.
BENCH_QUERIES = list(SPARK_QUERIES)
_only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
if _only:
    wanted = [n.strip() for n in _only.split(",") if n.strip()]
    unknown = [n for n in wanted if n not in SPARK_QUERIES]
    if unknown:
        raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY: unknown queries {unknown}")
    BENCH_QUERIES = wanted


def _st_probe_sec() -> float:
    """Fixed single-thread host-speed probe (VERDICT r13 item 1).

    min-of-3 of a 20,000,000-iteration pure-Python integer-sum loop --
    ~0.8 s in a healthy window on this container.  The container's
    effective CPU speed varies ~2x across hours (external
    oversubscription; adjudicated in NOTES_r13.md S9 / VERDICT r13), so
    every map carries its own calibration and tools/bench_drift.py scales
    its thresholds by the ratio of probes instead of treating host drift
    as code drift.  The loop spec is FROZEN: changing it breaks
    cross-round probe comparability.
    """
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = 0
        for i in range(20_000_000):
            x += i
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _cpu_jiffies() -> tuple[int, int] | None:
    """(busy, steal) jiffies from /proc/stat's aggregate cpu line.

    Steal is the cycles the hypervisor gave to OTHER tenants while this
    VM had runnable work -- the direct measurement of the external
    oversubscription that poisons bench windows here (r14: maps taken
    with a healthy 0.8 s single-thread probe still showed random 5-20x
    per-query spikes; the probe is a point sample, steal integrates the
    whole run).  Returns None where /proc/stat is unavailable."""
    try:
        parts = open("/proc/stat").readline().split()
        vals = [int(x) for x in parts[1:]]
        user, nice, system = vals[0], vals[1], vals[2]
        steal = vals[7] if len(vals) > 7 else 0
        return user + nice + system, steal
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    st_probe = _st_probe_sec()
    jiff0 = _cpu_jiffies()
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: JIT/codegen compilation, shuffle machinery, and the
    # Arrow Python-UDF worker pool are per-session fixed costs; without this
    # they are billed to whichever queries happen to run first.
    #
    # FROZEN as of round 5: the warmup set is (1) batch JIT/shuffle/window/
    # broadcast + pandas worker pool, (2) one tiny AvailableNow stream for
    # the micro-batch engine, (3) one untimed scan per input table for file
    # listing/footers.  Do NOT add further warmups -- growing this set
    # quietly flatters round-over-round comparisons; new fixed costs belong
    # in the timed numbers unless a PLANS.md adjudication argues otherwise.
    from pyspark.sql import Window
    from pyspark.sql import functions as SF

    warm = spark.range(10_000).selectExpr("id % 7 AS k", "id AS v")
    warm.groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    warm.mapInPandas(lambda it: it, warm.schema).write.format("noop").mode("overwrite").save()
    w = Window.partitionBy("k").orderBy("v")
    dim = spark.range(7).selectExpr("id AS k", "id * 2 AS d")
    (
        warm.withColumn("r", SF.row_number().over(w))
        .join(SF.broadcast(dim), "k")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # streaming machinery (micro-batch engine, state store providers,
    # checkpoint I/O paths) is another per-session fixed cost; a tiny
    # AvailableNow run here keeps it off the first *_stream query's bill
    import tempfile

    _stmp = tempfile.mkdtemp(prefix="bench_warm_stream_")
    spark.range(100).selectExpr("id", "id % 5 AS k").write.mode("overwrite").parquet(
        f"{_stmp}/in"
    )
    (
        spark.readStream.schema("id long, k long")
        .parquet(f"{_stmp}/in")
        .groupBy("k")
        .count()
        .writeStream.format("noop")
        .outputMode("complete")
        .option("checkpointLocation", f"{_stmp}/ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    import shutil

    shutil.rmtree(_stmp, ignore_errors=True)

    # touch every table once: file listing, footer reads, and the nanos
    # timestamp conversion are per-session costs, not per-query costs --
    # without this they bill to whichever query reads each table first
    from odp_dynamic_data_pipeline_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 - missing optional table
            pass

    # Warm probes run INLINE, immediately after each slow cold run (r12
    # VERDICT item 2): the old separate end-of-session warm pass ran under
    # 500+ s of accumulated JVM pressure and produced warm>cold inversions
    # that cost a round of adjudication receipts.  Inline, the warm number
    # answers exactly the question it exists for -- "was the cold number
    # per-query codegen/JIT?" -- under the SAME session state as its cold.
    warm_threshold = float(os.environ.get("SPARK_GRAFT_WARM_THRESHOLD_SEC", "2.0"))
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = SPARK_QUERIES[name]
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"bench error in {name}: {e!r}", file=sys.stderr)
            continue
        # warm re-run for slow outliers only: a first run pays per-query
        # whole-stage-codegen JIT (measured 1-5 s of pure compile on this
        # container), so "slow" on pass one is ambiguous; the warm number
        # separates compile noise from genuinely expensive plans at
        # bounded extra cost
        if timings[name] >= warm_threshold:
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                warm[name] = round(time.time() - t0, 3)
            except Exception:  # noqa: BLE001
                warm[name] = -1.0
    ok = [t for t in timings.values() if t >= 0]
    total = round(sum(ok), 3)
    # headline = mean wall sec per query: stable across rounds even as the
    # query count grows (total is still reported alongside)
    mean = round(total / max(len(ok), 1), 3)
    # batch vs streaming split: every micro-batch query pays seconds-class
    # fixed engine machinery per run (state-store providers, checkpoint
    # I/O, streaming codegen -- isolated floor measured 1.5-4.5 s warm in
    # STREAM_BENCH_LOCAL.json even for trivial plans), so folding the
    # twins into one mean misattributes that floor to data work
    batch_ok = [t for n, t in timings.items() if t >= 0 and "stream" not in n]
    stream_ok = [t for n, t in timings.items() if t >= 0 and "stream" in n]
    # gating-cadence queries run maintenance adversarially ON PURPOSE
    # (threshold-0 compaction, double expiry + superset replay) -- their
    # seconds measure the correctness gate, not production cost, so the
    # ex-gating aggregates are the round-over-round comparables (each has
    # a production-cadence twin in the registry; see queries/__init__.py)
    from odp_dynamic_data_pipeline_spark.queries import GATING_CADENCE, STORE_FAMILY

    gating = sorted(n for n in timings if n in GATING_CADENCE)
    ok_ex = [t for n, t in timings.items() if t >= 0 and n not in GATING_CADENCE]
    stream_ex = [
        t
        for n, t in timings.items()
        if t >= 0 and "stream" in n and n not in GATING_CADENCE
    ]
    result = {
        "metric": "mean_query_wall_sec",
        "value": mean,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "total_sec": total,
        "mean_batch_sec": round(sum(batch_ok) / max(len(batch_ok), 1), 3),
        "mean_stream_sec": round(sum(stream_ok) / max(len(stream_ok), 1), 3),
        "n_stream": len(stream_ok),
        "sf": sf,
        "n_queries": len(timings),
        "gating_cadence": gating,
        "total_sec_ex_gating": round(sum(ok_ex), 3),
        # None (not 0.0) when every stream timing is gating-tagged or
        # errored -- a 0.0 here would be indistinguishable from a genuine
        # near-zero mean in round-over-round comparison (r12 advisor)
        "mean_stream_sec_ex_gating": (
            round(sum(stream_ex) / len(stream_ex), 3) if stream_ex else None
        ),
        # explicit kvstore store-family tags for the drift gate's
        # fixed-drain-cost subtraction (replaces substring matching)
        "stream_families": {
            n: STORE_FAMILY[n] for n in sorted(timings) if n in STORE_FAMILY
        },
        # host-speed calibration, taken before session start and again
        # after the last query: a map whose probes disagree straddled a
        # host-speed shift mid-run
        "st_probe_sec": st_probe,
        "st_probe_end_sec": _st_probe_sec(),
        "cpus": int(cpus) if cpus.isdigit() else cpus,
    }
    # integrated hypervisor steal over the whole run: the fraction of
    # this VM's wanted cycles given to other tenants (0.0 = clean window)
    jiff1 = _cpu_jiffies()
    if jiff0 and jiff1:
        busy, steal = jiff1[0] - jiff0[0], jiff1[1] - jiff0[1]
        if busy + steal > 0:
            result["cpu_steal_frac"] = round(steal / (busy + steal), 4)
    line = json.dumps(result)
    # NOTE: a JSON result is printed as the VERY LAST line of this run
    # (see end of main) -- the driver parses the tail of the console
    # output, and anything printed after it (r10 lesson: the drift
    # gate's stderr) displaces it out of the tail-capture window, leaving
    # BENCH_r{N}.json with parsed=null.  r11 lesson: even as the last
    # line, the FULL 326-query map is ~14 KB and overflows the driver's
    # 2,000-char tail window, clipping the head of the JSON and leaving
    # parsed=null anyway.  So the console line is a COMPACT summary
    # (headline metric + aggregates + the slowest queries that fit),
    # with the full per-query map persisted to BENCH_LOCAL*.json files.
    # full artifact to a file as well: the driver records the console tail,
    # which truncates once the query map outgrows the tail window
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
    )
    try:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"bench: could not write {out_path}: {e!r}", file=sys.stderr)
    # round-stamped copy: the driver's BENCH_r{N}.json keeps only a 2,000
    # char tail of stdout, so per-query round-over-round diffs need the
    # full map persisted per round (VERDICT r5 item 3).  Round = 1 + the
    # highest recorded driver bench artifact.  Stamped ONLY for sf0.1 runs
    # (the driver's benchmark scale) -- a small-sf smoke run must not
    # clobber the round's comparable artifact.
    stamped_path = None
    # never stamp a partial (BENCH_ONLY) run as a round artifact
    if abs(sf - 0.1) < 1e-9 and not _only:
        import glob
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        # NEVER clobber an existing round map: sibling runs in the same
        # round stamp to r{N}b, r{N}c, ... so every map stays a genuinely
        # independent measurement (r9 lesson: the overwrite silently turned
        # the committed "sibling" into a byte-copy of the second run and
        # lost the first run's map entirely)
        base = f"BENCH_LOCAL_r{max(rounds, default=0) + 1:02d}"
        stamped = os.path.join(here, f"{base}.json")
        for suffix in "bcdefghij":
            if not os.path.exists(stamped):
                break
            stamped = os.path.join(here, f"{base}{suffix}.json")
        try:
            with open(stamped, "w") as f:
                f.write(line + "\n")
            stamped_path = stamped
        except OSError as e:
            print(f"bench: could not write {stamped}: {e!r}", file=sys.stderr)
        # Drift gate on the map just written, BY CONTRACT (VERDICT r9
        # item 1: the r9 final map shipped with an unadjudicated warm
        # doubling because the gate only ran on earlier sibling maps).
        # Gate output goes to stderr AND a side file; crucially it is
        # emitted BEFORE the final JSON print below, so the map is always
        # the last console line (VERDICT r10 item 2: the gate's trailing
        # stderr displaced the map from the driver's tail window and
        # BENCH_r10.json recorded parsed=null).  A surviving flag is loud
        # but non-fatal -- the numbers are still real measurements, the
        # flag is the adjudication TODO.
        import subprocess

        try:
            gate = subprocess.run(
                [sys.executable, os.path.join(here, "tools", "bench_drift.py"), stamped],
                capture_output=True,
                text=True,
                timeout=120,
            )
            gate_lines = (gate.stdout + gate.stderr).strip().splitlines()
            for ln in gate_lines:
                print(f"bench[drift-gate]: {ln}", file=sys.stderr)
            try:
                with open(os.path.join(here, "BENCH_DRIFT_GATE.txt"), "w") as f:
                    f.write(f"map: {os.path.basename(stamped)}\n")
                    f.write("\n".join(gate_lines) + "\n")
            except OSError:
                pass
        except Exception as e:  # noqa: BLE001 -- gate failure must not kill the bench
            print(f"bench: drift gate failed to run: {e!r}", file=sys.stderr)
    spark.stop()
    # LAST line of the run, by contract: the driver's BENCH_r{N}.json
    # parses the console tail for this JSON object.  Build a compact
    # summary guaranteed to fit the 2,000-char tail window: all the
    # aggregate fields, plus as many of the slowest per-query timings as
    # fit in the remaining budget (the slow tail is what round-over-round
    # comparison needs most; the full map is in the files above).
    compact = {
        k: v
        for k, v in result.items()
        if k not in ("queries", "queries_warm", "stream_families")
    }
    compact["full_map"] = os.path.basename(stamped_path or out_path)
    compact["queries_note"] = "slowest-first subset; full map in full_map file"
    slowest = sorted(
        ((n, t) for n, t in timings.items() if t >= 0),
        key=lambda kv: -kv[1],
    )
    budget = 1900 - len(json.dumps(compact)) - len('"queries": {}')
    subset: dict[str, float] = {}
    for n, t in slowest:
        entry_len = len(json.dumps({n: t})) + 2
        if budget - entry_len < 0:
            break
        budget -= entry_len
        subset[n] = t
    compact["queries"] = subset
    compact_line = json.dumps(compact)
    if len(compact_line) > 1950:  # never let the contract line overflow
        compact["queries"] = {}
        compact["queries_note"] = "subset dropped: summary alone near tail limit"
        compact_line = json.dumps(compact)
    sys.stdout.flush()
    sys.stderr.flush()
    print(compact_line, flush=True)


if __name__ == "__main__":
    main()
