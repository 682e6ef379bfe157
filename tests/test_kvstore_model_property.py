"""Model-based property test of the ManifestStore fold/retry/vacuum
protocol: hypothesis drives RANDOM interleavings of
  - fold(next batch_id, random rows)
  - retry (re-apply the LAST batch verbatim -- the post-flip retry path)
  - vacuum
against the bucketed incremental aggregate, and after every operation
the store read must equal a pure-Python dict model that only ever
applies each batch ONCE.  This is the receipt the example-based matrix
(tests/test_kvstore_matrix.py) cannot give: no hand-picked interleaving,
arbitrary retry positions (including retry-after-vacuum and double
retry), arbitrary vacuum positions -- any sequence that diverges from
the exactly-once model is a protocol bug.

Kept cheap: tiny keyspace (4 keys), <=6 operations, n_buckets=4, and a
shared Spark session; ~10 examples cover hundreds of distinct
interleavings across runs because hypothesis shrinks toward the minimal
failing sequence when one exists.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odp_dynamic_data_pipeline_spark.streaming.kvstore import ManifestStore
from odp_dynamic_data_pipeline_spark.streaming.stream import (
    apply_incremental_agg_batch,
    read_incremental_agg,
)

rows_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(1, 9)),
    min_size=1,
    max_size=4,
)
ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("fold"), rows_strategy),
        st.tuples(st.just("retry"), st.none()),
        st.tuples(st.just("vacuum"), st.none()),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_fold_retry_vacuum_interleavings_match_exactly_once_model(
    spark, tmp_path_factory, ops
):
    tmp = tmp_path_factory.mktemp("kvmodel")
    store = str(tmp / "store")
    model: dict[str, list[int]] = defaultdict(lambda: [0, 0])  # k -> [n, sum]
    batch_id = -1
    last_rows = None

    def check():
        if batch_id < 0:
            return  # nothing folded yet: no manifest to read
        got = {
            (r["k"], r["n"], r["sum_x"])
            for r in read_incremental_agg(spark, store).select("k", "n", "sum_x").collect()
        }
        want = {(k, v[0], v[1]) for k, v in model.items()}
        assert got == want, f"store diverged from model after ops: {got} != {want}"

    for op, arg in ops:
        if op == "fold":
            batch_id += 1
            last_rows = arg
            df = spark.createDataFrame(arg, "k string, x long")
            apply_incremental_agg_batch(
                df, batch_id, store, key_cols=["k"], sum_col="x", n_buckets=4
            )
            for k, x in arg:  # model applies the batch exactly once
                model[k][0] += 1
                model[k][1] += x
        elif op == "retry" and last_rows is not None:
            df = spark.createDataFrame(last_rows, "k string, x long")
            apply_incremental_agg_batch(
                df, batch_id, store, key_cols=["k"], sum_col="x", n_buckets=4
            )
            # model unchanged: a retry must not double-count
        elif op == "vacuum" and batch_id >= 0:
            ManifestStore(spark, store).vacuum()
        check()


upsert_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(1, 20),  # seq: arbitrary order across batches
        st.sampled_from(["x", "y", "z"]),
        st.booleans(),  # delete tombstone flag
    ),
    min_size=1,
    max_size=4,
)
upsert_ops = st.lists(
    st.one_of(
        st.tuples(st.just("fold"), upsert_rows),
        st.tuples(st.just("retry"), st.none()),
        st.tuples(st.just("vacuum"), st.none()),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=upsert_ops)
def test_upsert_interleavings_match_last_wins_model(spark, tmp_path_factory, ops):
    """Same harness for the CDC upsert: the model keeps, per key, the row
    with the max (seq, val) tuple over every batch applied ONCE -- late
    and out-of-order seqs included (max-by-seq is commutative, so unlike
    sessions there is no chronology constraint to respect).  Rows carry a
    random DELETE flag: the raw store must retain winning tombstones and
    the live (delete-filtered) read must hide exactly them."""
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_upsert_batch,
        read_incremental_upsert,
    )

    tmp = tmp_path_factory.mktemp("kvmodel_up")
    store = str(tmp / "store")
    best: dict[str, tuple] = {}
    batch_id = -1
    last_rows = None

    def apply(rows):
        df = spark.createDataFrame(rows, "k string, seq long, val string, del boolean")
        apply_incremental_upsert_batch(
            df, batch_id, store, key_cols=["k"], seq_cols=["seq", "val"],
            n_buckets=4, delete_col="del",
        )

    def check():
        if batch_id < 0:
            return
        got = {
            tuple(r)
            for r in read_incremental_upsert(spark, store)
            .select("k", "seq", "val", "del")
            .collect()
        }
        want = set(best.values())
        assert got == want, f"upsert raw state diverged: {got} != {want}"
        got_live = {
            tuple(r)
            for r in read_incremental_upsert(spark, store, delete_col="del")
            .select("k", "seq", "val", "del")
            .collect()
        }
        want_live = {v for v in best.values() if not v[3]}
        assert got_live == want_live, f"live view diverged: {got_live} != {want_live}"

    for op, arg in ops:
        if op == "fold":
            batch_id += 1
            last_rows = arg
            apply(arg)
            for k, seq, val, dl in arg:
                # deterministic winner: max (seq, val), mirroring seq_cols
                if k not in best or (seq, val) > (best[k][1], best[k][2]):
                    best[k] = (k, seq, val, dl)
        elif op == "retry" and last_rows is not None:
            apply(last_rows)  # model unchanged
        elif op == "vacuum" and batch_id >= 0:
            ManifestStore(spark, store, n_extras=2).vacuum()
        check()


session_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("fold"),
            st.lists(
                st.tuples(st.sampled_from(["u1", "u2", "u3"]), st.integers(0, 3)),
                min_size=1,
                max_size=4,
            ),
        ),
        st.tuples(st.just("retry"), st.none()),
        st.tuples(st.just("vacuum"), st.none()),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=session_ops)
def test_sessions_interleavings_match_walk_model(spark, tmp_path_factory, ops):
    """Sessions under random retry/vacuum interleavings: fold i carries
    events in hour-window [4i, 4i+3] (chronology guaranteed by
    construction, as the production file drops guarantee it), retries
    replay the last batch verbatim, and the read must equal a pure-Python
    gap+cap walk over the batches applied exactly once."""
    import datetime as dt

    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        apply_incremental_sessions_batch,
        read_incremental_sessions,
    )

    T0 = dt.datetime(2024, 1, 1)
    GAP_S, CAP_S = 2 * 3600, 6 * 3600
    tmp = tmp_path_factory.mktemp("kvmodel_sess")
    store, out = str(tmp / "store"), str(tmp / "out")
    applied: list[list[tuple[str, int]]] = []
    batch_id = -1
    last_hours = None

    def apply(hours):
        df = spark.createDataFrame(
            [(u, T0 + dt.timedelta(hours=h)) for u, h in hours],
            "user_id string, ts timestamp",
        )
        apply_incremental_sessions_batch(
            df, batch_id, store, out,
            group_col="user_id", ts_col="ts",
            gap_s=GAP_S, cap_s=CAP_S, n_buckets=4,
        )

    def model():
        base_us = int(T0.timestamp()) * 1_000_000
        want = set()
        for u in ("u1", "u2", "u3"):
            # every event row counts, duplicates included -- the operator
            # counts rows, not distinct timestamps
            ts = sorted(base_us + h * 3_600_000_000 for b in applied for uu, h in b if uu == u)
            sess, i = 0, 0
            while i < len(ts):
                sess += 1
                start, last, n, j = ts[i], ts[i], 1, i + 1
                while j < len(ts) and ts[j] - ts[j - 1] <= GAP_S * 1_000_000 and ts[j] - start <= CAP_S * 1_000_000:
                    last, n, j = ts[j], n + 1, j + 1
                want.add((u, sess, n, start, last))
                i = j
        return want

    def check():
        if batch_id < 0:
            return
        got = {
            tuple(r) for r in read_incremental_sessions(spark, store, out).collect()
        }
        assert got == model(), f"sessions diverged: {got} != {model()}"

    for op, arg in ops:
        if op == "fold":
            batch_id += 1
            # shift this batch's hours into its own 4-hour window so
            # chronology holds whatever hypothesis generated
            hours = [(u, 4 * batch_id + h) for u, h in arg]
            last_hours = hours
            applied.append(hours)
            apply(hours)
        elif op == "retry" and last_hours is not None:
            apply(last_hours)  # model unchanged
        elif op == "vacuum" and batch_id >= 0:
            ManifestStore(spark, store, n_extras=2).vacuum()
        check()
