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
