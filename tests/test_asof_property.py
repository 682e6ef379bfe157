"""Property test: asof_join (union + ordered window) equals the obvious
per-row reference (latest right row with ts <= left ts, per key)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from odp_dynamic_data_pipeline_spark.operators.asof import asof_join

ts_strat = st.integers(min_value=0, max_value=20)
key_strat = st.integers(min_value=0, max_value=2)


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(key_strat, ts_strat), min_size=1, max_size=8),
    right=st.lists(st.tuples(key_strat, ts_strat, st.integers(0, 99)), max_size=8),
)
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, lid long"
    )
    rdf = spark.createDataFrame(right, "k long, ts long, val long")
    got = {
        r["lid"]: (r["right_ts"], r["val"])
        for r in asof_join(ldf, rdf, on="k", ts_col="ts", right_ts_alias="right_ts").collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        if not cands:
            assert got[i] == (None, None), (i, got[i])
        else:
            best_ts = max(rt for rt, _ in cands)
            # ties on right ts: asof takes the last row in window order --
            # assert the ts, and that the value is among the tied rows
            assert got[i][0] == best_ts
            assert got[i][1] in {v for rt, v in cands if rt == best_ts}
