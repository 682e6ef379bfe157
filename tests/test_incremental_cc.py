"""Crafted-batch tests for the incremental connected-components store
(streaming.stream.apply_incremental_cc_batch): multi-generation chain
merges, post-flip retry, chain compaction, and isolated-node semantics
-- the protocol corners the registry's stream==batch oracle
(incremental_clusters_stream) exercises only implicitly."""

from __future__ import annotations

from odp_dynamic_data_pipeline_spark.streaming.kvstore import ManifestStore
from odp_dynamic_data_pipeline_spark.streaming.stream import (
    apply_incremental_cc_batch,
    compact_incremental_cc,
    read_incremental_cc,
)


def _mk(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _labels(spark, store, universe=None):
    return {
        r["doc_id"]: r["component"]
        for r in read_incremental_cc(spark, store, universe=universe).collect()
    }


def test_incremental_cc_two_generation_chain(spark, tmp_path):
    store = f"{tmp_path}/cc"
    # b0: two separate components {1,2} and {5,6}
    apply_incremental_cc_batch(_mk(spark, [(1, 2), (5, 6)]), 0, store, n_buckets=8)
    assert _labels(spark, store) == {1: 1, 2: 1, 5: 5, 6: 5}
    # b1: edge (2,5) merges them -> chain entry 5 -> 1
    apply_incremental_cc_batch(_mk(spark, [(2, 5)]), 1, store, n_buckets=8)
    assert _labels(spark, store) == {1: 1, 2: 1, 5: 1, 6: 1}
    # b2: new root 0 absorbs everything (1 -> 0, so the 5 -> 1 entry must
    # RE-CLOSE to 5 -> 0), plus new node 9 attaches via the stale-labeled 6
    apply_incremental_cc_batch(_mk(spark, [(0, 2), (6, 9)]), 2, store, n_buckets=8)
    assert _labels(spark, store) == {0: 0, 1: 0, 2: 0, 5: 0, 6: 0, 9: 0}
    # the chain holds ONLY merge events of existing comps (1->0, 5->0),
    # never per-node entries
    m = ManifestStore(spark, f"{store}/labels", n_extras=2).read_manifest()
    assert dict(m.extras[0]) == {1: 0, 5: 0}


def test_incremental_cc_post_flip_retry(spark, tmp_path):
    store = f"{tmp_path}/cc"
    apply_incremental_cc_batch(_mk(spark, [(1, 2), (5, 6)]), 0, store, n_buckets=8)
    for _ in range(2):  # batch 1 applied twice: post-flip retry replay
        apply_incremental_cc_batch(_mk(spark, [(2, 5)]), 1, store, n_buckets=8)
    assert _labels(spark, store) == {1: 1, 2: 1, 5: 1, 6: 1}
    m = ManifestStore(spark, f"{store}/labels", n_extras=2).read_manifest()
    assert m.current == "v1_r1" and dict(m.extras[0]) == {5: 1}


def test_incremental_cc_compaction_resets_chain(spark, tmp_path):
    store = f"{tmp_path}/cc"
    apply_incremental_cc_batch(_mk(spark, [(1, 2), (5, 6)]), 0, store, n_buckets=8)
    apply_incremental_cc_batch(_mk(spark, [(2, 5)]), 1, store, n_buckets=8)
    assert compact_incremental_cc(spark, store, n_buckets=8) == 1
    m = ManifestStore(spark, f"{store}/labels", n_extras=2).read_manifest()
    assert not m.extras[0]  # chain reset: folded into the label rows
    assert _labels(spark, store) == {1: 1, 2: 1, 5: 1, 6: 1}
    assert compact_incremental_cc(spark, store, n_buckets=8) == 0  # idempotent
    # folds keep working on the compacted store
    apply_incremental_cc_batch(_mk(spark, [(0, 6)]), 2, store, n_buckets=8)
    assert _labels(spark, store) == {0: 0, 1: 0, 2: 0, 5: 0, 6: 0}


def test_incremental_cc_isolated_universe(spark, tmp_path):
    store = f"{tmp_path}/cc"
    apply_incremental_cc_batch(_mk(spark, [(1, 2)]), 0, store, n_buckets=8)
    uni = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    got = _labels(spark, store, universe=uni)
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4}
