"""run_incremental_hamming: cross-batch retrieval against the accreted
band index, retry idempotence of the batch-keyed store, and stream ==
batch equality on a single AvailableNow pass."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from odp_dynamic_data_pipeline_spark.operators.dedup import hamming_join
from odp_dynamic_data_pipeline_spark.sources.readers import read_file_stream
from odp_dynamic_data_pipeline_spark.streaming.stream import run_incremental_hamming

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash60", LongType())]
)


def _write_batches(tmp_path, batches):
    d = tmp_path / "hm_in"
    d.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        p = d / f"b{i}.json"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (now - 60 + 30 * i, now - 60 + 30 * i))
    return str(d)


def test_cross_batch_pairs_and_store_accretion(spark, tmp_path):
    base = (1 << 59) - 1
    # batch 1: A and B differ in 2 bits (pair batch-internally);
    # batch 2: C differs from A by 1 bit (pair via the HISTORICAL store),
    #          D is far from everything (no pair)
    b1 = [{"doc_id": 1, "simhash60": base}, {"doc_id": 2, "simhash60": base ^ 0b11}]
    b2 = [{"doc_id": 3, "simhash60": base ^ (1 << 40)}, {"doc_id": 4, "simhash60": 0}]
    src = _write_batches(tmp_path, [b1, b2])
    stream = read_file_stream(spark, src, SCHEMA, multiline=False, max_files_per_trigger=1)
    store, out = str(tmp_path / "hm_store"), str(tmp_path / "hm_out")
    run_incremental_hamming(
        stream, store, out, checkpoint=str(tmp_path / "hm_ck"), max_dist=3
    )
    got = {
        (r.id_a, r.id_b, r.dist) for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 2, 2), (1, 3, 1), (2, 3, 3)}
    assert sorted(os.listdir(f"{store}/bands")) == ["batch_id=0", "batch_id=1"]


def test_retry_excludes_own_failed_partition(spark, tmp_path):
    # simulate a replayed batch: the store already holds THIS batch's rows
    # under the same batch_id (a failed attempt) -- the retry must not
    # pair the batch against its own ghost
    rows = [{"doc_id": 1, "simhash60": 7}, {"doc_id": 2, "simhash60": 7}]
    src = _write_batches(tmp_path, [rows])
    store, out = str(tmp_path / "hm_store"), str(tmp_path / "hm_out")
    ghost = spark.createDataFrame(
        [(1, 7, 0, 7), (2, 7, 0, 7)], "doc_id long, simhash60 long, bi int, bv long"
    )
    ghost.write.mode("overwrite").parquet(f"{store}/bands/batch_id=0")
    stream = read_file_stream(spark, src, SCHEMA, multiline=False)
    run_incremental_hamming(
        stream, store, out, checkpoint=str(tmp_path / "hm_ck"), max_dist=3
    )
    got = [(r.id_a, r.id_b, r.dist) for r in spark.read.parquet(out).collect()]
    assert got == [(1, 2, 0)]  # once, not doubled through the ghost partition


def test_single_pass_equals_batch_join(spark, tmp_path):
    import random

    rng = random.Random(9)
    rows = [{"doc_id": i, "simhash60": rng.getrandbits(59)} for i in range(30)]
    for i in range(0, 30, 5):  # plant near-dups
        rows.append({"doc_id": 100 + i, "simhash60": rows[i]["simhash60"] ^ (1 << (i % 59))})
    src = _write_batches(tmp_path, [rows])
    stream = read_file_stream(spark, src, SCHEMA, multiline=False)
    store, out = str(tmp_path / "hm_store"), str(tmp_path / "hm_out")
    run_incremental_hamming(
        stream, store, out, checkpoint=str(tmp_path / "hm_ck"), max_dist=3
    )
    got = {(r.id_a, r.id_b, r.dist) for r in spark.read.parquet(out).collect()}
    df = spark.createDataFrame(
        [(r["doc_id"], r["simhash60"]) for r in rows], "doc_id long, simhash60 long"
    )
    want = {
        (r.id_a, r.id_b, r.dist)
        for r in hamming_join(df, id_col="doc_id", code_col="simhash60", max_dist=3).collect()
    }
    assert got == want and len(want) >= 6


def test_redelivered_id_no_self_pair_no_reemission(spark, tmp_path):
    # ADVICE r7 (medium): the same doc_id delivered in TWO batches used to
    # self-pair (id, id, 0) through the store-side join and re-emit
    # already-reported pairs into the later batch partition.  Contract:
    # accumulated output == batch hamming_join over the DISTINCT rows.
    base = (1 << 50) - 1
    b1 = [{"doc_id": 1, "simhash60": base}, {"doc_id": 2, "simhash60": base ^ 0b1}]
    # batch 2 re-delivers doc 1 verbatim and adds doc 3 near doc 1
    b2 = [{"doc_id": 1, "simhash60": base}, {"doc_id": 3, "simhash60": base ^ 0b110}]
    src = _write_batches(tmp_path, [b1, b2])
    stream = read_file_stream(spark, src, SCHEMA, multiline=False, max_files_per_trigger=1)
    store, out = str(tmp_path / "hm_store"), str(tmp_path / "hm_out")
    run_incremental_hamming(
        stream, store, out, checkpoint=str(tmp_path / "hm_ck"), max_dist=3
    )
    acc = [(r.id_a, r.id_b, r.dist) for r in spark.read.parquet(out).collect()]
    assert len(acc) == len(set(acc))  # (1,2) reported once, not per batch
    assert all(a != b for a, b, _ in acc)  # no (1,1,0) self-pair
    df = spark.createDataFrame(
        [(1, base), (2, base ^ 0b1), (3, base ^ 0b110)], "doc_id long, simhash60 long"
    )
    want = {
        (r.id_a, r.id_b, r.dist)
        for r in hamming_join(df, id_col="doc_id", code_col="simhash60", max_dist=3).collect()
    }
    assert set(acc) == want == {(1, 2, 1), (1, 3, 2), (2, 3, 3)}


def test_store_compaction_mid_stream_output_unchanged(spark, tmp_path):
    # VERDICT r7 item 7: compact the band store BETWEEN AvailableNow runs
    # (fold batch_id=N partitions into the batch_id=-1 baseline) and prove
    # the accumulated output still equals the batch hamming_join -- the
    # baseline partition never collides with a live batch id, so the
    # own-batch exclusion filter keeps it visible.
    from odp_dynamic_data_pipeline_spark.streaming.stream import (
        compact_incremental_store,
    )

    base = (1 << 45) - 1
    b1 = [{"doc_id": 1, "simhash60": base}, {"doc_id": 2, "simhash60": base ^ 0b1}]
    b2 = [{"doc_id": 3, "simhash60": base ^ 0b10}]
    b3 = [{"doc_id": 4, "simhash60": base ^ 0b100}, {"doc_id": 5, "simhash60": 0}]
    store, out, ck = (
        str(tmp_path / "hm_store"),
        str(tmp_path / "hm_out"),
        str(tmp_path / "hm_ck"),
    )
    src = _write_batches(tmp_path, [b1, b2])
    stream = read_file_stream(spark, src, SCHEMA, multiline=False, max_files_per_trigger=1)
    run_incremental_hamming(stream, store, out, checkpoint=ck, max_dist=3)
    assert sorted(os.listdir(f"{store}/bands")) == ["batch_id=0", "batch_id=1"]

    folded = compact_incremental_store(spark, f"{store}/bands")
    assert folded == 2
    assert os.listdir(f"{store}/bands") == ["batch_id=-1"]

    # drop 3 lands; the SAME checkpoint continues the stream against the
    # compacted store
    p = os.path.join(src, "b2.json")
    with open(p, "w") as f:
        for r in b3:
            f.write(json.dumps(r) + "\n")
    stream2 = read_file_stream(spark, src, SCHEMA, multiline=False, max_files_per_trigger=1)
    run_incremental_hamming(stream2, store, out, checkpoint=ck, max_dist=3)

    got = {(r.id_a, r.id_b, r.dist) for r in spark.read.parquet(out).collect()}
    df = spark.createDataFrame(
        [(r["doc_id"], r["simhash60"]) for r in b1 + b2 + b3],
        "doc_id long, simhash60 long",
    )
    want = {
        (r.id_a, r.id_b, r.dist)
        for r in hamming_join(df, id_col="doc_id", code_col="simhash60", max_dist=3).collect()
    }
    assert got == want
    # pairs among {1,2,3} predate compaction; {4} pairs cross the baseline
    assert {(1, 4, 1), (2, 4, 2), (3, 4, 2)} <= got
