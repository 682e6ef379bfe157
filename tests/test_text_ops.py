"""Chunking, PII scrub, connected components (round-2 LLM-data operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from odp_dynamic_data_pipeline_spark.operators.dedup import connected_components
from odp_dynamic_data_pipeline_spark.operators.text import chunk_documents, scrub_pii


def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text), (2, "a b")], "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts at 1,4,7 (greatest(10-4+1,1)=7) -> 3 chunks; last is full
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in c1] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    assert [r["n_chunk_tokens"] for r in c1] == [4, 4, 4]
    # doc 2: 2 tokens < window -> one partial chunk
    c2 = by_doc[2]
    assert len(c2) == 1 and c2[0]["chunk_text"] == "a b" and c2[0]["n_chunk_tokens"] == 2


def test_chunk_documents_partial_tail(spark):
    text = " ".join(f"w{i}" for i in range(5))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=3, stride=2).collect(), key=lambda r: r["chunk_id"]
    )
    # starts 1,3 (greatest(5-3+1,1)=3); window at 3 covers w2,w3,w4
    assert [r["chunk_text"] for r in out] == ["w0 w1 w2", "w2 w3 w4"]


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567 now")],
        "doc_id long, text string",
    )
    got = scrub_pii(df).select("scrubbed").first()[0]
    assert "[EMAIL]" in got and "[PHONE]" in got
    assert "example" not in got and "555" not in got


def test_connected_components_transitivity(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    # chain 1-2-3-4 (one component via transitivity), pair 5-6, singleton 7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}
