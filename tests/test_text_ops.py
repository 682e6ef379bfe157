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


def test_chunk_documents_uneven_tail_kept(spark):
    # (n - W) % S != 0: a final partial window must be emitted, covering the
    # trailing tokens the old n-W+1 upper bound silently dropped.
    text = " ".join(f"w{i}" for i in range(6))  # n=6, W=3, S=2 -> (6-3)%2=1
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=3, stride=2).collect(), key=lambda r: r["chunk_id"]
    )
    assert [r["chunk_text"] for r in out] == ["w0 w1 w2", "w2 w3 w4", "w4 w5"]
    assert [r["n_chunk_tokens"] for r in out] == [3, 3, 2]
    # every token appears in at least one chunk
    covered = set(" ".join(r["chunk_text"] for r in out).split())
    assert covered == {f"w{i}" for i in range(6)}


def test_chunk_documents_advice_case(spark):
    # the exact shape from the defect report: 100 tokens, W=64, S=48.
    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=64, stride=48).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["n_chunk_tokens"] for r in out] == [64, 52]
    assert out[1]["chunk_text"].split()[0] == "t48" and out[1]["chunk_text"].split()[-1] == "t99"


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


def test_connected_components_long_chain_converges(spark):
    # diameter 9 with rounds_per_check batching: exercises the multi-batch path
    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in connected_components(nodes, edges, rounds_per_check=3).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_connected_components_nonconvergence_is_visible(spark):
    import warnings as _w

    import pytest

    n = 8
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        connected_components(nodes, edges, max_iterations=2).collect()
    assert any("did not converge" in str(w.message) for w in caught)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iterations=2, strict=True)


def test_pack_sequences_manifest(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import pack_sequences

    rows = [
        (1, "en", " ".join(["x"] * 6)),   # offset 0
        (2, "en", " ".join(["x"] * 10)),  # offset 6, spans the cut at 8
        (3, "en", " ".join(["x"] * 2)),   # offset 16 -> seq 2 exactly
        (4, "fr", " ".join(["x"] * 5)),   # independent stream per lang
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["global_offset"], r["seq_id"], r["seq_offset"], r["n_seqs_spanned"])
        for r in pack_sequences(df, seq_tokens=8).collect()
    }
    assert got[1] == (0, 0, 0, 1)
    assert got[2] == (6, 0, 6, 2)   # starts in seq 0, straddles into seq 1
    assert got[3] == (16, 2, 0, 1)
    assert got[4] == (0, 0, 0, 1)   # fr stream starts at its own offset 0


def test_boilerplate_scrub_removes_common_blocks(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import boilerplate_scrub

    footer = "copyright acme corp"
    rows = [
        (1, f"alpha beta gamma {footer}"),
        (2, f"delta epsilon zeta {footer}"),
        (3, f"eta theta iota {footer}"),
        (4, "kappa lambda mu unique text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # block = 3 tokens; the footer is a block shared by docs 1-3
    got = {r["doc_id"]: r for r in boilerplate_scrub(df, block_tokens=3, min_docs=3).collect()}
    assert got[1]["n_dropped"] == 1 and footer not in got[1]["clean_text"]
    assert got[1]["clean_text"] == "alpha beta gamma"
    assert got[2]["clean_text"] == "delta epsilon zeta"
    assert got[4]["n_dropped"] == 0 and got[4]["clean_text"] == "kappa lambda mu unique text here"


def test_chunk_documents_stride_exceeds_window(spark):
    # stride > chunk_tokens = deliberate gap sampling; the least() cap on
    # the sequence bound must prevent empty chunks past the end.
    text = " ".join(f"g{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=2, stride=5).collect(), key=lambda r: r["chunk_id"]
    )
    assert [r["chunk_text"] for r in out] == ["g0 g1", "g5 g6"]
    assert all(r["n_chunk_tokens"] == 2 for r in out)


def test_unigram_surprisal_hand_computed(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import unigram_surprisal

    # corpus: 8 tokens total; "a" x4 (N/tf=2 -> 2 bits), "b" x2 (4 -> 3 bits),
    # "c" x1 (8 -> 4 bits), "d" x1 (8 -> 4 bits)
    rows = [(1, "a a b c"), (2, "a a b d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["surprisal_bits"] == 2 + 2 + 3 + 4  # 11
    assert got[2]["surprisal_bits"] == 11
    assert got[1]["mean_surprisal_e3"] == (1000 * 11) // 4


def test_token_budget_allocation_quota_exact(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import allocate_token_budget

    rows = [(f"l{i % 7}", "tok " * (10 + 13 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = allocate_token_budget(df, budget=1_000_003).collect()
    assert len(out) == 7
    # Hamilton invariant: quotas sum EXACTLY to the budget
    assert sum(r["quota_tokens"] for r in out) == 1_000_003
    # quota property: each within 1 of the exact proportional share
    W = sum(r["weight_e3"] for r in out)
    for r in out:
        exact = 1_000_003 * r["weight_e3"] / W
        assert exact - 1 < r["quota_tokens"] < exact + 1


def test_ilog2_fp20_exact_properties():
    import math

    from odp_dynamic_data_pipeline_spark.operators.text import ilog2_fp20

    # exact at powers of two
    for e in range(0, 33):
        assert ilog2_fp20(1 << e) == e << 20
    # within one ulp (2^-20) of the true log2 everywhere else
    for x in [3, 7, 100, 999, 12345, 10**6, (1 << 33) - 1]:
        got = ilog2_fp20(x) / (1 << 20)
        assert abs(got - math.log2(x)) < 2 ** -19
    # monotone
    vals = [ilog2_fp20(x) for x in range(1, 2000)]
    assert vals == sorted(vals)


def test_dsir_selects_target_like_docs(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import dsir_select

    # target domain speaks "alpha beta"; raw pool has two dialects -- the
    # docs sharing the target vocabulary must outrank the "zulu" docs
    rows = [(i, "alpha beta alpha beta", "tgt") for i in range(5)]
    rows += [(10 + i, "alpha beta gamma", "raw") for i in range(3)]
    rows += [(20 + i, "zulu yankee xray", "raw") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_select(df, "source = 'tgt'", buckets=64, k=3).collect()
    assert [r["doc_id"] for r in out] == [10, 11, 12]
    assert all(r["weight_fp20"] > 0 for r in out)


def test_char_entropy_hand_computed(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import char_entropy

    rows = [(1, "aaaa"), (2, "ab"), (3, "abcd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    # uniform single char: H = 0
    assert got[1]["h2_fp"] == 0 and got[1]["mean_entropy_e6"] == 0
    # two equiprobable chars: H = 1 bit exactly
    assert got[2]["mean_entropy_e6"] == 1_000_000
    # four equiprobable chars: H = 2 bits exactly
    assert got[3]["mean_entropy_e6"] == 2_000_000
    assert got[3]["alphabet_size"] == 4 and got[3]["n_chars"] == 4


def test_weighted_sample_properties(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import weighted_sample

    # one overwhelming weight must always be drawn; output is min(k, n)
    rows = [("g", i, 1) for i in range(1, 30)] + [("g", 99, 10_000_000)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, w long")
    out = weighted_sample(df, "lang", "w", k=5).collect()
    assert len(out) == 5
    assert 99 in {r["doc_id"] for r in out}
    # deterministic: same call, same sample
    out2 = weighted_sample(df, "lang", "w", k=5).collect()
    assert {(r["doc_id"], r["rank"]) for r in out} == {(r["doc_id"], r["rank"]) for r in out2}
    # zero/negative weights excluded, small strata return all members
    rows2 = [("h", 1, 0), ("h", 2, 3), ("h", 3, 7)]
    df2 = spark.createDataFrame(rows2, "lang string, doc_id long, w long")
    out3 = weighted_sample(df2, "lang", "w", k=5).collect()
    assert {r["doc_id"] for r in out3} == {2, 3}


def test_bm25_ranks_rare_term_docs_first(spark):
    from odp_dynamic_data_pipeline_spark.operators.text import bm25_scores

    # "zebra" appears in one doc only; "data" in all -- the zebra doc must
    # dominate a [zebra, data] query despite equal term counts
    rows = [(1, "data data data tool"), (2, "data zebra tool box"), (3, "data tool box kit")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_scores(df, ["zebra", "data"], k=3).collect()
    assert out[0]["doc_id"] == 2 and out[0]["n_hit_terms"] == 2
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    scores = [r["score_fp"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_iexp2_fp20_exact_properties():
    """Pure-integer exp2: exact powers of two, monotonicity, and the
    round-trip bound exp2(log2(n)) within fp20 truncation of n."""
    import random

    from odp_dynamic_data_pipeline_spark.operators.text import (
        iexp2_fp20,
        ilog2_fp20,
    )

    one = 1 << 20
    assert iexp2_fp20(0) == one
    for i in range(0, 40):
        assert iexp2_fp20(i << 20) == one << i  # exact at integer exponents
    rng = random.Random(20260815)
    prev = -1
    for f in sorted(rng.randrange(0, 30 << 20) for _ in range(300)):
        v = iexp2_fp20(f)
        assert v >= prev  # per-bit truncating product is monotone
        prev = v
    for n in [1, 2, 3, 7, 100, 12345, 10**6]:
        v = iexp2_fp20(ilog2_fp20(n))
        # truncation only loses: result in ((1-2^-15)*n, n] -- the log2
        # and each of the 20 product steps truncate up to ~2^-20 apiece,
        # so the worst case is ~21*2^-20 < 2^-15 relative
        assert v <= n * one
        assert v * (1 << 15) > (n * one) * ((1 << 15) - 1)


def test_iexp2_fp20_three_way_agreement(spark):
    """Python reference == Spark aggregate fold == DuckDB list_reduce twin
    on a seeded spread of fp20 exponents (the contract the
    temperature_mixture_sweep oracle relies on)."""
    import random

    import duckdb

    from odp_dynamic_data_pipeline_spark.functions.scalars import iexp2_fp20_sql
    from odp_dynamic_data_pipeline_spark.operators.text import iexp2_fp20
    from odp_dynamic_data_pipeline_spark.queries.llm_text import duck_iexp2_sql

    from tests.conftest import temp_confs

    rng = random.Random(20260815)
    vals = [0, 1, (1 << 19), (1 << 20) - 1, (1 << 20), 40 << 20] + [
        rng.randrange(0, 42 << 20) for _ in range(120)
    ]
    ref = {f: iexp2_fp20(f) for f in vals}
    # BOTH ANSI modes: the original elt(k, ...) spelling silently
    # mis-evaluated under ansi=false (a user session setting) -- the
    # element_at form must be mode-independent
    for ansi in ("true", "false"):
        with temp_confs(spark, {"spark.sql.ansi.enabled": ansi}):
            sdf = spark.createDataFrame([(v,) for v in vals], "f long").selectExpr(
                "f", iexp2_fp20_sql("f") + " AS v"
            )
            assert {r.f: r.v for r in sdf.collect()} == ref, f"ansi={ansi}"
    con = duckdb.connect()
    got = dict(
        con.execute(
            f"SELECT f, {duck_iexp2_sql('f')} FROM (SELECT UNNEST(?) AS f)", [vals]
        ).fetchall()
    )
    assert got == ref
