"""occurrence_duplicate_spans / scrub_occurrence_spans (occurrence-gated
span dedup, the cut-all variant of the dedup.py keeper family): span
maximality, within-doc repeats, interval merging, short docs,
conservation law."""

from __future__ import annotations

import pytest

from odp_dynamic_data_pipeline_spark.operators.text import occurrence_duplicate_spans


def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = occurrence_duplicate_spans(df, **kw)
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in out.collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_passage_maximal_span_at_different_offsets(spark):
    # a 12-token passage shared by two docs, at token offset 4 in doc 1
    # and offset 1 in doc 2: each doc reports ONE maximal span of exactly
    # 12 tokens (= 5 windows of 8), positioned correctly
    passage = _words("p", 12)
    rows = [
        (1, _words("a", 3) + " " + passage + " " + _words("b", 4)),
        (2, passage + " " + _words("c", 2)),
    ]
    got = _spans(spark, rows, min_tokens=8)
    assert got == {(1, 4, 15, 12, 5), (2, 1, 12, 12, 5)}


def test_within_doc_repetition_counts(spark):
    # suffix-array semantics: the SAME doc repeating an 8-token run twice
    # flags both occurrences even with no second document
    run = _words("r", 8)
    rows = [(1, run + " xx yy " + run)]
    got = _spans(spark, rows, min_tokens=8)
    assert got == {(1, 1, 8, 8, 1), (1, 11, 18, 8, 1)}


def test_overlapping_duplicated_regions_merge(spark):
    # doc 3 contains passage A immediately followed by passage B; doc 1
    # shares A, doc 2 shares B -- doc 3's two duplicated regions are
    # adjacent and must fuse into ONE maximal span of 16 tokens
    a, b = _words("a", 8), _words("b", 8)
    rows = [(1, a), (2, b), (3, a + " " + b)]
    got = _spans(spark, rows, min_tokens=8)
    assert (3, 1, 16, 16, 2) in got
    assert (1, 1, 8, 8, 1) in got and (2, 9, 16, 8, 1) not in got
    assert (2, 1, 8, 8, 1) in got


def test_disjoint_spans_stay_separate(spark):
    # two shared 8-token passages separated by 9 unique tokens in doc 1:
    # gap > min_tokens, so two separate spans
    a, b = _words("a", 8), _words("b", 8)
    rows = [(1, a + " " + _words("u", 9) + " " + b), (2, a), (3, b)]
    got = _spans(spark, rows, min_tokens=8)
    doc1 = sorted(t for t in got if t[0] == 1)
    assert doc1 == [(1, 1, 8, 8, 1), (1, 18, 25, 8, 1)]


def test_short_and_unique_docs_emit_nothing(spark):
    rows = [(1, _words("x", 5)), (2, _words("y", 30)), (3, _words("z", 30))]
    assert _spans(spark, rows, min_tokens=8) == set()


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_tokens"):
        occurrence_duplicate_spans(df, min_tokens=1)
    with pytest.raises(ValueError, match="min_count"):
        occurrence_duplicate_spans(df, min_count=1)


# ---------------------------------------------------------------------------
# scrub_occurrence_spans (the removal half)
# ---------------------------------------------------------------------------

from odp_dynamic_data_pipeline_spark.operators.text import (  # noqa: E402
    scrub_occurrence_spans,
)


def test_scrub_cuts_spans_and_conserves_counts(spark):
    passage = _words("p", 12)
    keep1, keep2 = _words("a", 3), _words("b", 4)
    rows = [
        (1, keep1 + " " + passage + " " + keep2),
        (2, passage + " " + _words("c", 2)),
        (3, _words("zz", 9)),  # untouched doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_occurrence_spans(df, min_tokens=8).collect()}
    assert out[1].clean_text == keep1 + " " + keep2
    assert out[2].clean_text == _words("c", 2)
    assert out[3].clean_text == _words("zz", 9) and out[3].n_dropped_tokens == 0
    for r in out.values():
        n_clean = len(r.clean_text.split()) if r.clean_text else 0
        assert n_clean == r.n_tokens - r.n_dropped_tokens


def test_scrub_empty_result_when_whole_doc_duplicated(spark):
    run = _words("r", 8)
    df = spark.createDataFrame([(1, run), (2, run)], "doc_id long, text string")
    out = {r.doc_id: r for r in scrub_occurrence_spans(df, min_tokens=8).collect()}
    assert out[1].clean_text == "" and out[1].n_dropped_tokens == 8
    assert out[2].clean_text == ""


def _reference_spans(docs, L, min_count):
    """Pure-Python occurrence-gated span reference: window hashes ->
    global occurrence counts -> per-doc interval merge."""
    from collections import Counter

    wins = {}  # doc -> [(pos, key)]
    counts = Counter()
    for d, text in docs:
        toks = text.split()
        ws = []
        for i in range(len(toks) - L + 1):
            key = " ".join(toks[i : i + L])
            ws.append((i + 1, key))
            counts[key] += 1
        wins[d] = ws
    out = set()
    for d, ws in wins.items():
        dup = sorted(p for p, key in ws if counts[key] >= min_count)
        if not dup:
            continue
        start = prev = dup[0]
        n = 1
        for p in dup[1:]:
            if p - prev > L:
                out.add((d, start, prev + L - 1, prev + L - start, n))
                start, n = p, 0
            prev = p
            n += 1
        out.add((d, start, prev + L - 1, prev + L - start, n))
    return out


def test_random_corpora_match_reference(spark):
    # tiny alphabet + short words force organic window collisions across
    # and within docs; every (doc, span) must match the pure-Python
    # reference exactly, across L values
    import random

    for seed, n_docs, L in [(1, 25, 3), (2, 40, 4), (3, 30, 5)]:
        rng = random.Random(seed)
        docs = []
        for i in range(n_docs):
            words = [rng.choice("ab") for _ in range(rng.randint(0, 14))]
            docs.append((i, " ".join(words)))
        got = _spans(spark, docs, min_tokens=L)
        assert got == _reference_spans(docs, L, 2), (seed, L)
