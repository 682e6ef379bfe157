"""char_exact_spans: character-exact boundary trim for token-granular
ExactSubstr spans (Lee et al. 2022 byte-exact bounds) -- sub-token
shared prefixes/suffixes extend the span, token-aligned duplicates pick
up only the shared separator, doc-edge spans never extend, the cap
bounds the comparison, same-doc partners work."""

from __future__ import annotations

from odp_dynamic_data_pipeline_spark.operators.text import char_exact_spans


def _rows(df):
    return {
        r.doc_id: (
            r.span_start, r.span_end, r.char_start, r.char_end,
            r.ext_left, r.ext_right, r.char_exact_start, r.char_exact_end,
        )
        for r in df.collect()
    }


S8 = "S1 S2 S3 S4 S5 S6 S7 S8"


def test_subtoken_boundary_extension_both_sides(spark):
    # the shared run is S1..S8, but the surrounding tokens share "foo"
    # fragments: preXfoo|preZfoo share suffix "foo", fooY|fooQ share
    # prefix "foo" -- the character-exact duplicate is "foo S1..S8 foo"
    docs = spark.createDataFrame(
        [
            (1, "aa1 aa2 preXfoo " + S8 + " fooY bb1"),
            (2, "cc1 preZfoo " + S8 + " fooQ"),
        ],
        "doc_id long, text string",
    )
    got = _rows(char_exact_spans(docs, "text", min_tokens=8))
    # doc 1: span tokens 4..11; chars 17..39 of the normalized text;
    # ext 4 = " foo" reversed / " foo" on each side
    assert got[1] == (4, 11, 17, 39, 4, 4, 13, 43)
    # doc 2: span tokens 3..10; chars 13..35
    assert got[2] == (3, 10, 13, 35, 4, 4, 9, 39)
    # the extended slices really are equal text across the two docs
    n1 = "aa1 aa2 preXfoo " + S8 + " fooY bb1"
    n2 = "cc1 preZfoo " + S8 + " fooQ"
    assert n1[12:43] == n2[8:39] == "foo " + S8 + " foo"


def test_token_aligned_duplicates_share_only_separator(spark):
    # boundary tokens share NO characters -- but both contexts have the
    # single separator space, which IS part of the character-exact
    # duplicated substring " R1..R8 "
    docs = spark.createDataFrame(
        [
            (1, "u1 R1 R2 R3 R4 R5 R6 R7 R8 u2"),
            (2, "v1 v2 R1 R2 R3 R4 R5 R6 R7 R8 v3"),
        ],
        "doc_id long, text string",
    )
    got = _rows(char_exact_spans(docs, "text", min_tokens=8))
    assert got[1][4:6] == (1, 1)  # ext_left, ext_right
    assert got[2][4:6] == (1, 1)


def test_doc_edge_span_never_extends(spark):
    # doc 2 IS the passage: nothing before or after -> ext 0 both sides
    docs = spark.createDataFrame(
        [(1, "u1 " + S8 + " u2"), (2, S8)], "doc_id long, text string"
    )
    got = _rows(char_exact_spans(docs, "text", min_tokens=8))
    assert got[2] == (1, 8, 1, 23, 0, 0, 1, 23)


def test_cap_bounds_extension(spark):
    docs = spark.createDataFrame(
        [
            (1, "aa1 aa2 preXfoo " + S8 + " fooY bb1"),
            (2, "cc1 preZfoo " + S8 + " fooQ"),
        ],
        "doc_id long, text string",
    )
    got = _rows(char_exact_spans(docs, "text", min_tokens=8, max_ext=2))
    assert got[1][4:6] == (2, 2)


def test_same_doc_partner_and_no_spans(spark):
    # within-doc repetition: the partner is the same document's other
    # occurrence; doc edges and the unique middle token give ext 0
    docs = spark.createDataFrame(
        [(6, "P1 P2 P3 P4 P5 P6 P7 P8 z1 P1 P2 P3 P4 P5 P6 P7 P8")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start): (r.ext_left, r.ext_right)
        for r in char_exact_spans(docs, "text", min_tokens=8).collect()
    }
    assert got == {(6, 1): (0, 0), (6, 10): (0, 0)}
    clean = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "q r s t u v w x")],
        "doc_id long, text string",
    )
    assert char_exact_spans(clean, "text", min_tokens=8).count() == 0


def test_validation(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_ext"):
        char_exact_spans(docs, "text", max_ext=0)


# ---------------------------------------------------------------------------
# scrub_char_exact (the removal half)
# ---------------------------------------------------------------------------

from odp_dynamic_data_pipeline_spark.operators.text import scrub_char_exact  # noqa: E402


def test_scrub_cuts_char_exact_ranges(spark):
    docs = spark.createDataFrame(
        [
            (1, "aa1 aa2 preXfoo " + S8 + " fooY bb1"),
            (2, "cc1 preZfoo " + S8 + " fooQ"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_chars, r.n_dropped_chars, r.clean_text)
        for r in scrub_char_exact(docs, "text", min_tokens=8).collect()
    }
    # doc 1: chars 13..43 ("foo S1..S8 foo") cut from the 48-char norm
    assert got[1] == (48, 31, "aa1 aa2 preXY bb1")
    assert got[2] == (40, 31, "cc1 preZQ")
    for n_chars, dropped, clean in got.values():
        assert len(clean) == n_chars - dropped  # conservation


def test_scrub_merges_overlapping_extensions(spark):
    # doc 1 carries two duplicated runs whose char-exact extensions meet
    # in the shared middle token "foo": the two char intervals overlap
    # and must merge into one cut covering the entire document
    P = " ".join(f"P{i}" for i in range(8))
    R = " ".join(f"R{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, P + " foo " + R),
            (2, "c1 " + P + " fool"),
            (3, "afoo " + R + " c2"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_chars, r.n_dropped_chars, r.clean_text)
        for r in scrub_char_exact(docs, "text", min_tokens=8).collect()
    }
    n1 = len(P + " foo " + R)
    assert got[1] == (n1, n1, "")  # one merged interval, fully cut


def test_scrub_passthrough_without_spans(spark):
    docs = spark.createDataFrame(
        [(1, "a  b   c d e"), (2, "q r s t u")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chars, r.n_dropped_chars, r.clean_text)
        for r in scrub_char_exact(docs, "text", min_tokens=8).collect()
    }
    # normalized space: multi-whitespace collapses to single separators
    assert got[1] == (9, 0, "a b c d e")
    assert got[2] == (9, 0, "q r s t u")
