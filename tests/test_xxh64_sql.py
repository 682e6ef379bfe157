"""Three-way verification of the generated DuckDB XXH64 SQL
(queries/xxh64_sql.py): Spark xxhash64 == pure-Python spec reference ==
generated DuckDB SQL, over every length class and the exact chained
forms the oracle-gated queries use (3-token shingle chains, int-seeded
long remixes, band-bucket chains)."""

from __future__ import annotations

import random

import duckdb
import pytest

from odp_dynamic_data_pipeline_spark.queries import xxh64_sql as xx

STR_CASES = [
    "",
    "a",
    "ab",
    "abcd",
    "abcdefg",  # 7: byte tail only
    "abcdefgh",  # 8: one word
    "abcdefghijkl",  # 12: word + 4-byte
    "abcdefghijklm",  # 13: word + 4 + byte tail
    "0123456789abcdef0123456789abcde",  # 31: max short path
    "0123456789abcdef0123456789abcdef",  # 32: one stripe exactly
    "0123456789abcdef0123456789abcdefX",  # 33: stripe + byte
    "x" * 64,  # two stripes
    "y" * 71,  # stripes + word + tail
    "héllo wörld ünïcode",  # multi-byte UTF-8
    "日本語テキスト",  # 3-byte code points
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_duckdb_matches_python_reference_strings(duck):
    for s in STR_CASES:
        sql = "SELECT " + xx.U2S(xx.HASH_STR(f"'{s}'", "42::HUGEINT"))
        got = duck.sql(sql).fetchone()[0]
        assert got == xx.py_xxhash64([s]), f"string {s!r}"


def test_duckdb_matches_python_reference_random_strings(duck):
    rng = random.Random(20260816)
    alphabet = "abcdefghij XYZ0189éü|"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 90)))
        for _ in range(25)
    ]
    # ONE query for all cases: per-row SQL compile dominates otherwise
    exprs = ", ".join(
        xx.U2S(xx.HASH_STR(f"col{i}", "42::HUGEINT")) for i in range(len(cases))
    )
    cols = ", ".join(f"? AS col{i}" for i in range(len(cases)))
    row = duck.execute(f"SELECT {exprs} FROM (SELECT {cols})", cases).fetchone()
    for s, got in zip(cases, row):
        assert got == xx.py_xxhash64([s]), f"random string {s!r}"


def test_duckdb_matches_python_reference_longs_ints(duck):
    rng = random.Random(7)
    longs = [0, 1, -1, 42, 2**63 - 1, -(2**63), rng.getrandbits(63)]
    for v in longs:
        sql = "SELECT " + xx.U2S(xx.HASH_LONG(xx.S2U(str(v)), "42::HUGEINT"))
        assert duck.sql(sql).fetchone()[0] == xx.py_xxhash64([("long", v)]), v
    for i in [0, 1, 7, 31, 2**31 - 1]:
        sql = "SELECT " + xx.U2S(xx.HASH_INT(f"{i}::HUGEINT", "42::HUGEINT"))
        assert duck.sql(sql).fetchone()[0] == xx.py_xxhash64([("int", i)]), i


def test_duckdb_chained_and_k1_forms(duck):
    # 3-token shingle chain, flattened across subquery stages exactly as
    # minhash_xx_pairs_sql does (nesting all three HASH_STRs in one
    # expression exceeds DuckDB 1.0's binder/lambda depth limits)
    toks = ["the", "quick", "brown"]
    sql = f"SELECT {xx.HASH_STR(repr(toks[0]), '42::HUGEINT')} AS c0"
    for j, t in enumerate(toks[1:], start=1):
        sql = f"SELECT {xx.HASH_STR(repr(t), f'c{j - 1}')} AS c{j} FROM ({sql})"
    sql = f"SELECT {xx.U2S(f'c{len(toks) - 1}')} FROM ({sql})"
    assert duck.sql(sql).fetchone()[0] == xx.py_xxhash64(toks)
    # int-literal-seeded long remix, plain and via the hoisted K1 split
    h = -987654321
    want = xx.py_xxhash64([("int", 5), ("long", h)])
    plain = xx.xxhash64_longs_from_seed([str(h)], xx.py_hash_int(5, 42))
    split = xx.hash_long_from_k1(xx.K1(str(h)), xx.py_hash_int(5, 42))
    got_plain, got_split = duck.sql(f"SELECT {plain}, {split}").fetchone()
    assert got_plain == want and got_split == want
    # band-bucket 4-long chain, staged like the oracle's bx CTEs (a 4-deep
    # single expression also exceeds DuckDB 1.0's lambda depth limit)
    ms = [123, -9, 2**62, -(2**62)]
    want = xx.py_xxhash64([("int", 3)] + [("long", m) for m in ms])
    sql = f"SELECT {xx.HASH_LONG(xx.S2U(str(ms[0])), f'{xx.py_hash_int(3, 42)}::HUGEINT')} AS c0"
    for j, m in enumerate(ms[1:], start=1):
        sql = f"SELECT {xx.HASH_LONG(xx.S2U(str(m)), f'c{j - 1}')} AS c{j} FROM ({sql})"
    sql = f"SELECT {xx.U2S(f'c{len(ms) - 1}')} FROM ({sql})"
    assert duck.sql(sql).fetchone()[0] == want


def test_spark_matches_python_reference(spark):
    """Ground truth: Spark's own xxhash64 equals the Python reference on
    every form the oracles replay (strings incl. >=32-byte stripes and
    multi-byte UTF-8, chained strings, int+long chains)."""
    row = spark.sql(
        """
        SELECT xxhash64('abc') a,
               xxhash64('the', 'quick', 'brown') b,
               xxhash64('0123456789abcdef0123456789abcdefX') c,
               xxhash64('héllo wörld ünïcode') d,
               xxhash64(CAST(5 AS INT), CAST(-987654321 AS BIGINT)) e,
               xxhash64(CAST(3 AS INT), CAST(123 AS BIGINT), CAST(-9 AS BIGINT)) f,
               xxhash64('') g
        """
    ).collect()[0]
    assert row["a"] == xx.py_xxhash64(["abc"])
    assert row["b"] == xx.py_xxhash64(["the", "quick", "brown"])
    assert row["c"] == xx.py_xxhash64(["0123456789abcdef0123456789abcdefX"])
    assert row["d"] == xx.py_xxhash64(["héllo wörld ünïcode"])
    assert row["e"] == xx.py_xxhash64([("int", 5), ("long", -987654321)])
    assert row["f"] == xx.py_xxhash64([("int", 3), ("long", 123), ("long", -9)])
    assert row["g"] == xx.py_xxhash64([""])


def test_spark_vs_duckdb_on_real_corpus_tokens(spark, duck):
    """Engine-to-engine over a REAL data column (no literals): Spark's
    xxhash64 per distinct token of the sf0.001 corpus equals the
    generated DuckDB SQL over the same parquet -- the exact shape the
    simhash/minhash oracles rely on, hash-set-compared end to end."""
    duck.sql(
        "CREATE OR REPLACE VIEW documents AS"
        " SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    du = {
        (t, h)
        for t, h in duck.sql(
            "WITH toks AS (SELECT DISTINCT unnest(regexp_extract_all(text,"
            " '\\S+')) AS tok FROM documents)"
            f" SELECT tok, {xx.U2S(xx.HASH_STR('tok', '42::HUGEINT'))} FROM toks"
        ).fetchall()
    }
    from odp_dynamic_data_pipeline_spark.sources.catalog import load_table

    sp = {
        (r["tok"], r["h"])
        for r in load_table(spark, "/root/testdata/sf0.001", "documents")
        .selectExpr(r"explode(regexp_extract_all(text, r'\S+', 0)) AS tok")
        .distinct()
        .selectExpr("tok", "xxhash64(tok) AS h")
        .collect()
    }
    assert sp == du and len(sp) > 0


def test_minhash_pairs_oracle_runs_and_simhash_matches_spark(spark, duck):
    """End-to-end on real sf0.001 documents: the generated simhash oracle
    equals the Spark query bit-for-bit, and the minhash pairs oracle
    produces the same verified pair set (the registry parity gate re-runs
    both at sf0.01 every round; this pins them in the suite)."""
    duck.sql(
        "CREATE OR REPLACE VIEW documents AS"
        " SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    from odp_dynamic_data_pipeline_spark.queries.llm import dedup_simhash

    sp = sorted(
        (r["doc_id"], r["simhash"])
        for r in dedup_simhash(spark, "/root/testdata/sf0.001").collect()
    )
    du = sorted(map(tuple, duck.sql(xx.simhash_xx_sql(63)).fetchall()))
    assert sp == du
