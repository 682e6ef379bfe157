"""Pure-Python replication of Spark's ``xxhash64`` for INT/BIGINT inputs.

Spark's XxHash64 expression (sql/catalyst XXH64.scala, itself the public
xxHash64 algorithm by Yann Collet) hashes a multi-column input by chaining:
``hash = 42`` (default seed), then for each argument
``hash = hashInt(v, hash)`` / ``hashLong(v, hash)`` depending on the SQL
type.  Replicating it driver-side lets deterministic hash-derived constants
(e.g. LSH hyperplane signs over a literal plane/dim grid) be evaluated ONCE
at plan-build time and folded in as literals, instead of re-hashed per row
per element inside the expression -- identical results, zero per-row hash
cost.  Parity with the JVM implementation is pinned by
``tests/test_similarity.py::test_python_xxhash64_matches_spark``.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_PRIME64_1 = 0x9E3779B185EBCA87
_PRIME64_2 = 0xC2B2AE3D27D4EB4F
_PRIME64_3 = 0x165667B19E3779F9
_PRIME64_4 = 0x85EBCA77C2B2AE63
_PRIME64_5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _PRIME64_2) & _M
    h ^= h >> 29
    h = (h * _PRIME64_3) & _M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """XXH64.hashInt: a single 4-byte value (SQL INT/SMALLINT/TINYINT...)."""
    h = (seed + _PRIME64_5 + 4) & _M
    h ^= ((i & 0xFFFFFFFF) * _PRIME64_1) & _M
    h = (_rotl(h, 23) * _PRIME64_2 + _PRIME64_3) & _M
    return _fmix(h)


def hash_long(v: int, seed: int) -> int:
    """XXH64.hashLong: a single 8-byte value (SQL BIGINT, TIMESTAMP...)."""
    h = (seed + _PRIME64_5 + 8) & _M
    h ^= (_rotl((v & _M) * _PRIME64_2 & _M, 31) * _PRIME64_1) & _M
    h = (_rotl(h, 27) * _PRIME64_1 + _PRIME64_4) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_ints(*vals: int, seed: int = 42) -> int:
    """Spark ``xxhash64(a, b, ...)`` over INT-typed arguments (signed
    64-bit result, matching the BIGINT the SQL function returns)."""
    h = seed
    for v in vals:
        h = hash_int(v, h)
    return _signed(h)


def xxhash64_longs(*vals: int, seed: int = 42) -> int:
    """Spark ``xxhash64(a, b, ...)`` over BIGINT-typed arguments."""
    h = seed
    for v in vals:
        h = hash_long(v, h)
    return _signed(h)
