"""hamming_join (multi-index pigeonhole blocking): exactness vs brute
force, including codes that differ ONLY inside a single band (the case a
naive exact-bucket dedup collapses incorrectly) and the uneven final band
when bits is not divisible by max_dist + 1."""

from __future__ import annotations

import itertools
import random

import pytest

from odp_dynamic_data_pipeline_spark.operators.dedup import hamming_join


def _brute(rows: list[tuple[int, int]], d: int) -> set[tuple]:
    return {
        (a, b, bin(ca ^ cb).count("1"))
        for (a, ca), (b, cb) in itertools.combinations(rows, 2)
        if bin(ca ^ cb).count("1") <= d
    }


def _got(spark, rows: list[tuple[int, int]], bits: int, d: int) -> set[tuple]:
    df = spark.createDataFrame(rows, "id long, code long")
    out = hamming_join(df, id_col="id", code_col="code", bits=bits, max_dist=d)
    return {(r.id_a, r.id_b, r.dist) for r in out.collect()}


@pytest.mark.parametrize("bits,d", [(60, 3), (64, 3), (60, 2)])
def test_random_codes_match_brute_force(spark, bits, d):
    rng = random.Random(11)
    base = [rng.getrandbits(bits - 1) for _ in range(10)]  # keep positive in int64
    rows = list(base)
    for c in base:
        flips = rng.sample(range(bits - 1), rng.randint(0, d + 2))
        v = c
        for f in flips:
            v ^= 1 << f
        rows.append(v)
    indexed = list(enumerate(rows))
    assert _got(spark, indexed, bits, d) == _brute(indexed, d)


def test_flips_confined_to_one_band_found(spark):
    # d=3 -> 4 bands of 15 bits; flip 3 bits all inside band 2: the pair
    # disagrees on that band but must be caught through the other three
    base = (1 << 59) - 1
    other = base ^ (0b111 << 31)
    rows = [(0, base), (1, other), (2, 0)]
    got = _got(spark, rows, 60, 3)
    assert (0, 1, 3) in got
    assert not any(a == 2 or b == 2 for a, b, _ in got)


def test_rejects_bad_distance(spark):
    df = spark.createDataFrame([(0, 1)], "id long, code long")
    with pytest.raises(ValueError):
        hamming_join(df, id_col="id", code_col="code", bits=60, max_dist=0)


def test_narrow_bits_uneven_bands_build_and_match_brute(spark):
    # bits=5 / max_dist=3 used to raise ValueError at expression-build time
    # (ceil-width banding left the last band empty -> negative shift); the
    # even-split layout (widths 2,1,1,1) must build AND stay exact
    rows = [(i, c) for i, c in enumerate([0b00000, 0b00001, 0b00011, 0b10101, 0b11111])]
    assert _got(spark, rows, bits=5, d=3) == _brute(rows, 3)


def test_every_valid_bits_maxdist_combo_builds(spark):
    # the layout invariant: sum(widths) == bits and every band non-empty
    # for ALL 0 < max_dist < bits -- exercised as expression build + one
    # exactness probe per shape
    from odp_dynamic_data_pipeline_spark.operators.dedup import hamming_bands

    df = spark.createDataFrame([(1, 0b1011)], "id long, code long")
    for bits in (2, 3, 5, 7, 10):
        for d in range(1, bits):
            out = hamming_bands(df, id_col="id", code_col="code", bits=bits, max_dist=d)
            assert out.count() == d + 1
