"""F1-F6: scalar function surface (SURVEY.md section 2.6).

All JVM-side built-ins -- no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_key_prefix(col: Column | str, sep: str = ":") -> Column:
    """F1: strip a 'prefix:' from a key (reference: src/data_processor.py:92)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, sep, -1)


def ts_diff_seconds(end: Column | str, start: Column | str) -> Column:
    """F5: timestamp difference in (fractional) seconds
    (reference: src/batch_tlb.py:60 uses timedelta.total_seconds())."""
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return e.cast("double") - s.cast("double")


def json_field(col: Column | str, path: str) -> Column:
    """F3: extract a field from a JSON string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def ilog2_fp20_sql(x: str) -> str:
    """Spark SQL expression: exact fixed-point log2 (20 fractional bits) of
    the BIGINT expression ``x`` (must be >= 1), as one ``aggregate`` fold --
    the column-level form of operators.text.ilog2_fp20 (same
    square-and-extract-bit recurrence, same values bit-for-bit).

    The loop lives inside a single codegen'd higher-order function, so
    applying it to millions of rows costs no Python and no plan blowup;
    int64-safe for x < 2^33.  A DuckDB twin (queries.llm_text.duck_ilog2_sql)
    evaluates the identical recurrence with list_reduce, which is what puts
    entropy/weighted-sampling queries behind the exact-hash oracle gate
    with no libm log anywhere.
    """
    e = f"CAST(length(bin({x})) - 1 AS BIGINT)"
    return (
        f"(shiftleft({e}, 20) + aggregate(sequence(1, 20),"
        f" struct(shiftright(shiftleft({x}, 30), {e}) AS m, CAST(0 AS BIGINT) AS f),"
        " (acc, i) -> IF(shiftright(acc.m * acc.m, 30) >= 2147483648,"
        " struct(shiftright(shiftright(acc.m * acc.m, 30), 1) AS m, acc.f * 2 + 1 AS f),"
        " struct(shiftright(acc.m * acc.m, 30) AS m, acc.f * 2 AS f)),"
        " acc -> acc.f))"
    )


def iexp2_fp20_sql(f: str) -> str:
    """Spark SQL expression: exact fixed-point 2^f for the fp20 BIGINT
    expression ``f`` (must be >= 0) -- the inverse companion of
    :func:`ilog2_fp20_sql`, same bit-identical contract (the Python
    reference is operators.text.iexp2_fp20, the DuckDB twin
    queries.llm_text.duck_iexp2_sql).  One ``aggregate`` fold over the 20
    fraction bits, each set bit multiplying in the matching
    2^(2^-k) fp20 constant with truncation; integer part applied as a
    final shift.  int64-safe while (f >> 20) <= 42."""
    from odp_dynamic_data_pipeline_spark.operators.text import EXP2_FP20_CONSTS

    consts = ", ".join(f"CAST({c} AS BIGINT)" for c in EXP2_FP20_CONSTS)
    frac = f"(({f}) & 1048575)"
    # element_at over an array literal, NOT elt(k, ...): elt with a lambda
    # index resolves only under ANSI implicit casts -- in a non-ANSI
    # session it silently mis-evaluated the whole fold (observed; pinned
    # by the both-modes test in tests/test_text_ops.py)
    return (
        f"shiftleft(aggregate(sequence(1, 20), CAST(1048576 AS BIGINT),"
        f" (acc, k) -> IF(((shiftright({frac}, 20 - k)) & 1) = 1,"
        f" shiftright(acc * element_at(array({consts}), k), 20), acc),"
        f" acc -> acc), shiftright({f}, 20))"
    )
