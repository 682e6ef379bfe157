"""User-extension surface (SURVEY.md section 2.8): vectorized pandas UDFs
and a Python UDTF, registered for both DataFrame and SQL use.

These exist as the *extension* escape hatch -- the engine's own operators
deliberately stay in JVM built-ins (see tests/test_plan_shapes.py's
no-Python guard).  A user bringing custom logic gets the Arrow-batched path
by default, never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, LongType


@pandas_udf(LongType())
def token_count_udf(text: pd.Series) -> pd.Series:
    """Vectorized token counter (example pandas UDF; the engine-native
    version is operators.text.token_stats, pure JVM)."""
    return text.str.findall(r"\S+").str.len().astype("int64")


@pandas_udf(DoubleType())
def median_abs_dev_udf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (custom UDAF surface): median absolute
    deviation -- a robust spread statistic Spark has no built-in for.  Used
    with groupBy().agg(); each group's values arrive as one Arrow batch.
    Not algebraic (no partial aggregation), so prefer built-ins for
    monster groups -- this is the extension path, not the hot path."""
    med = v.median()
    return float((v - med).abs().median())


@udtf(returnType="shingle: string, idx: int")
class ShingleUDTF:
    """Table function: one row per word 3-gram of the input text (example
    UDTF; engine-native version is operators.dedup.shingles)."""

    def eval(self, text: str):  # noqa: D102
        toks = text.split() if text else []
        for i in range(max(len(toks) - 2, 0)):
            yield " ".join(toks[i : i + 3]), i


class FieldsUDTF:
    """POLYMORPHIC table function (Spark 4 UDTF ``analyze``): the output
    schema -- one string column per requested field, f1..fn -- is computed
    at PLAN time from the constant second argument, the surface for
    schema-parameterized extensions (splitters, pivoters, featurizers)
    that a fixed ``returnType`` cannot express.  ``eval`` emits one row of
    the first n whitespace tokens, NULL-padded."""

    @staticmethod
    def analyze(text, n):  # noqa: D102 (AnalyzeArgument, AnalyzeArgument) -> AnalyzeResult
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if not isinstance(n.value, int) or n.value < 1:
            raise Exception("fields_udtf: n must be a positive integer literal")
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"f{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):  # noqa: D102
        toks = text.split() if text else []
        yield tuple(toks[i] if i < len(toks) else None for i in range(n))


@udtf(returnType="lang: string, n_docs: bigint, n_incr: bigint, max_run: bigint")
class LangRunsUDTF:
    """PARTITION-scoped table function (Spark 4 TABLE(...) PARTITION BY /
    ORDER BY table arguments): invoked as

        lang_runs_udtf(TABLE(t) PARTITION BY lang ORDER BY doc_id)

    the engine feeds each instance ONE WHOLE PARTITION in the declared
    order -- eval() sees every row of a lang sequentially, terminate()
    emits the per-partition summary.  This is the surface for sequential
    per-group algorithms (CDC folds, legacy per-key state machines) that
    neither a scalar UDF (no order), a grouped-pandas kernel (whole group
    in ONE batch -- memory-bound), nor a window function (no arbitrary
    Python state) can express: state is O(1) per instance regardless of
    partition size, rows stream through.

    The statistic: n_incr counts doc_id-ordered ascents of n_chars and
    max_run the longest ascent run -- order-dependent on purpose, so the
    oracle (lag window per lang) breaks if partition/order table-arg
    semantics ever regress."""

    def __init__(self):  # noqa: D107
        self._lang = None
        self._prev = None
        self._n = 0
        self._incr = 0
        self._run = 1
        self._max_run = 1

    def eval(self, row):  # noqa: D102 - Row of the partitioned table arg
        self._lang = row["lang"]
        self._n += 1
        if self._prev is not None:
            if row["n_chars"] > self._prev:
                self._incr += 1
                self._run += 1
            else:
                self._run = 1
            self._max_run = max(self._max_run, self._run)
        self._prev = row["n_chars"]

    def terminate(self):  # noqa: D102 - one summary row per partition
        if self._n:
            yield self._lang, self._n, self._incr, self._max_run


def register_engine_udfs(spark: SparkSession) -> None:
    """Make the extension functions callable from SQL."""
    spark.udf.register("token_count_udf", token_count_udf)
    spark.udf.register("median_abs_dev_udf", median_abs_dev_udf)
    spark.udtf.register("shingle_udtf", ShingleUDTF)
    spark.udtf.register("fields_udtf", udtf(FieldsUDTF))
    spark.udtf.register("lang_runs_udtf", LangRunsUDTF)
