"""JVM-backed local relations from driver-side Python rows.

``spark.createDataFrame(list_of_tuples, schema)`` builds a DataFrame over
a PICKLED PYTHON RDD: every Spark job that scans it pays a Python-worker
round trip, measured at ~5-8 SECONDS per execution on this container's
local[32] (r13; three reps each, flat one-row frames included -- it is
the job-side Python evaluation, not data volume).  Routing the same rows
through pandas + Arrow yields a JVM LocalRelation with identical values
AND schema (nullability preserved), scanning in milliseconds.

Use :func:`local_relation` for any driver-built constant table that a
query/operator hot path executes (tier maps, idf tables, centroid
relations).  Tests constructing inputs keep plain createDataFrame -- the
cost only matters where wall time is measured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_relation(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a local-constant DataFrame JVM-side via pandas/Arrow, falling
    back to the plain (correct but Python-RDD-backed) path when pandas or
    the Arrow conversion is unavailable for the type shape.

    ``schema`` must be an explicit StructType or DDL string (the pandas
    path must never infer types -- object columns holding lists/None
    would guess differently than the list path).

    EMPTY rows go through the same pandas path (r13): a plain
    ``createDataFrame([], schema)`` parallelizes into defaultParallelism
    EMPTY Python partitions, so every job unioning/scanning the "empty"
    frame still spins a Python task per partition -- the zero-row seed
    tables (pagerank's no-edge return, kcore's removed accumulator) paid
    that on every materialization."""
    try:
        import pandas as pd

        from pyspark.sql.types import StructType

        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            schema_t = _parse_datatype_string(schema)
        else:
            schema_t = schema
        if isinstance(schema_t, StructType):
            names = [f.name for f in schema_t.fields]
            pdf = pd.DataFrame(
                {n: [r[i] for r in rows] for i, n in enumerate(names)}
            )
            return spark.createDataFrame(pdf, schema_t)
    except Exception:  # noqa: BLE001 -- fall through to the slow path
        pass
    return spark.createDataFrame(rows, schema)
