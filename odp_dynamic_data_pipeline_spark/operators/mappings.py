"""P2: mapping extraction -- project -> explode -> KV with last-writer-wins.

Reference semantics (src/data_processor.py:114-155): from each record,
extract key(s) via a dot-path (a path through an array field yields one key
per element, e.g. ``spans.spanId``) and a value dict of one or more fields;
entries with a null key or null value are skipped; duplicate keys keep the
*last* occurrence in file order (src/data_processor.py:153).

Spark-native: nested projection is just ``F.col("spans.spanId")`` (an
array), exploded with ``explode``; last-wins is a window over an explicit
order column -- under parallelism "file order" must be materialized, so we
use ``monotonically_increasing_id`` captured at scan time by default (stable
within a single input ordering; callers with a real ordering column, e.g. an
event timestamp, should pass it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def _explode_path(df: DataFrame, path: str) -> tuple[DataFrame, Column]:
    """Resolve a dot-path, exploding once if the path crosses an array field
    (reference maps over list fields implicitly, src/data_processor.py:171-173).
    Returns (possibly exploded df, key column)."""
    parts = path.split(".")
    schema = df.schema
    prefix = []
    for i, p in enumerate(parts):
        field = schema[p] if p in schema.fieldNames() else None
        if field is None:
            break
        prefix.append(p)
        if isinstance(field.dataType, ArrayType):
            rest = parts[i + 1 :]
            df = df.withColumn("__exploded", F.explode_outer(F.col(".".join(prefix))))
            col = F.col("__exploded." + ".".join(rest)) if rest else F.col("__exploded")
            return df, col
        schema = getattr(field.dataType, "fields", None) and field.dataType or schema
        if hasattr(field.dataType, "fieldNames"):
            schema = field.dataType
    return df, F.col(path)


def extract_mapping(
    df: DataFrame,
    key_path: str,
    value_fields: list[str] | str,
    *,
    order_col: str | Column | None = None,
) -> DataFrame:
    """Extract a (key, *value_fields) mapping table with last-wins dedup.

    Output columns: ``key`` plus one column per value field.
    """
    if isinstance(value_fields, str):
        value_fields = [value_fields]
    if order_col is None:
        df = df.withColumn("__ord", F.monotonically_increasing_id())
        order = F.col("__ord")
    else:
        order = F.col(order_col) if isinstance(order_col, str) else order_col
        df = df.withColumn("__ord", order)

    df, key = _explode_path(df, key_path)
    kv = df.select(
        key.alias("key"),
        *[F.col(f).alias(f.split(".")[-1]) for f in value_fields],
        F.col("__ord"),
    )
    # null-skip semantics (reference: src/data_processor.py:138-152): null
    # keys always skip; a SINGLE-field value skips when null, but MULTI-field
    # values are kept even with some nulls (the reference builds the value
    # dict unconditionally for lists).
    kv = kv.filter(F.col("key").isNotNull())
    if len(value_fields) == 1:
        kv = kv.filter(F.col(value_fields[0].split(".")[-1]).isNotNull())
    w = Window.partitionBy("key").orderBy(F.col("__ord").desc())
    return (
        kv.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__ord")
    )
