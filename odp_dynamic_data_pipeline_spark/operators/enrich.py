"""P3 / J1 / J2: enrichment lookup join with collision-overwrite.

Reference semantics (src/data_processor.py:100-112): for each record, look up
``record[key_field]`` in a small mapping table; on a hit, merge the mapping's
fields into the record, overwriting any same-named field; on a miss (or a
null/empty key) the record passes through unchanged.

Spark-native: LEFT join against a broadcast mapping DataFrame, then
``coalesce(mapping_col, original_col)`` per enriched column -- mapping wins
on collision, original survives a miss.  The broadcast replaces the
reference's Redis hop (the Redis dict *is* a hand-rolled broadcast-hash-join
build side, src/data_processor.py:90-92); at 100 TB the fact side streams
through executors while the dim side ships once per executor, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    mapping: DataFrame,
    key_col: str,
    mapping_key: str | None = None,
    *,
    how: str = "left",
    broadcast_mapping: bool = True,
) -> DataFrame:
    """Enrich ``df`` with the non-key columns of ``mapping``.

    mapping-wins-on-collision, pass-through-on-miss (reference:
    src/data_processor.py:109-112 merges only ``if mapping``).
    """
    mapping_key = mapping_key or key_col
    value_cols = [c for c in mapping.columns if c != mapping_key]
    m = mapping.select(
        F.col(mapping_key).alias("__enrich_key"),
        *[F.col(c).alias(f"__enrich_{c}") for c in value_cols],
    )
    if broadcast_mapping:
        m = F.broadcast(m)
    out = df.join(m, df[key_col] == m["__enrich_key"], how)
    for c in value_cols:
        if c in df.columns:
            out = out.withColumn(c, F.coalesce(F.col(f"__enrich_{c}"), F.col(c)))
        else:
            out = out.withColumn(c, F.col(f"__enrich_{c}"))
    return out.drop("__enrich_key", *[f"__enrich_{c}" for c in value_cols])
