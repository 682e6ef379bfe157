"""Batch MERGE (CDC apply / upsert): fold a change set into a snapshot.

The reference mutates state imperatively row-by-row in Redis
(reference: src/data_processor.py:90-92 full-keyspace SCAN + per-key SET);
the warehouse-scale equivalent is one declarative MERGE producing the next
snapshot: a single full-outer join on the key, every row decided by a CASE.
No driver loop, no per-row RPC -- at 100 TB this is one co-partitioned
shuffle (or none, if snapshot and changes share bucketing on the key).

Semantics (Delta/Iceberg MERGE subset):

* change op 'D': matched snapshot row is dropped;
* change op 'U'/'I' matched: change columns overwrite snapshot columns;
* change op 'U'/'I' unmatched: row is inserted;
* snapshot rows with no change pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` (one row per key, ``op_col`` in {'U','I','D'}) to
    ``snapshot``; returns the next snapshot with the snapshot's schema.

    Payload columns are taken from the change row when one exists (upsert
    overwrite), else from the snapshot row.  Changes must be unique per key
    -- pre-aggregate multi-event feeds with last-wins first (see
    operators.mappings.extract_mapping for the ordered-dedup idiom)."""
    payload = [c for c in snapshot.columns if c != key]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"merge_upsert: changes lack payload columns {missing}")
    s = snapshot.alias("s")
    c = changes.alias("c")
    joined = s.join(c, F.col(f"s.{key}") == F.col(f"c.{key}"), "full_outer")
    has_change = F.col(f"c.{op_col}").isNotNull()
    keep = ~(has_change & (F.col(f"c.{op_col}") == "D"))
    out_cols = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"c.{key}")).alias(key),
        *[
            F.when(has_change, F.col(f"c.{p}")).otherwise(F.col(f"s.{p}")).alias(p)
            for p in payload
        ],
    ]
    return joined.where(keep).select(*out_cols)
