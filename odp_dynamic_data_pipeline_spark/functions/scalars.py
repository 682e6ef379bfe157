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
