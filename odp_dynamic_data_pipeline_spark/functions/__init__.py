from odp_dynamic_data_pipeline_spark.functions.scalars import (
    strip_key_prefix,
    ts_diff_seconds,
    json_field,
)

__all__ = ["strip_key_prefix", "ts_diff_seconds", "json_field"]
