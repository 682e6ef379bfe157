"""PySpark-native analytics engine with the capabilities of the reference
config-driven observability pipeline (zhangruiddn/ODP-dynamic-data-pipeline),
re-expressed Spark-first, plus large-scale LLM-data-pipeline operators.

Layout:
    session    -- SparkSession factory tuned for scale (AQE, broadcast, UTC)
    sources    -- schema-declared readers/writers, table catalog
    operators  -- DataFrame -> DataFrame operator library (SURVEY.md section 2)
    functions  -- scalar helpers (SURVEY.md section 2.6)
    plans      -- YAML pipeline spec -> lazy DataFrame compiler
    streaming  -- Structured Streaming surface
"""

from odp_dynamic_data_pipeline_spark.session import get_spark, ensure_runtime_confs

__all__ = ["get_spark", "ensure_runtime_confs"]
