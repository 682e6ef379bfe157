from odp_dynamic_data_pipeline_spark.operators.enrich import enrich
from odp_dynamic_data_pipeline_spark.operators.mappings import extract_mapping
from odp_dynamic_data_pipeline_spark.operators.sessionize import pair_page_views, pair_page_views_exact
from odp_dynamic_data_pipeline_spark.operators.aggregate import conditional_counts

__all__ = [
    "enrich",
    "extract_mapping",
    "pair_page_views",
    "pair_page_views_exact",
    "conditional_counts",
]
