from odp_dynamic_data_pipeline_spark.operators.aggregate import (
    conditional_counts,
    with_zero_default_universe,
)
from odp_dynamic_data_pipeline_spark.operators.asof import asof_join
from odp_dynamic_data_pipeline_spark.operators.correlate import (
    correlate_events_logs,
    explode_spans,
)
from odp_dynamic_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    shingles,
    simhash,
)
from odp_dynamic_data_pipeline_spark.operators.enrich import enrich
from odp_dynamic_data_pipeline_spark.operators.mappings import extract_mapping
from odp_dynamic_data_pipeline_spark.operators.sessionize import (
    pair_page_views,
    pair_page_views_exact,
)
from odp_dynamic_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_quantizer,
    lsh_topk,
)
from odp_dynamic_data_pipeline_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
    token_stats,
)

__all__ = [
    "asof_join",
    "conditional_counts",
    "correlate_events_logs",
    "cosine_topk",
    "enrich",
    "exact_dedup",
    "explode_spans",
    "extract_mapping",
    "fingerprint",
    "ivf_topk",
    "kmeans_quantizer",
    "language_id",
    "lsh_topk",
    "minhash_lsh_pairs",
    "pair_page_views",
    "pair_page_views_exact",
    "quality_features",
    "shingles",
    "simhash",
    "token_stats",
    "with_zero_default_universe",
]
