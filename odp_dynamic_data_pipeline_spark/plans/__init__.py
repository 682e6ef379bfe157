from odp_dynamic_data_pipeline_spark.plans.pipeline import Pipeline, load_pipeline
from odp_dynamic_data_pipeline_spark.plans.tlb import tlb_metrics

__all__ = ["Pipeline", "load_pipeline", "tlb_metrics"]
