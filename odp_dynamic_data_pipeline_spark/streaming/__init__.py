from odp_dynamic_data_pipeline_spark.streaming.stream import (
    pair_page_views_stream,
    run_available_now,
    session_window_metrics,
    stream_enrich,
    windowed_event_counts,
)

__all__ = [
    "pair_page_views_stream",
    "run_available_now",
    "session_window_metrics",
    "stream_enrich",
    "windowed_event_counts",
]
