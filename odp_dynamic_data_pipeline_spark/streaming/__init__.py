from odp_dynamic_data_pipeline_spark.streaming.stream import (
    dedup_within_watermark,
    pair_page_views_stream,
    pair_page_views_tws,
    run_available_now,
    session_window_metrics,
    stream_enrich,
    stream_stream_join,
    windowed_event_counts,
)

__all__ = [
    "dedup_within_watermark",
    "pair_page_views_stream",
    "pair_page_views_tws",
    "run_available_now",
    "session_window_metrics",
    "stream_enrich",
    "stream_stream_join",
    "windowed_event_counts",
]
