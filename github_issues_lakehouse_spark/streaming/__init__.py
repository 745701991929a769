from .ops import (  # noqa: F401
    enrich_stream_with_dim,
    purchase_error_stream_join,
    quality_gate_stream,
    running_user_totals_stream,
    session_window_agg,
    sessionize_stream,
    stream_dedup,
    stream_mart_maintenance,
    stream_merge_to_parquet,
    tws_available,
    windowed_event_counts,
)
