from .ops import windowed_event_counts, sessionize_stream, stream_dedup  # noqa: F401
