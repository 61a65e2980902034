"""Structured Streaming surface: the G8 event-time operators on streams."""

from ferc_xbrl_extractor_spark.streaming.windows import (
    run_stream_to_memory,
    stream_session_counts,
    stream_tumbling_counts,
)

__all__ = [
    "run_stream_to_memory",
    "stream_session_counts",
    "stream_tumbling_counts",
]
