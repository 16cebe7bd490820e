"""Structured Streaming surface (SURVEY.md §7.2 v6).

The reference is strictly batch (SURVEY §2.5); this package provides
the streaming analogues of its aggregations plus the stateful
operators a production event pipeline needs.
"""

from .windows import (
    running_dedupe,
    stream_stream_interval_join,
    session_counts,
    sliding_counts,
    stateful_key_stats,
    stateful_key_stats_v1,
    streaming_funnel,
    stateful_running_count,
    stream_from_directory,
    tumbling_counts,
)

__all__ = [
    "running_dedupe",
    "stream_stream_interval_join",
    "session_counts",
    "sliding_counts",
    "stateful_key_stats",
    "stateful_key_stats_v1",
    "streaming_funnel",
    "stateful_running_count",
    "stream_from_directory",
    "tumbling_counts",
]
