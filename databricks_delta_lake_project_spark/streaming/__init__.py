from .ops import (
    enrich_stream,
    sessionized_stream,
    stream_dedup,
    tumbling_counts,
    windowed_agg,
)
from .sink import StreamMonitor, merge_stream, stream_to_lake_table

__all__ = [
    "enrich_stream",
    "sessionized_stream",
    "stream_dedup",
    "tumbling_counts",
    "windowed_agg",
    "StreamMonitor",
    "merge_stream",
    "stream_to_lake_table",
]
