from .ops import (
    enrich_stream,
    sessionized_stream,
    stream_dedup,
    tumbling_counts,
    windowed_agg,
)
from .sink import StreamMonitor, merge_stream, stream_to_lake_table
from .stateful import running_totals

__all__ = [
    "running_totals",
    "enrich_stream",
    "sessionized_stream",
    "stream_dedup",
    "tumbling_counts",
    "windowed_agg",
    "StreamMonitor",
    "merge_stream",
    "stream_to_lake_table",
]
