from clustopher_spark.streaming.windows import (
    sessionized_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
from clustopher_spark.streaming.stateful import running_user_totals

__all__ = [
    "stream_events",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "sessionized_stream",
    "running_user_totals",
]
