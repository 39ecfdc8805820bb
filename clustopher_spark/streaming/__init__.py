from clustopher_spark.streaming.windows import (
    sessionized_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
from clustopher_spark.streaming.stateful import running_user_totals, streaming_topk_values
from clustopher_spark.streaming.joins import (
    dedup_within_watermark,
    views_purchases_interval_join,
)
from clustopher_spark.streaming.sinks import foreach_batch_upsert

__all__ = [
    "stream_events",
    "tumbling_counts_stream",
    "sliding_counts_stream",
    "sessionized_stream",
    "running_user_totals",
    "streaming_topk_values",
    "views_purchases_interval_join",
    "dedup_within_watermark",
    "foreach_batch_upsert",
]
