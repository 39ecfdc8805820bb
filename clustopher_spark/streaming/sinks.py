"""Streaming sinks beyond the in-memory test harness.

``foreach_batch_upsert``: the lightweight insert-if-absent sink — each
micro-batch is appended to a keyed parquet table (dedup within the
batch, anti-join against existing keys), so an at-least-once source
(replays, retries) yields an exactly-once table. Append-only by design:
when a stream needs real updates/deletes, versioned reads, or a change
feed, use the copy-on-write MERGE table instead
(streaming/merge_table.py over sources/merge_table.py — the "real MERGE
INTO" this docstring used to defer to an external table format).

At scale: the anti-join reads only the key column of the existing table
(column-pruned scan); batch sizes are watermark-bounded; the table is
append-only per micro-batch (no rewrite), which parquet supports natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def foreach_batch_upsert(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str] | None = None,
    query_name: str = "upsert_sink",
):
    """Start an availableNow stream writing micro-batches into a keyed
    parquet table with insert-if-absent semantics. Returns the finished
    StreamingQuery (await already done)."""
    keys = keys or ["event_id"]
    spark = stream_df.sparkSession

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # in-batch dedup first (a replayed source can duplicate within one
        # batch), then anti-join against what the table already holds
        fresh = batch_df.dropDuplicates(keys)
        if os.path.isdir(table_path) and any(
            f.endswith(".parquet") for f in os.listdir(table_path)
        ):
            existing_keys = spark.read.parquet(table_path).select(*keys)
            fresh = fresh.join(existing_keys, keys, "left_anti")
        fresh.write.mode("append").option("compression", "zstd").parquet(table_path)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", table_path + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q
