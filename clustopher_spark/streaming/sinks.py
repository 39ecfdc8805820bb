"""Streaming sinks beyond the in-memory test harness.

``foreach_batch_upsert``: the production-shaped sink — each micro-batch
is merged into a keyed parquet table (dedup within the batch, anti-join
against existing keys), so an at-least-once source (replays, retries)
yields an exactly-once table. This is the same full-outer-join MERGE plan
as queries.sql_features.merge_upsert_orders, driven incrementally; on a
transactional table format (Delta/Iceberg) the rewrite step becomes a
real MERGE INTO and the whole-table read disappears.

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
