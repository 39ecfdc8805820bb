"""Streaming maintenance of mergeable distinct-count sketches.

Batch twin: ``stats_hll_mergeable_rollup`` (queries/stats.py) — per-day
HLL user sketches rolled up per event type by sketch UNION. This module
is the continuously-ingesting form a 100 TB pipeline runs: each micro
batch folds its events into a persisted (day, event_type) -> sketch
partial store, and serving answers "distinct users per event type / day
range" by unioning the tiny partials — never rescanning raw history.

Per micro-batch (foreachBatch):

1. batch partials: groupBy(day, event_type) -> hll_sketch_agg(user_id);
2. merge: union with the persisted partials for the TOUCHED days only and
   hll_union_agg per key (materialized eagerly BEFORE the write so the
   read of the store finishes before its partitions are replaced);
3. dynamic partition overwrite of just those day partitions.

Replay safety: HLL union is idempotent over element sets (folding the
same events twice yields the same registers), so a batch replayed by the
streaming checkpoint after a mid-write failure converges to the same
store instead of double-counting — the property exact per-batch COUNT
(DISTINCT) partials fundamentally lack.

Scale shape: the store carries one ~KB sketch per (day, event_type); the
per-batch merge reads only the touched day partitions (partition-pruned
scan) and shuffles sketch bytes, not user ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LGK = 12  # same lgConfigK as the batch twin — sketches must merge


def _batch_partials(batch_df: DataFrame) -> DataFrame:
    return batch_df.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", F.lit(LGK)).alias("sk"))


def incremental_hll_rollup(
    events_stream: DataFrame,
    store_path: str,
    query_name: str = "hll_rollup_sink",
):
    """Drain ``events_stream`` (availableNow) into the per-day HLL partial
    store at ``store_path`` (parquet partitioned by day). Returns the
    finished StreamingQuery."""
    spark = events_stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        fresh = _batch_partials(batch_df).localCheckpoint(eager=True)
        days = [r["day"] for r in fresh.select("day").distinct().collect()]
        merged = fresh
        if os.path.isdir(store_path) and any(
            not f.startswith("_") for f in os.listdir(store_path)
        ):
            old = spark.read.parquet(store_path).filter(F.col("day").isin(days))
            merged = (
                fresh.unionByName(old)
                .groupBy("day", "event_type")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
        # eager checkpoint: the merge must finish READING the old
        # partitions before the overwrite below replaces them
        merged = merged.localCheckpoint(eager=True)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("day").parquet(store_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    q = (
        events_stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q


def distinct_users_by_event_type(spark, store_path: str) -> DataFrame:
    """Serve-time rollup over the partial store: distinct users per event
    type across all days — a union of ~KB sketches, no raw-event scan."""
    return (
        spark.read.parquet(store_path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx_users"),
        )
        .orderBy("event_type")
    )
