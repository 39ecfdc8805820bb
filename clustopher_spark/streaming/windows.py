"""Structured Streaming over the events table (SURVEY.md §2.8: a greenfield
extension — the reference has no streaming operators).

The window logic is the SAME Catalyst expressions as the batch queries in
``clustopher_spark.queries.events`` — one logical plan, two execution modes
(this is the point of Structured Streaming). Watermarks bound state for
late data; at 100 TB/day scale the state store only holds open windows per
key, and the shuffle is on (window, key) exactly like the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory.

    (The driver's single events.parquet carries TIMESTAMP(NANOS), which the
    streaming parquet source reads as long under nanosAsLong — convert.)
    """
    import os

    reader = spark.readStream.schema(
        EVENTS_SCHEMA.replace("ts timestamp", "ts long")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # the file source requires a directory; narrow with a glob filter
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Hourly tumbling counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total")
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1h window sliding every 30m."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )


def sessionized_stream(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user with the same >= gap boundary as the batch
    oracle (queries.events.events_session)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "session_value")
    )


def run_available_now(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain everything currently available into an in-memory table and stop
    — the batch-parity harness used by tests (and a template for real sinks:
    swap format('memory') for format('delta')/kafka/parquet)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
