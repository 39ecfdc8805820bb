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


def _events_ts_unit(path: str) -> str:
    """Physical unit of the ``ts`` column ("ns"/"us"/"ms"/"s").

    The driver's generator has emitted both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) parquet across rounds; the streaming source needs a
    declared schema up front, so probe one footer instead of assuming.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        f = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    t = pq.read_schema(f).field("ts").type
    return getattr(t, "unit", "us")


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory.

    TIMESTAMP(NANOS) parquet is only readable as long (nanosAsLong) and
    needs an explicit truncation to Spark's microsecond timestamps; other
    units read natively as timestamp.
    """
    import os

    nanos = _events_ts_unit(path) == "ns"
    schema = EVENTS_SCHEMA.replace("ts timestamp", "ts long") if nanos else EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # the file source requires a directory; narrow with a glob filter
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


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


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    shuffle_partitions: int | None = None,
):
    """Drain everything currently available into an in-memory table and stop
    — the batch-parity harness used by tests (and a template for real sinks:
    swap format('memory') for format('delta')/kafka/parquet).

    ``shuffle_partitions`` sizes the stateful shuffle (= number of state
    store instances) for THIS query — a real streaming deployment decision:
    a streaming query's state partitioning is locked in at its first
    checkpoint, and each instance pays per-micro-batch maintenance, so it
    is sized to steady-state throughput, not to the session's batch
    default. Results are partition-count-independent (pinned by the
    batch-parity tests); the session conf is restored after start."""
    spark = stream_df.sparkSession
    prev = None
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    return q
