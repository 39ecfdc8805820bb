"""Registry plumbing for the driver-contract query inventory."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a (spark, sf_dir) -> DataFrame query, with an
    optional DuckDB oracle SQL string (omit for non-SQL-expressible ops —
    the driver then records a rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read via nanosAsLong: truncate to the
        # microsecond precision Spark timestamps carry. Oracle SQL applies
        # the matching date_trunc('microseconds', ts) (EVENTS_US_SQL).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# oracle-side view of events at Spark's microsecond timestamp precision
EVENTS_US_SQL = (
    "SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, "
    "event_type, value, props FROM events"
)
