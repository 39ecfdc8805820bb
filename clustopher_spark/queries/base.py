"""Registry plumbing for the driver-contract query inventory."""

from __future__ import annotations

import os
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


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship clustopher_spark to Python workers via addPyFile.

    The pandas kernels are cloudpickled by module reference, so workers
    must import the package. PYTHONPATH only helps if it was set before
    the JVM launched; addPyFile works on any live session (idempotent,
    zip built once per session)."""
    if getattr(spark, "_clustopher_pyfile_added", False):
        return
    # timestamp literals/windows must agree with the (naive-timestamp)
    # DuckDB oracle regardless of the host timezone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import shutil
    import tempfile

    import clustopher_spark

    pkg_dir = os.path.dirname(os.path.abspath(clustopher_spark.__file__))
    # rebuild once per process (never reuse a stale zip from a prior run)
    zip_base = os.path.join(tempfile.gettempdir(), f"clustopher_spark_pkg_{os.getpid()}")
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir), "clustopher_spark")
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. Spark Connect; PYTHONPATH fallback applies
    spark._clustopher_pyfile_added = True


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_workers_can_import(spark)
    # Memoize the base relation per (sf_dir, table) for the session:
    # every spark.read.parquet pays ~0.3 s of source resolution + file
    # listing + schema inference on this rig, and every query rep
    # constructs its frame fresh — so an entry touching three tables paid
    # ~1 s of pure driver overhead per execution. The DataFrame is
    # immutable and this caches only the ANALYZED BASE RELATION (file
    # list + schema — what a catalog/metastore registration would hold);
    # every execution still scans the parquet. The driver's input dirs
    # are immutable for a session's lifetime, so no invalidation is
    # needed.
    cache = getattr(spark, "_clustopher_table_cache", None)
    if cache is None:
        cache = {}
        spark._clustopher_table_cache = cache
    key = (os.path.abspath(sf_dir), name)
    hit = cache.get(key)
    if hit is not None:
        return hit
    if name == "events":
        # the driver may hand us a vanilla session; the events table is
        # TIMESTAMP(NANOS) parquet which Spark only reads via this conf
        # (runtime-settable)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # TIMESTAMP(NANOS) parquet read via nanosAsLong: truncate to the
            # microsecond precision Spark timestamps carry. Oracle SQL applies
            # the matching date_trunc('microseconds', ts) (EVENTS_US_SQL).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet infers as NTZ;
            # event-time ops (watermarks, window()) require LTZ. Session tz is
            # pinned to UTC so the cast is value-preserving and deterministic.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    cache[key] = df
    return df


# oracle-side view of events at Spark's microsecond timestamp precision
EVENTS_US_SQL = (
    "SELECT event_id, date_trunc('microseconds', ts) AS ts, user_id, "
    "event_type, value, props FROM events"
)
