"""Streaming/batch parity: the streaming plans must produce the same results
as their batch equivalents when draining the same parquet with availableNow.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustopher_spark.queries.base import table
from clustopher_spark.streaming import (
    running_user_totals,
    sessionized_stream,
    stream_events,
    tumbling_counts_stream,
)
from clustopher_spark.streaming.windows import run_available_now

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return stream_events(spark, f"{SF_DIR}/events.parquet")


def test_tumbling_stream_matches_batch(spark, events_stream):
    run_available_now(tumbling_counts_stream(events_stream), "tumbling_out")
    stream_rows = {
        (r.wstart, r.event_type): (r.n, r.total)
        for r in spark.sql("select * from tumbling_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total")
    )
    batch_rows = {(r.wstart, r.event_type): (r.n, r.total) for r in batch.collect()}
    assert stream_rows == batch_rows and len(batch_rows) > 0


def test_session_stream_matches_batch(spark, events_stream):
    run_available_now(sessionized_stream(events_stream), "session_out")
    stream_rows = {
        (r.user_id, r.session_start): (r.n_events, r.session_value)
        for r in spark.sql("select * from session_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "session_value")
    )
    batch_rows = {
        (r.user_id, r.session_start): (r.n_events, r.session_value) for r in batch.collect()
    }
    assert stream_rows == batch_rows and len(batch_rows) > 0


def test_stateful_running_totals(spark, events_stream):
    run_available_now(running_user_totals(events_stream), "totals_out", output_mode="update")
    stream_rows = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("select * from totals_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    batch_rows = {
        r.user_id: (r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert stream_rows == batch_rows and len(batch_rows) > 0
