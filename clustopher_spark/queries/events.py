"""Event-time queries over the ``events`` table: tumbling/sliding/session
windows, as-of join, time-range join, JSON extraction (SURVEY.md §2.8
extension surface — the reference has no streaming operators).

These run in batch here (the driver's oracle is batch SQL); the same
logical plans run incrementally under Structured Streaming via
``clustopher_spark.streaming`` (watermark + the identical window exprs).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clustopher_spark.queries.base import EVENTS_US_SQL, register, table

DEC = "decimal(18,2)"


@register(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM ({EVENTS_US_SQL}) GROUP BY wstart, event_type ORDER BY wstart, event_type
    """,
)
def events_tumbling(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
            (F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total", "avg_value")
        .orderBy("wstart", "event_type")
    )


@register(
    "events_sliding_1h_30m",
    oracle=f"""
    WITH b AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart, value FROM ({EVENTS_US_SQL})
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS wstart, value FROM ({EVENTS_US_SQL})
    )
    SELECT wstart, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM b GROUP BY wstart ORDER BY wstart
    """,
)
def events_sliding(spark, sf_dir):
    """Sliding window (1h every 30m): each event lands in exactly 2 windows;
    the oracle expresses that as a union of two shifted tumbling grids."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("wstart"), "n", "total")
        .orderBy("wstart")
    )


@register(
    "events_session_windows",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS new_sess
      FROM ({EVENTS_US_SQL}) WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
    """,
)
def events_session(spark, sf_dir):
    """Session windows, 10-min gap. Spark's session_window merges events whose
    interval [ts, ts+gap) overlaps, i.e. a new session starts when the gap is
    >= 10 min — the oracle's gaps-and-islands uses the same boundary."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events", "session_value"
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "events_asof_last_view_before_purchase",
    oracle=f"""
    SELECT p.event_id, v.ts AS last_view_ts
    FROM (SELECT * FROM ({EVENTS_US_SQL}) WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM ({EVENTS_US_SQL}) WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def events_asof(spark, sf_dir):
    """As-of join, Spark-native: union the two tagged streams and take the
    last view timestamp per user via an ordered running window — ONE shuffle
    on user_id, no range explosion (SURVEY.md §2.3 as-of mapping). A view at
    exactly the purchase timestamp sorts first (tag 0 < 1), matching the
    oracle's ``>=``."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(0).alias("tag"), F.col("event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("tag"), F.col("event_id")
    )
    tagged = views.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_view = F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        tagged.withColumn("last_view_ts", last_view)
        .filter(F.col("tag") == 1)
        .select("event_id", "last_view_ts")
        .orderBy("event_id")
    )


@register(
    "events_views_within_hour_of_purchase",
    oracle=f"""
    SELECT p.event_id, COUNT(v.event_id) AS n_views_1h
    FROM (SELECT * FROM ({EVENTS_US_SQL}) WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM ({EVENTS_US_SQL}) WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL '1 hour'
    GROUP BY p.event_id ORDER BY p.event_id
    """,
)
def events_range_join(spark, sf_dir):
    """Time-band range join (J2's band-join technique on the time axis)."""
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"), F.col("event_id").alias("v_id")
    )
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    cond = (
        (p.user_id == v.v_user)
        & (v.v_ts <= p.ts)
        & (v.v_ts > p.ts - F.expr("INTERVAL 1 HOUR"))
    )
    return (
        p.join(v, cond, "left")
        .groupBy("event_id")
        .agg(F.count("v_id").alias("n_views_1h"))
        .orderBy("event_id")
    )


@register(
    "events_json_props",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
    FROM ({EVENTS_US_SQL}) GROUP BY k_bucket ORDER BY k_bucket
    """,
)
def events_json(spark, sf_dir):
    """JSON scalar extraction (SURVEY.md §2.7 JSON row)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(F.expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 10").alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_value"))
        .orderBy("k_bucket")
    )


@register(
    "events_hypertable_rollup",
    oracle=f"""
    WITH hours AS (
      SELECT date_trunc('hour', ts) AS bucket_start, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM ({EVENTS_US_SQL}) GROUP BY 1
    ), days AS (
      SELECT date_trunc('day', bucket_start) AS bucket_start, CAST(SUM(n) AS BIGINT) AS n, SUM(total) AS total
      FROM hours GROUP BY 1
    )
    SELECT 'hour' AS grain, bucket_start, n, ROUND(total, 2) AS total FROM hours
    UNION ALL
    SELECT 'day' AS grain, bucket_start, n, ROUND(total, 2) AS total FROM days
    ORDER BY grain, bucket_start
    """,
)
def events_hypertable_rollup(spark, sf_dir):
    """Continuous-aggregate hierarchy (hour -> day): each grain re-aggregates
    the previous grain's partials — the zoom-pyramid pattern on the time
    axis (operators/scale.py::time_rollup)."""
    ev = table(spark, sf_dir, "events")
    hours = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("dtotal"),
    )
    days = hours.groupBy(F.date_trunc("day", "bucket_start").alias("bucket_start")).agg(
        F.sum("n").alias("n"), F.sum("dtotal").alias("dtotal")
    )
    h = hours.select(
        F.lit("hour").alias("grain"), "bucket_start", "n",
        F.round(F.col("dtotal").cast("double"), 2).alias("total"),
    )
    d = days.select(
        F.lit("day").alias("grain"), "bucket_start", "n",
        F.round(F.col("dtotal").cast("double"), 2).alias("total"),
    )
    return h.unionByName(d).orderBy("grain", "bucket_start")


@register(
    "events_conversion_funnel",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, ts FROM ({EVENTS_US_SQL})),
    s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT s1.user_id, MIN(e.ts) AS t2 FROM s1
           JOIN ev e ON e.user_id = s1.user_id AND e.event_type = 'view' AND e.ts > s1.t1
           GROUP BY s1.user_id),
    s3 AS (SELECT s2.user_id, MIN(e.ts) AS t3 FROM s2
           JOIN ev e ON e.user_id = s2.user_id AND e.event_type = 'purchase' AND e.ts > s2.t2
           GROUP BY s2.user_id)
    SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
           (SELECT COUNT(*) FROM s2) AS n_viewed_after,
           (SELECT COUNT(*) FROM s3) AS n_purchased_after
    """,
)
def events_conversion_funnel(spark, sf_dir):
    """Ordered-sequence funnel (signup -> view -> purchase, each stage
    strictly after the previous): min-timestamp joins per stage — the
    window/sequential-pattern shape funnel analytics lowers to. Each stage
    shrinks the key set, so at scale the joins cascade onto ever-smaller
    broadcast sides."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    s2 = (
        s1.join(views, (F.col("user_id") == F.col("vu")) & (F.col("vts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("vts").alias("t2"))
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    s3 = (
        s2.join(buys, (F.col("user_id") == F.col("pu")) & (F.col("pts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("pts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_viewed_after")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


@register(
    "events_retention_cohorts",
    oracle=f"""
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM ({EVENTS_US_SQL})),
    firsts AS (SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY user_id)
    SELECT CAST(f.cohort_d AS TIMESTAMP) AS cohort_date,
           CAST(date_diff('day', f.cohort_d, e.d) AS BIGINT) AS day_n,
           COUNT(DISTINCT e.user_id) AS retained
    FROM ev e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY cohort_date, day_n ORDER BY cohort_date, day_n
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Retention triangle: users grouped by first-activity date, distinct
    actives per (cohort, days-since-first). Two shuffles, both on user_id /
    the (cohort, day) pair — the cohort table is one row per user, so the
    join back is broadcastable at any event volume (users << events).
    Day buckets derive from each user's own first day, not calendar weeks,
    so no engine week-start convention can skew the compare."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = ev.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .groupBy(
            F.col("cohort_d").cast("timestamp").alias("cohort_date"),
            F.datediff("d", "cohort_d").cast("long").alias("day_n"),
        )
        .agg(F.count_distinct("user_id").alias("retained"))
        .orderBy("cohort_date", "day_n")
    )


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ({EVENTS_US_SQL}) GROUP BY event_type, h
    ), scored AS (
      SELECT event_type, h, n,
             AVG(n) OVER w AS mu,
             STDDEV_SAMP(n) OVER w AS sd,
             COUNT(*) OVER w AS n_hist
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h, n, ROUND((n - mu) / sd, 4) AS z
    FROM scored
    WHERE n_hist >= 12 AND sd > 0 AND abs(n - mu) / sd > 2.5
    ORDER BY event_type, h
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Self-calibrating volume-anomaly detection: hourly event counts whose
    z-score against the TRAILING 24 hours (frame excludes the current row,
    so the anomaly can't suppress its own baseline) exceeds 2.5, with a
    12-hour warm-up before flagging.  The monitoring query every streaming
    ingest runs next to itself; 100 TB shape: one groupBy shuffle to
    hourly partials (tiny), then a per-event_type window over ~one row per
    hour — state is bounded by cardinality(event_type) x 25 rows no matter
    the event volume.  Streaming twin: the hourly partials are exactly
    ``tumbling_counts_stream`` output, so the same scoring runs on its
    sink table."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "h",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_hist"),
    )
    return (
        scored.filter(
            (F.col("n_hist") >= 12)
            & (F.col("sd") > 0)
            & (F.abs(F.col("n") - F.col("mu")) / F.col("sd") > 2.5)
        )
        .select("event_type", "h", "n", F.round((F.col("n") - F.col("mu")) / F.col("sd"), 4).alias("z"))
        .orderBy("event_type", "h")
    )


@register(
    "events_hourly_gap_fill",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM ({EVENTS_US_SQL}) GROUP BY event_type, h
    ), bounds AS (
      SELECT MIN(h) AS h_lo, MAX(h) AS h_hi FROM hourly
    ), spine AS (
      SELECT et.event_type, unnest(generate_series(b.h_lo, b.h_hi, INTERVAL '1 hour')) AS h
      FROM (SELECT DISTINCT event_type FROM hourly) et CROSS JOIN bounds b
    )
    SELECT s.event_type, s.h,
           COALESCE(hh.n, 0) AS n,
           COALESCE(hh.total, 0.0) AS total,
           CAST(hh.n IS NULL AS BOOLEAN) AS gap_filled
    FROM spine s LEFT JOIN hourly hh
      ON s.event_type = hh.event_type AND s.h = hh.h
    ORDER BY s.event_type, s.h
    """,
)
def events_hourly_gap_fill(spark, sf_dir):
    """Gap-filled hourly rollup (the TSDB ``time_bucket_gapfill``): a dense
    hour spine per event_type — generated with ``sequence()`` from the
    corpus's own bounds, never materialized on the driver — left-joined
    against the sparse hourly partials, missing buckets zero-filled and
    flagged.  100 TB shape: the spine is |event_type| x hours rows (tiny,
    broadcast side), the partials are one map-side-combined groupBy; raw
    events are scanned exactly once."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
    ).localCheckpoint(eager=True)  # reused by bounds, spine, and the join
    bounds = hourly.agg(F.min("h").alias("h_lo"), F.max("h").alias("h_hi"))
    spine = (
        hourly.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h_lo", "h_hi", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = spine.join(hourly, ["event_type", "h"], "left")
    return (
        joined.select(
            "event_type",
            "h",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
            F.col("n").isNull().alias("gap_filled"),
        )
        .orderBy("event_type", "h")
    )
