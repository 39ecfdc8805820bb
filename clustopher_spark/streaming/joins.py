"""Stream-stream joins and watermark-scoped deduplication (SURVEY.md §2.8
extension surface).

Stream-stream interval join: the streaming twin of the batch time-band range
join (queries.events.events_views_within_hour_of_purchase). Both sides are
watermarked so the state store can evict view rows once no purchase within
the interval can still arrive — at production scale state is bounded by
(watermark + interval) x arrival rate per user, and the shuffle key is
user_id on both sides (co-partitioned by the join).

dedup_within_watermark: exactly-once-per-key semantics over an at-least-once
source (e.g. replayed Kafka) — state holds one entry per key only until the
watermark passes it, unlike a global dropDuplicates whose state grows
forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def views_purchases_interval_join(
    views: DataFrame,
    purchases: DataFrame,
    interval: str = "1 hour",
    view_watermark: str = "2 hours",
    purchase_watermark: str = "1 hour",
) -> DataFrame:
    """Purchases joined to the same user's views in the preceding interval.

    Inner stream-stream join: each output row is (purchase, view) with
    view.ts in (purchase.ts - interval, purchase.ts]. The view side keeps a
    longer watermark because a view must stay in state until any matching
    purchase (up to `interval` later, delivered up to its own watermark
    late) has arrived.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    ).withWatermark("v_ts", view_watermark)
    p = purchases.select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    ).withWatermark("p_ts", purchase_watermark)
    cond = (
        (p.user_id == v.v_user)
        & (v.v_ts <= p.p_ts)
        & (v.v_ts > p.p_ts - F.expr(f"INTERVAL {interval}"))
    )
    return p.join(v, cond, "inner").select("p_id", "v_id", "user_id", "p_ts", "v_ts")


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Drop duplicate events by key, keeping state only within the watermark
    horizon (dropDuplicatesWithinWatermark — state is evicted as event time
    advances, so a replayed/at-least-once source dedups in O(open-horizon)
    state instead of O(stream-history))."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple = ("c_name", "c_nationkey"),
) -> DataFrame:
    """Stream-static enrichment join — the most common streaming shape of
    all (attach dimension attributes to every event before it lands
    anywhere). Spark resolves the STATIC side fresh per micro-batch, so a
    slowly-changing dimension's updates are picked up on the next batch
    with no restart.

    Scale shape: the dimension is explicitly broadcast — each micro-batch
    pays one broadcast of the (pruned: ``dim_key`` + ``dim_cols``)
    dimension and ZERO shuffles on the stream side, which is the only
    side that is large. For dimensions too big to broadcast, drop the
    hint and bucket both sides on the key instead (the bucketed-join
    layout in operators/scale.py); left join so events with no dimension
    row survive with nulls rather than silently vanishing."""
    d = dim.select(F.col(dim_key).alias(stream_key), *dim_cols)
    return stream.join(F.broadcast(d), stream_key, "left")
