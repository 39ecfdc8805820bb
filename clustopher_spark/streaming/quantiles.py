"""Streaming maintenance of mergeable quantile partials (per-day
fixed-bin histograms).

Completes the sketch-store trio next to the HLL distinct-count partials
(sketches.py) and the Misra-Gries frequency summary (heavy_hitters.py):
distinct / frequency / quantile, each answering a full-history question
from state that never grows with event volume.

Per-day histogram partials are the simplest mergeable quantile summary:
merge = sum counts per (day, bin) — associative, commutative, and
serveable over ANY day range by a cumulative walk of B bins. The served
quantile is exact up to one bin width (values inside a bin are
indistinguishable), a bound the test asserts against the exact
percentile. Values outside [lo, hi) clamp into the edge bins, which
widens the error only for quantiles that land there — lo/hi are part of
the store's identity and must not change between drains.

Replay safety: summed counts are NOT idempotent under checkpoint replay,
so the meta row records the last folded batch_id and replays are
skipped (same trick as heavy_hitters.py / the upsert sink — including
its caveat: the partials write and the meta write are two parquet
commits, and a crash between them can refold one batch on restart; a
transactional table format committing both in one snapshot closes the
window).

Scale shape: state is |days| x B rows of (day, bin, cnt); each batch
folds via one hash aggregate on (day, bin) with map-side combine and a
dynamic partition overwrite of the touched days only. The raw stream is
never retained.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_col(value_col: str, lo: float, hi: float, bins: int):
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def _read_meta(spark, store_path: str):
    meta_path = store_path + "_meta"
    if not (os.path.isdir(meta_path) and any(
        not f.startswith("_") for f in os.listdir(meta_path)
    )):
        return -1
    return spark.read.parquet(meta_path).collect()[0]["last_batch"]


def incremental_quantile_partials(
    stream: DataFrame,
    store_path: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
    query_name: str = "quantile_partials_sink",
):
    """Drain ``stream`` (availableNow) into the per-day histogram partial
    store at ``store_path`` (parquet partitioned by day). Returns the
    finished StreamingQuery."""
    spark = stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_meta(spark, store_path):
            return  # checkpoint replay: already folded
        fresh = (
            batch_df.filter(F.col(value_col).isNotNull())
            .groupBy(
                F.to_date("ts").alias("day"),
                _bin_col(value_col, lo, hi, bins).alias("bin"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        days = [r["day"] for r in fresh.select("day").distinct().collect()]
        if not days:
            return
        merged = fresh
        if os.path.isdir(store_path) and any(
            not f.startswith("_") for f in os.listdir(store_path)
        ):
            old = spark.read.parquet(store_path).filter(F.col("day").isin(days))
            merged = (
                fresh.unionByName(old)
                .groupBy("day", "bin")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        # eager checkpoint: finish READING the old partitions before the
        # dynamic overwrite below replaces them
        merged = merged.localCheckpoint(eager=True)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("day").parquet(store_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        spark.createDataFrame(
            [(batch_id,)], "last_batch long"
        ).coalesce(1).write.mode("overwrite").parquet(store_path + "_meta")

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q


def quantiles_from_partials(
    spark,
    store_path: str,
    qs: list[float],
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
    day_min=None,
    day_max=None,
) -> list[float]:
    """Serve quantiles over an optional day range by a cumulative walk of
    the merged histogram — B rows scanned, no raw-event access. Each
    returned value is the upper edge of the bin holding the quantile, so
    it overshoots the exact quantile by at most one bin width."""
    part = spark.read.parquet(store_path)
    if day_min is not None:
        part = part.filter(F.col("day") >= F.lit(day_min))
    if day_max is not None:
        part = part.filter(F.col("day") <= F.lit(day_max))
    hist = {
        r["bin"]: r["cnt"]
        for r in part.groupBy("bin").agg(F.sum("cnt").alias("cnt")).collect()
    }
    total = sum(hist.values())
    if not total:
        raise ValueError(f"no histogram mass at {store_path} in range")
    width = (hi - lo) / bins
    out = []
    for q in qs:
        target = q * total
        acc = 0
        for b in sorted(hist):
            acc += hist[b]
            if acc >= target:
                out.append(lo + (b + 1) * width)
                break
    return out
