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
so the meta records the last folded batch_id and replays are skipped
(same trick as heavy_hitters.py / the upsert sink). The partials and
the meta commit ATOMICALLY (round-3 advice closed the old
two-parquet-commit crash window): each fold writes ONLY the touched
days' histograms under an immutable ``versions/v{N}`` directory and
repoints ``meta.json`` with one atomic rename carrying last_batch plus
a day -> directory manifest — untouched days stay owned by their older
version directories (the PyramidStore manifest pattern,
streaming/pyramid.py), so the write stays O(touched days) while a crash
anywhere leaves the previous (partials, meta) pair fully consistent.

Scale shape: state is |days| x B rows of (day, bin, cnt); each batch
folds via one hash aggregate on (day, bin) with map-side combine and an
O(touched-days) write. The raw stream is never retained.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.streaming.state_store import (
    commit_meta,
    prune_versions,
    read_meta,
    version_dir,
)


def _bin_col(value_col: str, lo: float, hi: float, bins: int):
    width = (hi - lo) / bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def _read_days(spark, root: str, manifest: dict, days) -> DataFrame | None:
    """Union the selected days' histograms, re-attaching the day column
    (each manifest entry is one day's directory; the column is implied by
    the key, not stored)."""
    frames = [
        spark.read.option("recursiveFileLookup", "true")
        .parquet(os.path.join(root, rel))
        .withColumn("day", F.lit(day).cast("date"))
        for day, rel in manifest.items()
        if day in days
    ]
    if not frames:
        return None
    return reduce(lambda a, b: a.unionByName(b), frames)


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
    store at ``store_path``. Returns the finished StreamingQuery."""
    spark = stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        meta = read_meta(store_path) or {
            "version": 0, "last_batch": -1, "manifest": {}
        }
        if batch_id <= int(meta["last_batch"]):
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
        days = sorted(str(r["day"]) for r in fresh.select("day").distinct().collect())
        if not days:
            return
        manifest = dict(meta["manifest"])
        merged = fresh
        old = _read_days(spark, store_path, manifest, set(days))
        if old is not None:
            merged = (
                fresh.unionByName(old)
                .groupBy("day", "bin")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        version = int(meta["version"]) + 1
        # one write job for all touched days: immutable version directory,
        # partitioned by day so each day gets its own manifest-addressable
        # subdirectory; untouched days keep their old owners
        out = os.path.join(version_dir(store_path, version), "days")
        merged.repartition("day").write.mode("overwrite").partitionBy(
            "day"
        ).parquet(out)
        for d in days:
            manifest[d] = os.path.join(
                "versions", f"v{version}", "days", f"day={d}"
            )
        commit_meta(store_path, {
            "version": version, "last_batch": batch_id, "manifest": manifest,
        })
        referenced = {
            int(rel.split(os.sep)[1][1:]) for rel in manifest.values()
        }
        prune_versions(store_path, referenced)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q


def read_partials(spark, store_path: str) -> DataFrame:
    """The full (day, bin, cnt) state across every day the manifest owns —
    the inspection/read surface now that the layout is versioned (a raw
    ``spark.read.parquet(store_path)`` would see multiple versions)."""
    meta = read_meta(store_path)
    if meta is None:
        raise ValueError(f"no quantile-partial state at {store_path}")
    out = _read_days(spark, store_path, meta["manifest"], set(meta["manifest"]))
    if out is None:
        raise ValueError(f"empty quantile-partial state at {store_path}")
    return out


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
    it overshoots the exact quantile by at most one bin width. Day-range
    selection happens driver-side against the manifest keys (ISO dates
    compare lexicographically), so only the selected days' files are
    even opened."""
    meta = read_meta(store_path)
    if meta is None:
        raise ValueError(f"no quantile-partial state at {store_path}")
    manifest = meta["manifest"]
    days = {
        d for d in manifest
        if (day_min is None or d >= str(day_min))
        and (day_max is None or d <= str(day_max))
    }
    paths = [os.path.join(store_path, manifest[d]) for d in sorted(days)]
    if not paths:
        raise ValueError(f"no histogram mass at {store_path} in range")
    # recursiveFileLookup disables partition discovery: the paths are
    # `day=...` leaf dirs under DIFFERENT version roots, which discovery
    # would reject as conflicting structures (the day column itself is
    # not needed here — selection already happened against the manifest)
    part = spark.read.option("recursiveFileLookup", "true").parquet(*paths)
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
