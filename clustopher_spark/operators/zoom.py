"""Zoom-hierarchy materialization (SURVEY.md §4.3.2).

The reference re-clusters the viewport on every query
(cluster/cluster.go:867-956). Supercluster-proper — and this engine —
precomputes one cluster set per zoom, bottom-up: level ``max_zoom``
clusters the raw points; each coarser level re-clusters the previous
level's output, which is sound because the greedy operator is *closed*
under ``num_points`` weighting (validated by the reference's nested-rollup
tests, cluster/cluster_test.go:75-105, 228-274).

At serve time a viewport query against the materialized table is a pure
scan + bbox filter — no clustering work — which is how we beat the
reference's <50 ms single-node latency at cluster scale: the per-zoom
table is written partitioned by zoom and sorted by (scx, scy) so parquet
row-group min/max stats prune to the viewport.

The driver loop is 17 sequential Spark jobs (z=16..0); each level's input
is the previous level's (small, cached) output, so total work is a
geometric series dominated by the z=16 pass over raw points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import (
    ClusterOptions,
    _greedy_assign,
    cluster_at_zoom,
)
from clustopher_spark.plans.projection import project_np, unproject_np


def _cluster_level_local(
    pdf: pd.DataFrame, zoom: int, metric_cols: list[str], opts: ClusterOptions
) -> pd.DataFrame:
    """One zoom level of the pyramid computed driver-side in numpy — the
    same greedy kernel + A1/A2 algebra as the distributed path (pinned
    against it by tests). Input/output frames use the zoom_levels schema
    minus the zoom column, with `id`/`num_points`/metric names on input."""
    px, py = project_np(pdf["lng"].to_numpy(), pdf["lat"].to_numpy(), zoom, opts.extent)
    assigned = _greedy_assign(
        pdf["id"].to_numpy(np.int64), px, py, opts.radius, opts.min_points
    )
    w = pdf["num_points"].to_numpy(np.float64)
    df = pd.DataFrame(
        {
            "cluster_id": assigned,
            "wx": px * w,
            "wy": py * w,
            "w": w,
            "num_points": pdf["num_points"].to_numpy(np.int64),
        }
    )
    for m in metric_cols:
        df[m] = pdf[m].to_numpy(np.float64)
    g = df.groupby("cluster_id", sort=True)
    agg = g.agg(
        wx=("wx", "sum"), wy=("wy", "sum"), w=("w", "sum"),
        point_count=("num_points", "sum"), num_members=("num_points", "size"),
        **{f"sum_{m}": (m, "sum") for m in metric_cols},
    ).reset_index()
    lng, lat = unproject_np(
        (agg["wx"] / agg["w"]).to_numpy(), (agg["wy"] / agg["w"]).to_numpy(), zoom, opts.extent
    )
    out = pd.DataFrame(
        {
            "cluster_id": agg["cluster_id"],
            "lng": lng,
            "lat": lat,
            "point_count": agg["point_count"].astype(np.int64),
            "num_members": agg["num_members"].astype(np.int64),
            "is_cluster": agg["num_members"] > 1,
        }
    )
    for m in metric_cols:
        out[f"sum_{m}"] = agg[f"sum_{m}"]
    return out


def materialize_zoom_levels(
    points: DataFrame,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
    cache_levels: bool = True,
    local_tail_threshold: int = 100_000,
) -> DataFrame:
    """Build the full ``zoom_levels`` table: one cluster set per zoom.

    Output: (zoom INT, cluster_id, lng, lat, point_count, num_members,
    is_cluster, sum_<metric>...).

    Levels shrink geometrically, so after the first couple of zooms the
    remaining pyramid fits on the driver: below ``local_tail_threshold``
    rows the tail levels run as one numpy pass (broadcast-threshold logic —
    ~1 s of fixed Spark job overhead per level is pure waste on 1k rows).
    At 100 TB the first levels dominate and they stay fully distributed.
    """
    metric_cols = metric_cols or []
    spark = points.sparkSession
    default_par = spark.sparkContext.defaultParallelism
    levels: list[DataFrame] = []
    current = points
    n_rows: int | None = None  # unknown for the raw input; known post-checkpoint
    zooms = list(range(opts.max_zoom, opts.min_zoom - 1, -1))
    for idx, zoom in enumerate(zooms):
        if n_rows is not None and n_rows <= local_tail_threshold:
            # ---- driver-side tail: finish the pyramid in one numpy pass ----
            pdf = current.toPandas()
            frames = []
            for z in zooms[idx:]:
                out = _cluster_level_local(pdf, z, metric_cols, opts)
                frames.append(out.assign(zoom=z))
                pdf = out.rename(
                    columns={"cluster_id": "id", "point_count": "num_points",
                             **{f"sum_{m}": m for m in metric_cols}}
                )[["id", "lng", "lat", "num_points", *metric_cols]]
            tail = spark.createDataFrame(pd.concat(frames, ignore_index=True))
            levels.append(tail)
            break
        # scale kernel parallelism to the level size: upper levels shrink
        # geometrically and 32-task shuffles on 1k rows are pure overhead
        par = None if n_rows is None else max(1, min(default_par, n_rows // 2000))
        clustered = cluster_at_zoom(
            current, zoom, metric_cols=metric_cols, opts=opts, parallelism=par
        )
        if cache_levels:
            # Truncate lineage so chained levels don't deepen the plan;
            # persistent pipelines write each level to parquet instead
            # (write_zoom_levels).
            clustered = clustered.localCheckpoint(eager=True)
            n_rows = clustered.count()  # free: counts the checkpointed RDD
        levels.append(clustered.withColumn("zoom", F.lit(zoom)))
        # closure: feed this level's clusters into the next (coarser) level
        current = clustered.select(
            F.col("cluster_id").alias("id"),
            "lng",
            "lat",
            F.col("point_count").alias("num_points"),
            *[F.col(f"sum_{m}").alias(m) for m in metric_cols],
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def write_zoom_levels(zoom_levels: DataFrame, path: str, opts: ClusterOptions = ClusterOptions()) -> None:
    """Persist partitioned by zoom, spatially sorted within partitions.

    The (floor(lng), floor(lat)) sort key gives parquet row-group min/max
    stats that prune viewport bbox filters — the Spark-native replacement
    for the reference's KD-tree AABB pruning (cluster/cluster.go:1026-1029).
    """
    (
        zoom_levels.repartition("zoom")
        .sortWithinPartitions(F.floor("lng"), F.floor("lat"))
        .write.mode("overwrite")
        .partitionBy("zoom")
        .parquet(path)
    )


def query_zoom_levels(
    zoom_levels: DataFrame, west: float, south: float, east: float, north: float, zoom: int
) -> DataFrame:
    """Serve-time viewport query: partition-pruned scan + bbox filter."""
    return zoom_levels.filter(
        (F.col("zoom") == zoom)
        & (F.col("lng") >= west)
        & (F.col("lng") <= east)
        & (F.col("lat") >= south)
        & (F.col("lat") <= north)
    )
