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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import ClusterOptions, cluster_at_zoom


def materialize_zoom_levels(
    points: DataFrame,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
    cache_levels: bool = True,
) -> DataFrame:
    """Build the full ``zoom_levels`` table: one cluster set per zoom.

    Output: (zoom INT, cluster_id, lng, lat, point_count, num_members,
    is_cluster, sum_<metric>...).
    """
    metric_cols = metric_cols or []
    spark = points.sparkSession
    default_par = spark.sparkContext.defaultParallelism
    levels: list[DataFrame] = []
    current = points
    n_rows: int | None = None  # unknown for the raw input; known post-checkpoint
    for zoom in range(opts.max_zoom, opts.min_zoom - 1, -1):
        # scale kernel parallelism to the level size: upper levels shrink
        # geometrically and 32-task shuffles on 1k rows are pure overhead
        par = None if n_rows is None else max(1, min(default_par, n_rows // 2000))
        clustered = cluster_at_zoom(
            current, zoom, metric_cols=metric_cols, opts=opts, parallelism=par
        )
        if cache_levels:
            # Truncate lineage: cluster_at_zoom references its input twice
            # (assignment + projection branches), so an unbroken 17-level
            # chain doubles the logical plan per level — exponential analyze
            # cost. On a persistent pipeline each level is written to
            # parquet instead (write_zoom_levels).
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
