"""Live cluster maintenance over a stream of points — the streaming
extension of the viewport-cluster query (no reference analog: the reference
loads static datasets only, runner/runner.go).

Strategy: maintain per-(zoom, grid-cell) weighted aggregates incrementally.
Grid-cell clusters are the associative core of the engine (A1/A2 algebra:
weighted centroid = Σw·p / Σw, metrics = Σ), so they fold over micro-batches
with plain streaming aggregation state — no custom state store. The greedy
merge pass, which is NOT associative, runs at serve time on the (small)
live cell table, exactly like the batch path runs it on zoom-level rows.

State size: O(occupied cells per zoom), independent of stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import ClusterOptions
from clustopher_spark.plans.projection import project_cols


def live_cell_aggregates(
    points_stream: DataFrame,
    zoom: int,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
) -> DataFrame:
    """Streaming points (id, lng, lat[, metrics...]) -> continuously updated
    per-cell aggregates at ``zoom`` (update output mode).

    Output: (cx, cy, point_count, wx, wy) + sum_<metric>: the mergeable
    partial state of A1/A2. Centroid = (wx/point_count, wy/point_count).
    """
    metric_cols = metric_cols or []
    px, py = project_cols(F.col("lng"), F.col("lat"), zoom, opts.extent)
    cell = points_stream.withColumn("px", px).withColumn("py", py).select(
        F.floor(F.col("px") / F.lit(opts.radius)).alias("cx"),
        F.floor(F.col("py") / F.lit(opts.radius)).alias("cy"),
        "px",
        "py",
        *metric_cols,
    )
    aggs = [
        F.count(F.lit(1)).alias("point_count"),
        F.sum("px").alias("wx"),
        F.sum("py").alias("wy"),
    ]
    for m in metric_cols:
        aggs.append(F.sum(m).alias(f"sum_{m}"))
    return cell.groupBy("cx", "cy").agg(*aggs)


def serve_live_clusters(
    spark, cells_table: str, zoom: int,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
) -> DataFrame:
    """Serve-time finish over the live cell table: cells are re-expressed as
    weighted pseudo-points (closure!) and the greedy merge runs on them —
    identical to clustering a zoom-pyramid level."""
    from clustopher_spark.operators.cluster import cluster_at_zoom
    from clustopher_spark.plans.projection import unproject_cols

    metric_cols = metric_cols or []
    cells = spark.table(cells_table)
    lng, lat = unproject_cols(
        F.col("wx") / F.col("point_count"), F.col("wy") / F.col("point_count"),
        zoom, opts.extent,
    )
    # synthetic stable id per cell: pack (cx, cy) into one int64. The shift
    # is derived from the actual per-axis cell bound at this zoom
    # (cx, cy < ceil(2^zoom * extent / radius)) instead of a fixed 2^22 —
    # a fixed shift collides for deeper zooms / larger extents / smaller
    # radii, silently merging distinct cells into one pseudo-point.
    import math

    n_cells = max(1, math.ceil((1 << zoom) * opts.extent / opts.radius))
    bits = max(1, (n_cells - 1).bit_length())
    if 2 * bits > 62:
        raise ValueError(
            f"cell-id packing overflows int64: zoom={zoom} extent={opts.extent} "
            f"radius={opts.radius} needs 2*{bits} bits"
        )
    pseudo = cells.select(
        (F.col("cx") * F.lit(1 << bits) + F.col("cy")).alias("id"),
        lng.alias("lng"),
        lat.alias("lat"),
        F.col("point_count").alias("num_points"),
        *[F.col(f"sum_{m}").alias(m) for m in metric_cols],
    )
    return cluster_at_zoom(pseudo, zoom, metric_cols=metric_cols, opts=opts)
