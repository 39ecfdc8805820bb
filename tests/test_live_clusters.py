"""Live streaming cluster maintenance: streamed cell state + serve-time
greedy finish must conserve totals and match the batch cell aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import ClusterOptions
from clustopher_spark.plans.projection import project_cols
from clustopher_spark.streaming.live_clusters import (
    live_cell_aggregates,
    serve_live_clusters,
)

OPTS = ClusterOptions(radius=100.0, min_points=2)
ZOOM = 5


def test_live_cells_match_batch_and_serve(spark, tmp_path):
    # stream source: points derived from orders, written as 3 files
    from clustopher_spark.queries.spatial import points_df

    pts = points_df(spark, "/root/testdata/sf0.001").select("id", "lng", "lat", "value")
    src = str(tmp_path / "pts")
    pts.repartition(3).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id long, lng double, lat double, value double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    cells = live_cell_aggregates(stream, ZOOM, ["value"], OPTS)
    q = (
        cells.writeStream.format("memory")
        .queryName("live_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 3  # genuinely incremental

    live = spark.sql("select * from live_cells")
    # streamed state == batch aggregation of the same cells
    px, py = project_cols(F.col("lng"), F.col("lat"), ZOOM, OPTS.extent)
    batch = (
        pts.withColumn("px", px).withColumn("py", py)
        .select(
            F.floor(F.col("px") / F.lit(OPTS.radius)).alias("cx"),
            F.floor(F.col("py") / F.lit(OPTS.radius)).alias("cy"),
            "px", "py", "value",
        )
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("point_count"),
            F.sum("px").alias("wx"), F.sum("py").alias("wy"),
            F.sum("value").alias("sum_value"),
        )
    )
    canon = lambda df: sorted(
        (r.cx, r.cy, r.point_count, round(r.wx, 4), round(r.wy, 4), round(r.sum_value, 2))
        for r in df.collect()
    )
    assert canon(live) == canon(batch)

    # serve-time greedy finish conserves every point and metric
    served = serve_live_clusters(spark, "live_cells", ZOOM, ["value"], OPTS)
    out = served.collect()
    assert sum(r.point_count for r in out) == pts.count()
    total_value = pts.agg(F.sum("value")).collect()[0][0]
    assert abs(sum(r.sum_value for r in out) - total_value) < 1e-4
