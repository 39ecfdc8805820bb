"""Z-order layout: at realistic row-group granularity, bbox scans touch
2-3x fewer row groups than a 1-D lng-sorted layout.

(Measured tradeoff, validated by simulation: with only a handful of coarse
row groups a lng-sort's slivers are competitive; the Morton win appears as
group count grows — 500+ groups here, millions at 100 TB. A curve
quantized to the WORLD while data occupies a corner loses the advantage
entirely — write_zordered quantizes to data bounds for exactly that
reason.) Asserted on actual parquet footer statistics over many random
viewports.
"""

from __future__ import annotations

import glob
import random

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from clustopher_spark.sources.generators import generate_test_points
from clustopher_spark.sources.layout import write_zordered


def _row_group_boxes(path_glob: str):
    boxes = []
    for f in glob.glob(path_glob):
        pf = pq.ParquetFile(f)
        names = [pf.schema_arrow.field(i).name for i in range(len(pf.schema_arrow))]
        lng_i, lat_i = names.index("lng"), names.index("lat")
        for rg in range(pf.metadata.num_row_groups):
            ls = pf.metadata.row_group(rg).column(lng_i).statistics
            as_ = pf.metadata.row_group(rg).column(lat_i).statistics
            boxes.append((ls.min, ls.max, as_.min, as_.max))
    return boxes


def _touched(boxes, west, east, south, north):
    return sum(
        1 for w, e, s, n in boxes if w <= east and e >= west and s <= north and n >= south
    )


def test_zorder_touches_fewer_row_groups(spark, tmp_path):
    pts = generate_test_points(spark, 60_000, -125, 25, -65, 49, num_partitions=8)
    block = str(16 * 1024)  # fine-grained groups: the many-row-groups regime

    flat = str(tmp_path / "lng_sorted")
    (
        pts.repartitionByRange(4, "lng").sortWithinPartitions("lng")
        .write.option("compression", "zstd").option("parquet.block.size", block)
        .parquet(flat)
    )
    zord = str(tmp_path / "zordered")
    write_zordered(pts, zord, num_files=4, block_size=16 * 1024)

    flat_boxes = _row_group_boxes(flat + "/*.parquet")
    z_boxes = _row_group_boxes(zord + "/*.parquet")
    assert len(z_boxes) > 100 and len(flat_boxes) > 100

    rng = random.Random(42)
    tot_flat = tot_z = 0
    for _ in range(30):
        w = rng.uniform(-125, -68)
        s = rng.uniform(25, 46)
        tot_flat += _touched(flat_boxes, w, w + 3, s, s + 3)
        tot_z += _touched(z_boxes, w, w + 3, s, s + 3)
    assert tot_z < 0.7 * tot_flat, f"z-order {tot_z} vs lng-sorted {tot_flat} groups touched"

    # correctness: identical rows through the pushed-down bbox filter
    def bbox_count(path):
        return (
            spark.read.parquet(path)
            .filter(F.col("lng").between(-100, -95) & F.col("lat").between(35, 40))
            .count()
        )

    assert bbox_count(flat) == bbox_count(zord) > 0


def test_zoom_partition_pruning(spark, tmp_path):
    """The serving table is written partitionBy(zoom); a zoom-filtered scan
    must prune to that partition directory (PartitionFilters in the plan,
    one zoom's files read) — the layout decision that keeps serve-time
    queries O(one level) regardless of pyramid size."""
    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.operators.zoom import query_zoom_levels
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 3000, seed=5).select("id", "lng", "lat", "value")
    eng = Clustopher(
        pts, ["value"], opts=ClusterOptions(radius=100.0, min_points=2, max_zoom=6)
    )
    path = str(tmp_path / "zl")
    eng.materialize(path)
    zl = spark.read.parquet(path)
    df = query_zoom_levels(zl, -125, 25, -65, 49, 4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(zoom" in plan or "zoom#" in plan.split(
        "PartitionFilters"
    )[1][:120], plan[:2000]
    # the pruned scan returns exactly the zoom-4 viewport slice
    expect = zl.filter(
        (F.col("zoom") == 4)
        & F.col("lng").between(-125, -65)
        & F.col("lat").between(25, 49)
    ).count()
    assert df.count() == expect > 0
