"""Clustering-surface queries (SURVEY.md §2.1-2.4, §2.10) over deterministic
points derived from ``orders`` by exact integer arithmetic, so the DuckDB
oracle reproduces them bit-for-bit:

    id    = o_orderkey
    lng   = -125 + (o_orderkey % 6000) / 100.0        -- [-125, -65)
    lat   =   25 + ((o_orderkey * 7) % 2400) / 100.0  -- [25, 49)
    value = o_totalprice; priority = o_orderpriority

Grid cells come straight from the integer keys (cell = k div 100), so no
float boundary can flip a bucket between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clustopher_spark.operators.cluster import ClusterOptions, get_clusters
from clustopher_spark.plans.projection import project_cols
from clustopher_spark.queries.base import register, table

DEC = "decimal(18,2)"

# shared derivation, SQL side (inlined into every oracle)
POINTS_SQL = """
    SELECT o_orderkey AS id,
           -125 + (o_orderkey % 6000) / 100.0 AS lng,
           25 + ((o_orderkey * 7) % 2400) / 100.0 AS lat,
           (o_orderkey % 6000) // 100 AS cell_x,
           ((o_orderkey * 7) % 2400) // 100 AS cell_y,
           o_totalprice AS value,
           o_orderpriority AS priority
    FROM orders
"""


def points_df(spark, sf_dir):
    """Spark side of the shared derivation (synthetic source S3 analog)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("id"),
        (F.lit(-125) + (F.col("o_orderkey") % 6000) / F.lit(100.0)).alias("lng"),
        (F.lit(25) + ((F.col("o_orderkey") * 7) % 2400) / F.lit(100.0)).alias("lat"),
        F.expr("(o_orderkey % 6000) div 100").alias("cell_x"),
        F.expr("((o_orderkey * 7) % 2400) div 100").alias("cell_y"),
        F.col("o_totalprice").alias("value"),
        F.col("o_orderpriority").alias("priority"),
    )


@register(
    "spatial_mercator_projection",
    oracle=f"""
    WITH pts AS ({POINTS_SQL})
    SELECT id,
           ROUND((lng + 180.0) / 360.0 * 131072.0, 4) AS px,
           ROUND((0.5 - 0.25 * ln((1.0 + sin(radians(least(greatest(lat, -85.0511), 85.0511))))
                 / (1.0 - sin(radians(least(greatest(lat, -85.0511), 85.0511))))) / pi()) * 131072.0, 4) AS py
    FROM pts ORDER BY id
    """,
)
def spatial_projection(spark, sf_dir):
    """P1 projectFast as column exprs (reference cluster/cluster.go:1169-1198);
    131072 = 2^8 * extent 512 (zoom 8)."""
    pts = points_df(spark, sf_dir)
    px, py = project_cols(F.col("lng"), F.col("lat"), zoom=8)
    return pts.select(
        "id", F.round(px, 4).alias("px"), F.round(py, 4).alias("py")
    ).orderBy("id")


@register(
    "spatial_viewport_filter",
    oracle=f"""
    WITH pts AS ({POINTS_SQL})
    SELECT priority, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM pts
    WHERE lng BETWEEN -110 AND -90 AND lat BETWEEN 30 AND 45
    GROUP BY priority ORDER BY priority
    """,
)
def spatial_viewport(spark, sf_dir):
    """P5 viewport bbox predicate -> pushed to the scan (SURVEY.md §2.2)."""
    pts = points_df(spark, sf_dir)
    return (
        pts.filter(
            F.col("lng").between(-110, -90) & F.col("lat").between(30, 45)
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .orderBy("priority")
    )


@register(
    "spatial_grid_centroids",
    oracle=f"""
    WITH pts AS ({POINTS_SQL})
    SELECT cell_x, cell_y, COUNT(*) AS point_count,
           CAST(SUM(CAST(lng AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS c_lng,
           CAST(SUM(CAST(lat AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS c_lat,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM pts GROUP BY cell_x, cell_y ORDER BY cell_x, cell_y
    """,
)
def spatial_grid(spark, sf_dir):
    """A7 grid-cell binning + A1 centroid + A2 metric sum as one group-by
    (reference cluster/cluster.go:1566-1572, 1896-1950)."""
    pts = points_df(spark, sf_dir)
    return (
        pts.groupBy("cell_x", "cell_y")
        .agg(
            F.count(F.lit(1)).alias("point_count"),
            (F.sum(F.col("lng").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias("c_lng"),
            (F.sum(F.col("lat").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias("c_lat"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("cell_x", "cell_y")
    )


@register(
    "spatial_meta_frequencies",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    counts AS (
      SELECT cell_x, cell_y, priority, COUNT(*) AS cnt
      FROM pts GROUP BY cell_x, cell_y, priority
    )
    SELECT cell_x, cell_y, priority,
           cnt / SUM(cnt) OVER (PARTITION BY cell_x, cell_y) AS freq
    FROM counts ORDER BY cell_x, cell_y, priority
    """,
)
def spatial_frequencies(spark, sf_dir):
    """A3 CalculateFrequencies re-expressed relationally: grid cells stand in
    for clusters; freq = cnt / window total (reference cluster/cluster.go:210-289)."""
    pts = points_df(spark, sf_dir)
    counts = pts.groupBy("cell_x", "cell_y", "priority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("cell_x", "cell_y")
    return counts.select(
        "cell_x",
        "cell_y",
        "priority",
        (F.col("cnt") / F.sum("cnt").over(w)).alias("freq"),
    ).orderBy("cell_x", "cell_y", "priority")


@register(
    "spatial_summary_stats",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    cells AS (
      SELECT cell_x, cell_y, COUNT(*) AS point_count,
             SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
      FROM pts GROUP BY cell_x, cell_y
    )
    SELECT CAST(SUM(point_count) AS BIGINT) AS total_points,
           COUNT(*) FILTER (WHERE point_count > 1) AS num_clusters,
           COUNT(*) FILTER (WHERE point_count = 1) AS num_single_points,
           CAST(MIN(sum_value) AS DOUBLE) AS min_value,
           CAST(MAX(sum_value) AS DOUBLE) AS max_value,
           CAST(SUM(sum_value) AS DOUBLE) AS total_value,
           CAST(SUM(sum_value) AS DOUBLE) / COUNT(*) AS avg_value
    FROM cells
    """,
)
def spatial_summary(spark, sf_dir):
    """A5 CalculateMetadataSummary: two-level rollup (points -> cells ->
    viewport), the partial+final aggregation pattern (helpers.go:142-344)."""
    pts = points_df(spark, sf_dir)
    cells = pts.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("point_count"),
        F.sum(F.col("value").cast(DEC)).alias("sum_value"),
    )
    return cells.agg(
        F.sum("point_count").cast("long").alias("total_points"),
        F.count(F.when(F.col("point_count") > 1, 1)).alias("num_clusters"),
        F.count(F.when(F.col("point_count") == 1, 1)).alias("num_single_points"),
        F.min("sum_value").cast("double").alias("min_value"),
        F.max("sum_value").cast("double").alias("max_value"),
        F.sum("sum_value").cast("double").alias("total_value"),
        (F.sum("sum_value").cast("double") / F.count(F.lit(1))).alias("avg_value"),
    )


@register("spatial_cluster_greedy")  # no oracle: greedy agglomeration is
# order-dependent/iterative, not SQL-expressible (SURVEY.md §4.3); the
# kernel's exact semantics are pinned by tests/test_cluster.py instead.
def spatial_cluster_greedy(spark, sf_dir):
    """C3 grid-strategy greedy clustering end-to-end at zoom 6 over the
    derived points (reference ClusterPoints, cluster/cluster.go:2434-2465)."""
    pts = points_df(spark, sf_dir).select("id", "lng", "lat", "value")
    opts = ClusterOptions(radius=100.0, min_points=2)
    out = get_clusters(pts, -125, 25, -65, 49, 6, ["value"], opts)
    return out.select(
        "cluster_id",
        F.round("lng", 6).alias("lng"),
        F.round("lat", 6).alias("lat"),
        "point_count",
        "num_members",
        "is_cluster",
        F.round("sum_value", 2).alias("sum_value"),
    ).orderBy("cluster_id")


@register(
    "spatial_cluster_invariants",
    oracle=f"""
    WITH pts AS ({POINTS_SQL})
    SELECT COUNT(*) AS total_points,
           TRUE AS points_conserved,
           TRUE AS members_conserved,
           TRUE AS value_conserved,
           TRUE AS clusters_le_points,
           TRUE AS bounds_ok
    FROM pts
    WHERE lng BETWEEN -125 AND -65 AND lat BETWEEN 25 AND 49
    """,
)
def spatial_cluster_invariants(spark, sf_dir):
    """Driver-checkable oracle for the greedy kernel (C1/C3): the greedy
    agglomeration itself is order-dependent and not SQL-expressible, but its
    conservation laws are — exactly the invariants the reference pins in
    cluster/cluster_test.go:475-530.

    ``total_points`` flows THROUGH the kernel (sum of per-cluster
    point_count), so a kernel that drops or duplicates points fails the
    cross-engine hash, not just a boolean.  The booleans additionally pin:
    member-count conservation, metric-sum conservation (|err| < 0.05 vs the
    exact DECIMAL sum), cluster-count sanity, and centroid containment in
    the viewport hull.
    """
    pts = points_df(spark, sf_dir).select("id", "lng", "lat", "value")
    opts = ClusterOptions(radius=100.0, min_points=2)
    out = get_clusters(pts, -125, 25, -65, 49, 6, ["value"], opts)
    exact = pts.filter(
        F.col("lng").between(-125, -65) & F.col("lat").between(25, 49)
    ).agg(
        F.count(F.lit(1)).cast("long").alias("exact_n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("exact_sum"),
    )
    ktotals = out.agg(
        F.sum("point_count").cast("long").alias("k_points"),
        F.sum("num_members").cast("long").alias("k_members"),
        F.sum("sum_value").cast("double").alias("k_sum"),
        F.count(F.lit(1)).cast("long").alias("k_clusters"),
        F.min("lng").alias("k_min_lng"),
        F.max("lng").alias("k_max_lng"),
        F.min("lat").alias("k_min_lat"),
        F.max("lat").alias("k_max_lat"),
    )
    eps = 1e-6
    return ktotals.crossJoin(exact).select(
        F.col("k_points").alias("total_points"),
        (F.col("k_points") == F.col("exact_n")).alias("points_conserved"),
        (F.col("k_members") == F.col("exact_n")).alias("members_conserved"),
        (F.abs(F.col("k_sum") - F.col("exact_sum")) < 0.05).alias("value_conserved"),
        (F.col("k_clusters") <= F.col("exact_n")).alias("clusters_le_points"),
        (
            (F.col("k_min_lng") >= -125 - eps)
            & (F.col("k_max_lng") <= -65 + eps)
            & (F.col("k_min_lat") >= 25 - eps)
            & (F.col("k_max_lat") <= 49 + eps)
        ).alias("bounds_ok"),
    )


@register(
    "spatial_geojson_features",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    cells AS (
      SELECT cell_x, cell_y, COUNT(*) AS point_count,
             SUM(CAST(value AS DECIMAL(18,2))) AS value
      FROM pts GROUP BY cell_x, cell_y
    )
    SELECT cell_x, cell_y,
           '{{"type":"Feature","geometry":{{"type":"Point","coordinates":['
           || ((-125 + cell_x + 0.5)::DECIMAL(12,6))::VARCHAR || ','
           || ((25 + cell_y + 0.5)::DECIMAL(12,6))::VARCHAR
           || ']}},"properties":{{"point_count":' || point_count::VARCHAR
           || ',"value":' || value::VARCHAR
           || ',"cluster":' || (CASE WHEN point_count > 1 THEN 'true' ELSE 'false' END)
           || '}}}}' AS feature
    FROM cells ORDER BY cell_x, cell_y
    """,
)
def spatial_geojson(spark, sf_dir):
    """ToGeoJSON sink shape (reference cluster/cluster.go:1999-2050) over
    grid-cell clusters. The Feature string is assembled from engine-neutral
    renderings — DECIMAL casts (fixed scale, identical text in Spark and
    DuckDB) and integer/boolean literals — so the oracle checks the JSON
    text byte-for-byte; coordinates are the exact cell centers."""
    pts = points_df(spark, sf_dir)
    cells = pts.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("point_count"),
        F.sum(F.col("value").cast(DEC)).alias("value"),
    )
    lng_s = (F.col("cell_x") + F.lit(-125) + F.lit(0.5)).cast("decimal(12,6)").cast("string")
    lat_s = (F.col("cell_y") + F.lit(25) + F.lit(0.5)).cast("decimal(12,6)").cast("string")
    feature = F.concat(
        F.lit('{"type":"Feature","geometry":{"type":"Point","coordinates":['),
        lng_s, F.lit(","), lat_s,
        F.lit(']},"properties":{"point_count":'),
        F.col("point_count").cast("string"),
        F.lit(',"value":'), F.col("value").cast("string"),
        F.lit(',"cluster":'),
        F.when(F.col("point_count") > 1, F.lit("true")).otherwise(F.lit("false")),
        F.lit("}}"),
    )
    return cells.select("cell_x", "cell_y", feature.alias("feature")).orderBy(
        "cell_x", "cell_y"
    )


@register(
    "spatial_haversine_distance",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    d AS (
      SELECT cell_x,
             2 * 6371.0 * asin(sqrt(
               pow(sin(radians(lat - 40.0) / 2), 2)
               + cos(radians(40.0)) * cos(radians(lat))
                 * pow(sin(radians(lng - (-100.0)) / 2), 2)
             )) AS km
      FROM pts)
    SELECT cell_x, COUNT(*) AS n,
           ROUND(MIN(km), 4) AS min_km, ROUND(MAX(km), 4) AS max_km
    FROM d GROUP BY cell_x ORDER BY cell_x
    """,
)
def spatial_haversine_distance(spark, sf_dir):
    """True-sphere great-circle distance (haversine) from every point to
    the anchor (-100, 40) — the geodesic alternative to the reference's
    tile-space Euclidean metric (SURVEY.md §2.7 distance row). Pure column
    trig, min/max per exact integer cell key (grouping on a transcendental
    band would flip buckets across engine ulps)."""
    pts = points_df(spark, sf_dir)
    km = (
        F.lit(2 * 6371.0)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat") - 40.0) / 2), 2)
                + F.cos(F.radians(F.lit(40.0)))
                * F.cos(F.radians(F.col("lat")))
                * F.pow(F.sin(F.radians(F.col("lng") - (-100.0)) / 2), 2)
            )
        )
    )
    return (
        pts.select("cell_x", km.alias("km"))
        .groupBy("cell_x")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("km"), 4).alias("min_km"),
            F.round(F.max("km"), 4).alias("max_km"),
        )
        .orderBy("cell_x")
    )


_HAVERSINE_KM_SQL = """
      2 * 6371.0 * asin(sqrt(
        pow(sin(radians(lat - 40.0) / 2), 2)
        + cos(radians(40.0)) * cos(radians(lat))
          * pow(sin(radians(lng - (-100.0)) / 2), 2)
      ))
"""


@register(
    "spatial_knn_query",
    oracle=f"""
    WITH pts AS ({POINTS_SQL})
    SELECT id, lng, lat, ROUND({_HAVERSINE_KM_SQL}, 4) AS km
    FROM pts
    ORDER BY {_HAVERSINE_KM_SQL}, id
    LIMIT 25
    """,
)
def spatial_knn_query(spark, sf_dir):
    """k nearest points to an anchor (-100, 40) by great-circle distance —
    the reference's KD-tree range/nearest query surface
    (cluster/cluster.go:2151-2212) re-expressed distributively.  No index
    build and no global sort: ``orderBy(...).limit(k)`` plans as
    TakeOrderedAndProject, a per-partition top-k heap plus a k-row driver
    merge, so at 100 TB every scan task keeps 25 rows and the shuffle is
    k*n_partitions rows, not the table.  Ties broken by id (duplicate
    coordinates exist by construction)."""
    pts = points_df(spark, sf_dir)
    km = (
        F.lit(2 * 6371.0)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat") - 40.0) / 2), 2)
                + F.cos(F.radians(F.lit(40.0)))
                * F.cos(F.radians(F.col("lat")))
                * F.pow(F.sin(F.radians(F.col("lng") - (-100.0)) / 2), 2)
            )
        )
    )
    return (
        pts.select("id", "lng", "lat", km.alias("_km"))
        .orderBy("_km", "id")
        .limit(25)
        .select("id", "lng", "lat", F.round(F.col("_km"), 4).alias("km"))
    )


def _quadkey_digits_sql(zoom: int) -> str:
    """Quadkey as SQL string concat: digit i = tx bit + 2*ty bit."""
    parts = [
        f"CAST(((tx // {1 << (zoom - i)}) % 2) + 2 * ((ty // {1 << (zoom - i)}) % 2) AS VARCHAR)"
        for i in range(1, zoom + 1)
    ]
    return " || ".join(parts)


@register(
    "spatial_tile_quadkeys",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    tiles AS (
      SELECT CAST(floor((lng + 180.0) / 360.0 * 1024.0) AS BIGINT) AS tx,
             CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians(lat)))
                   / (1.0 - sin(radians(lat)))) / pi()) * 1024.0) AS BIGINT) AS ty,
             value
      FROM pts)
    SELECT {_quadkey_digits_sql(10)} AS quadkey,
           tx, ty, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM tiles GROUP BY tx, ty ORDER BY tx, ty
    """,
)
def spatial_tile_quadkeys(spark, sf_dir):
    """Slippy-map tile aggregation at zoom 10 with Bing-style quadkey
    addressing — the serving-tier partition key for map tiles (each zoom-z
    tile's key is its zoom-(z-1) parent's key plus one digit, so prefix
    ranges ARE pyramid subtrees; partitioning/bucketing by quadkey
    co-locates every ancestor chain).  Tile math is the same Web-Mercator
    used by projectFast (plans/projection.py); the quadkey is built from
    integer bit arithmetic after one floor, so the oracle matches exactly.
    One shuffle (the tile groupBy)."""
    pts = points_df(spark, sf_dir)
    z = 10
    n_tiles = F.lit(float(1 << z))
    lat_r = F.radians(F.col("lat"))
    tx = F.floor((F.col("lng") + 180.0) / 360.0 * n_tiles).cast("long")
    ty = F.floor(
        (
            F.lit(0.5)
            - F.lit(0.25)
            * F.log((F.lit(1.0) + F.sin(lat_r)) / (F.lit(1.0) - F.sin(lat_r)))
            / F.lit(3.141592653589793)
        )
        * n_tiles
    ).cast("long")
    tiles = pts.select(tx.alias("tx"), ty.alias("ty"), "value")
    digits = [
        (
            (F.col("tx") / F.lit(1 << (z - i))).cast("long") % 2
            + 2 * ((F.col("ty") / F.lit(1 << (z - i))).cast("long") % 2)
        ).cast("string")
        for i in range(1, z + 1)
    ]
    return (
        tiles.groupBy("tx", "ty")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.concat(*digits).alias("quadkey"),
            "tx", "ty", "n", "sum_value",
        )
        .orderBy("tx", "ty")
    )


@register(
    "spatial_geofence_join",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    fences AS (
      SELECT n_nationkey AS fence_id,
             -125 + (n_nationkey % 5) * 12 AS west,
             -125 + (n_nationkey % 5) * 12 + 10 AS east,
             25 + (n_nationkey // 5) * 4 AS south,
             25 + (n_nationkey // 5) * 4 + 4 AS north
      FROM nation
    )
    SELECT f.fence_id, COUNT(*) AS n_points,
           CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM pts p JOIN fences f
      ON p.lng >= f.west AND p.lng < f.east
     AND p.lat >= f.south AND p.lat < f.north
    GROUP BY f.fence_id ORDER BY f.fence_id
    """,
)
def spatial_geofence_join(spark, sf_dir):
    """Point-in-polygon (geofence) join — 25 rectangular fences derived from
    ``nation`` — decomposed the scalable way: the naive range join is a
    BroadcastNestedLoopJoin (every point tested against every fence; at
    100 TB that is points x fences work), so instead each fence EXPLODES to
    the integer grid cells it covers (tiny: fences x cells-per-fence rows)
    and the join becomes a broadcast HASH join on (cell_x, cell_y) —
    per-point work is one hash probe, independent of fence count.  Fence
    bounds are integer degrees and membership is half-open
    ([west, east) x [south, north)), so cell coverage is exact and the
    DuckDB oracle — which runs the naive theta join — must agree row for
    row.  The residual BETWEEN refinement stays in the join condition for
    the general (non-aligned) case."""
    pts = points_df(spark, sf_dir)
    n = table(spark, sf_dir, "nation")
    fences = n.select(
        F.col("n_nationkey").alias("fence_id"),
        (F.lit(-125) + (F.col("n_nationkey") % 5) * 12).alias("west"),
        (F.lit(-115) + (F.col("n_nationkey") % 5) * 12).alias("east"),
        (F.lit(25) + F.expr("n_nationkey div 5") * 4).alias("south"),
        (F.lit(29) + F.expr("n_nationkey div 5") * 4).alias("north"),
    )
    # fence -> covered 1-degree cells (cell_x = lng - (-125), cell_y = lat - 25
    # for integer-degree bounds; half-open so the east/north edge cells are
    # excluded exactly like the membership predicate)
    covered = fences.select(
        "fence_id", "west", "east", "south", "north",
        F.explode(F.sequence(F.col("west") + 125, F.col("east") + 125 - 1)).alias("cell_x"),
    ).select(
        "fence_id", "west", "east", "south", "north", "cell_x",
        F.explode(F.sequence(F.col("south") - 25, F.col("north") - 25 - 1)).alias("cell_y"),
    )
    j = pts.join(F.broadcast(covered), ["cell_x", "cell_y"]).filter(
        (F.col("lng") >= F.col("west")) & (F.col("lng") < F.col("east"))
        & (F.col("lat") >= F.col("south")) & (F.col("lat") < F.col("north"))
    )
    return (
        j.groupBy("fence_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .orderBy("fence_id")
    )


@register(
    "spatial_quadkey_rollup",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    tiles AS (
      SELECT CAST(floor((lng + 180.0) / 360.0 * 1024.0) AS BIGINT) AS tx,
             CAST(floor((0.5 - 0.25 * ln((1.0 + sin(radians(lat)))
                   / (1.0 - sin(radians(lat)))) / pi()) * 1024.0) AS BIGINT) AS ty,
             value
      FROM pts),
    z10 AS (
      SELECT {_quadkey_digits_sql(10)} AS quadkey, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
      FROM tiles GROUP BY tx, ty
    ),
    rolled AS (
      SELECT 10 AS zoom, quadkey, CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sum_value) AS DOUBLE) AS sum_value
      FROM z10 GROUP BY quadkey
      UNION ALL
      SELECT 8 AS zoom, substr(quadkey, 1, 8), CAST(SUM(n) AS BIGINT),
             CAST(SUM(sum_value) AS DOUBLE)
      FROM z10 GROUP BY substr(quadkey, 1, 8)
      UNION ALL
      SELECT 6 AS zoom, substr(quadkey, 1, 6), CAST(SUM(n) AS BIGINT),
             CAST(SUM(sum_value) AS DOUBLE)
      FROM z10 GROUP BY substr(quadkey, 1, 6)
    )
    SELECT zoom, quadkey, n, sum_value
    FROM rolled ORDER BY zoom, quadkey
    """,
)
def spatial_quadkey_rollup(spark, sf_dir):
    """Tile pyramid as quadkey PREFIX rollups: the z10 base aggregate is
    computed once, then z8 and z6 re-aggregate the (already tiny) z10
    partials by key truncation — the hypertable/continuous-aggregate
    pattern on the space axis, and the quadkey property that makes it
    free: a parent tile's key IS the child's prefix, so coarser levels
    never touch raw points.  At 100 TB exactly one shuffle sees input
    rows; every rollup shuffles tile counts (bounded by 4^z, not n)."""
    pts = points_df(spark, sf_dir)
    z = 10
    n_tiles = F.lit(float(1 << z))
    lat_r = F.radians(F.col("lat"))
    tx = F.floor((F.col("lng") + 180.0) / 360.0 * n_tiles).cast("long")
    ty = F.floor(
        (
            F.lit(0.5)
            - F.lit(0.25)
            * F.log((F.lit(1.0) + F.sin(lat_r)) / (F.lit(1.0) - F.sin(lat_r)))
            / F.lit(3.141592653589793)
        )
        * n_tiles
    ).cast("long")
    digits = [
        (
            (F.col("tx") / F.lit(1 << (z - i))).cast("long") % 2
            + 2 * ((F.col("ty") / F.lit(1 << (z - i))).cast("long") % 2)
        ).cast("string")
        for i in range(1, z + 1)
    ]
    base = (
        pts.select(tx.alias("tx"), ty.alias("ty"), "value")
        .groupBy("tx", "ty")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("sum_value_dec"),
        )
        .select(
            F.concat(*digits).alias("quadkey"), "n", "sum_value_dec"
        )
        .localCheckpoint(eager=True)  # compute the base once; 3 consumers
    )
    levels = []
    for zz in (10, 8, 6):
        levels.append(
            base.groupBy(F.substring("quadkey", 1, zz).alias("quadkey"))
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("sum_value_dec").cast("double").alias("sum_value"),
            )
            .select(F.lit(zz).alias("zoom"), "quadkey", "n", "sum_value")
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.orderBy("zoom", "quadkey")


# Planted-density derivation for the DBSCAN oracle: 80% of points scatter
# (+-120) around one of 500 Weyl-spread sites on a 60000 x 24000 integer
# plane, 20% are uniform background — all exact integer arithmetic, so
# DuckDB reproduces every coordinate bit-for-bit and the parity check is
# strict. (The plain orders-derived lattice has no density structure:
# consecutive orderkeys land eps-close and everything chains into one
# component, which is not a DBSCAN test.)
DBSCAN_PTS_SQL = """
    SELECT o_orderkey AS id,
           CASE WHEN o_orderkey % 10 < 8
                THEN ((o_orderkey % 500) * 1201) % 59000 + 500 + (o_orderkey * 29587) % 241 - 120
                ELSE (o_orderkey * 31469) % 60000 END AS ix,
           CASE WHEN o_orderkey % 10 < 8
                THEN ((o_orderkey % 500) * 761) % 23000 + 500 + (o_orderkey * 9973) % 241 - 120
                ELSE (o_orderkey * 17393) % 24000 END AS iy
    FROM orders
"""

_DBSCAN_EPS, _DBSCAN_MINPTS = 300, 4


def dbscan_points_df(spark, sf_dir):
    """Spark side of the planted-density derivation (same integer exprs)."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    clustered = k % 10 < 8
    ix = F.when(
        clustered, ((k % 500) * 1201) % 59000 + 500 + (k * 29587) % 241 - 120
    ).otherwise((k * 31469) % 60000)
    iy = F.when(
        clustered, ((k % 500) * 761) % 23000 + 500 + (k * 9973) % 241 - 120
    ).otherwise((k * 17393) % 24000)
    return o.select(k.alias("id"), ix.alias("ix"), iy.alias("iy"))


@register(
    "spatial_dbscan",
    oracle=f"""
    WITH pts AS ({DBSCAN_PTS_SQL}),
    cand AS (
      SELECT a.id AS ida, b.id AS idb
      FROM pts a JOIN pts b
        ON b.ix // {_DBSCAN_EPS} BETWEEN a.ix // {_DBSCAN_EPS} - 1 AND a.ix // {_DBSCAN_EPS} + 1
       AND b.iy // {_DBSCAN_EPS} BETWEEN a.iy // {_DBSCAN_EPS} - 1 AND a.iy // {_DBSCAN_EPS} + 1
      WHERE (a.ix-b.ix)*(a.ix-b.ix) + (a.iy-b.iy)*(a.iy-b.iy) <= {_DBSCAN_EPS * _DBSCAN_EPS}
    ),
    deg AS (SELECT ida AS id, COUNT(*) AS n FROM cand GROUP BY ida),
    core AS (SELECT id FROM deg WHERE n >= {_DBSCAN_MINPTS}),
    ce AS (
      SELECT c.ida, c.idb FROM cand c
      JOIN core x ON c.ida = x.id JOIN core y ON c.idb = y.id
      WHERE c.ida <> c.idb
    ),
    reach AS (
      WITH RECURSIVE r(src, dst) AS (
        SELECT ida, idb FROM ce
        UNION
        SELECT r.src, e.idb FROM r JOIN ce e ON r.dst = e.ida
      ) SELECT * FROM r
    ),
    lab AS (
      SELECT c.id, LEAST(c.id, COALESCE(MIN(r.dst), c.id)) AS label
      FROM core c LEFT JOIN reach r ON r.src = c.id GROUP BY c.id
    ),
    border AS (
      SELECT c.ida AS id, MIN(l.label) AS label
      FROM cand c JOIN lab l ON c.idb = l.id
      WHERE c.ida <> c.idb AND c.ida NOT IN (SELECT id FROM core)
      GROUP BY c.ida
    )
    SELECT p.id,
           CAST(COALESCE(l.label, b.label) AS BIGINT) AS label,
           CASE WHEN l.id IS NOT NULL THEN 'core'
                WHEN b.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS kind
    FROM pts p
    LEFT JOIN lab l ON p.id = l.id
    LEFT JOIN border b ON p.id = b.id
    ORDER BY p.id
    """,
)
def spatial_dbscan(spark, sf_dir):
    """Exact distributed DBSCAN (operators/dbscan.py) over planted-density
    points, checked against a DuckDB implementation built from the same
    definition (grid-bounded candidate pairs, recursive-CTE closure for
    the core components, min-label border assignment). Every point gets a
    (label, kind) verdict; strict value parity."""
    from clustopher_spark.operators.dbscan import dbscan

    pts = dbscan_points_df(spark, sf_dir)
    return (
        dbscan(pts, eps=_DBSCAN_EPS, min_pts=_DBSCAN_MINPTS, x_col="ix", y_col="iy")
        .orderBy("id")
    )


# Three literal test polygons over the derived points' domain (lng in
# [-125,-65), lat in [25,49)): a triangle, a CONCAVE hexagon, and a convex
# pentagon. No edge is horizontal, so the ray-crossing predicate never
# divides by zero on the evaluated branch in either engine.
_POLYGONS = {
    1: [(-120.0, 30.0), (-110.0, 45.0), (-100.0, 30.2)],
    2: [(-95.0, 30.0), (-85.0, 30.5), (-85.0, 44.0), (-90.0, 43.5),
        (-90.0, 36.0), (-95.0, 36.5)],
    3: [(-80.0, 32.0), (-72.0, 35.0), (-70.0, 42.0), (-76.0, 47.0),
        (-83.0, 40.0)],
}
_POLY_EDGES = [
    (pid, x1, y1, x2, y2)
    for pid, ring in _POLYGONS.items()
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1])
]
_EDGES_SQL = ", ".join(
    f"({p}, {x1}, {y1}, {x2}, {y2})" for p, x1, y1, x2, y2 in _POLY_EDGES
)


@register(
    "spatial_point_in_polygon",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    edges(poly_id, x1, y1, x2, y2) AS (VALUES {_EDGES_SQL}),
    crossings AS (
      SELECT p.id, p.value, e.poly_id, COUNT(*) AS k
      FROM pts p
      JOIN edges e
        ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
       AND p.lng < e.x1 + (p.lat - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1)
      GROUP BY p.id, p.value, e.poly_id
    )
    SELECT poly_id,
           COUNT(*) AS n_inside,
           ROUND(AVG(value), 4) AS avg_value
    FROM crossings
    WHERE k % 2 = 1
    GROUP BY poly_id
    ORDER BY poly_id
    """,
)
def spatial_point_in_polygon(spark, sf_dir):
    """Point-in-polygon membership for ARBITRARY (including concave)
    polygons by the ray-casting parity rule, expressed relationally: each
    point joins the broadcast edge table on the "my eastward ray crosses
    this edge" predicate, an odd crossing count means inside (Jordan
    curve theorem). Both conjuncts are plain arithmetic on identical IEEE
    doubles in Spark and DuckDB, so parity is exact.

    Scale shape: the polygon set is a TINY broadcast relation, so the
    non-equi join is a BroadcastNestedLoopJoin whose per-point cost is
    O(edges) predicate evaluations — no shuffle of the points, ever. For
    MANY polygons, compose with the geofence cell decomposition
    (spatial_geofence_join): pre-filter candidates by the polygons'
    bbox cells with a hash join, then run this parity test only on the
    per-cell survivors. The reference has no polygon support at all
    (bbox viewports only, cluster/cluster.go:867-956)."""
    p = points_df(spark, sf_dir)
    edges = spark.createDataFrame(
        _POLY_EDGES, "poly_id int, x1 double, y1 double, x2 double, y2 double"
    )
    crossing = (
        (F.col("y1") > F.col("lat")) != (F.col("y2") > F.col("lat"))
    ) & (
        F.col("lng")
        < F.col("x1")
        + (F.col("lat") - F.col("y1"))
        * (F.col("x2") - F.col("x1"))
        / (F.col("y2") - F.col("y1"))
    )
    k = (
        p.join(F.broadcast(edges), crossing)
        .groupBy("id", "value", "poly_id")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return (
        k.filter(F.col("k") % 2 == 1)
        .groupBy("poly_id")
        .agg(
            F.count(F.lit(1)).alias("n_inside"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("poly_id")
    )


# Two literal test polylines ("routes") crossing the points' domain — a
# diagonal I-95-ish corridor and a zig-zag transcontinental corridor.
_ROUTES = {
    1: [(-120.0, 48.0), (-105.0, 40.0), (-95.0, 35.0), (-80.0, 26.0)],
    2: [(-123.0, 34.0), (-108.0, 44.0), (-92.0, 30.0), (-76.0, 44.0),
        (-67.0, 45.0)],
}
_ROUTE_SEGS = [
    (rid, i, x1, y1, x2, y2)
    for rid, line in _ROUTES.items()
    for i, ((x1, y1), (x2, y2)) in enumerate(zip(line, line[1:]))
]
_SEGS_SQL = ", ".join(
    f"({r}, {i}, {x1}, {y1}, {x2}, {y2})" for r, i, x1, y1, x2, y2 in _ROUTE_SEGS
)


@register(
    "spatial_nearest_route_distance",
    oracle=f"""
    WITH pts AS ({POINTS_SQL}),
    segs(route_id, seg_idx, x1, y1, x2, y2) AS (VALUES {_SEGS_SQL}),
    proj AS (
      SELECT p.id, p.lng, p.lat, s.route_id,
             GREATEST(0.0, LEAST(1.0,
               ((p.lng - s.x1) * (s.x2 - s.x1) + (p.lat - s.y1) * (s.y2 - s.y1))
               / ((s.x2 - s.x1) * (s.x2 - s.x1) + (s.y2 - s.y1) * (s.y2 - s.y1))
             )) AS t,
             s.x1, s.y1, s.x2, s.y2
      FROM pts p CROSS JOIN segs s
    ),
    seg_d AS (
      SELECT id, route_id,
             SQRT(POWER(lng - (x1 + t * (x2 - x1)), 2)
                  + POWER(lat - (y1 + t * (y2 - y1)), 2)) AS d
      FROM proj
    ),
    near AS (
      SELECT id, route_id, MIN(d) AS dist FROM seg_d GROUP BY id, route_id
    )
    SELECT route_id,
           COUNT(*) FILTER (WHERE dist <= 1.0) AS n_within_1deg,
           ROUND(MIN(dist), 6) AS min_dist,
           ROUND(AVG(dist), 4) AS avg_dist
    FROM near
    GROUP BY route_id
    ORDER BY route_id
    """,
)
def spatial_nearest_route_distance(spark, sf_dir):
    """Point-to-polyline distance (the map-matching primitive): each point's
    distance to its nearest segment of each route, by the clamped
    orthogonal-projection formula — t = clamp(dot/len^2, 0, 1), distance to
    the projected foot. All plain IEEE arithmetic, so the DuckDB oracle is
    strict value parity.

    Scale shape: routes are a TINY broadcast relation (segments, not
    points), so per-point cost is O(segments) arithmetic in one map stage
    plus a per-(point, route) min — no shuffle of the points beyond the
    final per-route aggregate. For continental route networks, pre-filter
    segments per point by the geofence cell grid exactly as the polygon
    join does. The reference has no linear-geometry support."""
    p = points_df(spark, sf_dir)
    segs = spark.createDataFrame(
        _ROUTE_SEGS,
        "route_id int, seg_idx int, x1 double, y1 double, x2 double, y2 double",
    )
    dx, dy = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    t = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            ((F.col("lng") - F.col("x1")) * dx + (F.col("lat") - F.col("y1")) * dy)
            / (dx * dx + dy * dy),
        ),
    )
    d = F.sqrt(
        F.pow(F.col("lng") - (F.col("x1") + t * dx), F.lit(2.0))
        + F.pow(F.col("lat") - (F.col("y1") + t * dy), F.lit(2.0))
    )
    near = (
        p.crossJoin(F.broadcast(segs))
        .select("id", F.col("route_id"), d.alias("d"))
        .groupBy("id", "route_id")
        .agg(F.min("d").alias("dist"))
    )
    return (
        near.groupBy("route_id")
        .agg(
            F.count(F.when(F.col("dist") <= 1.0, 1)).alias("n_within_1deg"),
            F.round(F.min("dist"), 6).alias("min_dist"),
            F.round(F.avg("dist"), 4).alias("avg_dist"),
        )
        .orderBy("route_id")
    )
