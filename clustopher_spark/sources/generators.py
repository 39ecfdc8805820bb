"""Synthetic point sources (reference S3/S4: GenerateTestPoints,
cluster/helpers.go:346-380; GenerateTestPointsAroundCities,
cluster/helpers.go:383-448) as pure ``spark.range`` + column expressions —
no driver-side loops, so generating 30M points is a 1-job distributed scan.

Determinism: ``rand(seed)`` is deterministic for a fixed partition count,
so ``num_partitions`` is part of the generator contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATEGORIES = ["Urban", "Rural", "Coastal", "Mountain", "Desert", "Forest", "Island"]
REGIONS = ["Americas", "Europe", "Asia", "Africa", "Oceania"]

# (name, lng, lat) — the reference's six cities (helpers.go:383-400)
CITIES = [
    ("New York", -74.0060, 40.7128),
    ("Los Angeles", -118.2437, 34.0522),
    ("Chicago", -87.6298, 41.8781),
    ("Miami", -80.1918, 25.7617),
    ("Seattle", -122.3321, 47.6062),
    ("Austin", -97.7431, 30.2672),
]


def _pick(col, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (col % len(values)).cast("int") + 1)


def generate_test_points(
    spark: SparkSession,
    n: int,
    west: float = -180.0,
    south: float = -85.0,
    east: float = 180.0,
    north: float = 85.0,
    seed: int = 42,
    num_partitions: int = 32,
) -> DataFrame:
    """Uniform random points with the reference's 5 metrics + categorical/
    timestamp metadata (S3)."""
    base = spark.range(1, n + 1, 1, num_partitions).withColumnRenamed("id", "pid")
    return base.select(
        F.col("pid").alias("id"),
        (F.lit(west) + F.rand(seed) * (east - west)).alias("lng"),
        (F.lit(south) + F.rand(seed + 1) * (north - south)).alias("lat"),
        (F.rand(seed + 2) * 100).alias("value"),
        (F.rand(seed + 3) * 50).alias("size"),
        (F.rand(seed + 4) * 1000).alias("sales"),
        F.floor(F.rand(seed + 5) * 100).cast("double").alias("customers"),
        _pick(F.col("pid"), CATEGORIES).alias("category"),
        _pick(F.col("pid") * 7, REGIONS).alias("region"),
        (
            F.lit("2025-01-01 00:00:00").cast("timestamp")
            - F.make_interval(days=F.floor(F.rand(seed + 6) * 365).cast("int"))
        ).alias("ts"),
        (F.rand(seed + 7) * 5000).alias("elevation"),
    )


def generate_test_points_around_cities(
    spark: SparkSession,
    n: int,
    n_cities: int = 3,
    radius_deg: float = 0.7,  # ~50 miles
    seed: int = 42,
    num_partitions: int = 32,
) -> DataFrame:
    """Gaussian-ish scatter around ``n_cities`` cities, assigned round-robin
    (reference ``cities[i % 3]``, helpers.go:415) via a broadcast join on
    the city index (J3)."""
    cities = spark.createDataFrame(
        [(i, name, lng, lat) for i, (name, lng, lat) in enumerate(CITIES[:n_cities])],
        "city_idx int, city string, c_lng double, c_lat double",
    )
    base = spark.range(1, n + 1, 1, num_partitions).select(
        F.col("id"),
        (F.col("id") % n_cities).cast("int").alias("city_idx"),
        # Box-Muller-ish radial scatter from two uniforms
        (F.sqrt(-2.0 * F.log(F.rand(seed) + 1e-12)) * F.cos(
            F.lit(6.283185307179586) * F.rand(seed + 1)
        ) * radius_deg / 3.0).alias("dx"),
        (F.sqrt(-2.0 * F.log(F.rand(seed + 2) + 1e-12)) * F.sin(
            F.lit(6.283185307179586) * F.rand(seed + 3)
        ) * radius_deg / 3.0).alias("dy"),
        (F.rand(seed + 4) * 10000).alias("population_density"),
        (F.rand(seed + 5) * 100000).alias("avg_income"),
        (F.rand(seed + 6) * 100).alias("crime_rate"),
        (F.rand(seed + 7) * 100).alias("traffic_level"),
        _pick(F.col("id"), ["Urban", "Suburban", "Industrial", "Commercial", "Residential"]).alias("category"),
        (F.lit(60.0) + F.rand(seed + 8) * 30).alias("temperature"),
        (F.lit(100.0) + F.rand(seed + 9) * 500).alias("elevation"),
    )
    return base.join(F.broadcast(cities), "city_idx").select(
        "id",
        (F.col("c_lng") + F.col("dx")).alias("lng"),
        (F.col("c_lat") + F.col("dy")).alias("lat"),
        "population_density",
        "avg_income",
        "crime_rate",
        "traffic_level",
        "category",
        "city",
        "temperature",
        "elevation",
    )
