from clustopher_spark.sources.generators import (
    generate_test_points,
    generate_test_points_around_cities,
)
from clustopher_spark.sources.catalog import ClusterCatalog

__all__ = [
    "generate_test_points",
    "generate_test_points_around_cities",
    "ClusterCatalog",
]
