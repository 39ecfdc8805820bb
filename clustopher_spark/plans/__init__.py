from clustopher_spark.plans.projection import (
    MAX_LATITUDE,
    project_cols,
    project_bounds,
    unproject_cols,
)

__all__ = ["MAX_LATITUDE", "project_cols", "project_bounds", "unproject_cols"]
