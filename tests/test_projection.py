"""Projection round-trip, mirroring reference cluster/cluster_test.go:440-473."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustopher_spark.plans.projection import (
    project_bounds,
    project_cols,
    project_scalar,
    unproject_cols,
)

CASES = [(0.0, 0.0), (180.0, 85.0), (-180.0, -85.0), (45.0, 45.0), (-125.0, 25.0)]
ZOOMS = [0, 5, 8, 10]


@pytest.mark.parametrize("zoom", ZOOMS)
def test_round_trip(spark, zoom):
    df = spark.createDataFrame([(lng, lat) for lng, lat in CASES], "lng double, lat double")
    px, py = project_cols(F.col("lng"), F.col("lat"), zoom)
    proj = df.select("lng", "lat", px.alias("px"), py.alias("py"))
    lng2, lat2 = unproject_cols(F.col("px"), F.col("py"), zoom)
    out = proj.select("lng", "lat", lng2.alias("lng2"), lat2.alias("lat2")).collect()
    for row in out:
        assert abs(row.lng - row.lng2) < 1e-4
        assert abs(row.lat - row.lat2) < 1e-4


def test_projection_bounds_y_flip():
    # North edge maps to the SMALLER tile y (Mercator y grows southward).
    min_x, min_y, max_x, max_y = project_bounds(-125, 25, -65, 49, zoom=5)
    assert min_x < max_x and min_y < max_y
    x_n, y_n = project_scalar(-125, 49, 5)
    assert y_n == min_y


def test_world_extent():
    # zoom 0: the whole world fits in [0, extent).
    x, y = project_scalar(0.0, 0.0, 0)
    assert x == 256.0 and abs(y - 256.0) < 1e-9
    x, y = project_scalar(-180.0, 0.0, 0)
    assert x == 0.0
