"""Web-Mercator projection as pure Catalyst column expressions.

Re-expresses the reference's ``projectFast`` / ``unprojectFast``
(reference cluster/cluster.go:1169-1198, 1201-1224) as whole-stage-codegen
column math — no UDFs, no lookup tables (the reference's 1025-entry lat
table, cluster/cluster.go:560-572, is subsumed by codegen'd ``sin``/``log``).

Tile-pixel space at zoom ``z`` spans ``[0, 2**z * extent)`` on both axes;
``y`` grows southward (hence the bbox Y-flip in :func:`project_bounds`,
mirroring reference cluster/cluster.go:1156-1166). Latitude is clamped to
the Mercator limit +/-85.0511.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LATITUDE = 85.0511
DEFAULT_EXTENT = 512
DEFAULT_RADIUS = 40.0
DEFAULT_MIN_POINTS = 3
DEFAULT_MAX_ZOOM = 16


def _world_size(zoom: int, extent: int = DEFAULT_EXTENT) -> float:
    return float(extent) * (2.0**zoom)


def project_cols(
    lng: Column, lat: Column, zoom: int, extent: int = DEFAULT_EXTENT
) -> tuple[Column, Column]:
    """(lng, lat) degrees -> (px, py) tile pixels at ``zoom``.

    px = (lng+180)/360 * 2^z * extent
    py = (0.5 - 0.25*ln((1+sin(phi))/(1-sin(phi)))/pi) * 2^z * extent
    with phi = radians(clamp(lat, +/-85.0511)).
    """
    size = F.lit(_world_size(zoom, extent))
    px = (lng + F.lit(180.0)) / F.lit(360.0) * size
    clamped = F.least(F.greatest(lat, F.lit(-MAX_LATITUDE)), F.lit(MAX_LATITUDE))
    siny = F.sin(F.radians(clamped))
    py = (
        F.lit(0.5)
        - F.lit(0.25) * F.log((F.lit(1.0) + siny) / (F.lit(1.0) - siny)) / F.lit(math.pi)
    ) * size
    return px, py


def unproject_cols(
    px: Column, py: Column, zoom: int, extent: int = DEFAULT_EXTENT
) -> tuple[Column, Column]:
    """(px, py) tile pixels at ``zoom`` -> (lng, lat) degrees."""
    size = F.lit(_world_size(zoom, extent))
    lng = px / size * F.lit(360.0) - F.lit(180.0)
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp((F.lit(1.0) - F.lit(2.0) * py / size) * F.lit(math.pi)))
        - F.lit(math.pi / 2.0)
    )
    return lng, lat


def project_scalar(lng: float, lat: float, zoom: int, extent: int = DEFAULT_EXTENT):
    """Driver-side scalar projection for literal bbox parameters."""
    size = _world_size(zoom, extent)
    x = (lng + 180.0) / 360.0 * size
    clamped = max(min(lat, MAX_LATITUDE), -MAX_LATITUDE)
    siny = math.sin(math.radians(clamped))
    y = (0.5 - 0.25 * math.log((1.0 + siny) / (1.0 - siny)) / math.pi) * size
    return x, y


def project_np(lng, lat, zoom: int, extent: int = DEFAULT_EXTENT):
    """Vectorized numpy projection (same formulas as project_cols) for
    driver-side tails of the zoom pyramid."""
    import numpy as np

    size = _world_size(zoom, extent)
    x = (lng + 180.0) / 360.0 * size
    clamped = np.clip(lat, -MAX_LATITUDE, MAX_LATITUDE)
    siny = np.sin(np.radians(clamped))
    y = (0.5 - 0.25 * np.log((1.0 + siny) / (1.0 - siny)) / math.pi) * size
    return x, y


def unproject_np(x, y, zoom: int, extent: int = DEFAULT_EXTENT):
    import numpy as np

    size = _world_size(zoom, extent)
    lng = x / size * 360.0 - 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp((1.0 - 2.0 * y / size) * math.pi)) - math.pi / 2.0)
    return lng, lat


def project_bounds(
    west: float, south: float, east: float, north: float, zoom: int,
    extent: int = DEFAULT_EXTENT,
):
    """Project a geographic bbox to a tile-space bbox (min_x, min_y, max_x, max_y).

    Mercator y grows southward, so the *north* edge becomes min_y
    (reference cluster/cluster.go:1156-1166).
    """
    min_x, min_y = project_scalar(west, north, zoom, extent)
    max_x, max_y = project_scalar(east, south, zoom, extent)
    return min_x, min_y, max_x, max_y
