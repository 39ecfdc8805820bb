"""Reference ``.zst`` cluster-file interop (round-3 verdict item 5).

The fixture writer is field-for-field the reference's SaveCompressed
byte layout (cluster/storage.go:17-205), so a green round-trip here
means the reader parses what the native engine writes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustopher_spark.sources.refformat import (
    read_supercluster_zst,
    write_supercluster_zst,
)


def test_zst_roundtrip_full(spark, tmp_path):
    path = str(tmp_path / "dataset.zst")
    pts = [
        (1, -73.98, 40.75, 1),
        (2, -73.97, 40.76, 1),
        (7, 2.35, 48.86, 3),      # a pre-aggregated cluster row
        (9, 139.69, 35.68, 1),    # no metrics, no metadata
    ]
    metrics = {
        "sales": {1: 10.5, 2: 20.25, 7: 4.0},
        "visits": {1: 3.0, 2: 0.5, 7: 1.0},
    }
    metadata = {
        1: {"city": "New York", "score": 8.5, "active": True},
        2: {"city": "New York", "active": False},
        7: {"city": "Paris", "score": 3.25},
    }
    write_supercluster_zst(
        path, pts,
        opts={"min_zoom": 0, "max_zoom": 12, "min_points": 3,
              "radius": 75.0, "extent": 512, "log": True},
        metadata=metadata, metrics=metrics, nodes=5,
    )
    df, info = read_supercluster_zst(spark, path)
    assert (info["max_zoom"], info["min_points"], info["radius"]) == (12, 3, 75.0)
    assert info["num_nodes"] == 5 and info["num_points"] == 4
    assert info["log"] is True

    rows = {r.id: r for r in df.collect()}
    assert set(rows) == {1, 2, 7, 9}
    # f32 positions: exact to float32 resolution
    assert abs(rows[1].lng - np.float32(-73.98)) < 1e-12
    assert abs(rows[7].lat - np.float32(48.86)) < 1e-12
    assert rows[7].num_points == 3
    # metrics round-trip through the point->row mapping
    assert rows[2].sales == np.float32(20.25)
    assert rows[1].visits == 3.0
    assert rows[9].sales is None or np.isnan(rows[9].sales)
    # typed metadata maps
    assert rows[1].meta_str == {"city": "New York"}
    assert rows[1].meta_num == {"score": 8.5}
    assert rows[1].meta_bool == {"active": True}
    assert rows[2].meta_bool == {"active": False}
    assert rows[2].meta_num is None or rows[2].meta_num == {}
    assert rows[9].meta_str is None or rows[9].meta_str == {}


def test_zst_migration_into_engine(spark, tmp_path):
    """A migrated file must drive the engine end-to-end: cluster the
    points at a zoom and keep the point_count invariant."""
    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions

    path = str(tmp_path / "migrate.zst")
    rng = np.random.RandomState(5)
    n = 500
    pts = [
        (i, float(-74 + rng.rand() * 0.5), float(40 + rng.rand() * 0.5), 1)
        for i in range(n)
    ]
    write_supercluster_zst(
        path, pts, metrics={"value": {i: float(i % 7) for i in range(n)}}
    )
    df, info = read_supercluster_zst(spark, path)
    eng = Clustopher(
        df.select("id", "lng", "lat", "value"),
        ["value"],
        opts=ClusterOptions(
            radius=info["radius"], min_points=info["min_points"],
            max_zoom=info["max_zoom"],
        ),
    )
    out = eng.get_clusters(-180, -85, 180, 85, 4)
    agg = out.agg(
        F.sum("point_count").alias("n"), F.sum("sum_value").alias("v")
    ).collect()[0]
    assert agg.n == n
    assert abs(agg.v - sum(i % 7 for i in range(n))) < 1e-6


def test_zst_rejects_bad_version_and_truncation(spark, tmp_path):
    import pyarrow as pa
    import struct

    bad = str(tmp_path / "bad.zst")
    with pa.output_stream(bad, compression="zstd") as f:
        f.write(struct.pack("<I", 9))
    with pytest.raises(ValueError, match="version"):
        read_supercluster_zst(spark, bad)

    trunc = str(tmp_path / "trunc.zst")
    with pa.output_stream(trunc, compression="zstd") as f:
        f.write(struct.pack("<I", 1))
        f.write(struct.pack("<II", 0, 100))  # claims 100 points, has none
    with pytest.raises(EOFError):
        read_supercluster_zst(spark, trunc)
