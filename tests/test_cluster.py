"""Clustering engine tests porting the reference's literal expectations.

Mirrors cluster/cluster_test.go: TestGetClusters (:475-530),
TestClusterMetricsRollup (:16-106), TestNestedClusterWeights (:228-274),
TestEmptyCluster (:108-121), TestSinglePointCluster (:123-170).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import (
    ClusterOptions,
    cluster_at_zoom,
    get_clusters,
)

OPTS = ClusterOptions(radius=40.0, extent=512, min_points=2)


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "id long, lng double, lat double, value double"
    )


def test_get_clusters_zoom5_merges_near_points(spark):
    # 3 near points + 1 far: zoom 5 -> 2 rows (one cluster of 3, one single);
    # zoom 15 -> 4 singletons (cluster_test.go:506-519).
    rows = [
        (1, -100.0, 40.0, 100.0),
        (2, -100.1, 40.1, 200.0),
        (3, -100.2, 40.2, 300.0),
        (4, -105.0, 35.0, 400.0),
    ]
    df = _points(spark, rows)
    z5 = get_clusters(df, -125, 25, -65, 49, 5, metric_cols=["value"], opts=OPTS).collect()
    assert len(z5) == 2
    by_count = {r.point_count: r for r in z5}
    assert set(by_count) == {3, 1}
    assert by_count[3].is_cluster and not by_count[1].is_cluster
    assert abs(by_count[3].sum_value - 600.0) < 1e-9
    assert abs(by_count[1].sum_value - 400.0) < 1e-9
    # centroid of the 3-cluster is the unweighted mean of its members
    assert abs(by_count[3].lng - (-100.1)) < 1e-6

    z15 = get_clusters(df, -125, 25, -65, 49, 15, metric_cols=["value"], opts=OPTS).collect()
    assert len(z15) == 4
    assert all(r.point_count == 1 and not r.is_cluster for r in z15)


def test_metrics_rollup_and_closure(spark):
    # Flat: 100+200+300 -> 600. Then cluster-of-clusters: feeding the output
    # back in (num_points-weighted) gives 600+400 -> 1000, count 3+2 -> 5
    # (cluster_test.go:16-106).
    level1 = spark.createDataFrame(
        [(1, -100.0, 40.0, 3, 600.0), (2, -100.05, 40.05, 2, 400.0)],
        "id long, lng double, lat double, num_points long, value double",
    )
    out = cluster_at_zoom(level1, 5, metric_cols=["value"], opts=OPTS).collect()
    assert len(out) == 1
    row = out[0]
    assert row.point_count == 5
    assert abs(row.sum_value - 1000.0) < 1e-9


def test_nested_cluster_weights(spark):
    # Weighted centroid: sum(p*num_points)/sum(num_points) (cluster_test.go:228-274).
    level1 = spark.createDataFrame(
        [(1, 0.0, 0.0, 3, 900.0), (2, 0.3, 0.0, 2, 600.0)],
        "id long, lng double, lat double, num_points long, value double",
    )
    out = cluster_at_zoom(level1, 2, metric_cols=["value"], opts=OPTS).collect()
    assert len(out) == 1
    row = out[0]
    assert row.point_count == 5
    # weighted lng = (0.0*3 + 0.3*2)/5 = 0.12 (projection is linear in lng)
    assert abs(row.lng - 0.12) < 1e-6
    assert abs(row.sum_value - 1500.0) < 1e-9


def test_empty_and_single(spark):
    empty = _points(spark, [])
    assert get_clusters(empty, -180, -85, 180, 85, 5, ["value"], OPTS).count() == 0

    single = _points(spark, [(7, -100.0, 40.0, 42.0)])
    out = get_clusters(single, -180, -85, 180, 85, 5, ["value"], OPTS).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cluster_id == 7 and r.point_count == 1 and not r.is_cluster
    assert abs(r.sum_value - 42.0) < 1e-9
    assert abs(r.lng - (-100.0)) < 1e-6 and abs(r.lat - 40.0) < 1e-6


def test_min_points_threshold(spark):
    # Two near points with min_points=3: both stay singletons.
    df = _points(spark, [(1, -100.0, 40.0, 1.0), (2, -100.01, 40.01, 2.0)])
    opts3 = ClusterOptions(radius=40.0, min_points=3)
    out = get_clusters(df, -125, 25, -65, 49, 5, ["value"], opts3).collect()
    assert len(out) == 2
    assert all(r.point_count == 1 for r in out)


def test_deterministic_seed_order(spark):
    # Same input twice -> identical assignments (pinned id-order seeds).
    # Float aggregates are compared at rounded precision: double sums are
    # not bit-stable across partial-aggregation orders, by design.
    def canon(rows):
        return sorted(
            (r.cluster_id, round(r.lng, 9), round(r.lat, 9), r.point_count,
             r.num_members, round(r.sum_value, 6))
            for r in rows
        )

    rows = [(i, -100.0 + (i % 50) * 0.01, 40.0 + (i // 50) * 0.01, float(i)) for i in range(1, 301)]
    df = _points(spark, rows)
    a = canon(get_clusters(df, -125, 25, -65, 49, 8, ["value"], OPTS).collect())
    b = canon(get_clusters(df, -125, 25, -65, 49, 8, ["value"], OPTS).collect())
    assert a == b
    total = sum(r[3] for r in a)
    assert total == 300


def test_low_zoom_hierarchical_conserves(spark):
    # zoom<=4 triggers the two-phase path; totals and metric sums conserve,
    # and near points still merge into one cluster at z0.
    rows = [(i, -100.0 + (i % 50) * 0.01, 40.0 + (i // 50) * 0.01, 1.0) for i in range(1, 501)]
    df = _points(spark, rows)
    out = get_clusters(df, -180, -85, 180, 85, 0, ["value"], OPTS).collect()
    assert sum(r.point_count for r in out) == 500
    assert abs(sum(r.sum_value for r in out) - 500.0) < 1e-9
    assert len(out) == 1  # tight blob -> single world-level cluster


def test_prepare_points_dedup_and_nulls(spark):
    from clustopher_spark.operators.cluster import prepare_points

    rows = [
        (1, -100.0, 40.0, 1.0),
        (1, -99.0, 41.0, 2.0),   # duplicate id -> dropped (first kept)
        (2, None, 40.0, 3.0),     # null coord -> dropped
        (None, -98.0, 39.0, 4.0), # null id -> dropped
        (3, -97.0, 38.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "id long, lng double, lat double, value double")
    out = prepare_points(df)
    got = {r.id for r in out.collect()}
    assert got == {1, 3}
    assert dict(out.dtypes)["num_points"] == "bigint"


def test_sum_metric_maps_heterogeneous_keys(spark):
    """Reference semantics for dynamic metric keys (cluster_test.go:360-401):
    different points carry different key sets; sums per key over members;
    null maps tolerated."""
    from clustopher_spark.operators.cluster import sum_metric_maps

    rows = [
        (1, {"sales": 100.0, "units": 2.0}),
        (1, {"sales": 200.0}),
        (1, None),
        (2, {"elevation": 5.0}),
    ]
    df = spark.createDataFrame(rows, "cluster_id long, metrics map<string,double>")
    got = {r.cluster_id: dict(r.metrics) for r in sum_metric_maps(df).collect()}
    assert got[1] == {"sales": 300.0, "units": 2.0}
    assert got[2] == {"elevation": 5.0}


def test_dbscan_literal_blobs(spark):
    """DBSCAN verdicts on a hand-computed layout: two dense blobs (core),
    one reachable-but-sparse point (border), two isolated points (noise).
    eps=10, min_pts=3 (|N_eps| includes self, per the paper)."""
    from clustopher_spark.operators.dbscan import dbscan

    rows = [
        # blob A: unit square scaled by 5 — all pairwise <= 7.08 <= eps
        (1, 0.0, 0.0), (2, 5.0, 0.0), (3, 0.0, 5.0), (4, 5.0, 5.0),
        # blob B: 3-point cluster at (100, 100)
        (10, 100.0, 100.0), (11, 105.0, 100.0), (12, 100.0, 105.0),
        # border: within eps of (5,0) only -> 2 neighbors incl self < 3
        (20, 14.0, 0.0),
        # noise
        (30, 200.0, 200.0), (31, 300.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {r.id: (r.label, r.kind) for r in dbscan(df, eps=10.0, min_pts=3).collect()}
    assert out[1] == (1, "core") and out[2] == (1, "core")
    assert out[3] == (1, "core") and out[4] == (1, "core")
    assert out[10] == (10, "core") and out[11] == (10, "core") and out[12] == (10, "core")
    assert out[20] == (1, "border")
    assert out[30] == (None, "noise") and out[31] == (None, "noise")
    assert len(out) == 10
