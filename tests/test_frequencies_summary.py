"""A3 frequencies + A5 summary + zoom-hierarchy closure tests.

Mirrors reference cluster_test.go: TestClusterWithMixedMetadata (:172-226),
TestClusterWithNilMetadata (:360-401), nested rollup (:75-105).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from clustopher_spark.engine import Clustopher
from clustopher_spark.operators.cluster import ClusterOptions
from clustopher_spark.operators.frequencies import (
    frequencies_from_counts,
    metadata_counts,
)
from clustopher_spark.operators.zoom import materialize_zoom_levels, query_zoom_levels

OPTS = ClusterOptions(radius=40.0, min_points=2)


def test_mixed_metadata_frequencies(spark):
    # NY/Boston -> 0.5/0.5 (cluster_test.go:219-224); missing keys tolerated.
    df = spark.createDataFrame(
        [
            (1, "store", "New York"),
            (1, "store", "Boston"),
            (2, "store", None),
            (2, None, None),
        ],
        "cluster_id long, type string, city string",
    )
    counts = metadata_counts(df, ["type", "city"])
    freq = {
        (r.cluster_id, r.key, r.value): r.freq
        for r in frequencies_from_counts(counts).collect()
    }
    assert abs(freq[(1, "city", "New York")] - 0.5) < 1e-3
    assert abs(freq[(1, "city", "Boston")] - 0.5) < 1e-3
    assert abs(freq[(1, "type", "store")] - 1.0) < 1e-9
    # cluster 2: one member had type=store, NULLs dropped
    assert abs(freq[(2, "type", "store")] - 1.0) < 1e-9
    assert (2, "city", None) not in freq


def test_engine_summary_and_geojson(spark):
    rows = [
        (1, -100.0, 40.0, 100.0, "Urban"),
        (2, -100.1, 40.1, 200.0, "Urban"),
        (3, -100.2, 40.2, 300.0, "Rural"),
        (4, -105.0, 35.0, 400.0, "Rural"),
    ]
    df = spark.createDataFrame(rows, "id long, lng double, lat double, value double, category string")
    eng = Clustopher(df, metric_cols=["value"], meta_cols=["category"], opts=OPTS)

    counts, stats, dist = eng.get_metadata_summary(-125, 25, -65, 49, 5)
    c = counts.collect()[0]
    assert c.total_points == 4 and c.num_clusters == 1 and c.num_single_points == 1
    s = stats.collect()[0]
    assert s.metric == "value" and s.sum == 1000.0 and s.min == 400.0 and s.max == 600.0
    d = {(r.key, r.value): r.percentage for r in dist.collect()}
    assert abs(d[("category", "Urban")] - 50.0) < 1e-9
    assert abs(d[("category", "Rural")] - 50.0) < 1e-9

    clusters = eng.get_clusters_with_metadata(-125, 25, -65, 49, 5)
    rows = {r.point_count: r for r in clusters.collect()}
    freq_map = rows[3].meta_freq
    assert abs(freq_map["category"]["Urban"] - 2.0 / 3.0) < 1e-9

    feats = [json.loads(r.feature) for r in eng.to_geojson_features(clusters.drop("meta_freq")).collect()]
    assert all(f["type"] == "Feature" and f["geometry"]["type"] == "Point" for f in feats)
    assert {f["properties"]["point_count"] for f in feats} == {1, 3}


def test_zoom_hierarchy_closure(spark):
    # 300 points in a tight blob + 1 far point. At z=0 everything merges;
    # totals conserved at every level.
    rows = [(i, -100.0 + (i % 10) * 0.001, 40.0 + (i // 10) * 0.001, 1.0) for i in range(1, 301)]
    rows.append((999, 60.0, -30.0, 1.0))
    df = spark.createDataFrame(rows, "id long, lng double, lat double, value double")
    opts = ClusterOptions(radius=40.0, min_points=2, max_zoom=8)
    zl = materialize_zoom_levels(df, ["value"], opts)
    per_zoom = (
        zl.groupBy("zoom")
        .agg(F.sum("point_count").alias("tot"), F.count("*").alias("rows"), F.sum("sum_value").alias("val"))
        .collect()
    )
    assert len(per_zoom) == 9
    for r in per_zoom:
        assert r.tot == 301, f"zoom {r.zoom} lost points: {r.tot}"
        assert abs(r.val - 301.0) < 1e-9
    rows_by_zoom = {r.zoom: r.rows for r in per_zoom}
    assert rows_by_zoom[0] <= rows_by_zoom[8]
    # serve-time query at z0: blob cluster visible in west hemisphere
    west = query_zoom_levels(zl, -180, 0, 0, 85, 0).collect()
    assert sum(r.point_count for r in west) == 300


def test_local_tail_matches_distributed(spark):
    # The numpy tail path must produce the same pyramid as the fully
    # distributed path (same kernel, same algebra).
    rows = [(i, -100.0 + (i % 40) * 0.05, 40.0 + (i // 40) * 0.05, float(i % 7)) for i in range(1, 601)]
    df = spark.createDataFrame(rows, "id long, lng double, lat double, value double")
    opts = ClusterOptions(radius=40.0, min_points=2, max_zoom=6)

    def canon(zl):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 6), round(r.lat, 6), r.point_count,
             r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in zl.collect()
        )

    distributed = canon(materialize_zoom_levels(df, ["value"], opts, local_tail_threshold=0))
    hybrid = canon(materialize_zoom_levels(df, ["value"], opts, local_tail_threshold=10**9))
    assert distributed == hybrid


def test_full_summary_typed_dispatch(spark):
    # A5 typed dispatch: numeric -> weighted range, timestamp -> time range
    # (reference helpers.go:207-301)
    rows = [
        (1, -100.0, 40.0, 100.0, "Urban", 120.0, "2024-03-01 10:00:00"),
        (2, -100.1, 40.1, 200.0, "Urban", 300.0, "2024-01-15 08:30:00"),
        (3, -105.0, 35.0, 300.0, "Rural", 50.0, "2024-06-20 22:00:00"),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, lng double, lat double, value double, category string, elevation double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    eng = Clustopher(
        df, ["value"], ["category"], OPTS, numeric_meta_cols=["elevation"], ts_col="ts"
    )
    full = eng.get_metadata_summary_full(-125, 25, -65, 49, 5)
    nr = {r.key: r for r in full["numeric_ranges"].collect()}
    assert nr["elevation"].min == 50.0 and nr["elevation"].max == 300.0
    assert abs(nr["elevation"].average - (120 + 300 + 50) / 3) < 1e-9
    tr = full["time_range"].collect()[0]
    assert str(tr.earliest).startswith("2024-01-15")
    assert str(tr.latest).startswith("2024-06-20")


def test_serve_cache_matches_spark_path(spark):
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 2000, seed=11).select("id", "lng", "lat", "value")
    eng = Clustopher(pts, ["value"], opts=OPTS)
    eng.materialize()
    cached = eng.build_serve_cache()
    assert cached, "no zoom level fit in the serve cache"
    viewports = [(-125, 25, -65, 49), (-180, -85, 180, 85), (-110, 30, -90, 45)]
    for zoom in sorted(cached)[:3]:
        for w, s, e, n in viewports:
            pdf = eng.get_clusters_local(w, s, e, n, zoom)
            spark_rows = eng.get_clusters(w, s, e, n, zoom).collect()
            a = sorted(
                (int(r["cluster_id"]), round(float(r["lng"]), 9), int(r["point_count"]))
                for _, r in pdf.iterrows()
            )
            b = sorted(
                (int(r.cluster_id), round(float(r.lng), 9), int(r.point_count))
                for r in spark_rows
            )
            assert a == b, f"serve cache diverges at zoom {zoom} viewport {(w,s,e,n)}"
    # uncached zoom falls back to the Spark path
    deep = max(OPTS.max_zoom, max(cached) + 1) if max(cached) < OPTS.max_zoom else None
    if deep is not None and deep not in cached:
        pdf = eng.get_clusters_local(-125, 25, -65, 49, deep)
        assert len(pdf) == eng.get_clusters(-125, 25, -65, 49, deep).count()


def test_metadata_paths_single_kernel_pass(spark):
    """Round-1 advice: get_clusters_with_metadata ran the greedy kernel
    twice (assign_clusters + cluster_at_zoom). Now both the cluster
    aggregate and the metadata join derive from ONE cached assignment —
    values must match the direct path, and the plan must show the cached
    reuse (InMemoryTableScan) instead of a second kernel stage."""
    from clustopher_spark.operators.cluster import cluster_at_zoom, filter_viewport

    rows = [
        (i, -100.0 + (i % 20) * 0.01, 40.0 + (i // 20) * 0.01, float(i), "Urban" if i % 3 else "Rural")
        for i in range(1, 201)
    ]
    df = spark.createDataFrame(rows, "id long, lng double, lat double, value double, category string")
    eng = Clustopher(df, metric_cols=["value"], meta_cols=["category"], opts=OPTS)
    out = eng.get_clusters_with_metadata(-125, 25, -65, 49, 5)

    # the meta-join branch must consume the cached kernel output, not
    # re-run the kernel: exactly one MapInPandas stage feeding an
    # InMemoryRelation scanned twice
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, "assignment not reused from cache"

    direct = cluster_at_zoom(
        filter_viewport(df, -125, 25, -65, 49, 5, OPTS), 5, ["value"], OPTS
    )
    canon = lambda d: sorted(  # noqa: E731
        (r.cluster_id, round(r.lng, 9), round(r.lat, 9), r.point_count, round(r.sum_value, 6))
        for r in d.collect()
    )
    assert canon(out.select("cluster_id", "lng", "lat", "point_count", "sum_value")) == canon(direct)
    # frequencies still correct off the shared assignment
    freqs = {r.point_count: r.meta_freq for r in out.collect()}
    for pc, fm in freqs.items():
        if fm and "category" in fm:
            assert abs(sum(fm["category"].values()) - 1.0) < 1e-9


def test_incremental_pyramid_equals_full_rebuild(spark):
    """update_zoom_levels(old, delta) must reproduce
    materialize_zoom_levels(old UNION delta) exactly — supercell
    independence + deterministic kernel make untouched cells identical and
    reclustered cells recompute the same inputs."""
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=8)
    old = generate_test_points(spark, 8000, seed=21).select("id", "lng", "lat", "value")
    new = (
        generate_test_points(spark, 400, seed=22)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    levels_old = materialize_zoom_levels(old, ["value"], opts)
    # rebuild_fraction=None pins the INCREMENTAL algebra: the worldwide
    # batch would otherwise trip the cost-based dispatch into a rebuild
    # and this test would compare the rebuild to itself
    stats = {}
    incremental = update_zoom_levels(
        levels_old, old, new, ["value"], opts, rebuild_fraction=None,
        stats=stats,
    )
    full = materialize_zoom_levels(old.unionByName(new), ["value"], opts)

    def canon(df):
        return sorted(
            (
                r.zoom,
                r.cluster_id,
                round(r.lng, 9),
                round(r.lat, 9),
                r.point_count,
                r.num_members,
                bool(r.is_cluster),
                round(r.sum_value, 6),
            )
            for r in df.collect()
        )
    a, b = canon(incremental), canon(full)
    assert len(a) == len(b) and a == b


def test_fused_pass_matches_level_at_a_time(spark):
    # The fused single-boundary pyramid pass must produce the same pyramid
    # as the level-at-a-time plan (supercell nesting argument), up to float
    # associativity in the weighted-centroid sums (partition composition
    # differs, so summation order may differ).
    rows = [
        (i, -120.0 + (i % 83) * 0.31, 28.0 + ((i * 13) % 59) * 0.29, float(i % 11))
        for i in range(1, 3001)
    ]
    df = spark.createDataFrame(rows, "id long, lng double, lat double, value double")
    opts = ClusterOptions(radius=60.0, min_points=2, max_zoom=9)

    def canon(zl):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9), r.point_count,
             r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in zl.collect()
        )

    fused = canon(
        materialize_zoom_levels(df, ["value"], opts, local_tail_threshold=0, fuse=True)
    )
    unfused = canon(
        materialize_zoom_levels(df, ["value"], opts, local_tail_threshold=0, fuse=False)
    )
    assert fused == unfused


def test_fused_update_equals_level_at_a_time(spark):
    """The one-shuffle fused incremental pass must agree with the
    level-at-a-time reference implementation (fuse=False) exactly — same
    canon as the rebuild-equivalence test."""
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=8)
    old = generate_test_points(spark, 6000, seed=31).select("id", "lng", "lat", "value")
    new = (
        generate_test_points(spark, 300, seed=32)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    levels_old = materialize_zoom_levels(old, ["value"], opts)
    fused = update_zoom_levels(
        levels_old, old, new, ["value"], opts, fuse=True,
        rebuild_fraction=None,
    )
    ref = update_zoom_levels(levels_old, old, new, ["value"], opts, fuse=False)

    def canon(df):
        return sorted(
            (
                r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
                r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6),
            )
            for r in df.collect()
        )

    a, b = canon(fused), canon(ref)
    assert len(a) == len(b) and a == b


def test_fused_update_empty_and_disjoint_batches(spark):
    """Edges of the fused incremental pass: an EMPTY batch must reproduce
    the old pyramid exactly (pure passthrough + deterministic tail), and a
    spatially DISJOINT batch must leave every old-region row untouched
    while adding the new region's clusters."""
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=6)
    old = generate_test_points(
        spark, 2000, west=-125, south=25, east=-65, north=49, seed=41
    ).select("id", "lng", "lat", "value")
    levels_old = materialize_zoom_levels(old, ["value"], opts).localCheckpoint(True)

    def canon(df):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
             r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in df.collect()
        )

    empty = spark.createDataFrame([], "id long, lng double, lat double, value double")
    upd_empty = update_zoom_levels(levels_old, old, empty, ["value"], opts)
    assert canon(upd_empty) == canon(levels_old)

    far = (
        generate_test_points(spark, 300, west=100, south=-40, east=120, north=-20, seed=42)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 5_000_000)
    )
    upd_far = update_zoom_levels(levels_old, old, far, ["value"], opts)
    full = materialize_zoom_levels(old.unionByName(far), ["value"], opts)
    assert canon(upd_far) == canon(full)
    # old-region rows byte-identical (no recluster happened there)
    old_region = set(canon(levels_old))
    kept = set(canon(upd_far))
    assert old_region <= kept


def test_fused_update_with_deletions_equals_rebuild(spark):
    """Append + delete in one fused pass must equal a rebuild over
    (old MINUS deleted) UNION new — the right-to-be-forgotten path."""
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=7)
    old = generate_test_points(spark, 5000, seed=51).select("id", "lng", "lat", "value")
    new = (
        generate_test_points(spark, 200, seed=52)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    deleted = old.filter(F.col("id") % 17 == 3)  # ~300 scattered points
    levels_old = materialize_zoom_levels(old, ["value"], opts).localCheckpoint(True)
    upd = update_zoom_levels(
        levels_old, old, new, ["value"], opts, points_deleted=deleted,
        rebuild_fraction=None,
    )
    survivors = old.join(deleted.select("id"), "id", "left_anti")
    full = materialize_zoom_levels(survivors.unionByName(new), ["value"], opts)

    def canon(df):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
             r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in df.collect()
        )

    a, b = canon(upd), canon(full)
    assert len(a) == len(b) and a == b
    # deleted ids can no longer appear as singleton cluster ids
    del_ids = {r.id for r in deleted.select("id").collect()}
    assert not (del_ids & {c for (_, c, *_r) in a})


def test_fused_update_jvm_dirty_path_keeps_out_of_bbox_rows(spark, monkeypatch):
    """Force the JVM-side dirty-set path (the branch large batches take)
    with a LOCALIZED batch and assert exact rebuild equality. Regression:
    the passthrough must be a partition of the whole level set — an
    earlier form derived it from the bbox-FILTERED frame, silently
    dropping every level row outside the batch bbox whenever this branch
    was taken (dense-corpus batches with >500k fed rows)."""
    import clustopher_spark.operators.zoom as zoom_mod
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    monkeypatch.setattr(zoom_mod, "_DRIVER_DIRTY_LIMIT", 0)
    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=7)
    # old corpus spans two far-apart regions; the batch touches only one,
    # so the expanded bbox excludes the other region entirely
    old = (
        generate_test_points(spark, 2000, west=-125, south=25, east=-65,
                             north=49, seed=61)
        .unionByName(
            generate_test_points(spark, 2000, west=100, south=-45, east=150,
                                 north=-10, seed=62)
            .withColumn("id", F.col("id") + 500_000)
        )
        .select("id", "lng", "lat", "value")
    )
    new = (
        generate_test_points(spark, 300, west=-75, south=40, east=-73,
                             north=42, seed=63)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    levels_old = materialize_zoom_levels(old, ["value"], opts).localCheckpoint(True)
    upd = update_zoom_levels(levels_old, old, new, ["value"], opts)
    full = materialize_zoom_levels(old.unionByName(new), ["value"], opts)

    def canon(df):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
             r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in df.collect()
        )

    a, b = canon(upd), canon(full)
    assert len(a) == len(b) and a == b


def test_fused_update_cost_dispatch(spark):
    """The cost-based dispatch must send a worldwide-uniform batch (which
    dirties most coarse supercells) to the REBUILD path and a localized
    batch to the INCREMENTAL path — and both must still equal the full
    rebuild of the accumulated corpus."""
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=8)
    old = generate_test_points(spark, 6000, seed=35).select(
        "id", "lng", "lat", "value"
    )
    levels_old = materialize_zoom_levels(old, ["value"], opts).localCheckpoint(True)

    def canon(df):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
             r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in df.collect()
        )

    world = (
        generate_test_points(spark, 400, seed=36)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    s1: dict = {}
    upd1 = update_zoom_levels(levels_old, old, world, ["value"], opts, stats=s1)
    assert s1["path"] == "rebuild"
    assert canon(upd1) == canon(
        materialize_zoom_levels(old.unionByName(world), ["value"], opts)
    )

    city = (
        generate_test_points(spark, 400, west=-75, south=40, east=-73,
                             north=42, seed=37)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 2_000_000)
    )
    s2: dict = {}
    upd2 = update_zoom_levels(levels_old, old, city, ["value"], opts, stats=s2)
    assert s2["path"] == "incremental"
    assert s2["est_fed_fraction"] < s1["est_fed_fraction"]
    assert canon(upd2) == canon(
        materialize_zoom_levels(old.unionByName(city), ["value"], opts)
    )


def test_fused_update_cost_dispatch_jvm_branch(spark, monkeypatch):
    """The dispatch must also fire on the JVM dirty-set branch (oversized
    batches): force it and check a worldwide batch is routed to rebuild
    with the same exact result."""
    import clustopher_spark.operators.zoom as zoom_mod
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    monkeypatch.setattr(zoom_mod, "_DRIVER_DIRTY_LIMIT", 0)
    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=7)
    old = generate_test_points(spark, 4000, seed=38).select(
        "id", "lng", "lat", "value"
    )
    new = (
        generate_test_points(spark, 300, seed=39)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    levels_old = materialize_zoom_levels(old, ["value"], opts).localCheckpoint(True)
    st: dict = {}
    upd = update_zoom_levels(levels_old, old, new, ["value"], opts, stats=st)
    assert st["path"] == "rebuild"

    def canon(df):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
             r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in df.collect()
        )

    assert canon(upd) == canon(
        materialize_zoom_levels(old.unionByName(new), ["value"], opts)
    )


def test_fused_update_oversize_batch_dispatches_to_rebuild(spark, monkeypatch):
    """Past the broadcastable-dirty-set envelope the update must dispatch
    straight to the rebuild (the unpruned fused pass shuffles corpus +
    levels + batch — strictly more than the rebuild's one shuffle)."""
    import clustopher_spark.operators.zoom as zoom_mod
    from clustopher_spark.operators.zoom import (
        materialize_zoom_levels,
        update_zoom_levels,
    )
    from clustopher_spark.sources.generators import generate_test_points

    monkeypatch.setattr(zoom_mod, "_PRUNE_LIMIT", 10)
    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=6)
    old = generate_test_points(spark, 1500, seed=45).select(
        "id", "lng", "lat", "value"
    )
    new = (
        generate_test_points(spark, 100, west=-75, south=40, east=-73,
                             north=42, seed=46)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    levels_old = materialize_zoom_levels(old, ["value"], opts).localCheckpoint(True)
    st: dict = {}
    upd = update_zoom_levels(levels_old, old, new, ["value"], opts, stats=st)
    assert st["path"] == "rebuild"

    def canon(df):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
             r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
            for r in df.collect()
        )

    assert canon(upd) == canon(
        materialize_zoom_levels(old.unionByName(new), ["value"], opts)
    )


def test_tile_cache_matches_spark_path(spark):
    """Round-4 serve tier: the per-(zoom, coarse-tile) driver LRU must be
    bit-equivalent to the Spark bbox filter over the same cached zoom
    frame, for viewports that straddle tile borders, repeat (resident
    tiles), and pan to fresh tiles."""
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 3000, seed=23).select("id", "lng", "lat", "value")
    eng = Clustopher(pts, ["value"], opts=OPTS)
    eng.materialize()
    counts = eng.cache_zoom_frames()
    # NO build_serve_cache: every get_clusters_local goes through tiles
    viewports = [
        (-125, 25, -65, 49),
        (-180, -85, 180, 85),
        (-110, 30, -90, 45),
        (-1.0, -1.0, 1.0, 1.0),   # straddles the world-center tile corner
        (-110, 30, -90, 45),      # repeat: fully resident, no Spark job
    ]
    for zoom in sorted(counts)[:4]:
        for w, s, e, n in viewports:
            pdf = eng.get_clusters_local(w, s, e, n, zoom)
            spark_rows = eng.get_clusters(w, s, e, n, zoom).collect()
            a = sorted(
                (int(r["cluster_id"]), round(float(r["lng"]), 9), int(r["point_count"]))
                for _, r in pdf.iterrows()
            )
            b = sorted(
                (int(r.cluster_id), round(float(r.lng), 9), int(r.point_count))
                for r in spark_rows
            )
            assert a == b, f"tile cache diverges at zoom {zoom} viewport {(w,s,e,n)}"
    assert eng._tile_cache, "tile LRU never populated"
    eng.release_caches()
    assert not eng._tile_cache and eng._tile_cache_rows == 0


def test_tile_cache_lru_bound(spark):
    """The tile LRU must stay under tile_cache_max_rows (eviction), and an
    evicted tile must re-fetch correctly rather than erroring."""
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 2000, seed=29).select("id", "lng", "lat", "value")
    eng = Clustopher(pts, ["value"], opts=OPTS)
    eng.materialize()
    counts = eng.cache_zoom_frames()
    zoom = max(z for z in counts)  # deepest level: most rows
    eng.tile_cache_max_rows = 50  # force eviction pressure
    for w in range(-180, 140, 40):  # sweep viewports across the world
        eng.get_clusters_local(w, -60, w + 40, 60, zoom)
    assert eng._tile_cache_rows <= max(
        50, max(len(p) for p in eng._tile_cache.values())
    )
    # a previously-evicted region still answers correctly
    pdf = eng.get_clusters_local(-180, -60, -140, 60, zoom)
    n_spark = eng.get_clusters(-180, -60, -140, 60, zoom).count()
    assert len(pdf) == n_spark
    eng.release_caches()


def test_tile_cache_thread_safety(spark):
    """The HTTP layer calls get_clusters_local from ThreadingHTTPServer
    worker threads: hammer the tile LRU from 8 threads with overlapping
    viewports under heavy eviction pressure and require every response to
    equal the single-threaded answer (no torn cache states, no KeyErrors,
    bound respected)."""
    import threading

    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 2000, seed=31).select("id", "lng", "lat", "value")
    eng = Clustopher(pts, ["value"], opts=OPTS)
    eng.materialize()
    counts = eng.cache_zoom_frames()
    zoom = max(counts)
    eng.tile_cache_max_rows = 200  # force constant eviction
    viewports = [(-180 + 30 * i, -60, -150 + 30 * i, 60) for i in range(8)]
    want = {
        vp: sorted(
            (int(r.cluster_id), int(r.point_count))
            for r in eng.get_clusters(*vp, zoom).collect()
        )
        for vp in viewports
    }
    errors = []

    def worker(seed):
        try:
            for i in range(6):
                vp = viewports[(seed + i) % len(viewports)]
                pdf = eng.get_clusters_local(*vp, zoom)
                got = sorted(
                    (int(r["cluster_id"]), int(r["point_count"]))
                    for _, r in pdf.iterrows()
                )
                if got != want[vp]:
                    errors.append((vp, len(got), len(want[vp])))
        except Exception as e:  # noqa: BLE001 — surfaced via the errors list
            errors.append(repr(e))

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:5]
    eng.release_caches()


def test_tile_cache_inverted_bbox_returns_empty(spark):
    """A viewport with west > east (antimeridian crossing as two calls) or
    south > north has an empty tile cover — it must answer [] like the
    Spark path did, not crash (round-4 review finding)."""
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 500, seed=37).select("id", "lng", "lat", "value")
    eng = Clustopher(pts, ["value"], opts=OPTS)
    eng.materialize()
    counts = eng.cache_zoom_frames()
    zoom = max(counts)
    assert len(eng.get_clusters_local(170, -60, -170, 60, zoom)) == 0
    assert len(eng.get_clusters_local(-10, 50, 10, 40, zoom)) == 0
    # coarse (serve-cache) path agrees once built
    eng.build_serve_cache()
    z0 = min(counts)
    assert len(eng.get_clusters_local(170, -60, -170, 60, z0)) == 0
    eng.release_caches()


def test_tile_cache_generation_guard(spark):
    """A tile fetch that straddles release_caches() (live ingest advanced
    the corpus) must not seed the fresh cache with stale tiles."""
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 500, seed=41).select("id", "lng", "lat", "value")
    eng = Clustopher(pts, ["value"], opts=OPTS)
    eng.materialize()
    counts = eng.cache_zoom_frames()
    zoom = max(counts)
    import pandas as pd

    stale_gen = eng._tile_generation
    eng.release_caches()  # generation bump
    eng._tile_cache_put((zoom, 0, 0), pd.DataFrame({"lng": [0.0]}), stale_gen)
    assert (zoom, 0, 0) not in eng._tile_cache, "stale-generation insert accepted"
    # current-generation inserts still work
    eng._tile_cache_put((zoom, 0, 0), pd.DataFrame({"lng": [0.0]}), eng._tile_generation)
    assert (zoom, 0, 0) in eng._tile_cache
    eng.release_caches()
