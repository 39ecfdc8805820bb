"""Generators (S3/S4), catalog (S5-S7), and the HTTP serving layer (S9/S10)."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from clustopher_spark.sources.catalog import ClusterCatalog
from clustopher_spark.sources.generators import (
    generate_test_points,
    generate_test_points_around_cities,
)


def test_generate_test_points_deterministic(spark):
    a = generate_test_points(spark, 1000, -125, 25, -65, 49, num_partitions=4)
    stats = a.agg(
        F.count("*").alias("n"), F.min("lng").alias("mnl"), F.max("lng").alias("mxl"),
        F.min("lat").alias("mnlat"), F.max("lat").alias("mxlat"),
        F.count_distinct("category").alias("ncat"),
    ).collect()[0]
    assert stats.n == 1000
    assert -125 <= stats.mnl and stats.mxl <= -65
    assert 25 <= stats.mnlat and stats.mxlat <= 49
    assert stats.ncat == 7
    b = generate_test_points(spark, 1000, -125, 25, -65, 49, num_partitions=4)
    assert a.exceptAll(b).count() == 0  # same seed+partitions -> identical


def test_generate_cities_clustered(spark):
    pts = generate_test_points_around_cities(spark, 900, n_cities=3, num_partitions=4)
    per_city = {r.city: r["count"] for r in pts.groupBy("city").count().collect()}
    assert len(per_city) == 3
    assert all(c == 300 for c in per_city.values())  # round-robin id % 3
    # scatter stays near centers
    spread = pts.groupBy("city").agg(
        (F.max("lng") - F.min("lng")).alias("dl")
    ).collect()
    assert all(r.dl < 3.0 for r in spread)


def test_catalog_save_load_roundtrip(spark, tmp_path):
    cat = ClusterCatalog(spark, str(tmp_path / "catalog"))
    pts = generate_test_points(spark, 500, num_partitions=2)
    ds = cat.save(pts, dataset_id="t1")
    loaded = cat.load_points(ds)
    assert loaded.count() == 500
    assert set(loaded.columns) == set(pts.columns)
    infos = cat.list_datasets()
    assert len(infos) == 1 and infos[0]["num_points"] == 500
    assert cat.info("t1")["file_size_bytes"] > 0
    cdf = cat.as_dataframe().collect()
    assert cdf[0].dataset_id == "t1" and cdf[0].num_points == 500


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.serving import ClusterService, serve

    root = str(tmp_path_factory.mktemp("serving"))
    svc = ClusterService(
        spark, root, ClusterOptions(radius=100.0, min_points=2, max_zoom=6)
    )
    httpd = serve(svc, port=18734)
    yield "http://127.0.0.1:18734"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def test_serving_end_to_end(server):
    # create (POST) -> list -> clusters -> metadata
    req = urllib.request.Request(
        f"{server}/api/clusters",
        data=json.dumps({"numPoints": 2000}).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        created = json.loads(r.read())
    ds = created["dataset_id"]
    assert created["num_points"] == 2000

    listed = _get(f"{server}/api/clusters")
    assert any(m["dataset_id"] == ds for m in listed)

    clusters = _get(
        f"{server}/api/clusters/{ds}?zoom=3&west=-180&south=-85&east=180&north=85"
    )
    assert sum(c["count"] for c in clusters) == 2000
    assert any(c["is_cluster"] for c in clusters)
    assert all("value" in c["metrics"] for c in clusters)

    meta = _get(
        f"{server}/api/clusters/{ds}/metadata?zoom=3&west=-180&south=-85&east=180&north=85"
    )
    assert meta["total_points"] == 2000
    assert "value" in meta["metrics"]
    assert abs(sum(meta["distributions"]["category"].values()) - 100.0) < 1e-6


def test_serving_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/clusters/nope?zoom=3&west=0&south=0&east=1&north=1")
    assert e.value.code in (400, 404, 500)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/clusters/whatever")  # missing params
    assert e.value.code == 400


def test_read_write_any_roundtrip(spark, tmp_path):
    """CSV/JSON/ORC/XML ingest-export edges round-trip the points schema."""
    from clustopher_spark.sources.catalog import read_any, write_any
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 500, seed=3).select(
        "id", "lng", "lat", "value", "category"
    )
    want = sorted(
        (r.id, round(r.lng, 9), round(r.lat, 9), round(r.value, 9), r.category)
        for r in pts.collect()
    )
    schema = "id long, lng double, lat double, value double, category string"
    for fmt in ("csv", "json", "orc", "parquet", "xml"):
        path = str(tmp_path / f"pts_{fmt}")
        write_any(pts, path, fmt)
        back = read_any(spark, path, fmt, schema=schema)
        got = sorted(
            (r.id, round(r.lng, 9), round(r.lat, 9), round(r.value, 9), r.category)
            for r in back.collect()
        )
        assert got == want, f"round-trip mismatch for {fmt}"
    # extension-based dispatch (no fmt argument)
    path = str(tmp_path / "pts2.csv")
    write_any(pts, path)
    back = read_any(spark, path, schema=schema)
    assert back.count() == 500


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution on the points dataset: files written before a new
    metric column existed read seamlessly under mergeSchema, nulls filling
    the gap — the add-a-column-without-rewrite path at 100 TB."""
    base = str(tmp_path / "evolving")
    old = spark.createDataFrame(
        [(1, -100.0, 40.0)], "id long, lng double, lat double"
    )
    new = spark.createDataFrame(
        [(2, -101.0, 41.0, 7.5)], "id long, lng double, lat double, value double"
    )
    old.write.parquet(base + "/batch=1")
    new.write.parquet(base + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(base)
    rows = {r.id: r for r in merged.collect()}
    assert set(merged.columns) >= {"id", "lng", "lat", "value"}
    assert rows[1].value is None and rows[2].value == 7.5


def test_dataset_cache_concurrent_miss_single_load():
    """Concurrent misses for the same dataset must share ONE loader call
    (the load is the serving tier's most expensive operation); a loader
    failure must wake waiters so one of them retries."""
    import threading
    import time

    from clustopher_spark.serving import DatasetCache

    cache = DatasetCache(max_datasets=2)
    calls = []

    def slow_loader(ds_id):
        calls.append(ds_id)
        time.sleep(0.2)
        return type("Eng", (), {"_zoom_levels": None})()

    results = []
    threads = [
        threading.Thread(target=lambda: results.append(cache.get("a", slow_loader)))
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1, f"loader ran {len(calls)}x for one dataset"
    assert len({id(r) for r in results}) == 1, "waiters got different engines"

    # failure path: waiters are woken and one retries
    attempts = []

    def flaky_loader(ds_id):
        attempts.append(ds_id)
        if len(attempts) == 1:
            time.sleep(0.1)
            raise RuntimeError("boom")
        return type("Eng", (), {"_zoom_levels": None})()

    outcomes = []

    def worker():
        try:
            outcomes.append(cache.get("b", flaky_loader))
        except RuntimeError:
            outcomes.append("err")

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert "err" in outcomes, "first loader's failure must propagate"
    assert any(o != "err" for o in outcomes), "a waiter should retry and succeed"


def test_grpc_rpc_surface(spark, tmp_path):
    """S9 parity: the five reference RPCs (proto/cluster_service.proto:7-16)
    through the transport-agnostic dispatcher with proto-shaped messages.
    (grpcio itself is absent in this runtime; serve_grpc is the
    import-guarded production binding over this exact dispatch.)"""
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.rpc import SERVICE_NAME, ClusterRpc
    from clustopher_spark.serving import ClusterService

    svc = ClusterService(
        spark, str(tmp_path / "grpc_cat"), ClusterOptions(radius=100.0, min_points=2, max_zoom=6)
    )
    rpc = ClusterRpc(svc)
    assert rpc.method_names() == [
        f"/{SERVICE_NAME}/{m}"
        for m in ["ListClusters", "LoadCluster", "CreateCluster", "GetClusters", "GetMetadata"]
    ]

    created = rpc.dispatch(f"/{SERVICE_NAME}/CreateCluster", {"num_points": 1500})
    info = created["cluster"]
    assert info["num_points"] == 1500 and info["file_size"] > 0 and info["timestamp"]
    ds = info["id"]

    listed = rpc.dispatch(f"/{SERVICE_NAME}/ListClusters", {})
    assert any(c["id"] == ds for c in listed["clusters"])

    loaded = rpc.dispatch(f"/{SERVICE_NAME}/LoadCluster", {"cluster_id": ds})
    assert loaded["cluster"]["id"] == ds

    got = rpc.dispatch(
        f"/{SERVICE_NAME}/GetClusters",
        {"cluster_id": ds, "zoom": 3,
         "bounds": {"min_x": -180, "min_y": -85, "max_x": 180, "max_y": 85}},
    )
    feats = got["features"]
    assert sum(f["count"] for f in feats) == 1500
    assert any(f["is_cluster"] for f in feats)
    assert all(set(f) == {"x", "y", "count", "id", "metrics", "is_cluster"} for f in feats)

    md = rpc.dispatch(
        f"/{SERVICE_NAME}/GetMetadata",
        {"cluster_id": ds, "zoom": 3,
         "bounds": {"min_x": -180, "min_y": -85, "max_x": 180, "max_y": 85}},
    )
    assert md["total_points"] == 1500
    assert "value" in md["metrics_summary"]
    dist = md["metadata_summary"]["category"]["distribution"]["values"]
    assert abs(sum(dist.values()) - 100.0) < 1e-6

    import pytest as _pytest

    with _pytest.raises(KeyError):
        rpc.dispatch(f"/{SERVICE_NAME}/Nope", {})


def test_load_points_merges_evolved_schema(spark, tmp_path):
    """Append-evolved datasets load with the union schema: a batch that
    adds a metric column must not break reads of the whole dataset, and
    older rows surface NULL for the new column."""
    import os

    from clustopher_spark.sources.catalog import ClusterCatalog

    cat = ClusterCatalog(spark, str(tmp_path))
    base = spark.range(0, 100).selectExpr(
        "id", "cast(id % 360 - 180 as double) as lng",
        "cast(id % 170 - 85 as double) as lat", "cast(id as double) as value"
    )
    ds = cat.save(base, dataset_id="evolving")
    evolved = spark.range(100, 150).selectExpr(
        "id", "cast(id % 360 - 180 as double) as lng",
        "cast(id % 170 - 85 as double) as lat", "cast(id as double) as value",
        "cast(id * 2 as double) as weight"
    )
    evolved.write.mode("append").parquet(os.path.join(str(tmp_path), ds, "points"))
    got = cat.load_points(ds)
    assert "weight" in got.columns
    assert got.count() == 150
    assert got.filter("weight IS NULL").count() == 100
    assert got.filter("weight IS NOT NULL").count() == 50


def test_snapshot_versioning_time_travel(spark, tmp_path):
    """save_snapshot publishes immutable versions; pinned reads see the
    old data after a newer snapshot lands, and latest follows the commit."""
    from clustopher_spark.sources.catalog import ClusterCatalog

    cat = ClusterCatalog(spark, str(tmp_path))
    v1_pts = spark.range(0, 50).selectExpr(
        "id", "cast(id as double) as lng", "cast(id % 80 as double) as lat",
        "cast(1 as double) as value"
    )
    assert cat.save_snapshot("ds", v1_pts) == 1
    v2_pts = spark.range(0, 80).selectExpr(
        "id", "cast(id as double) as lng", "cast(id % 80 as double) as lat",
        "cast(2 as double) as value"
    )
    assert cat.save_snapshot("ds", v2_pts) == 2

    assert cat.load_points("ds").count() == 80                 # latest
    assert cat.load_points("ds", version=1).count() == 50      # pinned
    assert cat.load_points("ds", version=1).agg({"value": "max"}).first()[0] == 1.0
    hist = cat.history("ds")
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["num_points"] == 50 and hist[1]["num_points"] == 80
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        cat.load_points("ds", version=9)

    # legacy unversioned datasets still load
    legacy = cat.save(v1_pts, dataset_id="old_style")
    assert cat.load_points(legacy).count() == 50


def test_vacuum_removes_old_snapshots_keeps_latest(spark, tmp_path):
    from clustopher_spark.sources.catalog import ClusterCatalog

    cat = ClusterCatalog(spark, str(tmp_path))
    for n in (10, 20, 30, 40):
        pts = spark.range(0, n).selectExpr(
            "id", "cast(id as double) as lng", "cast(id % 80 as double) as lat",
            "cast(1 as double) as value"
        )
        cat.save_snapshot("ds", pts)
    assert cat.vacuum("ds", keep_last=2) == [1, 2]
    assert cat.load_points("ds").count() == 40
    assert cat.load_points("ds", version=3).count() == 30
    import pytest as _p

    with _p.raises(Exception):
        cat.load_points("ds", version=1).count()
    # history preserved with the GC recorded; vacuum is idempotent
    assert [h["version"] for h in cat.history("ds")] == [1, 2, 3, 4]
    assert cat.history("ds")[0]["data_removed"] is True
    assert cat.vacuum("ds", keep_last=2) == []


def test_serving_cache_lifecycle(spark):
    """Round-2 verdict item 3: per-request kernel caches must not
    accumulate in executor storage across a serving loop. The metadata
    paths cache the kernel assignment per request; the engine evicts
    (unpersists) beyond a bounded window, so N requests pin at most
    ``request_cache_window`` frames — deterministically, with no reliance
    on GC timing."""
    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.sources.generators import generate_test_points

    pts = generate_test_points(spark, 2_000, seed=5).localCheckpoint(eager=True)
    pts.count()
    eng = Clustopher(
        pts, ["value"], meta_cols=["category"],
        opts=ClusterOptions(radius=80.0, min_points=2, max_zoom=8),
    )
    eng.request_cache_window = 4

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    baseline = n_persistent()
    for _ in range(6):
        out = eng.get_clusters_with_metadata(-120, 10, -60, 60, 5)
        out.count()
        counts, stats, dist = eng.get_metadata_summary(-120, 10, -60, 60, 5)
        counts.count()
    # 6 iterations x 3 kernel caches each = 18 created; the window holds 4
    after = n_persistent()
    assert after <= baseline + eng.request_cache_window, (
        f"serving loop leaked pinned RDDs: baseline={baseline} after={after}"
    )
    # an evicted-but-still-held frame must recompute, not fail
    assert out.count() > 0
    eng.release_caches()
    assert n_persistent() <= baseline


def test_engine_update_advances_pyramid_and_serving(spark):
    """Clustopher.update() must advance the pyramid to exactly the state a
    fresh engine over the full corpus would materialize, refresh the
    corpus for chained updates, and invalidate stale serve caches."""
    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.sources.generators import generate_test_points

    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=6)
    base = generate_test_points(spark, 2000, seed=55).select(
        "id", "lng", "lat", "value"
    )
    batch = (
        generate_test_points(spark, 150, west=-75, south=40, east=-73,
                             north=42, seed=56)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 1_000_000)
    )
    eng = Clustopher(base, ["value"], opts=opts)
    eng.materialize()
    eng.build_serve_cache()
    before = eng.get_clusters_local(-80, 35, -70, 45, 5)

    eng.update(batch)
    fresh = Clustopher(base.unionByName(batch), ["value"], opts=opts)
    fresh.materialize()

    def canon(df):
        return sorted(
            (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
             r.point_count, r.num_members, round(r.sum_value, 6))
            for r in df.collect()
        )

    assert canon(eng._zoom_levels) == canon(fresh._zoom_levels)
    assert eng.points.count() == 2150
    # serve cache was invalidated and now reflects the new pyramid
    after = eng.get_clusters_local(-80, 35, -70, 45, 5)
    assert len(after) >= len(before)
    want = fresh.get_clusters(-80, 35, -70, 45, 5).count()
    assert len(after) == want

    # deletions chain through the refreshed corpus
    doomed = batch.limit(40)
    eng.update(
        generate_test_points(spark, 10, seed=57)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 2_000_000),
        points_deleted=doomed,
    )
    assert eng.points.count() == 2150 - 40 + 10
    total = eng._zoom_levels.filter(F.col("zoom") == 0).agg(
        F.sum("point_count")
    ).first()[0]
    assert total == 2150 - 40 + 10


def test_serving_live_update(server):
    """POST /api/clusters/:id/update: live append + delete through the
    serving tier, visible in subsequent clusters/metadata reads, and a
    persisted snapshot version on request."""
    import urllib.request

    req = urllib.request.Request(
        f"{server}/api/clusters",
        data=json.dumps({"numPoints": 1000}).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        ds = json.loads(r.read())["dataset_id"]

    def post_update(payload):
        req = urllib.request.Request(
            f"{server}/api/clusters/{ds}/update",
            data=json.dumps(payload).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    add = [
        {"id": 1_000_000 + i, "lng": -74.0 + i * 0.01, "lat": 40.7,
         "value": 1.0, "sales": 2.0, "category": "retail", "region": "east"}
        for i in range(5)
    ]
    out = post_update({"add": add, "delete": [{"id": 1, "lng": 0, "lat": 0}],
                       "persist": True})
    assert out["added"] == 5 and out["deleted"] == 1
    assert out["plan"] in ("incremental", "rebuild")
    assert out["version"] >= 1
    # note: the created dataset's point ids may or may not include id=1 at
    # (0,0); a non-member deletion is a no-op by contract, so num_points is
    # >= 1000 + 5 - 1
    assert out["num_points"] >= 1004

    meta = _get(
        f"{server}/api/clusters/{ds}/metadata?zoom=3&west=-180&south=-85&east=180&north=85"
    )
    assert meta["total_points"] == out["num_points"]

    # malformed rows are rejected
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        post_update({"add": [{"lng": 0.0, "lat": 0.0}]})
    assert e.value.code == 400


def test_cache_zoom_frames_restricted_band(spark):
    """cache_zoom_frames(zooms=[...]) — the deep-corpus serving knob the
    30M bench family uses — must cache ONLY the listed levels, serve a
    cached zoom through the tile path bit-equal to the Spark filter
    path, and still answer un-cached zooms via the fallback."""
    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.sources.generators import generate_test_points

    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=6)
    pts = generate_test_points(spark, 3000, seed=61).select(
        "id", "lng", "lat", "value"
    )
    eng = Clustopher(pts, ["value"], opts=opts)
    eng.materialize()
    counts = eng.cache_zoom_frames(zooms=[5])
    assert set(counts) == {5}
    assert set(eng._zoom_frames) == {5}

    bbox = (-100, 30, -80, 45)
    via_tiles = eng.get_clusters_local(*bbox, 5)
    want = eng.get_clusters(*bbox, 5).toPandas()

    def canon(pdf):
        return sorted(
            (int(r.cluster_id), round(r.lng, 9), round(r.lat, 9),
             int(r.point_count))
            for r in pdf.itertuples()
        )

    assert canon(via_tiles) == canon(want)
    # an un-cached zoom answers through the Spark fallback path
    fallback = eng.get_clusters_local(*bbox, 4)
    want4 = eng.get_clusters(*bbox, 4).toPandas()
    assert canon(fallback) == canon(want4)
    eng.release_caches()


@pytest.fixture(scope="module")
def vector_server(spark, tmp_path_factory):
    """A server with vector serving configured: one IVF-PQ index built
    from the real embeddings table under the vector root."""
    from conftest import SF_DIR

    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.serving import ClusterService, serve
    from clustopher_spark.sources.vector_index import IVFPQIndex

    base = tmp_path_factory.mktemp("vector_serving")
    vroot = str(base / "vectors")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = IVFPQIndex(
        spark, f"{vroot}/docs", n_lists=8, m_subvectors=4, n_codes=32
    )
    idx.build(emb)
    svc = ClusterService(
        spark,
        str(base / "catalog"),
        ClusterOptions(radius=100.0, min_points=2, max_zoom=6),
        vector_root=vroot,
    )
    httpd = serve(svc, port=18735)
    yield "http://127.0.0.1:18735", emb
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_vector_serving_end_to_end(vector_server):
    server, emb = vector_server
    listed = _get(f"{server}/api/vectors")
    assert [ix["index_id"] for ix in listed] == ["docs"]
    dim = listed[0]["dim"]

    # search with a vector that exists in the index: its source id must
    # come back rank-1 with cosine ~1 (synthetic negative query ids mean
    # self-exclusion cannot suppress it)
    rows = emb.orderBy("vec_id").limit(2).collect()
    got = _post(
        f"{server}/api/vectors/docs/search",
        {"vectors": [[float(x) for x in r.embedding] for r in rows], "k": 3},
    )
    top1 = {h["query_idx"]: h for h in got["hits"] if h["rank"] == 1}
    assert top1[0]["neighbor_id"] == rows[0].vec_id
    assert top1[1]["neighbor_id"] == rows[1].vec_id
    assert top1[0]["cos_sim"] > 0.999

    # live append through the API, then the new vector is queryable
    v = [float(x) for x in rows[0].embedding]
    shifted = [x + 0.0005 for x in v]
    res = _post(
        f"{server}/api/vectors/docs/append",
        {"ids": [777000], "vectors": [shifted], "batch": 1},
    )
    assert res == {"appended": True, "rows": 1}
    # idempotent: committed batch replay is a no-op
    res2 = _post(
        f"{server}/api/vectors/docs/append",
        {"ids": [777000], "vectors": [shifted], "batch": 1},
    )
    assert res2["appended"] is False
    got2 = _post(
        f"{server}/api/vectors/docs/search", {"vectors": [shifted], "k": 2}
    )
    assert got2["hits"][0]["neighbor_id"] == 777000

    # right-to-be-forgotten: delete the appended vector, it stops answering
    res3 = _post(
        f"{server}/api/vectors/docs/delete", {"ids": [777000], "batch": 2}
    )
    assert res3 == {"deleted": True, "rows": 1}
    res4 = _post(  # replay no-op
        f"{server}/api/vectors/docs/delete", {"ids": [777000], "batch": 2}
    )
    assert res4["deleted"] is False
    got3 = _post(
        f"{server}/api/vectors/docs/search", {"vectors": [shifted], "k": 2}
    )
    assert not any(h["neighbor_id"] == 777000 for h in got3["hits"])

    # stats endpoint: list-occupancy balance over the live rows
    stats = _get(f"{server}/api/vectors/docs/stats")
    assert stats["n_lists"] == 8 and stats["rows"] > 0
    assert stats["balance_factor"] >= 1.0

    # drift endpoint: offline-built index has no drift log -> []; unknown
    # index -> 404
    assert _get(f"{server}/api/vectors/docs/drift") == []
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/vectors/nope/drift")
    assert e.value.code == 404

    # error paths: wrong dim -> 400, unknown index -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/vectors/docs/search", {"vectors": [[1.0] * (dim + 1)]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/vectors/nope/search", {"vectors": [[1.0] * dim]})
    assert e.value.code == 404
    # batch is the idempotence token: omitting it must be a 400, not a
    # silent default-0 watermark no-op
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/vectors/docs/delete", {"ids": [1]})
    assert e.value.code == 400 and "batch" in json.loads(e.value.read())["error"]
    # the clusters metadata route must not swallow the vectors namespace
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/vectors/docs/metadata?zoom=3&west=0&south=0&east=1&north=1")
    assert e.value.code == 404


def test_vector_serving_not_configured(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/vectors")
    assert e.value.code == 404


@pytest.fixture(scope="module")
def table_server(spark, tmp_path_factory):
    """A server with MERGE-table serving configured: one table created
    from the real orders table under the table root."""
    from conftest import SF_DIR

    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.serving import ClusterService, serve
    from clustopher_spark.sources.merge_table import MergeTable

    base = tmp_path_factory.mktemp("table_serving")
    troot = str(base / "tables")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    MergeTable(spark, f"{troot}/orders").create(
        orders, ["o_orderkey"], num_files=4
    )
    svc = ClusterService(
        spark, str(base / "catalog"),
        ClusterOptions(radius=100.0, min_points=2, max_zoom=6),
        table_root=troot,
    )
    httpd = serve(svc, port=18737)
    yield "http://127.0.0.1:18737", orders, troot
    httpd.shutdown()


def test_table_serving_end_to_end(table_server):
    server, orders, _troot = table_server
    listed = _get(f"{server}/api/tables")
    assert [t["table_id"] for t in listed] == ["orders"]
    assert listed[0]["key_cols"] == ["o_orderkey"] and listed[0]["latest"] == 1

    # manifest-pruned point lookup: one key -> a subset of the files
    row = orders.orderBy("o_orderkey").limit(1).collect()[0]
    got = _get(f"{server}/api/tables/orders/lookup?key={row.o_orderkey}")
    assert got["files_scanned"] < listed[0]["files"]
    assert len(got["rows"]) == 1
    assert got["rows"][0]["o_totalprice"] == row.o_totalprice

    # live merge commit: update that key, delete another, insert a fresh one
    other = orders.orderBy(F.desc("o_orderkey")).limit(1).collect()[0]
    def as_json(r, **over):
        d = {k: (v.isoformat() if hasattr(v, "isoformat") else v)
             for k, v in r.asDict().items()}
        d.update(over)
        return d

    res = _post(
        f"{server}/api/tables/orders/merge",
        {
            "rows": [
                as_json(row, o_totalprice=42.5, op="upsert"),
                as_json(other, op="delete"),
                as_json(row, o_orderkey=99_999_999, op="upsert"),
            ],
            "op_col": "op",
            "batch": 1,
        },
    )
    assert res == {"merged": True, "version": 2}
    # replay of the committed batch is a no-op
    res2 = _post(
        f"{server}/api/tables/orders/merge",
        {"rows": [as_json(row, op="upsert")], "op_col": "op", "batch": 1},
    )
    assert res2["merged"] is False

    # the committed changes are visible through every GET
    assert _get(f"{server}/api/tables/orders/lookup?key={row.o_orderkey}")[
        "rows"
    ][0]["o_totalprice"] == 42.5
    assert _get(f"{server}/api/tables/orders/lookup?key={other.o_orderkey}")["rows"] == []
    assert _get(f"{server}/api/tables/orders/lookup?key=99999999")["rows"][0][
        "o_orderkey"
    ] == 99_999_999
    # time travel: version 1 still serves the original price
    assert _get(
        f"{server}/api/tables/orders/lookup?key={row.o_orderkey}&version=1"
    )["rows"][0]["o_totalprice"] == row.o_totalprice

    hist = _get(f"{server}/api/tables/orders/history")
    assert [h["operation"] for h in hist] == ["create", "merge"]

    # layout telemetry over HTTP: post-merge layout overlaps (the update
    # rewrote files spanning carried ranges), signal present and sane
    st = _get(f"{server}/api/tables/orders/stats")
    assert st["version"] == 2 and st["files"] == listed[0]["files"] + 1
    assert st["max_key_coverage"] >= 1 and st["overlap_factor"] >= 1.0

    # CDC poll: the feed for (1, latest] carries all four change images
    feed = _get(f"{server}/api/tables/orders/changes?since=1")
    kinds = sorted(r["_change_type"] for r in feed["rows"])
    assert kinds == ["delete", "insert", "update_post", "update_pre"]
    assert feed["total"] == 4

    # validation: batch token required; unknown table 404s; a value that
    # does not cast to the table's types rejects the whole request (the
    # silent-null cast path would otherwise commit a corrupt row)
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/tables/orders/merge",
              {"rows": [as_json(row, op="upsert")], "op_col": "op"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/tables/orders/merge",
              {"rows": [as_json(row, o_orderkey="not-a-number", op="upsert")],
               "op_col": "op", "batch": 9})
    assert e.value.code == 400 and "cast" in e.value.read().decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/tables/nope/history")
    assert e.value.code == 404


def test_table_view_serving_end_to_end(spark, table_server):
    """Maintained views over HTTP — the CDC loop's serve leg: create +
    bootstrap a view, commit a merge, refresh (drains the CDC stream
    exactly-once), and GET the standing aggregate; the served rows equal
    a recompute over the live table at every step. Runs after the merge
    test (module-scoped server), so the view bootstraps mid-history —
    the watermark handles it."""
    import urllib.error

    from clustopher_spark.sources.merge_table import MergeTable

    server, orders, troot = table_server
    t = MergeTable(spark, f"{troot}/orders")

    made = _post(
        f"{server}/api/tables/orders/views",
        {"view_id": "price-extrema", "kind": "minmax",
         "group_cols": ["o_orderstatus"], "value_col": "o_totalprice"},
    )
    assert made["view_id"] == "price-extrema" and made["latest"] == 1
    assert made["applied_commit"] == t._meta()["latest"]
    listed = _get(f"{server}/api/tables/orders/views")
    assert [v["view_id"] for v in listed] == ["price-extrema"]

    def recompute():
        return {
            r.o_orderstatus: (r.n_rows, r.v_min, r.v_max)
            for r in t.read().groupBy("o_orderstatus").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("o_totalprice").alias("v_min"),
                F.max("o_totalprice").alias("v_max"),
            ).collect()
        }

    def served():
        got = _get(f"{server}/api/tables/orders/views/price-extrema")
        return {
            r["o_orderstatus"]: (r["n_rows"], r["v_min"], r["v_max"])
            for r in got["rows"]
        }

    assert served() == recompute()  # bootstrap state

    # a merge that REMOVES a stored extremum (forces the dirty-group
    # recompute through the time-traveled snapshot), then refresh
    top = t.read().orderBy(F.desc("o_totalprice")).limit(1).collect()[0]
    row = {k: (v.isoformat() if hasattr(v, "isoformat") else v)
           for k, v in top.asDict().items()}
    res = _post(
        f"{server}/api/tables/orders/merge",
        {"rows": [dict(row, op="delete")], "op_col": "op", "batch": 50},
    )
    assert res["merged"] is True
    ref = _post(f"{server}/api/tables/orders/views/price-extrema/refresh", {})
    assert ref["applied_commit"] == t._meta()["latest"]
    assert served() == recompute()
    # refresh again: nothing fresh, meta unchanged
    ref2 = _post(f"{server}/api/tables/orders/views/price-extrema/refresh", {})
    assert ref2 == ref

    # the other two kinds round-trip too (sum with decimal-to-float JSON,
    # topk with its array column)
    _post(
        f"{server}/api/tables/orders/views",
        {"view_id": "rev", "kind": "sum", "group_cols": ["o_orderstatus"],
         "sum_cols": {"o_totalprice": "revenue"}},
    )
    got = _get(f"{server}/api/tables/orders/views/rev")
    want = {
        r.o_orderstatus: (r.n_rows, float(r.revenue))
        for r in t.read().groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
        ).collect()
    }
    assert {
        r["o_orderstatus"]: (r["n_rows"], r["revenue"]) for r in got["rows"]
    } == pytest.approx(want)
    _post(
        f"{server}/api/tables/orders/views",
        {"view_id": "top3", "kind": "topk", "group_cols": ["o_orderstatus"],
         "value_col": "o_totalprice", "k": 3},
    )
    got3 = _get(f"{server}/api/tables/orders/views/top3")
    want3 = {
        r.o_orderstatus: list(r.top_k)
        for r in t.read().groupBy("o_orderstatus").agg(
            F.slice(F.sort_array(F.collect_list("o_totalprice"), asc=False), 1, 3).alias("top_k")
        ).collect()
    }
    assert {r["o_orderstatus"]: r["top_k"] for r in got3["rows"]} == want3

    # the distinct kind: count + COUNT(DISTINCT) served from the
    # support-relation view (round-8: the durable distinct leg)
    _post(
        f"{server}/api/tables/orders/views",
        {"view_id": "cust", "kind": "distinct",
         "group_cols": ["o_orderstatus"], "value_col": "o_custkey"},
    )
    gotd = _get(f"{server}/api/tables/orders/views/cust")
    wantd = {
        r.o_orderstatus: (r.n_rows, r.n_distinct)
        for r in t.read().groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_distinct"),
        ).collect()
    }
    assert {
        r["o_orderstatus"]: (r["n_rows"], r["n_distinct"]) for r in gotd["rows"]
    } == wantd
    # a refresh with nothing fresh is a no-op on its meta
    refd = _post(f"{server}/api/tables/orders/views/cust/refresh", {})
    assert refd["applied_commit"] == t._meta()["latest"]

    # sum_cols OUTPUT-name collisions and non-numeric sources are 400s
    # at create time, not broken views (round-7 advice)
    import urllib.error as _ue

    for bad in (
        {"sum_cols": {"o_totalprice": "o_orderstatus"}},  # collides: group col
        {"sum_cols": {"o_totalprice": "n_rows"}},         # collides: count col
        {"sum_cols": {"o_totalprice": "x", "o_custkey": "x"}},  # self-collide
        {"sum_cols": {"o_orderpriority": "p"}},           # non-numeric source
    ):
        with pytest.raises(_ue.HTTPError) as e:
            _post(f"{server}/api/tables/orders/views",
                  {"view_id": "badv", "kind": "sum",
                   "group_cols": ["o_orderstatus"], **bad})
        assert e.value.code == 400

    # validation: bad kind 400, duplicate 400, unknown view 404,
    # traversal-shaped id 400, unknown table 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/tables/orders/views",
              {"view_id": "x", "kind": "median", "group_cols": ["o_orderstatus"]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/tables/orders/views",
              {"view_id": "rev", "kind": "sum", "group_cols": ["o_orderstatus"],
               "sum_cols": {"o_totalprice": "revenue"}})
    assert e.value.code == 400 and "exists" in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/tables/orders/views/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/api/tables/orders/views",
              {"view_id": "../escape", "kind": "minmax",
               "group_cols": ["o_orderstatus"], "value_col": "o_totalprice"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/api/tables/nope/views")
    assert e.value.code == 404


def test_dataset_cache_ttl_sweeper_evicts_idle():
    """DatasetCache TTL (the reference's 30-min idle-dataset sweeper,
    runner/runner.go:113-140): entries idle past the TTL are evicted and
    their caches released; a freshly-touched entry survives. Driven via
    the public sweep_idle() (the daemon thread calls the same method)."""
    import time

    from clustopher_spark.serving import DatasetCache

    released = []

    def loader(ds_id):
        class Eng:
            _zoom_levels = None

            def release_caches(self, _id=ds_id):
                released.append(_id)

        return Eng()

    cache = DatasetCache(max_datasets=5, ttl_sec=0.15)
    try:
        cache.get("old", loader)
        cache.get("fresh", loader)
        time.sleep(0.2)
        cache.get("fresh", loader)  # touch: resets its idle clock
        n = cache.sweep_idle()
        assert n == 1 and released == ["old"]
        # the evicted entry reloads on next access; the fresh one is a hit
        reload_calls = []
        cache.get("old", lambda d: (reload_calls.append(d), loader(d))[1])
        assert reload_calls == ["old"]
        assert cache.sweep_idle() == 0  # both just touched
        # with no TTL the sweep is a no-op by contract
        assert DatasetCache(max_datasets=2).sweep_idle() == 0
    finally:
        cache.close()


def test_dataset_cache_ttl_daemon_sweeps_without_explicit_calls():
    """The TTL daemon itself fires: an idle entry disappears within a few
    sweep intervals with no explicit sweep_idle() call."""
    import time

    from clustopher_spark.serving import DatasetCache

    cache = DatasetCache(max_datasets=5, ttl_sec=0.2)
    try:
        cache.get("x", lambda d: type("Eng", (), {
            "_zoom_levels": None, "release_caches": lambda self: None})())
        deadline = time.time() + 5.0
        while time.time() < deadline and "x" in cache._entries:
            time.sleep(0.05)
        assert "x" not in cache._entries
    finally:
        cache.close()
