#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Process isolation (round-3 verdict item 1): each entry FAMILY runs in its
own subprocess, i.e. its own JVM — the r3 committed numbers were
contaminated by in-run storage pressure (the 10M pyramid's ~67M
checkpointed rows and DBSCAN's candidate materialization inflated every
lightweight entry 2-8x), which made round-over-round comparison
unprovable from the artifact. A fresh JVM per family means one family's
block-manager residue cannot distort another's timings; the OS page
cache still carries the warmed parquet across processes. Each worker
prints per-entry storage telemetry (pinned RDD count + cached MB before
and after) so any intra-family pressure is visible in the transcript.

Run one family directly with `bench.py --family NAME` (worker mode);
no args = driver mode, which runs every family and merges the timings.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the 10M-point pyramid family holds ~67M checkpointed rows; headroom keeps
# it in memory instead of spilling (overridable like everything else)
os.environ.setdefault("CLUSTOPHER_DRIVER_MEM", "24g")


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


BENCH_QUERIES = [
    # name in clustopher_spark.queries registry
    "spatial_cluster_greedy",      # flagship: greedy viewport clustering
    "spatial_grid_centroids",      # grid binning + weighted centroid agg
    "q1_pricing_summary",          # scan-heavy aggregation
    "q3_shipping_priority",        # 3-way join
    "q5_revenue_by_nation",        # star join through broadcast dims
    "window_top3_orders_per_customer",
    "events_session_windows",
    "events_asof_last_view_before_purchase",
    "llm_fingerprint_dedup",
    "llm_minhash_candidates",
    "llm_knn_cosine",
    "llm_ann_lsh_topk",
    # round-2 additions (keep the r1 entries above unchanged for
    # round-over-round comparability; these extend the set)
    "spatial_geofence_join",
    "llm_doc_chunking",
    "llm_embedding_quantization",
    "events_anomaly_zscore",
    # round-3 addition
    "llm_ann_ivfpq_topk",
    # round-4 additions
    "llm_bm25_retrieval",
    "llm_hybrid_retrieval_rrf",
    "llm_random_projection",
]


# --------------------------------------------------------------------------
# worker-side plumbing
# --------------------------------------------------------------------------


def _storage_telemetry(spark) -> tuple[int, float]:
    """(pinned RDD count, cached MB) from the block manager — printed
    before/after every entry so storage pressure is visible per-entry."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    mb = sum(i.memSize() for i in infos) / 1e6
    return len(infos), round(mb, 1)


def _report(spark, timings, name, secs, detail=""):
    timings[name] = round(secs, 4 if secs < 0.1 else 3)
    n, mb = _storage_telemetry(spark)
    print(
        f"# {name}: {timings[name]}s{' (' + detail + ')' if detail else ''}"
        f" [pinned after: {n} rdds / {mb} MB]",
        file=sys.stderr,
    )


def _get_worker_spark(app_name: str):
    from pyspark.sql import functions as F

    from clustopher_spark import get_spark

    spark = get_spark(app_name=app_name)
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM/codegen startup and Python-worker pool spawn (the pandas
    # kernels fork one worker per core on first use) aren't billed to
    # queries. Aggregate real columns (count() alone reads only parquet
    # footers) so the OS page cache and codec paths are warm like a serving
    # engine's would be.
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").agg(F.count(F.lit(1))).collect()
    import pandas as pd  # noqa: F401

    warm = spark.range(0, 1024, 1, 32).withColumn("g", F.col("id") % 32)
    warm.groupBy("g").applyInPandas(
        lambda pdf: pdf.head(1), schema="id long, g long"
    ).count()
    return spark


def _best_of(fn, reps: int) -> tuple[float, object]:
    best, out = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best, out


# --------------------------------------------------------------------------
# entry families — each runs in its own subprocess/JVM
# --------------------------------------------------------------------------


def family_registry(spark, timings):
    """The registry headline queries — light entries, shared JVM within the
    family (matching the r1/r2 measurement conditions)."""
    from clustopher_spark.queries import QUERIES

    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        # best-of-3: steady-state, damps scheduler/GC noise
        best, n = _best_of(lambda: fn(spark, SF_DIR).count(), 3)
        _report(spark, timings, name, best, f"{n} rows")


def family_materialize_serve(spark, timings):
    """Baseline-comparable ingest + the serving tier (BASELINE.md:
    '~30 s initial load+cluster per 1M points', '<50 ms viewport query')."""
    import shutil
    import tempfile

    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.queries.spatial import points_df

    tmp = tempfile.mkdtemp(prefix="clustopher_bench_")
    try:
        pts = points_df(spark, SF_DIR).select("id", "lng", "lat", "value")
        n_points = pts.count()
        eng = Clustopher(
            pts, ["value"], opts=ClusterOptions(radius=100.0, min_points=2, max_zoom=10)
        )
        t0 = time.perf_counter()
        eng.materialize(f"{tmp}/zoom_levels")
        _report(
            spark, timings, "materialize_zoom_pyramid",
            time.perf_counter() - t0, f"{n_points} points, zooms 0-10",
        )

        # serving tier. Three honest numbers:
        #   serve_viewport_cold_tile — FIRST touch of a region at a zoom:
        #     one Spark job fetches the covering coarse tiles into the
        #     driver LRU (this container's floor for any Spark action is
        #     ~70-100 ms of scheduling, so this entry can't go much lower);
        #   serve_viewport_query — steady-state query over resident tiles
        #     (the latency every pan/zoom after first exposure pays; the
        #     analog of the reference's <50 ms claim, which is measured
        #     against its fully in-memory dataset, runner/runner.go:157);
        #   serve_viewport_hot — the driver-side full-level cache.
        eng.cache_zoom_frames()  # pre-split per-zoom cached frames
        t0 = time.perf_counter()
        pdf_cold = eng.get_clusters_local(-110, 30, -90, 45, 6)
        _report(
            spark, timings, "serve_viewport_cold_tile",
            time.perf_counter() - t0,
            f"{len(pdf_cold)} rows, first touch incl. tile fetch",
        )
        # a DIFFERENT overlapping viewport: tiles are resident, no Spark job
        t0 = time.perf_counter()
        served_pdf = eng.get_clusters_local(-112, 31, -92, 46, 6)
        _report(
            spark, timings, "serve_viewport_query",
            time.perf_counter() - t0,
            f"{len(served_pdf)} rows, resident tiles",
        )

        eng.build_serve_cache()
        eng.get_clusters_local(-110, 30, -90, 45, 6)  # warm
        t0 = time.perf_counter()
        hot = eng.get_clusters_local(-110, 30, -90, 45, 6)
        _report(
            spark, timings, "serve_viewport_hot",
            time.perf_counter() - t0, f"{len(hot)} rows",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def family_skew(spark, timings):
    """Adversarial skew: a dense city blob that lands in ONE supercell at
    zoom 0 — the worst-case task for the supercell-partitioned kernel.
    Bounded by the O(n) CSR r-grid kernel; this entry keeps the bound
    visible round-over-round."""
    from pyspark.sql import functions as F  # noqa: F401

    from clustopher_spark.operators.cluster import ClusterOptions, get_clusters

    n_hot = 200_000
    hot = spark.range(1, n_hot + 1).selectExpr(
        "id",
        "-100.0 + (id % 447) * 0.0005 as lng",
        "40.0 + ((id * 7) % 449) * 0.0005 as lat",
        "cast(id % 13 as double) as value",
    )
    best, n_rows = _best_of(
        lambda: get_clusters(
            hot, -180, -85, 180, 85, 0, ["value"],
            ClusterOptions(radius=100.0, min_points=2),
        ).count(),
        2,
    )
    _report(
        spark, timings, "skew_hot_supercell_200k", best,
        f"{n_rows} clusters from {n_hot} pts in one cell",
    )


def family_dbscan(spark, timings):
    """DBSCAN at the bench SF: iterative star-contraction CC over the
    eps-graph; rounds + driver-finisher edge count reported so the
    contraction claim stays visible."""
    from clustopher_spark.operators.dbscan import dbscan
    from clustopher_spark.queries.spatial import (
        _DBSCAN_EPS,
        _DBSCAN_MINPTS,
        dbscan_points_df,
    )

    dpts = dbscan_points_df(spark, SF_DIR).localCheckpoint(eager=True)
    n_dpts = dpts.count()
    cc_stats: dict = {}

    def run():
        return dbscan(
            dpts, eps=_DBSCAN_EPS, min_pts=_DBSCAN_MINPTS,
            x_col="ix", y_col="iy", cc_stats=cc_stats,
        ).count()

    best, n_db = _best_of(run, 2)  # best-of-2: this VM shows rare 5-10x stalls
    _report(
        spark, timings, "spatial_dbscan_sf", best,
        f"{n_db} of {n_dpts} pts labeled, {cc_stats.get('rounds', 0)} star"
        f" rounds, {cc_stats.get('driver_edges', 0)} finisher edges",
    )


def family_pyramid_1m(spark, timings):
    """The baseline-comparable 1M-point pyramid build (BASELINE.md '~30 s /
    1M points': full 17-level pyramid, zooms 0-16) plus the incremental-
    maintenance entries that reuse its output."""
    import gc

    from pyspark.sql import functions as F

    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.operators.zoom import update_zoom_levels
    from clustopher_spark.sources.generators import generate_test_points

    pts_1m = (
        generate_test_points(spark, 1_000_000, seed=7)
        .select("id", "lng", "lat", "value")
        .localCheckpoint(eager=True)
    )
    pts_1m.count()
    opts_1m = ClusterOptions(radius=100.0, min_points=2, max_zoom=16)
    eng_1m = Clustopher(pts_1m, ["value"], opts=opts_1m)
    best = None
    for i in range(2):  # best-of-2 (rare multi-x VM stalls)
        t0 = time.perf_counter()
        eng_1m.materialize()
        n_pyr = eng_1m._zoom_levels.count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        if i == 0:  # release rep-0's pyramid checkpoints
            eng_1m._zoom_levels = None
            gc.collect()
            spark._jvm.System.gc()
    _report(
        spark, timings, "pyramid_build_1m_points", best,
        f"{n_pyr} pyramid rows, zooms 0-16",
    )

    # incremental maintenance: append a 10k batch to the 1M pyramid via
    # the fused update (one shuffle + one Python boundary; exact-equal
    # to a full rebuild by test). This worldwide-uniform batch genuinely
    # dirties ~30% of the corpus, so the cost-based dispatch routes it
    # to the REBUILD plan — the entry therefore tracks dispatch +
    # rebuild cost; the city entry below tracks the pruned incremental.
    batch_1m = (
        generate_test_points(spark, 10_000, seed=99)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 2_000_000)
        .localCheckpoint(eager=True)
    )
    batch_1m.count()
    base_levels = eng_1m._zoom_levels.localCheckpoint(eager=True)
    base_levels.count()
    # the update entries read the checkpointed copy only — release the
    # build's own pyramid so they don't run under double storage
    eng_1m._zoom_levels = None
    gc.collect()
    spark._jvm.System.gc()

    def run_update(batch):
        upd = update_zoom_levels(base_levels, pts_1m, batch, ["value"], opts_1m)
        n = upd.count()
        # each run checkpoints an 8.4M-row output; release it before the
        # next rep or storage pressure distorts later entries
        del upd
        gc.collect()
        spark._jvm.System.gc()
        return n

    best, n_upd = _best_of(lambda: run_update(batch_1m), 2)
    _report(
        spark, timings, "incremental_update_1m_plus_10k", best,
        f"{n_upd} pyramid rows",
    )

    # the same update with a LOCALIZED batch (one metro-sized bbox) —
    # the realistic continuous-ingest shape; shows the dirty-supercell
    # pruning payoff directly.
    batch_city = (
        generate_test_points(spark, 10_000, west=-74.5, south=40.2,
                             east=-73.5, north=41.2, seed=101)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 3_000_000)
        .localCheckpoint(eager=True)
    )
    batch_city.count()
    best, n_city = _best_of(lambda: run_update(batch_city), 2)
    _report(
        spark, timings, "incremental_update_1m_city_10k", best,
        f"{n_city} pyramid rows",
    )

    # release the in-memory 1M pyramid checkpoints BEFORE the store
    # entry: it reads its levels from its own parquet, and holding
    # ~17M checkpointed rows alongside inflates its timing several-x
    del base_levels, batch_1m, eng_1m
    gc.collect()
    spark._jvm.System.gc()

    # the durable streaming form of the same update: a PyramidStore in
    # manifest mode applies the city batch AND publishes it durably —
    # dirty blocks only, untouched blocks shared with the previous
    # version via the manifest. Times the full ingest step a streaming
    # maintainer pays per micro-batch. Bootstrap is untimed setup.
    import shutil
    import tempfile

    from clustopher_spark.streaming.pyramid import PyramidStore

    tmp = tempfile.mkdtemp(prefix="clustopher_pstore_")
    try:
        store_root = f"{tmp}/pyramid_store"
        pstore = PyramidStore(
            spark, store_root, ["value"], opts_1m, publish="manifest"
        )
        pstore.bootstrap(pts_1m)
        t0 = time.perf_counter()
        pstore.apply_batch(batch_city, 0)
        dt = time.perf_counter() - t0
        man = json.load(open(pstore._manifest_path(2)))
        n_dirty = sum(1 for rel in man.values() if f"{os.sep}v2{os.sep}" in rel)
        _report(
            spark, timings, "pyramid_store_city_publish", dt,
            f"{n_dirty} of {len(man)} blocks rewritten",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def family_pyramid_10m(spark, timings):
    """The 10M-point full pyramid (round-2 verdict: the README/SCALE 10M
    claims were not committed bench entries). Isolated in its own JVM —
    its ~67M checkpointed rows were the main storage-pressure source that
    contaminated the r3 artifact."""
    import gc
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions
    from clustopher_spark.sources.generators import generate_test_points
    from clustopher_spark.streaming.pyramid import PyramidStore

    pts_10m = (
        generate_test_points(spark, 10_000_000, seed=11)
        .select("id", "lng", "lat", "value")
        .localCheckpoint(eager=True)
    )
    pts_10m.count()
    opts = ClusterOptions(radius=100.0, min_points=2, max_zoom=16)
    eng_10m = Clustopher(pts_10m, ["value"], opts=opts)
    best = None
    for i in range(2):  # best-of-2: single shots swing 58-112 s on this VM
        t0 = time.perf_counter()
        eng_10m.materialize()
        n_pyr10 = eng_10m._zoom_levels.count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        if i == 0:  # release rep-0's ~67M checkpointed rows
            eng_10m._zoom_levels = None
            gc.collect()
            spark._jvm.System.gc()
    _report(
        spark, timings, "pyramid_build_10m", best,
        f"{n_pyr10} pyramid rows, zooms 0-16",
    )

    # the O(dirty-blocks) claim at 10x: the same city-batch publish as the
    # 1M family's pyramid_store_city_publish — if the manifest fast path
    # really is corpus-size-independent, this entry stays ~flat vs the 1M
    # one rather than scaling 10x. Bootstrap (a second full build into the
    # store layout) is untimed setup; release the in-memory pyramid first
    # so the apply isn't measured under 67M rows of storage pressure.
    eng_10m._zoom_levels = None
    gc.collect()
    spark._jvm.System.gc()
    batch_city = (
        generate_test_points(spark, 10_000, west=-74.5, south=40.2,
                             east=-73.5, north=41.2, seed=103)
        .select("id", "lng", "lat", "value")
        .withColumn("id", F.col("id") + 20_000_000)
        .localCheckpoint(eager=True)
    )
    batch_city.count()
    tmp = tempfile.mkdtemp(prefix="clustopher_pstore10m_")
    try:
        pstore = PyramidStore(
            spark, f"{tmp}/pyramid_store", ["value"], opts, publish="manifest"
        )
        pstore.bootstrap(pts_10m)
        t0 = time.perf_counter()
        pstore.apply_batch(batch_city, 0)
        dt = time.perf_counter() - t0
        man = json.load(open(pstore._manifest_path(2)))
        n_dirty = sum(1 for rel in man.values() if f"{os.sep}v2{os.sep}" in rel)
        _report(
            spark, timings, "pyramid_store_city_publish_10m", dt,
            f"{n_dirty} of {len(man)} blocks rewritten,"
            f" path={pstore.last_apply_stats.get('publish_path')}",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def family_minhash_prod(spark, timings):
    """Production-path MinHash (xxhash64 base hash): the registry entry
    llm_minhash_candidates runs the PORTABLE (md5) pipeline so the DuckDB
    oracle can replay it; this entry times the deployment pipeline."""
    from clustopher_spark.functions.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    best, n_pairs = _best_of(
        lambda: minhash_dedup_pairs(docs, threshold=0.3, portable=False).count(), 3
    )
    _report(spark, timings, "llm_minhash_production_xxhash", best, f"{n_pairs} pairs")


def family_vector_index(spark, timings):
    """Persisted-index ANN query: the serving path (build once, query
    many). Index build is untimed setup; the entry times a 5-query top-k
    against the list-partitioned store — probed lists are partition-pruned
    scans, so this is the latency a vector-search service pays per request
    batch."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from clustopher_spark.sources.vector_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vroot = tempfile.mkdtemp(prefix="clustopher_vecidx_")
    try:
        vidx = IVFPQIndex(spark, f"{vroot}/idx", n_lists=16,
                          m_subvectors=8, n_codes=64)
        vidx.build(emb)
        vq = emb.filter(F.col("vec_id") < 5)
        best, n_hits = _best_of(
            lambda: vidx.topk(vq, k=5, n_probe=4, refine=4).count(), 3
        )
        _report(
            spark, timings, "vector_index_topk", best,
            f"{n_hits} rows, 4/16 lists probed",
        )
    finally:
        shutil.rmtree(vroot, ignore_errors=True)


def family_streaming(spark, timings):
    """Streaming drain: file source -> watermarked tumbling agg -> memory
    sink with trigger(availableNow) — the end-to-end micro-batch path
    (state store + watermark bookkeeping included)."""
    from clustopher_spark.streaming.windows import (
        run_available_now,
        stream_events,
        tumbling_counts_stream,
    )

    n_ev = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    t0 = time.perf_counter()
    q = run_available_now(
        tumbling_counts_stream(stream_events(spark, f"{SF_DIR}/events.parquet")),
        "bench_stream_tumbling",
        # state-partition sizing (a per-query deployment knob): one
        # availableNow batch over sf0.1 doesn't amortize 32 state stores
        shuffle_partitions=8,
    )
    dt = time.perf_counter() - t0
    n_out = spark.table("bench_stream_tumbling").count()
    q.stop()
    _report(
        spark, timings, "streaming_tumbling_drain", dt,
        f"{n_ev} events -> {n_out} windows, {n_ev / dt:,.0f} events/s",
    )


FAMILIES = {
    "registry": family_registry,
    "materialize_serve": family_materialize_serve,
    "skew": family_skew,
    "dbscan": family_dbscan,
    "pyramid_1m": family_pyramid_1m,
    "pyramid_10m": family_pyramid_10m,
    "minhash_prod": family_minhash_prod,
    "vector_index": family_vector_index,
    "streaming": family_streaming,
}

_WORKER_SENTINEL = "BENCH_FAMILY_RESULT "


def run_worker(family: str) -> None:
    spark = _get_worker_spark(f"clustopher-bench-{family}")
    n0, mb0 = _storage_telemetry(spark)
    print(f"# [{family}] start: pinned {n0} rdds / {mb0} MB", file=sys.stderr)
    timings: dict[str, float] = {}
    FAMILIES[family](spark, timings)
    print(_WORKER_SENTINEL + json.dumps(timings), flush=True)
    spark.stop()


def run_driver() -> None:
    timings: dict[str, float] = {}
    failures: list[str] = []
    for family in FAMILIES:
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--family", family],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            text=True,
            timeout=3600,
        )
        wall = time.perf_counter() - t0
        got = None
        for line in proc.stdout.splitlines():
            if line.startswith(_WORKER_SENTINEL):
                got = json.loads(line[len(_WORKER_SENTINEL):])
        if proc.returncode != 0 or got is None:
            failures.append(family)
            print(
                f"# FAMILY {family} FAILED rc={proc.returncode}", file=sys.stderr
            )
            continue
        timings.update(got)
        print(
            f"# [{family}] done: {round(sum(got.values()), 3)}s measured,"
            f" {round(wall, 1)}s wall (isolated JVM)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_label(SF_DIR),
            }
        )
    )
    if failures:
        sys.exit(1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=sorted(FAMILIES), default=None)
    args = ap.parse_args()
    if args.family:
        run_worker(args.family)
    else:
        run_driver()


if __name__ == "__main__":
    main()
