#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set spans the engine's surfaces: the flagship viewport
cluster query (reference hot path), zoom materialization (reference
"initial load+cluster"), a TPC-H-style join-agg, windows, dedup, ANN,
and streaming-shaped event windows.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the 10M-point pyramid entry holds ~67M checkpointed rows; headroom keeps
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
]


def main() -> None:
    from pyspark.sql import functions as F

    from clustopher_spark import get_spark
    from clustopher_spark.queries import QUERIES

    spark = get_spark(app_name="clustopher-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM/codegen startup and Python-worker pool spawn (the pandas
    # kernels fork one worker per core on first use) aren't billed to queries.
    # Aggregate real columns (count() alone reads only parquet footers) so the
    # OS page cache and codec paths are warm like a serving engine's would be.
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").agg(F.count(F.lit(1))).collect()
    import pandas as pd  # noqa: F401

    warm = spark.range(0, 1024, 1, 32).withColumn("g", F.col("id") % 32)
    warm.groupBy("g").applyInPandas(
        lambda pdf: pdf.head(1), schema="id long, g long"
    ).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        best, n = None, 0
        for _ in range(3):  # best-of-3: steady-state, damps scheduler/GC noise
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    # --- baseline-comparable numbers (BASELINE.md) ---
    # ingest+materialize (analog of "30 s per 1M points initial clustering"):
    # build the full zoom pyramid for the derived points, write to parquet.
    import shutil
    import tempfile

    from clustopher_spark.engine import Clustopher
    from clustopher_spark.operators.cluster import ClusterOptions, get_clusters
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
        timings["materialize_zoom_pyramid"] = round(time.perf_counter() - t0, 3)
        print(
            f"# materialize_zoom_pyramid: {timings['materialize_zoom_pyramid']}s"
            f" ({n_points} points, zooms 0-10)",
            file=sys.stderr,
        )

        # serve-time viewport query (analog of "<50 ms viewport"): the
        # actual serving surface (pandas rows out, as the HTTP layer ships
        # them) over the pre-split cached frames — bbox filter on ONE
        # cached partition, AQE off for the single-stage action.
        eng.cache_zoom_frames()  # pre-split per-zoom cached frames
        eng.get_clusters_local(-179, -80, 179, 80, 5)  # warm the code path
        t0 = time.perf_counter()
        served_pdf = eng.get_clusters_local(-110, 30, -90, 45, 6)
        n_served = len(served_pdf)
        timings["serve_viewport_query"] = round(time.perf_counter() - t0, 3)
        print(
            f"# serve_viewport_query: {timings['serve_viewport_query']}s ({n_served} rows)",
            file=sys.stderr,
        )

        # serving-tier hot path: coarse zooms held driver-side (the form the
        # HTTP layer actually serves; analog of the reference's in-memory
        # loaded dataset behind its <50 ms claim)
        eng.build_serve_cache()
        eng.get_clusters_local(-110, 30, -90, 45, 6)  # warm
        t0 = time.perf_counter()
        hot = eng.get_clusters_local(-110, 30, -90, 45, 6)
        timings["serve_viewport_hot"] = round(time.perf_counter() - t0, 4)
        print(
            f"# serve_viewport_hot: {timings['serve_viewport_hot']}s ({len(hot)} rows)",
            file=sys.stderr,
        )
        # adversarial skew: a dense city blob that lands in ONE supercell at
        # zoom 0 — the worst-case task for the supercell-partitioned kernel.
        # Bounded by the O(n) CSR r-grid kernel (~0.6 s / 1M points in a
        # single cell, measured single-threaded); this entry keeps the bound
        # visible round-over-round.
        n_hot = 200_000
        hot = spark.range(1, n_hot + 1).selectExpr(
            "id",
            "-100.0 + (id % 447) * 0.0005 as lng",
            "40.0 + ((id * 7) % 449) * 0.0005 as lat",
            "cast(id % 13 as double) as value",
        )
        t0 = time.perf_counter()
        hot_out = get_clusters(
            hot, -180, -85, 180, 85, 0, ["value"],
            ClusterOptions(radius=100.0, min_points=2),
        )
        n_hot_rows = hot_out.count()
        timings["skew_hot_supercell_200k"] = round(time.perf_counter() - t0, 3)
        print(
            f"# skew_hot_supercell_200k: {timings['skew_hot_supercell_200k']}s"
            f" ({n_hot_rows} clusters from {n_hot} pts in one cell)",
            file=sys.stderr,
        )

        # DBSCAN at sf0.1 (round-2 verdict: the label-propagation plan had
        # only been timed at sf0.001/0.01). Runs BEFORE the pyramid
        # entries: its 49M-pair candidate materialization deserves a
        # storage-quiet JVM, and the entry is new in round 3 so there is
        # no ordering to preserve. Rounds + driver-finisher edge count
        # reported so the contraction claim stays visible.
        from clustopher_spark.operators.dbscan import dbscan
        from clustopher_spark.queries.spatial import (
            _DBSCAN_EPS,
            _DBSCAN_MINPTS,
            dbscan_points_df,
        )

        dpts = dbscan_points_df(spark, SF_DIR).localCheckpoint(eager=True)
        n_dpts = dpts.count()
        cc_stats: dict = {}
        best = None
        for _ in range(2):  # best-of-2: this VM shows rare 5-10x stalls
            t0 = time.perf_counter()
            n_db = dbscan(
                dpts, eps=_DBSCAN_EPS, min_pts=_DBSCAN_MINPTS,
                x_col="ix", y_col="iy", cc_stats=cc_stats,
            ).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings["spatial_dbscan_sf"] = round(best, 3)
        print(
            f"# spatial_dbscan_sf: {timings['spatial_dbscan_sf']}s"
            f" ({n_db} of {n_dpts} pts labeled, {cc_stats.get('rounds', 0)}"
            f" star rounds, {cc_stats.get('driver_edges', 0)} finisher edges)",
            file=sys.stderr,
        )
        del dpts
        import gc

        gc.collect()
        spark._jvm.System.gc()

        # the baseline-comparable 1M-point pyramid build (BASELINE.md
        # "~30 s / 1M points"): full 17-level pyramid, zooms 0-16, same
        # config as the README's 27.4 s measurement (radius 100,
        # min_points 2; input materialized before the clock starts so the
        # timing covers clustering, not synthesis).
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
        timings["pyramid_build_1m_points"] = round(best, 3)
        print(
            f"# pyramid_build_1m_points: {timings['pyramid_build_1m_points']}s"
            f" ({n_pyr} pyramid rows, zooms 0-16)",
            file=sys.stderr,
        )

        # incremental maintenance: append a 10k batch to the 1M pyramid via
        # the fused update (one shuffle + one Python boundary; exact-equal
        # to a full rebuild by test). Round-over-round visibility for the
        # path a streaming ingest exercises continuously. This worldwide-
        # uniform batch genuinely dirties ~30% of the corpus, so the
        # cost-based dispatch (est fed fraction >= 0.15) routes it to the
        # REBUILD plan — the entry therefore tracks dispatch + rebuild
        # cost; the city entry below tracks the pruned incremental plan.
        from clustopher_spark.operators.zoom import update_zoom_levels

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
        best = None
        for _ in range(2):  # best-of-2 (rare multi-x VM stalls)
            t0 = time.perf_counter()
            upd = update_zoom_levels(
                base_levels, pts_1m, batch_1m, ["value"], opts_1m
            )
            n_upd = upd.count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            # each run checkpoints an 8.4M-row output; release it before
            # the next rep or storage pressure distorts later entries
            del upd
            gc.collect()
            spark._jvm.System.gc()
        timings["incremental_update_1m_plus_10k"] = round(best, 3)
        print(
            f"# incremental_update_1m_plus_10k: {timings['incremental_update_1m_plus_10k']}s"
            f" ({n_upd} pyramid rows)",
            file=sys.stderr,
        )

        # the same update with a LOCALIZED batch (one metro-sized bbox) —
        # the realistic continuous-ingest shape. The worldwide-uniform
        # batch above is the adversarial case (it genuinely dirties most
        # coarse supercells, so ~20% of the corpus must recluster under
        # exact greedy semantics); a localized batch prunes to near
        # nothing and shows the dirty-supercell pruning payoff directly.
        batch_city = (
            generate_test_points(spark, 10_000, west=-74.5, south=40.2,
                                 east=-73.5, north=41.2, seed=101)
            .select("id", "lng", "lat", "value")
            .withColumn("id", F.col("id") + 3_000_000)
            .localCheckpoint(eager=True)
        )
        batch_city.count()
        best = None
        for _ in range(2):  # best-of-2 (rare multi-x VM stalls)
            t0 = time.perf_counter()
            upd_city = update_zoom_levels(
                base_levels, pts_1m, batch_city, ["value"], opts_1m
            )
            n_city = upd_city.count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            del upd_city
            gc.collect()
            spark._jvm.System.gc()
        timings["incremental_update_1m_city_10k"] = round(best, 3)
        print(
            f"# incremental_update_1m_city_10k: "
            f"{timings['incremental_update_1m_city_10k']}s ({n_city} pyramid rows)",
            file=sys.stderr,
        )

        # release the in-memory 1M pyramid checkpoints BEFORE the store
        # entry: it reads its levels from its own parquet, and holding
        # ~17M checkpointed rows alongside inflates its timing several-x
        # (measured 104 s in-bench vs 15 s standalone)
        del base_levels, batch_1m, eng_1m
        gc.collect()
        spark._jvm.System.gc()

        # the durable streaming form of the same update: a PyramidStore in
        # manifest mode applies the city batch AND publishes it durably —
        # dirty blocks only, untouched blocks shared with the previous
        # version via the manifest. Times the full ingest step a streaming
        # maintainer pays per micro-batch: update compute + O(dirty-block)
        # parquet write + manifest/meta commit. Bootstrap (a full rebuild
        # + full write) is untimed setup.
        import json

        from clustopher_spark.streaming.pyramid import PyramidStore

        store_root = f"{tmp}/pyramid_store"
        pstore = PyramidStore(
            spark, store_root, ["value"], opts_1m, publish="manifest"
        )
        pstore.bootstrap(pts_1m)
        t0 = time.perf_counter()
        pstore.apply_batch(batch_city, 0)
        timings["pyramid_store_city_publish"] = round(
            time.perf_counter() - t0, 3
        )
        man = json.load(open(pstore._manifest_path(2)))
        n_dirty = sum(1 for rel in man.values() if f"{os.sep}v2{os.sep}" in rel)
        print(
            f"# pyramid_store_city_publish: "
            f"{timings['pyramid_store_city_publish']}s "
            f"({n_dirty} of {len(man)} blocks rewritten)",
            file=sys.stderr,
        )
        del pstore
        gc.collect()
        spark._jvm.System.gc()

        # release the remaining update inputs before the 10M build
        del batch_city, pts_1m
        gc.collect()
        spark._jvm.System.gc()

        # the 10M-point full pyramid (round-2 verdict: the README/SCALE
        # 10M claims were not committed bench entries, so regressions were
        # invisible). Same config as pyramid_build_1m_points.
        pts_10m = (
            generate_test_points(spark, 10_000_000, seed=11)
            .select("id", "lng", "lat", "value")
            .localCheckpoint(eager=True)
        )
        pts_10m.count()
        eng_10m = Clustopher(pts_10m, ["value"], opts=opts_1m)
        t0 = time.perf_counter()
        eng_10m.materialize()
        n_pyr10 = eng_10m._zoom_levels.count()
        timings["pyramid_build_10m"] = round(time.perf_counter() - t0, 3)
        print(
            f"# pyramid_build_10m: {timings['pyramid_build_10m']}s"
            f" ({n_pyr10} pyramid rows, zooms 0-16)",
            file=sys.stderr,
        )
        # release the 10M pyramid (~67M checkpointed rows) before the
        # remaining entries: holding it through them adds GC/storage
        # pressure that distorts their timings several-fold
        del eng_10m, pts_10m
        gc.collect()
        spark._jvm.System.gc()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # production-path MinHash (xxhash64 base hash): the registry entry
    # llm_minhash_candidates runs the PORTABLE (md5-based) pipeline so the
    # DuckDB oracle can replay it bit-for-bit; this entry times the pipeline
    # a deployment would actually run.
    from clustopher_spark.functions.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        n_pairs = minhash_dedup_pairs(docs, threshold=0.3, portable=False).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    timings["llm_minhash_production_xxhash"] = round(best, 3)
    print(
        f"# llm_minhash_production_xxhash: {best:.3f}s ({n_pairs} pairs)",
        file=sys.stderr,
    )

    # persisted-index ANN query: the serving path (build once, query
    # many). Index build is untimed setup; the entry times a 5-query
    # top-k against the list-partitioned store — probed lists are
    # partition-pruned scans, so this is the latency a vector-search
    # service pays per request batch.
    import shutil as _shutil
    import tempfile as _tempfile

    from clustopher_spark.sources.vector_index import IVFPQIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _vroot = _tempfile.mkdtemp(prefix="clustopher_vecidx_")
    try:
        vidx = IVFPQIndex(spark, f"{_vroot}/idx", n_lists=16,
                          m_subvectors=8, n_codes=64)
        vidx.build(emb)
        vq = emb.filter(F.col("vec_id") < 5)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            n_hits = vidx.topk(vq, k=5, n_probe=4, refine=4).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        timings["vector_index_topk"] = round(best, 3)
        print(
            f"# vector_index_topk: {best:.3f}s ({n_hits} rows, 4/16 lists probed)",
            file=sys.stderr,
        )
    finally:
        _shutil.rmtree(_vroot, ignore_errors=True)

    # streaming drain: file source -> watermarked tumbling agg -> memory
    # sink with trigger(availableNow) — the end-to-end micro-batch path
    # (state store + watermark bookkeeping included), reported so streaming
    # throughput is visible round-over-round alongside the batch numbers.
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
        # state-partition sizing (a per-query deployment knob, see
        # run_available_now): one availableNow batch over sf0.1 doesn't
        # amortize 32 state store instances
        shuffle_partitions=8,
    )
    dt = time.perf_counter() - t0
    n_out = spark.table("bench_stream_tumbling").count()
    q.stop()
    timings["streaming_tumbling_drain"] = round(dt, 3)
    print(
        f"# streaming_tumbling_drain: {dt:.3f}s ({n_ev} events -> {n_out} windows,"
        f" {n_ev / dt:,.0f} events/s)",
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
    spark.stop()


if __name__ == "__main__":
    main()
