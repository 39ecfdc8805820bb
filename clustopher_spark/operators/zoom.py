"""Zoom-hierarchy materialization (SURVEY.md §4.3.2).

The reference re-clusters the viewport on every query
(cluster/cluster.go:867-956). Supercluster-proper — and this engine —
precomputes one cluster set per zoom, bottom-up: level ``max_zoom``
clusters the raw points; each coarser level re-clusters the previous
level's output, which is sound because the greedy operator is *closed*
under ``num_points`` weighting (validated by the reference's nested-rollup
tests, cluster/cluster_test.go:75-105, 228-274).

At serve time a viewport query against the materialized table is a pure
scan + bbox filter — no clustering work — which is how we beat the
reference's <50 ms single-node latency at cluster scale: the per-zoom
table is written partitioned by zoom and sorted by (scx, scy) so parquet
row-group min/max stats prune to the viewport.

The driver loop is 17 sequential Spark jobs (z=16..0); each level's input
is the previous level's (small, cached) output, so total work is a
geometric series dominated by the z=16 pass over raw points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import (
    ClusterOptions,
    _assign_sorted,
    cluster_at_zoom,
)
from clustopher_spark.plans.lineage import materialize_df
from clustopher_spark.plans.projection import project_np, unproject_np


def _cluster_level_local(
    pdf: pd.DataFrame, zoom: int, metric_cols: list[str], opts: ClusterOptions
) -> pd.DataFrame:
    """One zoom level of the pyramid computed driver-side in numpy — the
    same greedy kernel + A1/A2 algebra as the distributed path (pinned
    against it by tests). Input/output frames use the zoom_levels schema
    minus the zoom column, with `id`/`num_points`/metric names on input.

    Round-8 optimization (guide §1.2 step 2, per-task work; results
    bit-identical, pinned by the fused-vs-level-at-a-time equivalence
    tests): the kernel runs through :func:`_assign_sorted` (native C
    when available), and the aggregation splits singleton clusters out
    of the pandas groupby — a singleton's aggregate is its own row
    (sum of one element is the element; the centroid still pays the
    (px*w)/w double-rounding so floats match the groupby path
    bit-for-bit), and at sparse zooms singletons are >95% of rows, so
    the groupby shrinks from O(level) to O(rows-in-multi-clusters)."""
    n = len(pdf)
    if n == 0:
        return _empty_level_frame(metric_cols)
    px, py = project_np(pdf["lng"].to_numpy(), pdf["lat"].to_numpy(), zoom, opts.extent)
    ids_all = pdf["id"].to_numpy(np.int64)
    # Partition by supercell exactly like the distributed kernel stage —
    # clusters must never span supercells on EITHER path, or the local
    # tail would merge boundary groups the distributed path keeps apart
    # and the two paths would disagree (caught by the incremental-update
    # equivalence test).
    size = opts.supercell_size
    gx = np.floor(px / size).astype(np.int64)
    gy = np.floor(py / size).astype(np.int64)
    order = np.lexsort((gy, gx))
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    sgx, sgy = gx[order], gy[order]
    bounds = np.flatnonzero(
        np.concatenate(([True], (sgx[1:] != sgx[:-1]) | (sgy[1:] != sgy[:-1])))
    )
    bounds = np.append(bounds, len(order))
    assigned_sorted = _assign_sorted(
        ids_all[order], px[order], py[order], bounds, opts.radius, opts.min_points
    )
    assigned = assigned_sorted[inv]
    w = pdf["num_points"].to_numpy(np.float64)
    npts = pdf["num_points"].to_numpy(np.int64)
    wx = px * w
    wy = py * w
    mvals = {m: pdf[m].to_numpy(np.float64) for m in metric_cols}

    # group spans over assignment sorted by cluster_id (stable: original
    # row order within each group is preserved, so the pandas sums below
    # accumulate in the same order as the old whole-frame groupby)
    sort_idx = np.argsort(assigned, kind="stable")
    cid_sorted = assigned[sort_idx]
    starts = np.flatnonzero(np.concatenate(([True], cid_sorted[1:] != cid_sorted[:-1])))
    sizes = np.diff(np.append(starts, n))
    gidx = np.zeros(n, dtype=np.int64)
    gidx[starts[1:]] = 1
    gidx = np.cumsum(gidx)
    single_sorted = sizes[gidx] == 1

    frames: list[pd.DataFrame] = []
    single_rows = sort_idx[single_sorted]
    if len(single_rows):
        sw = w[single_rows]
        lng1, lat1 = unproject_np(
            wx[single_rows] / sw, wy[single_rows] / sw, zoom, opts.extent
        )
        d1 = pd.DataFrame(
            {
                "cluster_id": assigned[single_rows],
                "lng": lng1,
                "lat": lat1,
                "point_count": npts[single_rows],
                "num_members": np.ones(len(single_rows), dtype=np.int64),
                "is_cluster": np.zeros(len(single_rows), dtype=bool),
            }
        )
        for m in metric_cols:
            d1[f"sum_{m}"] = mvals[m][single_rows]
        frames.append(d1)
    multi_rows = sort_idx[~single_sorted]
    if len(multi_rows):
        df = pd.DataFrame(
            {
                "cluster_id": assigned[multi_rows],
                "wx": wx[multi_rows],
                "wy": wy[multi_rows],
                "w": w[multi_rows],
                "num_points": npts[multi_rows],
            }
        )
        for m in metric_cols:
            df[m] = mvals[m][multi_rows]
        g = df.groupby("cluster_id", sort=True)
        agg = g.agg(
            wx=("wx", "sum"), wy=("wy", "sum"), w=("w", "sum"),
            point_count=("num_points", "sum"), num_members=("num_points", "size"),
            **{f"sum_{m}": (m, "sum") for m in metric_cols},
        ).reset_index()
        lng2, lat2 = unproject_np(
            (agg["wx"] / agg["w"]).to_numpy(), (agg["wy"] / agg["w"]).to_numpy(),
            zoom, opts.extent,
        )
        d2 = pd.DataFrame(
            {
                "cluster_id": agg["cluster_id"],
                "lng": lng2,
                "lat": lat2,
                "point_count": agg["point_count"].astype(np.int64),
                "num_members": agg["num_members"].astype(np.int64),
                "is_cluster": agg["num_members"] > 1,
            }
        )
        for m in metric_cols:
            d2[f"sum_{m}"] = agg[f"sum_{m}"]
        frames.append(d2)
    out = (
        frames[0]
        if len(frames) == 1
        else pd.concat(frames, ignore_index=True).sort_values(
            "cluster_id", kind="stable", ignore_index=True
        )
    )
    return out


def levels_schema_ddl(metric_cols: list[str]) -> str:
    """The zoom_levels DDL (column order = the written/kernel order) —
    the single definition shared by the fused build, the fused update,
    the driver tail, and the store's empty-levels frame."""
    metric_schema = "".join(f", sum_{m} double" for m in metric_cols)
    return (
        "cluster_id long, lng double, lat double, point_count long,"
        f" num_members long, is_cluster boolean{metric_schema}, zoom int"
    )


def _empty_level_frame(metric_cols: list[str]) -> pd.DataFrame:
    """An empty frame with the level-output schema/dtypes — the single
    definition shared by every per-level pandas path (fused kernel,
    incremental tail), so a schema change has one place to land."""
    return pd.DataFrame(
        {c: pd.Series(dtype=t) for c, t in (
            ("cluster_id", "int64"), ("lng", "float64"), ("lat", "float64"),
            ("point_count", "int64"), ("num_members", "int64"),
            ("is_cluster", "bool"),
            *[(f"sum_{m}", "float64") for m in metric_cols],
        )}
    )


def _level_as_points(pdf: pd.DataFrame, metric_cols: list[str]) -> pd.DataFrame:
    """Level-output rows back to kernel-input point form (the closure
    step every chained level takes) — shared rename, one behavior."""
    d = pdf.rename(
        columns={"cluster_id": "id", "point_count": "num_points",
                 **{f"sum_{m}": m for m in metric_cols}}
    )
    return d[["id", "lng", "lat", "num_points", *metric_cols]]


def _chain_levels_local(
    pdf: pd.DataFrame, zooms: list[int], metric_cols: list[str], opts: ClusterOptions
) -> pd.DataFrame:
    """Run a descending chain of pyramid levels over one frame in numpy,
    feeding each level's clusters into the next (the closure property the
    whole pyramid rests on). Shared by the driver-side tail and the fused
    distributed pass — one implementation, one behavior."""
    frames = []
    for z in zooms:
        out = _cluster_level_local(pdf, z, metric_cols, opts)
        frames.append(out.assign(zoom=z))
        pdf = _level_as_points(out, metric_cols)
    return pd.concat(frames, ignore_index=True)


# Maintenance batches up to this size have their dirty-cell code set
# derived driver-side from one bounded collect (cells + bbox in a single
# tiny job, shipped back as a local-relation broadcast); larger batches
# build it JVM-side. 200k rows x 32 B ≈ 6 MB on the driver — the same
# bounded-parameter envelope as the other justified collects in this
# package. Module-level so tests can force the JVM path.
_DRIVER_DIRTY_LIMIT = 200_000

# Past this batch size the dirty set stops being broadcastable and the
# update dispatches to a rebuild (see fused_update_pass). Module-level so
# tests can exercise the oversize branch without 2M-row fixtures.
_PRUNE_LIMIT = 2_000_000


def _fuse_cut(opts: ClusterOptions, parts: int) -> int:
    """Coarsest zoom whose supercell grid still offers >= 4x ``parts``
    cells — the fused pass partitions on that grid, so this keeps the
    single kernel stage at full parallelism."""
    z = opts.min_zoom
    while (
        z < opts.max_zoom
        and (2**z * opts.extent / opts.supercell_size) ** 2 < 4 * parts
    ):
        z += 1
    return z


def fused_zoom_pass(
    points: DataFrame,
    zooms: list[int],
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
    parallelism: int | None = None,
) -> DataFrame:
    """All levels in ``zooms`` (descending, contiguous) in ONE shuffle and
    ONE Python boundary.

    Partition by the supercell grid of the COARSEST chained level:
    projected coords halve per zoom step (px_{z-1} = px_z / 2), so a
    supercell at z-1 is exactly a union of supercells at z — every finer
    level's cells are whole inside a partition, and the per-level kernel
    runs are identical to the level-at-a-time plan (pinned by test). The
    level-at-a-time build shuffles + Arrow-transfers the (barely shrinking)
    point set once per sparse zoom; this pass pays both costs once total,
    and the in-kernel chain shrinks the frame as levels merge.

    Scale note: a partition holds every chained level's rows for its cells,
    so the memory envelope is input_rows/parts x chain depth — at 100 TB
    size ``parts`` accordingly. Known skew caveat: one dense metro area in
    a single coarse cell serializes onto one task; pass ``fuse=False`` to
    ``materialize_zoom_levels`` (level-at-a-time + hierarchical pre-pass)
    when the data is pathologically concentrated.
    """
    from clustopher_spark.plans.projection import project_cols

    metric_cols = metric_cols or []
    spark = points.sparkSession
    z_lo = zooms[-1]
    px, py = project_cols(F.col("lng"), F.col("lat"), z_lo, opts.extent)
    size = opts.supercell_size
    src = points
    if "num_points" not in src.columns:
        src = src.withColumn("num_points", F.lit(1).cast("long"))
    binned = (
        src.select("id", "lng", "lat", "num_points", *metric_cols)
        .withColumn("scx", F.floor(px / F.lit(size)))
        .withColumn("scy", F.floor(py / F.lit(size)))
    )
    parts = parallelism or max(spark.sparkContext.defaultParallelism, 8)
    binned = binned.repartition(parts, "scx", "scy")
    schema = levels_schema_ddl(metric_cols)
    out_cols = [
        "cluster_id", "lng", "lat", "point_count", "num_members", "is_cluster",
        *[f"sum_{m}" for m in metric_cols], "zoom",
    ]
    chain, mcols, o = list(zooms), list(metric_cols), opts

    def run_partition(batches):
        frames = [b for b in batches]
        if not frames:
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        yield _chain_levels_local(pdf, chain, mcols, o)[out_cols]

    return binned.mapInPandas(run_partition, schema=schema)


def _tail_levels(
    current: DataFrame,
    n_rows: int | None,
    zooms_rest: list[int],
    metric_cols: list[str],
    opts: ClusterOptions,
    cache_levels: bool = True,
    local_tail_threshold: int = 100_000,
) -> list[DataFrame]:
    """Finish a pyramid from an intermediate ``current`` point set down the
    remaining ``zooms_rest`` (descending): one numpy pass on the driver once
    the level fits ``local_tail_threshold``, per-level distributed passes
    above it. Shared by the fused build and the fused incremental update so
    both finish levels identically (the equivalence tests depend on it)."""
    spark = current.sparkSession
    default_par = spark.sparkContext.defaultParallelism
    levels: list[DataFrame] = []
    for idx, zoom in enumerate(zooms_rest):
        if n_rows is not None and n_rows <= local_tail_threshold:
            pdf = current.toPandas()
            # explicit schema: pandas inference fails on an EMPTY frame
            # (a corpus whose deletions removed every point still needs
            # a valid — empty — pyramid), and an explicit DDL keeps the
            # dtypes identical to the distributed branch either way
            tail = spark.createDataFrame(
                _chain_levels_local(pdf, zooms_rest[idx:], metric_cols, opts),
                schema=levels_schema_ddl(metric_cols),
            )
            levels.append(tail)
            break
        par = None if n_rows is None else max(1, min(default_par, n_rows // 2000))
        clustered = cluster_at_zoom(
            current, zoom, metric_cols=metric_cols, opts=opts, parallelism=par
        )
        if cache_levels:
            clustered = clustered.localCheckpoint(eager=True)
            n_rows = clustered.count()
        levels.append(clustered.withColumn("zoom", F.lit(zoom)))
        current = clustered.select(
            F.col("cluster_id").alias("id"),
            "lng",
            "lat",
            F.col("point_count").alias("num_points"),
            *[F.col(f"sum_{m}").alias(m) for m in metric_cols],
        )
    return levels


def incremental_tail_local(
    coarse_old: pd.DataFrame,
    prev_new: pd.DataFrame,
    dirty_lng: np.ndarray,
    dirty_lat: np.ndarray,
    zooms_rest: list[int],
    metric_cols: list[str],
    opts: ClusterOptions,
) -> pd.DataFrame:
    """Maintain the coarse tail (zooms below the fused cut, descending in
    ``zooms_rest``) INCREMENTALLY on the driver — the O(batch) replacement
    for the tail rebuild, which is the fused update's one global
    dependency (it re-derives every tail level from the complete new
    z_cut level, a full scan of that level per update).

    Inputs: ``coarse_old`` — the previous version's tail rows (output form
    + zoom column; bounded by local_tail_threshold at build time);
    ``prev_new`` — the NEW ``zooms_rest[0] + 1`` level rows (output form,
    no zoom) covering EVERY (z+1)-child cell of every dirty cell at
    ``zooms_rest[0]``. Supplying that coverage is the caller's contract:
    the children sit within ±1 numpy cell of a batch cell in both axes,
    which in JVM block coordinates reaches x±1/y±3 (two independent
    ±1-cell floor ulps on top of the child offset) — BEYOND the
    y±2-dilated dirty-block set, which is why PyramidStore's fast path
    unions the dirty blocks' x±1/y±1 neighbor blocks into this input;
    ``dirty_lng``/``dirty_lat`` — the batch positions (adds + deletes).

    Why batch positions are a sufficient dirty frontier at EVERY level:
    a new cluster is a convex combination of members inside one dirty
    cell and a displaced row sits in its own (dirty) cell, so by
    induction every changed row at every level lies in a cell on some
    batch position's own cell-ancestry path — the same containment
    argument as fused_update_pass's per-level frontier, collapsed across
    levels. Marking an unchanged ancestry cell dirty is harmless: the
    greedy kernel is deterministic per cell, so reclustering it from
    identical inputs reproduces the old rows byte-for-byte (the
    equivalence invariant everything here is pinned to, by test).

    All codes here are numpy (same project_np as the kernel), so no
    JVM-vs-numpy ulp dilation is needed within this function."""
    out_cols = [
        "cluster_id", "lng", "lat", "point_count", "num_members",
        "is_cluster", *[f"sum_{m}" for m in metric_cols],
    ]
    size = opts.supercell_size

    def cell_codes(lng, lat, zoom):
        cpx, cpy = project_np(lng, lat, zoom, opts.extent)
        cx = np.floor(cpx / size).astype(np.int64)
        cy = np.floor(cpy / size).astype(np.int64)
        return (cx << 32) + cy

    frames = []
    prev = prev_new
    for z in zooms_rest:
        lz = coarse_old[coarse_old["zoom"] == z]
        dirty = np.unique(cell_codes(dirty_lng, dirty_lat, z))
        lz_mask = np.isin(
            cell_codes(lz["lng"].to_numpy(), lz["lat"].to_numpy(), z), dirty
        )
        pl = _level_as_points(prev, metric_cols)
        pl_mask = np.isin(
            cell_codes(pl["lng"].to_numpy(), pl["lat"].to_numpy(), z), dirty
        )
        recluster_in = pl[pl_mask].reset_index(drop=True)
        if len(recluster_in):
            new_out = _cluster_level_local(recluster_in, z, metric_cols, opts)
        else:
            new_out = _empty_level_frame(metric_cols)
        full_new = pd.concat(
            [lz[~lz_mask][out_cols], new_out[out_cols]], ignore_index=True
        )
        frames.append(full_new.assign(zoom=z))
        prev = full_new
    if not frames:
        return coarse_old.iloc[0:0]
    result = pd.concat(frames, ignore_index=True)
    result["cluster_id"] = result["cluster_id"].astype(np.int64)
    result["point_count"] = result["point_count"].astype(np.int64)
    result["num_members"] = result["num_members"].astype(np.int64)
    result["is_cluster"] = result["is_cluster"].astype(bool)
    result["zoom"] = result["zoom"].astype(np.int32)
    return result[out_cols + ["zoom"]]


def materialize_zoom_levels(
    points: DataFrame,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
    cache_levels: bool = True,
    local_tail_threshold: int = 100_000,
    fuse: bool = True,
) -> DataFrame:
    """Build the full ``zoom_levels`` table: one cluster set per zoom.

    Output: (zoom INT, cluster_id, lng, lat, point_count, num_members,
    is_cluster, sum_<metric>...).

    Levels shrink geometrically, so after the first couple of zooms the
    remaining pyramid fits on the driver: below ``local_tail_threshold``
    rows the tail levels run as one numpy pass (broadcast-threshold logic —
    ~1 s of fixed Spark job overhead per level is pure waste on 1k rows).
    At 100 TB the first levels dominate and they stay fully distributed.
    """
    metric_cols = metric_cols or []
    spark = points.sparkSession
    default_par = spark.sparkContext.defaultParallelism
    levels: list[DataFrame] = []
    current = points
    n_rows: int | None = None  # unknown for the raw input; known post-checkpoint
    zooms = list(range(opts.max_zoom, opts.min_zoom - 1, -1))
    start = 0
    if fuse and cache_levels and len(zooms) > 1:
        # Scale the fused pass's partition count with input size: the kernel
        # chain is O(rows) per task, so wall time is set by the FULLEST
        # task, and at 32 partitions a 10M-point build leaves cores idle
        # behind the skewed supercells (measured 1.8x slower than 64).
        # ~150k chained rows per task balances skew against per-task
        # overhead; clamped to [defaultParallelism, 4x] so small inputs
        # keep full-width tasks and huge ones don't explode the shuffle.
        # One count() on the input pays for itself immediately (the common
        # callers hand over a checkpointed/cached frame where it is free).
        n_input = points.count()
        parts = min(max(default_par, -(-n_input // 150_000)), 4 * default_par)
        z_cut = _fuse_cut(opts, parts)
        chain = [z for z in zooms if z >= z_cut]
        if len(chain) > 1:
            fused = fused_zoom_pass(points, chain, metric_cols, opts, parallelism=parts)
            # materialize once: the union, the z_cut re-read below, and any
            # downstream consumer all reuse the materialized pass. Parquet
            # spill, not localCheckpoint: the fused pyramid is the largest
            # frame in the system (~6.7x the input rows), and holding it as
            # per-row block-manager objects was the dominant GC/storage
            # pressure in every build-family JVM (plans/lineage.py note).
            fused = materialize_df(fused, label="pyramid_build")
            levels.append(fused)
            lowest = fused.filter(F.col("zoom") == z_cut)
            n_rows = lowest.count()
            current = lowest.select(
                F.col("cluster_id").alias("id"),
                "lng",
                "lat",
                F.col("point_count").alias("num_points"),
                *[F.col(f"sum_{m}").alias(m) for m in metric_cols],
            )
            start = len(chain)
    levels.extend(
        _tail_levels(
            current, n_rows, zooms[start:], metric_cols, opts,
            cache_levels=cache_levels, local_tail_threshold=local_tail_threshold,
        )
    )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def write_zoom_levels(zoom_levels: DataFrame, path: str, opts: ClusterOptions = ClusterOptions()) -> None:
    """Persist partitioned by zoom, spatially sorted within partitions.

    The (floor(lng), floor(lat)) sort key gives parquet row-group min/max
    stats that prune viewport bbox filters — the Spark-native replacement
    for the reference's KD-tree AABB pruning (cluster/cluster.go:1026-1029).

    An EMPTY pyramid (a corpus whose deletions removed every point) is
    written as a plain un-partitioned parquet: partitionBy of an empty
    frame emits no readable footer, and every later read would raise
    UNABLE_TO_INFER_SCHEMA — bricking a snapshot-mode store with no way
    to recover (the next apply_batch reads current_levels first).
    """
    if not zoom_levels.take(1):
        zoom_levels.write.mode("overwrite").parquet(path)
        return
    (
        zoom_levels.repartition("zoom")
        .sortWithinPartitions(F.floor("lng"), F.floor("lat"))
        .write.mode("overwrite")
        .partitionBy("zoom")
        .parquet(path)
    )


def query_zoom_levels(
    zoom_levels: DataFrame, west: float, south: float, east: float, north: float, zoom: int
) -> DataFrame:
    """Serve-time viewport query: partition-pruned scan + bbox filter."""
    return zoom_levels.filter(
        (F.col("zoom") == zoom)
        & (F.col("lng") >= west)
        & (F.col("lng") <= east)
        & (F.col("lat") >= south)
        & (F.col("lat") <= north)
    )


def _with_supercell(df: DataFrame, zoom: int, opts: ClusterOptions) -> DataFrame:
    """Tag rows with the supercell key cluster_at_zoom would assign them —
    identical projection + floor expressions, so incremental maintenance
    and full builds agree on cell membership."""
    from clustopher_spark.plans.projection import project_cols

    px, py = project_cols(F.col("lng"), F.col("lat"), zoom, opts.extent)
    size = opts.supercell_size
    return df.withColumn("scx", F.floor(px / F.lit(size))).withColumn(
        "scy", F.floor(py / F.lit(size))
    )


def _rebuild_corpus(
    points_old, points_new, points_deleted, metric_cols, opts,
    local_tail_threshold,
):
    """The dispatch target: a full rebuild of the accumulated corpus
    (old minus deleted, plus new) — identical to the incremental result
    by the equivalence invariant, pinned by test."""
    pts = points_old
    if points_deleted is not None:
        pts = pts.join(points_deleted.select("id"), "id", "left_anti")
    return materialize_zoom_levels(
        pts.unionByName(points_new.select(*pts.columns)),
        metric_cols,
        opts,
        local_tail_threshold=local_tail_threshold,
    )


def _est_fed_fraction(
    dirty_at, chain, z_cut, z_top, opts, n_total
):
    """Estimated fraction of the pyramid the kernel would have to feed:
    per chained level, dirty-cell count at the fed granularity over that
    grid's size, weighted by a grid-capped level-size bound (clusters per
    supercell <= supercell_radii^2 by the greedy min-separation).
    ``dirty_at`` maps tz -> dirty-cell count. Pure driver arithmetic."""
    grid_axis = 2**z_top * opts.extent / opts.supercell_size
    cap = float(opts.supercell_radii) ** 2
    est_fed = est_tot = 0.0
    for z in chain:
        tz = max(z - 1, z_cut)
        g_tz = max((grid_axis / 2 ** (z_top - tz)) ** 2, 1.0)
        g_z = max((grid_axis / 2 ** (z_top - z)) ** 2, 1.0)
        rows_z = min(float(n_total), g_z * cap)
        est_fed += min(dirty_at[tz] / g_tz, 1.0) * rows_z
        est_tot += rows_z
    return est_fed / max(est_tot, 1.0)


def fused_update_pass(
    levels_old: DataFrame,
    points_old: DataFrame,
    points_new: DataFrame,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
    parallelism: int | None = None,
    local_tail_threshold: int = 100_000,
    points_deleted: DataFrame | None = None,
    rebuild_fraction: float = 0.15,
    stats: dict | None = None,
    coarse_tail: bool = True,
    n_new: int | None = None,
    n_old: int | None = None,
) -> DataFrame:
    """Incremental pyramid maintenance in ONE shuffle + ONE Python boundary
    (the fused-build treatment applied to `update_zoom_levels`: measured
    70 s -> level-at-a-time vs ~rebuild-time fused at 1M+10k locally).

    Everything rides the z_cut supercell partitioning: old points, new
    points, and the old chain levels are unioned with a tag column and
    hash-partitioned by the COARSEST chained supercell (cluster centroids
    are convex combinations of members, members never span a supercell,
    and supercells nest — so a level row lands in exactly the coarse cell
    its members occupy, and per-partition dirty propagation is complete).
    Inside the kernel each level z replays the level-at-a-time algebra:
    cells touched by the dirty frontier are reclustered from the previous
    level's NEW rows (raw points at the deepest level), untouched rows of
    the old level pass through byte-identical, and the frontier for z-1 is
    the new clusters plus the displaced old rows. Below z_cut the coarse
    tail is REBUILT from the fused z_cut level — deterministic closure
    makes that exactly equal to incrementally maintaining it, and those
    levels are geometrically small.

    At 100 TB: one scan of old points + old levels + batch, one hash
    shuffle, kernel work O(partition rows); with parquet-partitioned
    levels the scan prunes to the batch's coarse cells (everything else
    passes through untouched), which is the regime where incremental
    beats rebuild.

    ``rebuild_fraction``: cost-based dispatch threshold — when the
    estimated fed fraction of the corpus reaches it (default 0.15, the
    measured breakeven at 1M+10k), the update is answered by a straight
    rebuild of the accumulated corpus instead (identical result, pinned
    by test); ``None`` disables the dispatch. ``stats``: optional dict
    the call fills with ``path`` ("incremental" | "rebuild") and
    ``est_fed_fraction`` for observability.

    ``n_new`` / ``n_old``: known row counts of ``points_new`` /
    ``points_old`` — they feed only partition sizing and the dispatch
    estimate's denominator, so a caller that already knows them (the
    pyramid store tracks its logs' footer counts) saves the two count
    jobs here; an UPPER bound on ``n_old`` is acceptable for the same
    reason (documented caller contract).

    ``coarse_tail=False`` skips the coarse-tail rebuild and returns only
    the chained levels (zoom >= the fused z_cut). The tail rebuild is the
    one GLOBAL dependency of the incremental pass — it re-derives every
    zoom < z_cut from the complete new z_cut level, i.e. a full scan of
    that level per update. Callers that maintain the tail themselves
    (PyramidStore's manifest fast path keeps it incrementally on the
    driver via :func:`incremental_tail_local`) turn it off so an append
    batch costs O(dirty blocks), not O(corpus). Ignored when the update
    dispatches to a rebuild — a rebuild always returns the full pyramid."""
    metric_cols = metric_cols or []
    spark = points_old.sparkSession
    if "num_points" not in points_old.columns:
        points_old = points_old.withColumn("num_points", F.lit(1).cast("long"))
    if "num_points" not in points_new.columns:
        points_new = points_new.withColumn("num_points", F.lit(1).cast("long"))
    zooms = list(range(opts.max_zoom, opts.min_zoom - 1, -1))
    default_par = spark.sparkContext.defaultParallelism
    n_batch = n_new if n_new is not None else points_new.count()
    n_total = (n_old if n_old is not None else points_old.count()) + n_batch
    parts = parallelism or min(
        max(default_par, -(-n_total // 150_000)), 4 * default_par
    )
    z_cut = _fuse_cut(opts, parts)
    chain = [z for z in zooms if z >= z_cut]
    if len(chain) < 2:
        if points_deleted is not None:
            # the level-at-a-time fallback has no deletion path; silently
            # forwarding without the deletions would return a pyramid that
            # still contains the deleted points (the exact opposite of the
            # right-to-be-forgotten contract)
            raise ValueError(
                "deletions are supported on the fused path only (fuse=True)"
            )
        return update_zoom_levels(
            levels_old, points_old, points_new, metric_cols, opts, fuse=False
        )

    def as_input(df, kind, zoom_col, id_col, np_col, nm_col, ic_col, m_cols):
        return df.select(
            F.lit(kind).alias("kind"),
            zoom_col.cast("int").alias("zoom"),
            F.col(id_col).cast("long").alias("id"),
            "lng",
            "lat",
            F.col(np_col).cast("long").alias("num_points"),
            nm_col.cast("long").alias("num_members"),
            ic_col.cast("boolean").alias("is_cluster"),
            *[m.alias(name) for name, m in m_cols],
        )

    # ---- dirty-cell pruning: only rows the batch can perturb ride the
    # shuffle + Python boundary; everything else is a broadcast anti-join
    # passthrough straight into the output union. ----
    # dirty(z) — the cells the kernel can alter at level z — is exactly
    # the set of cells at z containing a batch (or deleted) point: a new
    # cluster is a convex combination of members inside ONE dirty cell, a
    # displaced row sits in a dirty cell, and cells nest across zooms, so
    # dirtiness propagates coarse-ward strictly along each batch point's
    # own cell path. Hence:
    #   * an old point is kernel input iff its cell at chain[0] (the
    #     finest chained zoom) is dirty — it feeds that level's recluster;
    #   * a level-z row is kernel input iff its cell at max(z-1, z_cut)
    #     is dirty — it is displaced at z or feeds the recluster at z-1;
    #   * every other level row is byte-identical in the result.
    # At 100 TB this is the difference between "incremental" and "rebuild":
    # the shuffle carries O(batch)-sized data, the corpus is read once
    # through a broadcast hash anti-join (no exchange), and with the
    # levels table parquet-partitioned the scan itself prunes.
    # Every row's cell is projected ONCE, at z_top; the coarser codes
    # derive by exact integer halving (cells nest:
    # cx(z-k) = floor(cx(z_top) / 2^k), the floor-of-floor identity —
    # float division by a power of two is exact, so this is bit-equal to
    # reprojecting at each zoom but costs one trig evaluation per row and
    # no per-zoom CASE). The only cross-system comparison is against the
    # kernel's numpy codes, where JVM sin/log may differ by 1 ulp: the x
    # coordinate is exact (pure +,/,* IEEE ops on identical inputs), so
    # the set is dilated in y ONLY. The dilation is TWO cells per side:
    # the fed test compares the row's JVM code to the batch's JVM codes,
    # and EACH side independently carries a ±1-cell boundary error vs the
    # kernel's numpy codes (a position within 1 ulp of a cell edge can
    # floor either way), so the worst-case JVM-to-JVM offset of a
    # numpy-dirty row is ±2. Over-inclusion is harmless twice over: a
    # fed-but-clean row passes through inside the kernel via the same
    # vectorized mask, and is never fed to the greedy recluster.
    from clustopher_spark.plans.projection import project_cols

    z_top = chain[0]
    size = opts.supercell_size
    # a maintenance batch is small by contract — beyond this the dirty
    # set stops being broadcastable; past it the unpruned fused pass would
    # shuffle corpus + levels + batch — strictly MORE than the rebuild's
    # single corpus shuffle — so such batches dispatch straight to the
    # rebuild (identical result). The unpruned pass survives only for
    # callers that force the incremental algebra (rebuild_fraction=None).
    prune = n_batch <= _PRUNE_LIMIT
    if not prune and rebuild_fraction is not None:
        if stats is not None:
            stats["path"] = "rebuild"
        return _rebuild_corpus(
            points_old, points_new, points_deleted, metric_cols, opts,
            local_tail_threshold,
        )

    tpx, tpy = project_cols(F.col("lng"), F.col("lat"), z_top, opts.extent)
    cx_top = F.floor(tpx / F.lit(size)).cast("long")
    cy_top = F.floor(tpy / F.lit(size)).cast("long")

    lvl_all = levels_old.filter(F.col("zoom") >= z_cut)
    if prune:
        batch_pos = points_new.select("lng", "lat")
        if points_deleted is not None:
            batch_pos = batch_pos.unionByName(points_deleted.select("lng", "lat"))
        test_zooms = list(range(z_cut, z_top + 1))
        dirty_df = None
        ext = None
        if n_batch <= _DRIVER_DIRTY_LIMIT:
            # Common case (maintenance batches are small): ONE tiny job —
            # collect the JVM-projected top-level cell coords (so the
            # floor/trig is bit-identical to the scan side below) and
            # derive the per-zoom dilated code set in numpy on the driver,
            # shipping it back as a LOCAL relation. Replaces two Spark
            # jobs (a 3x-exploded distinct + checkpoint, and a min/max agg
            # for the bbox) with one bounded collect; the local relation
            # broadcasts without ever touching an executor. limit()+len
            # doubles as the size gate when deletions inflate the frame
            # past n_batch (no separate count job).
            bp = (
                batch_pos.select(
                    cx_top.alias("cx"), cy_top.alias("cy"),
                    tpx.alias("px"), tpy.alias("py"),
                )
                .limit(_DRIVER_DIRTY_LIMIT + 1)
                .toPandas()
            )
            if len(bp) <= _DRIVER_DIRTY_LIMIT:
                if len(bp):
                    bcx = bp["cx"].to_numpy(np.int64)
                    bcy = bp["cy"].to_numpy(np.int64)
                    # ---- cost-based dispatch (C6 pattern): when the batch
                    # dirties a large share of the corpus, the incremental
                    # pass degenerates — it shuffles the fed rows AND pays
                    # the complement scans. Measured at 1M+10k: ~3.5 s of
                    # fixed cost plus ~38 s per unit of fed fraction,
                    # against a flat ~9 s rebuild — breakeven ≈ 0.15,
                    # the default threshold (the worldwide-uniform batch
                    # estimates 0.27 and rebuilds: 15 s incremental vs
                    # 9 s rebuilt). The estimate is pure
                    # driver arithmetic over the collected batch cells:
                    # per chained level, dirty-cell count at the fed
                    # granularity over the grid size, weighted by a
                    # grid-capped level-size bound (clusters per supercell
                    # <= supercell_radii^2 by the greedy min-separation).
                    # Over-estimating on a concentrated corpus picks a
                    # rebuild that is merely not-faster — never wrong.
                    if rebuild_fraction is not None:
                        dirty_at = {
                            tz: len(np.unique(
                                ((bcx >> (z_top - tz)) << 32)
                                + (bcy >> (z_top - tz))
                            ))
                            for tz in set(max(z - 1, z_cut) for z in chain)
                        }
                        est = _est_fed_fraction(
                            dirty_at, chain, z_cut, z_top, opts, n_total
                        )
                        if stats is not None:
                            stats["est_fed_fraction"] = est
                        if est >= rebuild_fraction:
                            if stats is not None:
                                stats["path"] = "rebuild"
                            return _rebuild_corpus(
                                points_old, points_new, points_deleted,
                                metric_cols, opts, local_tail_threshold,
                            )
                    if stats is not None:
                        stats["path"] = "incremental"
                    frames = []
                    for tz in test_zooms:
                        k = z_top - tz
                        code = ((bcx >> k) << 32) + (bcy >> k)
                        codes = np.unique(
                            np.concatenate(
                                [code - 2, code - 1, code, code + 1, code + 2]
                            )
                        )
                        frames.append(
                            pd.DataFrame({"tz": np.int32(tz), "code": codes})
                        )
                    dirty_df = spark.createDataFrame(
                        pd.concat(frames, ignore_index=True),
                        schema="tz int, code long",
                    )
                    ext = (
                        float(bp["px"].min()), float(bp["px"].max()),
                        float(bp["py"].min()), float(bp["py"].max()),
                    )
                else:
                    dirty_df = spark.createDataFrame([], "tz int, code long")
                    ext = (None, None, None, None)
        if dirty_df is None:
            # huge batch: the same cost-based dispatch, estimated from ONE
            # small agg job over the batch (approx-distinct cell counts
            # per fed granularity — a few % of error is irrelevant to a
            # breakeven heuristic) instead of a driver collect
            if rebuild_fraction is not None:
                dist_aggs = []
                for tz in set(max(z - 1, z_cut) for z in chain):
                    p2 = float(2 ** (z_top - tz))
                    tz_code = F.shiftleft(
                        F.floor(cx_top / F.lit(p2)).cast("long"), 32
                    ) + F.floor(cy_top / F.lit(p2)).cast("long")
                    dist_aggs.append(
                        F.approx_count_distinct(tz_code).alias(f"d{tz}")
                    )
                drow = batch_pos.agg(*dist_aggs).first()
                dirty_at = {
                    tz: drow[f"d{tz}"]
                    for tz in set(max(z - 1, z_cut) for z in chain)
                }
                est = _est_fed_fraction(
                    dirty_at, chain, z_cut, z_top, opts, n_total
                )
                if stats is not None:
                    stats["est_fed_fraction"] = est
                if est >= rebuild_fraction:
                    if stats is not None:
                        stats["path"] = "rebuild"
                    return _rebuild_corpus(
                        points_old, points_new, points_deleted, metric_cols,
                        opts, local_tail_threshold,
                    )
                if stats is not None:
                    stats["path"] = "incremental"
            # build the code set JVM-side (no driver transfer),
            # checkpointed once so both broadcast-join consumers reuse one
            # materialization
            bcells = batch_pos.select(
                cx_top.alias("cx"), cy_top.alias("cy")
            ).select(
                F.explode(F.array(*[F.lit(z) for z in test_zooms])).alias("tz"),
                "cx", "cy",
            )
            bp2 = F.pow(F.lit(2.0), (F.lit(z_top) - F.col("tz")).cast("double"))
            bcode = F.shiftleft(
                F.floor(F.col("cx") / bp2).cast("long"), 32
            ) + F.floor(F.col("cy") / bp2).cast("long")
            dirty_df = (
                bcells.select(
                    "tz",
                    F.explode(
                        F.array(
                            bcode - F.lit(2), bcode - F.lit(1), bcode,
                            bcode + F.lit(1), bcode + F.lit(2),
                        )
                    ).alias("code"),
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            ext = batch_pos.select(tpx.alias("px"), tpy.alias("py")).agg(
                F.min("px"), F.max("px"), F.min("py"), F.max("py")
            ).first()

        # bbox pre-prune ahead of the projection scan: every fed row sits
        # in a dirty cell, dirty cells contain batch points, and the
        # coarsest chained cell (z_cut) bounds a cell's extent — so fed
        # rows lie inside the batch bbox expanded by two z_cut cells
        # (+dilation). For a localized batch this turns the 8.4M-row trig
        # scan into cheap double compares on all but the bbox slice; for a
        # worldwide batch the filter selects everything and costs nothing.
        if ext[0] is None:  # empty batch: nothing can be dirty
            bbox = F.lit(False)
        else:
            margin = 2.0 * size * (2 ** (z_top - z_cut))
            world_px = float(2**z_top * opts.extent)
            if (
                ext[0] - margin <= 0.0
                and ext[1] + margin >= world_px
                and ext[2] - margin <= 0.0
                and ext[3] + margin >= world_px
            ):
                # worldwide batch: the expanded bounds cover the whole
                # projected plane, so the predicate is a constant —
                # letting Catalyst fold it drops the filter from the fed
                # scan AND prunes the (empty) outside-bbox passthrough
                # branch below to nothing instead of an 8.4M-row no-op
                # scan per evaluation
                bbox = F.lit(True)
            else:
                blngs, blats = unproject_np(
                    np.array([ext[0] - margin, ext[1] + margin]),
                    np.array([ext[2] - margin, ext[3] + margin]),
                    z_top,
                    opts.extent,
                )
                bbox = (
                    (F.col("lng") >= float(min(blngs)))
                    & (F.col("lng") <= float(max(blngs)))
                    & (F.col("lat") >= float(min(blats)))
                    & (F.col("lat") <= float(max(blats)))
                )

        tz_col = F.greatest(F.col("zoom") - F.lit(1), F.lit(z_cut)).cast("int")
        lp2 = F.pow(F.lit(2.0), (F.lit(z_top) - tz_col).cast("double"))
        lcode = F.shiftleft(F.floor(cx_top / lp2).cast("long"), 32) + F.floor(
            cy_top / lp2
        ).cast("long")
        lvl_tagged = lvl_all.filter(bbox).withColumn("tz", tz_col).withColumn(
            "code", lcode
        )
        # fed rows flow straight into the kernel's input union (lazy — the
        # semi-join scan folds into the kernel job, no standalone
        # checkpoint/count jobs); the passthrough keeps EVERY non-fed row:
        # rows outside the expanded bbox can't be dirty and skip the
        # projection entirely, rows inside it anti-join the same dirty
        # set the semi side used, so fed/passthrough is an exact partition
        # of lvl_all whatever the bbox covers.
        lvl_fed = lvl_tagged.join(
            F.broadcast(dirty_df), ["tz", "code"], "left_semi"
        ).drop("tz", "code")
        lvl_passthrough = lvl_all.filter(~bbox).unionByName(
            lvl_tagged.join(
                F.broadcast(dirty_df), ["tz", "code"], "left_anti"
            ).drop("tz", "code")
        )

        pcode = F.shiftleft(cx_top, 32) + cy_top
        pts_old_fed = (
            points_old.filter(bbox)
            .withColumn("tz", F.lit(z_top)).withColumn("code", pcode)
            .join(F.broadcast(dirty_df), ["tz", "code"], "left_semi")
            .drop("tz", "code")
        )
    else:
        lvl_fed = lvl_all
        lvl_passthrough = None
        pts_old_fed = points_old

    pts_old_in = as_input(
        pts_old_fed, "po", F.lit(None), "id", "num_points",
        F.lit(1), F.lit(False), [(m, F.col(m).cast("double")) for m in metric_cols],
    )
    pts_new_in = as_input(
        points_new, "pn", F.lit(None), "id", "num_points",
        F.lit(1), F.lit(False), [(m, F.col(m).cast("double")) for m in metric_cols],
    )
    lvl_in = as_input(
        lvl_fed,
        "lvl", F.col("zoom"), "cluster_id", "point_count",
        F.col("num_members"), F.col("is_cluster"),
        [(m, F.col(f"sum_{m}").cast("double")) for m in metric_cols],
    )
    unioned = pts_old_in.unionByName(pts_new_in).unionByName(lvl_in)
    if points_deleted is not None:
        # deletions ride the same shuffle: a deleted point's (lng, lat)
        # lands in the partition holding its old copy, marks its cells
        # dirty at every level, and its id is excluded from the deepest
        # recluster input — the "right to be forgotten" path a training
        # corpus needs without rebuilding the pyramid
        del_in = as_input(
            points_deleted.withColumn("num_points", F.lit(0).cast("long")),
            "pd", F.lit(None), "id", "num_points", F.lit(0), F.lit(False),
            [(m, F.lit(0.0)) for m in metric_cols],
        )
        unioned = unioned.unionByName(del_in)
    px, py = project_cols(F.col("lng"), F.col("lat"), z_cut, opts.extent)
    size = opts.supercell_size
    binned = unioned.withColumn("scx", F.floor(px / F.lit(size))).withColumn(
        "scy", F.floor(py / F.lit(size))
    ).repartition(parts, "scx", "scy")

    out_schema = levels_schema_ddl(metric_cols)
    out_cols = [
        "cluster_id", "lng", "lat", "point_count", "num_members", "is_cluster",
        *[f"sum_{m}" for m in metric_cols], "zoom",
    ]
    chain_z, mcols, o = list(chain), list(metric_cols), opts

    def cell_codes(lng, lat, zoom):
        cpx, cpy = project_np(lng, lat, zoom, o.extent)
        cx = np.floor(cpx / o.supercell_size).astype(np.int64)
        cy = np.floor(cpy / o.supercell_size).astype(np.int64)
        return (cx << 32) + cy

    def run_partition(batches):
        frames = [b for b in batches]
        if not frames:
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        is_p = pdf["kind"] != "lvl"
        pts_old_p = pdf[(pdf["kind"] == "po")]
        pts_new_p = pdf[(pdf["kind"] == "pn")]
        pts_del_p = pdf[(pdf["kind"] == "pd")]
        if len(pts_del_p):
            del_ids = pts_del_p["id"].to_numpy(np.int64)
            pts_old_p = pts_old_p[
                ~np.isin(pts_old_p["id"].to_numpy(np.int64), del_ids)
            ]
        lvl_p = pdf[~is_p]
        points_cols = ["id", "lng", "lat", "num_points", *mcols]

        def to_points(level_out):
            # NEW-level rows back to kernel-input point form
            return _level_as_points(level_out, mcols)

        def to_output(level_rows):
            # old-level input rows to output form, values preserved
            d = level_rows.rename(
                columns={"id": "cluster_id", "num_points": "point_count",
                         **{m: f"sum_{m}" for m in mcols}}
            )
            return d[["cluster_id", "lng", "lat", "point_count",
                      "num_members", "is_cluster", *[f"sum_{m}" for m in mcols]]]

        out_frames = []
        dirty_lng = np.concatenate(
            [pts_new_p["lng"].to_numpy(), pts_del_p["lng"].to_numpy()]
        )
        dirty_lat = np.concatenate(
            [pts_new_p["lat"].to_numpy(), pts_del_p["lat"].to_numpy()]
        )
        prev_new = None  # previous level's FULL new rows, output form
        for z in chain_z:
            lz = lvl_p[lvl_p["zoom"] == z]
            # sorted-unique dirty codes: membership checks are vectorized
            # np.isin (C-side binary search), never a Python loop — the
            # passthrough side is the bulk of the partition and dominates
            # kernel time otherwise
            dirty = np.unique(cell_codes(dirty_lng, dirty_lat, z))
            lz_codes = cell_codes(lz["lng"].to_numpy(), lz["lat"].to_numpy(), z)
            lz_dirty_mask = np.isin(lz_codes, dirty)
            if prev_new is None:
                pcodes = cell_codes(
                    pts_old_p["lng"].to_numpy(), pts_old_p["lat"].to_numpy(), z
                )
                aff_mask = np.isin(pcodes, dirty)
                recluster_in = pd.concat(
                    [pts_old_p[aff_mask][points_cols], pts_new_p[points_cols]],
                    ignore_index=True,
                )
            else:
                pl = to_points(prev_new)
                plcodes = cell_codes(pl["lng"].to_numpy(), pl["lat"].to_numpy(), z)
                pl_mask = np.isin(plcodes, dirty)
                recluster_in = pl[pl_mask].reset_index(drop=True)
            if len(recluster_in):
                new_out = _cluster_level_local(recluster_in, z, mcols, o)
            else:
                new_out = _empty_level_frame(mcols)
            untouched = to_output(lz[~lz_dirty_mask])
            displaced = lz[lz_dirty_mask]
            full_new = pd.concat([untouched, new_out], ignore_index=True)
            out_frames.append(full_new.assign(zoom=z))
            dirty_lng = np.concatenate(
                [new_out["lng"].to_numpy(), displaced["lng"].to_numpy()]
            )
            dirty_lat = np.concatenate(
                [new_out["lat"].to_numpy(), displaced["lat"].to_numpy()]
            )
            prev_new = full_new
        result = pd.concat(out_frames, ignore_index=True)
        result["num_members"] = result["num_members"].astype(np.int64)
        result["point_count"] = result["point_count"].astype(np.int64)
        result["is_cluster"] = result["is_cluster"].astype(bool)
        yield result[out_cols]

    fused = materialize_df(
        binned.mapInPandas(run_partition, schema=out_schema),
        label="pyramid_update",
    )
    levels: list[DataFrame] = [fused]
    if not coarse_tail:
        out = fused
        if lvl_passthrough is not None:
            out = out.unionByName(lvl_passthrough.select(*out_cols))
        return out
    lowest = fused.filter(F.col("zoom") == z_cut)
    if lvl_passthrough is not None:
        # untouched level rows join the result Spark-side, values
        # preserved bit-for-bit; the z_cut slice also completes the input
        # of the coarse-tail rebuild below
        levels.append(lvl_passthrough.select(*out_cols))
        lowest = lowest.unionByName(
            lvl_passthrough.filter(F.col("zoom") == z_cut).select(*out_cols)
        )
        # local-vs-distributed tail decision only needs a bound, not the
        # exact count: each appended point adds at most one z_cut row and
        # merges/deletes only shrink the level, so old-count + batch is a
        # safe upper bound and skips re-running the anti-join here
        n_rows = (
            levels_old.filter(F.col("zoom") == z_cut).count() + n_batch
        )
    else:
        n_rows = lowest.count()
    current = lowest.select(
        F.col("cluster_id").alias("id"),
        "lng",
        "lat",
        F.col("point_count").alias("num_points"),
        *[F.col(f"sum_{m}").alias(m) for m in metric_cols],
    )
    # coarse tail: REBUILD from the fused z_cut level (deterministic
    # closure == incremental maintenance, and these levels are tiny)
    levels.extend(
        _tail_levels(
            current, n_rows, [z for z in zooms if z < z_cut], metric_cols, opts,
            local_tail_threshold=local_tail_threshold,
        )
    )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def update_zoom_levels(
    levels_old: DataFrame,
    points_old: DataFrame,
    points_new: DataFrame,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
    fuse: bool = True,
    points_deleted: DataFrame | None = None,
    rebuild_fraction: float | None = 0.15,
    stats: dict | None = None,
) -> DataFrame:
    """Incremental pyramid maintenance: append ``points_new`` and recluster
    ONLY the supercells they perturb, per zoom. Returns a zoom_levels table
    exactly equal to ``materialize_zoom_levels(points_old UNION points_new)``
    — supercells are independent and the kernel is deterministic per cell,
    so untouched cells keep identical clusters (the equivalence is pinned
    by test, not assumed).

    Change propagation: each level's perturbed-cell set is derived from the
    DIRTY positions of the previous level — both the newly produced
    clusters and the old clusters they displaced (a removal perturbs the
    coarser level even where nothing new lands; displaced rows invalidate
    cells but are never reclustering inputs). Work per level is
    O(|affected cells|), not O(|world|): at 100 TB an append batch touches
    batch-sized supercells and everything else is an anti-join passthrough
    of the existing level. The reference has no incremental path at all.

    Tradeoff (``fuse=False`` path): each level pays a fixed ~4 Spark jobs
    of scheduling plus a full-level checkpoint, so at toy scale a full
    in-memory rebuild is faster (measured 70 s vs 17 s at 1M+10k). The
    default ``fuse=True`` routes through :func:`fused_update_pass` — the
    same algebra in one shuffle + one Python boundary — which removes that
    overhead; this level-at-a-time form is kept as the reference
    implementation the fused path is equivalence-tested against.
    """
    metric_cols = metric_cols or []
    if points_deleted is not None and not fuse:
        raise ValueError(
            "deletions are supported on the fused path only (fuse=True)"
        )
    if fuse:
        return fused_update_pass(
            levels_old, points_old, points_new, metric_cols, opts,
            points_deleted=points_deleted,
            rebuild_fraction=rebuild_fraction, stats=stats,
        )
    if "num_points" not in points_old.columns:
        points_old = points_old.withColumn("num_points", F.lit(1).cast("long"))
    if "num_points" not in points_new.columns:
        points_new = points_new.withColumn("num_points", F.lit(1).cast("long"))

    in_cols = ["id", "lng", "lat", "num_points", *metric_cols]
    as_points = [
        F.col("cluster_id").alias("id"),
        "lng",
        "lat",
        F.col("point_count").alias("num_points"),
        *[F.col(f"sum_{m}").alias(m) for m in metric_cols],
    ]

    def cells_of(df, zoom):
        # eager checkpoint: the cell set is tiny (one row per perturbed
        # supercell) but consumed three times per level — without pinning
        # it, each consumer re-runs the previous level's kernel lineage
        # and the rebuild goes superlinear across levels
        return (
            _with_supercell(df, zoom, opts)
            .select("scx", "scy")
            .distinct()
            .localCheckpoint(eager=True)
        )

    zooms = list(range(opts.max_zoom, opts.min_zoom - 1, -1))
    out_levels: list[DataFrame] = []
    level_prev_new: DataFrame | None = None  # the (z+1) level after update
    dirty: DataFrame | None = None           # (lng, lat) rows that changed at z+1
    for zoom in zooms:
        if level_prev_new is None:
            # deepest level: recluster cells touched by the appended points
            delta_cells = cells_of(points_new.select(*in_cols), zoom)
            tagged_old = _with_supercell(points_old.select(*in_cols), zoom, opts)
            affected = tagged_old.join(
                delta_cells, ["scx", "scy"], "left_semi"
            ).select(*in_cols)
            recluster_in = affected.unionByName(points_new.select(*in_cols))
        else:
            delta_cells = cells_of(dirty, zoom)
            tagged = _with_supercell(
                level_prev_new.select(*as_points), zoom, opts
            )
            recluster_in = tagged.join(
                delta_cells, ["scx", "scy"], "left_semi"
            ).select(*in_cols)
        # affected cells are batch-sized: cap kernel parallelism so tiny
        # recluster sets don't pay 32-task scheduling per level; checkpoint
        # because both the level union and the dirty set consume it
        new_out = cluster_at_zoom(
            recluster_in, zoom, metric_cols=metric_cols, opts=opts, parallelism=8
        ).localCheckpoint(eager=True)

        old_level = levels_old.filter(F.col("zoom") == zoom).drop("zoom")
        old_tagged = _with_supercell(old_level, zoom, opts)
        untouched = old_tagged.join(
            delta_cells, ["scx", "scy"], "left_anti"
        ).drop("scx", "scy")
        removed = old_tagged.join(
            delta_cells, ["scx", "scy"], "left_semi"
        ).drop("scx", "scy")

        # one checkpoint per level: everything downstream (output union,
        # dirty set, next level's input) reads from it, keeping lineage
        # flat without extra eager jobs
        level_prev_new = untouched.unionByName(new_out).localCheckpoint(eager=True)
        out_levels.append(level_prev_new.withColumn("zoom", F.lit(zoom)))
        # dirty rows for the coarser level: produced clusters + displaced
        # old clusters (positions only — removals invalidate, never feed)
        dirty = new_out.select("lng", "lat").unionByName(
            removed.select("lng", "lat")
        )
    out = out_levels[0]
    for lv in out_levels[1:]:
        out = out.unionByName(lv)
    return out
