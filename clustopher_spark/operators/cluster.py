"""Greedy epsilon-radius agglomerative clustering, Spark-first.

Logical operator (reference semantics, cluster/cluster.go:1266-1360 and
1896-1996 — see SURVEY.md §4.4):

* work in projected tile space at the query zoom; radius ``r`` is in tile
  pixels (engine default 40, server default 100);
* greedy and seed-order dependent: the next unprocessed point ``p`` collects
  every unprocessed point within ``r`` (squared-Euclidean, ``<=``); if the
  group (seed included) has ``>= min_points`` members it becomes a cluster
  (id = seed id, members marked processed), otherwise ``p`` alone is emitted
  as a singleton and its neighbours stay available;
* cluster centroid = ``num_points``-weighted mean, count = sum of
  ``num_points`` — which makes the operator *closed*: its output (clusters
  with ``num_points > 1``) can be re-clustered at a coarser zoom, the basis
  of the zoom hierarchy.

Physical strategy (Spark): the reference fans the same kernel out over
goroutines with a shared mutex-guarded "processed" set
(cluster/cluster.go:1704-1893) — shared mutable state has no distributed
analog, so instead we make the parallelism *spatial*: points are hash-
partitioned by **super-cell** (a square of ``supercell_radii * r`` tile
pixels), and an Arrow-batched ``applyInPandas`` runs the exact sequential
greedy kernel per super-cell. Seed order is pinned to ascending ``id``
within a super-cell, so results are deterministic for a given partitioning
(unlike the reference, which is only invariant-stable across its own
strategies). Clusters never span super-cells — a boundary approximation of
the same order as the reference's own 3x3-vs-5x5 neighbor-cell heuristics
(cluster/cluster.go:1601-1616). The kernel emits only ``(id, cluster_id)``
assignments; centroids, metric sums, and frequency maps are ordinary
Catalyst group-bys over a join, so column pruning / partial aggregation /
AQE all apply.

Scale notes (100 TB): the only shuffle is the hash partition on
(supercell_x, supercell_y); the kernel is O(n) per super-cell via an
``r``-sized grid index (the reference's own C3 strategy); the assignment
join back to the full rows is an equi join on ``id`` that AQE will
broadcast when the viewport result is small.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clustopher_spark.plans.projection import (
    DEFAULT_EXTENT,
    DEFAULT_MAX_ZOOM,
    DEFAULT_MIN_POINTS,
    DEFAULT_RADIUS,
    project_bounds,
    project_cols,
    unproject_cols,
)

@dataclass(frozen=True)
class ClusterOptions:
    """Mirrors the reference's SuperclusterOptions (cluster/cluster.go:519-544)."""

    radius: float = DEFAULT_RADIUS
    extent: int = DEFAULT_EXTENT
    min_points: int = DEFAULT_MIN_POINTS
    min_zoom: int = 0
    max_zoom: int = DEFAULT_MAX_ZOOM
    # Super-cell edge length in radii. Bigger = fewer boundary effects,
    # less parallelism per viewport (at zoom z the world is 2^z*extent/
    # (radius*supercell_radii) super-cells wide — low zooms are the
    # parallelism-starved case, so keep this modest).
    supercell_radii: int = 16
    # At/below this zoom, get_clusters pre-clusters at (zoom + hier_step)
    # first: the whole world is a handful of super-cells at low zooms, which
    # would serialize the kernel onto one task over raw data. Closure under
    # num_points weighting makes the two-phase result a valid clustering
    # (the zoom-pyramid argument; mirrors the reference's zoom-based
    # strategy dispatch, cluster/cluster.go:2434-2465).
    hierarchical_zoom_threshold: int = 4
    hier_step: int = 4

    @property
    def supercell_size(self) -> float:
        return self.radius * self.supercell_radii


def prepare_points(points: DataFrame) -> DataFrame:
    """Ingest hygiene (S1 Load semantics): dedupe by id keeping the first
    row (the reference's MetricsStore overwrites re-inserted ids,
    cluster/cluster.go:317-364, tested at cluster_test.go:303-345), drop
    rows with null id/coords, default ``num_points`` to 1."""
    cleaned = points.filter(
        F.col("id").isNotNull() & F.col("lng").isNotNull() & F.col("lat").isNotNull()
    ).dropDuplicates(["id"])
    if "num_points" not in cleaned.columns:
        cleaned = cleaned.withColumn("num_points", F.lit(1).cast("long"))
    return cleaned


def _greedy_assign(ids: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                   radius: float, min_points: int) -> np.ndarray:
    """Sequential greedy kernel over one super-cell.

    Candidate lookup uses an r-sized grid (3x3 neighborhood), the
    reference's C3 strategy (cluster/cluster.go:1487-1701), so total work
    is ~O(n * local_density) instead of O(n^2).
    """
    n = len(ids)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(ids, kind="stable")  # pinned deterministic seed order
    cx = np.floor(xs / radius).astype(np.int64)
    cy = np.floor(ys / radius).astype(np.int64)
    cx -= cx.min()
    cy -= cy.min()
    width = int(cx.max()) + 1
    height = int(cy.max()) + 1
    # CSR bucket index: cell id = cx*H + cy makes each 3-cell neighbor
    # COLUMN contiguous, so a 3x3 neighborhood is <= 3 slices, no dicts.
    cell = cx * height + cy
    csort = np.argsort(cell, kind="stable")
    cell_sorted = cell[csort]
    # Dense prefix array only when the grid is commensurate with the point
    # count; sparse data spanning a wide area (e.g. world-bounds points at
    # deep zoom) would otherwise allocate width*height ints for mostly
    # empty cells. The sparse path does two binary searches per column
    # probe instead — O(log n) against the occupied cells only.
    dense = width * height <= max(1 << 22, 4 * n)
    starts = (
        np.searchsorted(cell_sorted, np.arange(width * height + 1)) if dense else None
    )

    processed = np.zeros(n, dtype=bool)
    cluster_of = np.full(n, -1, dtype=np.int64)
    r2 = radius * radius

    for seed in order:
        if processed[seed]:
            continue
        sx, sy = xs[seed], ys[seed]
        scx, scy = cx[seed], cy[seed]
        y0 = scy - 1 if scy > 0 else 0
        y1 = scy + 1 if scy + 1 < height else height - 1
        chunks = []
        for x in (scx - 1, scx, scx + 1):
            if x < 0 or x >= width:
                continue
            if dense:
                s, e = starts[x * height + y0], starts[x * height + y1 + 1]
            else:
                s = np.searchsorted(cell_sorted, x * height + y0)
                e = np.searchsorted(cell_sorted, x * height + y1 + 1)
            if e > s:
                chunks.append(csort[s:e])
        cand = chunks[0] if len(chunks) == 1 else np.concatenate(chunks)
        cand = cand[~processed[cand]]
        dx = xs[cand] - sx
        dy = ys[cand] - sy
        members = cand[dx * dx + dy * dy <= r2]  # seed is in its own bucket
        if len(members) >= min_points:
            cluster_of[members] = ids[seed]
            processed[members] = True
        else:
            cluster_of[seed] = ids[seed]
            processed[seed] = True
    return cluster_of


def _assign_sorted(
    ids_s: np.ndarray,
    xs_s: np.ndarray,
    ys_s: np.ndarray,
    bounds: np.ndarray,
    radius: float,
    min_points: int,
) -> np.ndarray:
    """Greedy assignment over supercell-SORTED arrays (``bounds`` marks
    the segment boundaries, len = n_segments + 1): the native C kernel
    when available (operators/native.py — same algorithm, same IEEE
    arithmetic, bit-identical by test, ~10-70x faster per task), else
    the per-segment numpy reference loop. The single shared entry point
    for every kernel caller (distributed mapInPandas partitions and the
    driver-side pyramid tails), so both paths stay pinned to one
    behavior."""
    from clustopher_spark.operators import native

    out = native.assign_sorted_segments(
        ids_s, xs_s, ys_s, bounds, radius, min_points
    )
    if out is not None:
        return out
    out = np.empty(len(ids_s), dtype=np.int64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s == 1:
            out[s] = ids_s[s]
        else:
            out[s:e] = _greedy_assign(
                ids_s[s:e], xs_s[s:e], ys_s[s:e], radius, min_points
            )
    return out


def assign_clusters(
    points: DataFrame,
    zoom: int,
    opts: ClusterOptions = ClusterOptions(),
    parallelism: int | None = None,
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """(id, lng, lat[, num_points]) -> (id, cluster_id, px, py[, passthrough])
    at ``zoom``. ``cluster_id`` is the seed point's id; singletons get their
    own id.

    ``parallelism`` caps the kernel-stage partition count — pass a small
    number for small inputs (e.g. upper zoom-pyramid levels) to avoid
    paying 32-task scheduling overhead on 1000 rows.

    ``passthrough_cols`` ride through the kernel's Arrow batches untouched,
    letting downstream aggregations consume the kernel output directly
    instead of re-joining against the input (late materialization by join
    is only worth it for wide rows; metric columns are cheap to carry).
    """
    passthrough = list(passthrough_cols or [])
    if "num_points" in points.columns and "num_points" not in passthrough:
        passthrough.append("num_points")

    px, py = project_cols(F.col("lng"), F.col("lat"), zoom, opts.extent)
    proj = points.withColumn("px", px).withColumn("py", py)
    size = opts.supercell_size
    binned = proj.withColumn("scx", F.floor(F.col("px") / F.lit(size))).withColumn(
        "scy", F.floor(F.col("py") / F.lit(size))
    )

    radius, min_points = opts.radius, opts.min_points
    out_cols = ["id", "cluster_id", "px", "py", *passthrough]
    passthrough_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in binned.schema.fields
        if f.name in passthrough
    )
    schema = f"id long, cluster_id long, px double, py double{passthrough_schema}"

    def run_partition(batches):
        # One pandas pass per PARTITION, not per supercell: hash repartition
        # on (scx, scy) keeps every supercell whole within a partition, so
        # grouping inside pandas gives identical per-supercell kernel runs
        # while paying the Arrow/pandas boundary once per task instead of
        # once per group (measured 4x less overhead than
        # groupBy().applyInPandas with ~1k supercells). Memory bound =
        # one shuffle partition (sized by the explicit partition count),
        # same scale envelope as any shuffle consumer.
        frames = [b for b in batches]
        if not frames:
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        # Pure-numpy group pipeline: lexsort the partition by supercell,
        # slice group boundaries, run the kernel per slice, emit ONE output
        # frame. A pandas-groupby loop constructs a frame per group, which
        # at sparse zooms (millions of 1-5 point supercells) costs ~10x the
        # kernel itself; slicing numpy views costs nothing. Supercells with
        # a single point shortcut to a singleton (the kernel would return
        # exactly that).
        ids = pdf["id"].to_numpy(np.int64)
        pxs = pdf["px"].to_numpy(np.float64)
        pys = pdf["py"].to_numpy(np.float64)
        scx = pdf["scx"].to_numpy(np.int64)
        scy = pdf["scy"].to_numpy(np.int64)
        order = np.lexsort((scy, scx))
        ids, pxs, pys = ids[order], pxs[order], pys[order]
        gx, gy = scx[order], scy[order]
        n = len(ids)
        bounds = np.flatnonzero(
            np.concatenate(([True], (gx[1:] != gx[:-1]) | (gy[1:] != gy[:-1])))
        )
        bounds = np.append(bounds, n)
        assigned = _assign_sorted(ids, pxs, pys, bounds, radius, min_points)
        out = pd.DataFrame({"id": ids, "cluster_id": assigned, "px": pxs, "py": pys})
        for col in passthrough:
            out[col] = pdf[col].to_numpy()[order]
        yield out[out_cols]

    narrow = binned.select("id", "px", "py", "scx", "scy", *passthrough)
    # Explicit numPartitions repartition on the supercell keys: co-locates
    # each supercell and pins kernel-stage parallelism. AQE byte-based
    # coalescing would under-parallelize the Python-CPU-bound stage
    # (observed: 150k points coalesced to 2 tasks), so the count is explicit.
    parts = parallelism or max(points.sparkSession.sparkContext.defaultParallelism, 8)
    narrow = narrow.repartition(parts, "scx", "scy")
    assign = narrow.mapInPandas(run_partition, schema=schema)
    return assign


def cluster_at_zoom(
    points: DataFrame,
    zoom: int,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
    parallelism: int | None = None,
) -> DataFrame:
    """Full cluster query at one zoom: assignments + A1/A2 aggregations.

    Input columns: ``id`` (unique long), ``lng``, ``lat``, optional
    ``num_points`` (defaults to 1; >1 means the row is itself a cluster,
    reference cluster/cluster.go:391-395), plus any metric columns.

    Output: ``cluster_id, lng, lat, point_count, num_members, is_cluster``
    + ``sum_<metric>`` per metric column. Weighted-centroid and count
    semantics per reference cluster/cluster.go:1896-1950.

    Single-pass plan: metric columns ride through the kernel's Arrow batch
    (pass-through columns), so the aggregation group-by consumes the kernel
    output directly — ONE shuffle total, no assignment re-join, and the
    plan stays linear when levels chain (no exponential lineage).
    """
    metric_cols = metric_cols or []
    if "num_points" not in points.columns:
        points = points.withColumn("num_points", F.lit(1).cast("long"))

    assigned = assign_clusters(
        points, zoom, opts, parallelism=parallelism, passthrough_cols=metric_cols
    )
    return aggregate_assignment(assigned, zoom, metric_cols, opts)


def aggregate_assignment(
    assigned: DataFrame,
    zoom: int,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
) -> DataFrame:
    """A1/A2 aggregation over a kernel assignment: ``(id, cluster_id, px,
    py, num_points[, metrics])`` -> one row per cluster with weighted
    centroid, counts and metric sums (reference cluster/cluster.go:1896-1950).

    Split out of :func:`cluster_at_zoom` so callers that also need the raw
    assignment (e.g. the engine's metadata paths, which join meta columns on
    ``id``) can run the kernel ONCE, cache the assignment, and derive both
    the cluster aggregate and the join from it instead of paying the
    kernel twice.
    """
    metric_cols = metric_cols or []
    w = F.col("num_points").cast("double")
    aggs: list[Column] = [
        (F.sum(F.col("px") * w) / F.sum(w)).alias("cpx"),
        (F.sum(F.col("py") * w) / F.sum(w)).alias("cpy"),
        F.sum("num_points").cast("long").alias("point_count"),
        F.count(F.lit(1)).alias("num_members"),
    ]
    for m in metric_cols:
        aggs.append(F.sum(F.col(m)).alias(f"sum_{m}"))
    grouped = assigned.groupBy("cluster_id").agg(*aggs)

    lng, lat = unproject_cols(F.col("cpx"), F.col("cpy"), zoom, opts.extent)
    out = grouped.select(
        "cluster_id",
        lng.alias("lng"),
        lat.alias("lat"),
        "point_count",
        "num_members",
        (F.col("num_members") > F.lit(1)).alias("is_cluster"),
        *[f"sum_{m}" for m in metric_cols],
    )
    return out


def filter_viewport(
    points: DataFrame,
    west: float,
    south: float,
    east: float,
    north: float,
    zoom: int,
    opts: ClusterOptions = ClusterOptions(),
) -> DataFrame:
    """Viewport bbox predicate (reference cluster/cluster.go:1046-1047).

    The reference tests in projected tile space; Mercator is monotonic in
    both axes, so the equivalent *geographic* predicate on the raw lng/lat
    columns is used instead — a plain comparison that pushes down to
    parquet row-group min/max stats (`PushedFilters` in the plan), which a
    filter on computed projection expressions never would. Latitudes past
    the Mercator clamp (+/-85.0511) project onto the world edge in the
    reference, so a bbox touching the edge keeps them too.
    """
    from clustopher_spark.plans.projection import MAX_LATITUDE

    pred = (F.col("lng") >= F.lit(west)) & (F.col("lng") <= F.lit(east))
    if south > -MAX_LATITUDE:
        pred = pred & (F.col("lat") >= F.lit(south))
    if north < MAX_LATITUDE:
        pred = pred & (F.col("lat") <= F.lit(north))
    return points.filter(pred)


def get_clusters(
    points: DataFrame,
    west: float,
    south: float,
    east: float,
    north: float,
    zoom: int,
    metric_cols: list[str] | None = None,
    opts: ClusterOptions = ClusterOptions(),
) -> DataFrame:
    """The reference's hot query, ``GetClusters(bounds, zoom)``
    (cluster/cluster.go:867-956): bbox filter -> greedy cluster -> aggregate
    -> unproject. Low zooms run two-phase (fine zoom first, distributed;
    then the small output at the target zoom) to avoid the one-super-cell
    skew — see ClusterOptions.hierarchical_zoom_threshold.
    """
    zoom = min(zoom, opts.max_zoom)
    visible = filter_viewport(points, west, south, east, north, zoom, opts)
    if zoom <= opts.hierarchical_zoom_threshold and zoom + opts.hier_step <= opts.max_zoom:
        fine = cluster_at_zoom(
            visible, zoom + opts.hier_step, metric_cols=metric_cols, opts=opts
        ).localCheckpoint(eager=True)
        n_fine = fine.count()
        fine_pts = fine.select(
            F.col("cluster_id").alias("id"),
            "lng",
            "lat",
            F.col("point_count").alias("num_points"),
            *[F.col(f"sum_{m}").alias(m) for m in (metric_cols or [])],
        )
        # The fine output is bounded by occupied r-cells at zoom+hier_step,
        # so it is usually tiny — finish the target level DRIVER-SIDE in
        # the same numpy kernel the pyramid tail uses (identical algebra,
        # pinned by the pyramid equivalence tests) instead of paying a
        # second full distributed pipeline (~1 s of fixed exchange +
        # Python-boundary latency for a frame of a few thousand rows; the
        # round-4 profile battery showed the z2 column paying exactly
        # that). Above the tail threshold, keep the distributed second
        # pass — the checkpoint already prevents downstream actions from
        # re-running the fine pass.
        if n_fine <= 100_000:
            from clustopher_spark.operators.zoom import _chain_levels_local

            spark = points.sparkSession
            pdf = fine_pts.toPandas()
            out = _chain_levels_local(pdf, [zoom], list(metric_cols or []), opts)
            metric_schema = "".join(f", sum_{m} double" for m in (metric_cols or []))
            schema = (
                "cluster_id long, lng double, lat double, point_count long,"
                f" num_members long, is_cluster boolean{metric_schema}"
            )
            return spark.createDataFrame(out.drop(columns=["zoom"]), schema=schema)
        visible = fine_pts
    return cluster_at_zoom(visible, zoom, metric_cols=metric_cols, opts=opts)


def sum_metric_maps(
    df: DataFrame, group_col: str = "cluster_id", map_col: str = "metrics"
) -> DataFrame:
    """Aggregate the open-ended metrics-map tail (§1.4 points schema):
    per-key SUM across group members, for metric keys too dynamic to pivot
    into columns. The reference creates metric columns on first insert and
    tolerates heterogeneous key sets per point (cluster/cluster.go:338-344,
    tested at cluster/cluster_test.go:360-401); here a key absent from a
    row simply contributes nothing.

    explode -> (group, key) partial-aggregated SUM -> map_from_entries.
    Two shuffles, both on keys that Catalyst partial-aggregates map-side;
    entries are sorted so output maps compare deterministically.
    """
    exploded = df.select(group_col, F.explode_outer(map_col).alias("k", "v"))
    per_key = (
        exploded.filter(F.col("k").isNotNull())
        .groupBy(group_col, "k")
        .agg(F.sum("v").alias("s"))
    )
    return per_key.groupBy(group_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("k", "s")))
        ).alias(map_col)
    )
