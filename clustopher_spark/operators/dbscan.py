"""Distributed DBSCAN (Ester et al. 1996) — density clustering beyond the
reference's greedy-radius operator (cluster/cluster.go:1266-1360 clusters
by greedy sweep; DBSCAN's core/border/noise semantics are the standard
density alternative a spatial analytics engine is expected to offer).

Spark-first decomposition — every step is a relational op, no Python
kernel at all:

1. ε-grid candidate pairs: bucket points into cells of edge ``eps``,
   explode the PROBE side to its 3x3 neighbor cells, hash-join on the
   cell key, filter exact squared distance. Never all-pairs: fan-out is
   9x one side, candidate count is bounded by per-cell density (the same
   J2 band-join shape as the greedy kernel's grid).
2. Core points: neighborhood degree (self included, per the paper's
   |N_eps(p)| >= minPts) via one groupBy on the pair list.
3. Clusters: connected components over CORE-CORE edges (the
   density-reachability graph restricted to cores) using the engine's
   label-propagation operator — O(cluster diameter) rounds, each one
   join + groupBy.
4. Border points: non-core with >= 1 core neighbor, assigned the MIN
   core-neighbor label (plain DBSCAN leaves border assignment
   order-dependent; min-label makes it deterministic so the DuckDB
   oracle can replay it exactly). Everything else is noise.

100 TB shape: two shuffles for candidates (cell key), one for degrees,
O(diameter) label rounds on the core-edge list (dense clusters are
shallow graphs), plus two bounded assignment joins. A pathological cell
(everything in one ε-cell) degrades to that cell's pairs only — cap
density upstream (sample or pre-aggregate) exactly as you would for any
self-join on a skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.functions.dedup import connected_components
from clustopher_spark.plans.lineage import truncate_lineage


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    cc_stats: dict | None = None,
) -> DataFrame:
    """Exact DBSCAN over planar coordinates.

    Returns one row per input point: ``(id, label, kind)`` where ``kind``
    is 'core' / 'border' / 'noise' and ``label`` is the cluster id (the
    minimum member id of the cluster's core set; NULL for noise).
    Deterministic under any partitioning: every step is set-algebraic and
    ties break by min.
    """
    eps2 = float(eps) * float(eps)
    p = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    cell = lambda c: F.floor(c / F.lit(float(eps)))  # noqa: E731
    base = p.select("id", "x", "y", cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy"))
    # Pin the join parallelism on the cell key BEFORE the probe fan-out:
    # the map-side input is small (ids + coords), so AQE would coalesce
    # the exchange to one or two partitions and the join OUTPUT — which
    # explodes quadratically inside dense cells — would run single-task
    # (measured: minutes instead of seconds at 150k points). An explicit
    # key repartition is honored by AQE and co-partitions both sides.
    parts = p.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(parts, "cx", "cy").localCheckpoint(eager=True)
    # Forward-only probing: instead of exploding every point to its full
    # 3x3 neighborhood and materializing ORDERED pairs (every pair twice
    # plus the self pair), each point probes only the same cell and the 4
    # "forward" neighbors (E, NE, N, NW). Every unordered cell pair has
    # exactly one forward direction, and same-cell pairs are ordered by
    # id — so each qualifying UNORDERED pair is generated exactly once.
    # Halves the dominant shuffle, join output, and checkpoint footprint
    # (49M -> 24.5M rows at sf0.1) with identical semantics: degree
    # counts stack both endpoints (+1 for self), border assignment
    # stacks both orientations.
    probe_cells = F.array(
        *[
            F.struct(
                (F.col("cx") + dx).alias("pcx"), (F.col("cy") + dy).alias("pcy")
            )
            for dx, dy in ((0, 0), (1, 0), (1, 1), (0, 1), (-1, 1))
        ]
    )
    probes = base.select(
        F.col("id").alias("idb"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("ocx"),
        F.col("cy").alias("ocy"),
        F.explode(probe_cells).alias("pc"),
    ).select(
        "idb", "xb", "yb", "ocx", "ocy",
        F.col("pc.pcx").alias("cx"), F.col("pc.pcy").alias("cy"),
    )
    probes = probes.repartition(parts, "cx", "cy")
    # unordered candidate pairs, each exactly once, self-pairs excluded
    cand = (
        base.join(probes, ["cx", "cy"])
        .filter(
            ((F.col("ocx") != F.col("cx")) | (F.col("ocy") != F.col("cy")))
            | (F.col("idb") > F.col("id"))
        )
        .filter(
            (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb"))
            + (F.col("y") - F.col("yb")) * (F.col("y") - F.col("yb"))
            <= F.lit(eps2)
        )
        .select("id", "idb")
    )
    cand = truncate_lineage(cand)  # consumed 3x below
    # Round-8 (guide §3.1): every join below pairs the 24M-row candidate
    # list (or its 49M-row stacked form) against an aggregate-sized core
    # table. Left to the planner those run as sort-merge joins — two full
    # shuffles + sorts of the pair list per join. When the POINT count
    # bounds the core side to a safe broadcast (2M rows = ~32 MB of
    # (id, cell) longs), build the small side once and broadcast it so
    # the pair list never crosses another exchange. Scale-adaptive: past
    # the gate (real-cluster corpus) the shuffled plan stands.
    n_points = base.count()  # metadata-cheap: base is checkpointed
    bcast = F.broadcast if n_points <= 2_000_000 else (lambda df: df)
    # |N_eps(p)| >= min_pts, self included (the paper counts p itself):
    # stack both endpoints of each unordered pair, +1 for self
    ends = cand.select("id").unionAll(cand.select(F.col("idb").alias("id")))
    deg = truncate_lineage(
        ends.groupBy("id").agg((F.count(F.lit(1)) + F.lit(1)).alias("n"))
    )  # one 49M-row aggregation, reused by core + singletons below
    # deg's ids ARE the distinct pair endpoints — reuse them instead of
    # a second 49M-row distinct over `ends`
    singletons = p.select("id").join(bcast(deg.select("id")), "id", "left_anti")
    core = deg.filter(F.col("n") >= min_pts).select("id")
    if min_pts <= 1:
        core = core.unionAll(singletons)

    # --- cell-contracted connected components -------------------------------
    # Dense data makes the core-core edge list quadratic in blob size (a
    # blob whose diameter <= eps is a clique), and label propagation then
    # re-joins millions of edges per round. Contract first: in a grid of
    # edge eps/sqrt(2) any two points in the SAME cell are <= eps apart,
    # so same-cell cores form a clique — one super-vertex, no edges
    # materialized. Cross-cell clique edges collapse to ONE edge per
    # (cellA, cellB) pair via distinct. Components of the contracted graph
    # are exactly the components of the full core-core graph (contraction
    # merges only cliques; an edge survives iff a qualifying pair exists),
    # and the label (min core id per component) is unchanged. This turns
    # the O(edges x rounds) propagation into rounds over cell-pair counts.
    import math

    s = float(eps) / math.sqrt(2.0)
    cell_code = (
        F.floor(F.col("x") / F.lit(s)).cast("long") * F.lit(1 << 32)
        + F.floor(F.col("y") / F.lit(s)).cast("long")
    )
    core_cells = truncate_lineage(
        base.join(bcast(core), "id", "left_semi").select(
            "id", cell_code.alias("cell")
        )
    )
    cell_edges = (
        cand.join(bcast(core_cells), "id")
        .join(
            bcast(
                core_cells.select(
                    F.col("id").alias("idb"), F.col("cell").alias("cell_b")
                )
            ),
            "idb",
        )
        .filter(F.col("cell") != F.col("cell_b"))
        .select(F.col("cell").alias("ca"), F.col("cell_b").alias("cb"))
        .distinct()
    )
    cells = core_cells.select(F.col("cell").alias("id")).distinct()
    comp = connected_components(
        cell_edges, vertices=cells, id_a="ca", id_b="cb", stats=cc_stats
    ).withColumnRenamed("id", "cell")
    labeled_cores = core_cells.join(bcast(comp), "cell")
    comp_label = labeled_cores.groupBy("group_id").agg(F.min("id").alias("label"))
    core_labels = truncate_lineage(
        labeled_cores.join(bcast(comp_label), "group_id").select("id", "label")
    )  # consumed by border + both assembly joins
    # border: non-core with >= 1 core neighbor, min core-neighbor label;
    # pairs are unordered, so stack both orientations before the lookup
    stacked = cand.unionAll(
        cand.select(F.col("idb").alias("id"), F.col("id").alias("idb"))
    )
    border = (
        stacked.join(bcast(core_cells.select("id")), "id", "left_anti")
        .join(
            bcast(core_labels.select(F.col("id").alias("idb"), "label")), "idb"
        )
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    out = (
        p.select("id")
        .join(
            bcast(
                core_labels.select("id", F.col("label").alias("core_label"))
            ),
            "id",
            "left",
        )
        .join(border.select("id", F.col("label").alias("border_label")), "id", "left")
        .select(
            "id",
            F.coalesce("core_label", "border_label").alias("label"),
            F.when(F.col("core_label").isNotNull(), "core")
            .when(F.col("border_label").isNotNull(), "border")
            .otherwise("noise")
            .alias("kind"),
        )
    )
    return out
