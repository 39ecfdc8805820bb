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

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.functions.dedup import connected_components
from clustopher_spark.plans.lineage import truncate_lineage

# Driver-size gate shared by the broadcast plan and the native pair
# kernel: below it every pair-derived intermediate (degrees, contracted
# cells, border candidates) is aggregate-sized by construction.
_DRIVER_GATE_POINTS = 2_000_000


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

    Round-8 (guide §1.2/§4): below the driver-size gate the candidate
    pair list — DBSCAN's only corpus-squared intermediate — is never
    materialized: a two-pass native kernel (operators/native_dbscan.py)
    derives the three aggregate-sized facts the algorithm actually needs
    (per-point degrees, distinct contracted-cell edges, border-candidate
    pairs) straight from the cell-grouped points, replacing the 24M-row
    checkpoint + 49M-row degree aggregation + three pair-list joins of
    the relational plan at sf0.1. Past the gate (or when the kernel is
    unavailable — no gcc, ``CLUSTOPHER_NATIVE=0``, or
    ``CLUSTOPHER_DBSCAN_KERNEL=0``) the relational plan below stands
    unchanged: at real-cluster scale the pair list must shuffle anyway,
    and that plan is the one you want at 100 TB.
    """
    eps2 = float(eps) * float(eps)
    p = points.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    n_points = None
    if (
        os.environ.get("CLUSTOPHER_DBSCAN_KERNEL", "1") != "0"
        and int(min_pts) <= 32
    ):
        from clustopher_spark.operators import native_dbscan

        # Kernel availability is probed on the DRIVER only. In local mode
        # (driver == executors) that is exact; on a real cluster the
        # deployment must guarantee executors can build/load the .so too
        # (gcc + writable tmp, the same contract as the greedy kernel) —
        # or set CLUSTOPHER_DBSCAN_KERNEL=0 / CLUSTOPHER_NATIVE=0 to pin
        # the relational plan. The 2M-point gate makes this moot at scale:
        # any corpus past it takes the SQL path regardless.
        if native_dbscan.load() is not None:
            # one narrow count against the (typically checkpointed)
            # input decides the path; the kernel path re-counts nothing
            # and the SQL path reuses this count for its broadcast gate
            n_points = p.count()
            if n_points <= _DRIVER_GATE_POINTS:
                return _dbscan_kernel(p, eps, eps2, min_pts, cc_stats)
    return _dbscan_sql(p, eps, eps2, min_pts, cc_stats, n_points=n_points)


def _dbscan_sql(
    p: DataFrame,
    eps: float,
    eps2: float,
    min_pts: int,
    cc_stats: dict | None,
    n_points: int | None = None,
) -> DataFrame:
    """The pure-relational plan (module docstring): ε-grid pair join,
    degree aggregation, cell-contracted connected components."""
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
    if n_points is None:  # not pre-counted by the dispatch gate
        n_points = base.count()  # metadata-cheap: base is checkpointed
    bcast = F.broadcast if n_points <= _DRIVER_GATE_POINTS else (lambda df: df)
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


def _dbscan_kernel(
    p: DataFrame,
    eps: float,
    eps2: float,
    min_pts: int,
    cc_stats: dict | None,
) -> DataFrame:
    """Native two-pass plan below the driver-size gate.

    Identical semantics to :func:`_dbscan_sql`, derived without ever
    materializing the candidate pair list (native_dbscan.py docstring):

    1. tag + explode each point to its forward probe cells (the exact
       join structure of the SQL plan), ONE hash shuffle on the cell
       key, localCheckpoint — ~6 rows per point instead of ~160 pair
       rows per point at the bench density;
    2. kernel pass 1 over the cell-grouped rows -> partial degree
       counts -> one aggregate-sized groupBy -> degrees on the driver
       (bounded by the gate, exactly like the SQL plan's broadcasts);
    3. kernel pass 2 with the global core set broadcast -> deduped
       contracted-cell edges + border candidates + core (id, cell)
       rows, all aggregate-sized by the capacity proofs;
    4. union-find over the contracted cells on the driver (the SQL
       plan's star-contraction CC already degenerates to its driver
       finisher here: rounds=0 at every committed bench run), then one
       final scan assembling (id, label, kind) via two broadcast joins.
    """
    import numpy as np
    import pandas as pd

    from clustopher_spark.operators import native_dbscan

    spark = p.sparkSession
    sc = spark.sparkContext
    parts = sc.defaultParallelism
    s = float(eps) / math.sqrt(2.0)

    cell = lambda c: F.floor(c / F.lit(float(eps)))  # noqa: E731
    base = p.select(
        "id", "x", "y", cell(F.col("x")).alias("cx"), cell(F.col("y")).alias("cy")
    )
    # forward-only probe copies (see _dbscan_sql): tag 1 = same cell
    # (pairs require probe id > base id), tag 2 = forward neighbor
    probe_structs = F.array(
        *[
            F.struct(
                (F.col("cx") + dx).alias("cx"),
                (F.col("cy") + dy).alias("cy"),
                F.lit(tag).cast("tinyint").alias("tag"),
            )
            for dx, dy, tag in (
                (0, 0, 1), (1, 0, 2), (1, 1, 2), (0, 1, 2), (-1, 1, 2)
            )
        ]
    )
    probes = base.select(
        "id", "x", "y", F.explode(probe_structs).alias("pc")
    ).select(
        "id", "x", "y",
        F.col("pc.cx").alias("cx"), F.col("pc.cy").alias("cy"),
        F.col("pc.tag").alias("tag"),
    )
    tagged = base.withColumn("tag", F.lit(0).cast("tinyint")).unionByName(probes)
    # one shuffle co-locates every cell's base rows and probe copies;
    # pinned parallelism for the same reason as the SQL plan's repartition
    tagged = tagged.repartition(parts, "cx", "cy").localCheckpoint(eager=True)

    def _sorted_partition(pdf):
        ids = pdf["id"].to_numpy(np.int64)
        xs = pdf["x"].to_numpy(np.float64)
        ys = pdf["y"].to_numpy(np.float64)
        tags = pdf["tag"].to_numpy(np.int8)
        cx = pdf["cx"].to_numpy(np.int64)
        cy = pdf["cy"].to_numpy(np.int64)
        order = np.lexsort((cy, cx))
        ids, xs, ys, tags = ids[order], xs[order], ys[order], tags[order]
        gx, gy = cx[order], cy[order]
        n = len(ids)
        bounds = np.flatnonzero(
            np.concatenate(([True], (gx[1:] != gx[:-1]) | (gy[1:] != gy[:-1])))
        )
        bounds = np.append(bounds, n)
        return ids, xs, ys, tags, bounds

    def pass1(batches):
        frames = [b for b in batches]
        if not frames:
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        ids, xs, ys, tags, bounds = _sorted_partition(pdf)
        cnt = native_dbscan.degrees(ids, xs, ys, tags, bounds, eps2)
        if cnt is None:  # gated at dispatch; cannot regress mid-query
            raise RuntimeError("dbscan native kernel unavailable on executor")
        mask = cnt > 0
        yield pd.DataFrame({"id": ids[mask], "c": cnt[mask]})

    deg_pdf = (
        tagged.mapInPandas(pass1, schema="id long, c long")
        .groupBy("id")
        .agg((F.sum("c") + F.lit(1)).alias("n"))
        .toPandas()
    )
    deg_ids = deg_pdf["id"].to_numpy(np.int64)
    deg_n = deg_pdf["n"].to_numpy(np.int64)
    core_ids = np.sort(deg_ids[deg_n >= int(min_pts)])
    bc_core = sc.broadcast(core_ids)

    def pass2(batches):
        frames = [b for b in batches]
        if not frames:
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        ids, xs, ys, tags, bounds = _sorted_partition(pdf)
        core = np.isin(ids, bc_core.value).astype(np.int8)
        out = native_dbscan.pass2(
            ids, xs, ys, tags, core, bounds, eps2, s, int(min_pts)
        )
        if out is None:
            raise RuntimeError("dbscan native kernel pass 2 failed on executor")
        edges, cands, ccells = out
        yield pd.DataFrame(
            {
                "t": np.concatenate(
                    [
                        np.zeros(len(edges), dtype=np.int8),
                        np.ones(len(cands), dtype=np.int8),
                        np.full(len(ccells), 2, dtype=np.int8),
                    ]
                ),
                "a": np.concatenate([edges[:, 0], cands[:, 0], ccells[:, 0]]),
                "b": np.concatenate([edges[:, 1], cands[:, 1], ccells[:, 1]]),
            }
        )

    facts = tagged.mapInPandas(pass2, schema="t tinyint, a long, b long").toPandas()
    t = facts["t"].to_numpy(np.int8)
    fa = facts["a"].to_numpy(np.int64)
    fb = facts["b"].to_numpy(np.int64)
    edges = np.unique(np.stack([fa[t == 0], fb[t == 0]], axis=1), axis=0)
    cand_nid, cand_cid = fa[t == 1], fb[t == 1]
    cc_ids, cc_cells = fa[t == 2], fb[t == 2]
    bc_core.destroy()

    # union-find over contracted cells (every core cell is a vertex; two
    # cores in one cell share it, exactly the SQL plan's contraction)
    parent: dict = {}

    def find(c):
        r = c
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(c, c) != c:
            parent[c], c = r, parent[c]
        return r

    for a, b in edges.tolist():
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    if cc_stats is not None:
        cc_stats["rounds"] = 0
        cc_stats["driver_edges"] = int(len(edges))

    # label = min core id per component
    roots = np.fromiter((find(c) for c in cc_cells.tolist()), dtype=np.int64,
                        count=len(cc_cells))
    comp_min: dict = {}
    for cid, r in zip(cc_ids.tolist(), roots.tolist()):
        m = comp_min.get(r)
        if m is None or cid < m:
            comp_min[r] = cid
    core_labels = np.fromiter(
        (comp_min[r] for r in roots.tolist()), dtype=np.int64, count=len(roots)
    )
    label_of_core = dict(zip(cc_ids.tolist(), core_labels.tolist()))

    # border: min core-neighbor label per noncore id
    border: dict = {}
    for nid, cid in zip(cand_nid.tolist(), cand_cid.tolist()):
        lab = label_of_core[cid]
        cur = border.get(nid)
        if cur is None or lab < cur:
            border[nid] = lab

    core_sdf = spark.createDataFrame(
        pd.DataFrame({"id": cc_ids, "core_label": core_labels}),
        schema="id long, core_label long",
    )
    if min_pts <= 1:
        # every point is core: paired points carry their component label,
        # singletons (no pair, isolated cell) are their own cluster
        return (
            p.join(F.broadcast(core_sdf), "id", "left")
            .select(
                "id",
                F.coalesce("core_label", F.col("id")).alias("label"),
                F.lit("core").alias("kind"),
            )
        )
    border_sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": np.fromiter(border.keys(), dtype=np.int64, count=len(border)),
                "border_label": np.fromiter(
                    border.values(), dtype=np.int64, count=len(border)
                ),
            }
        ),
        schema="id long, border_label long",
    )
    return (
        p.join(F.broadcast(core_sdf), "id", "left")
        .join(F.broadcast(border_sdf), "id", "left")
        .select(
            "id",
            F.coalesce("core_label", "border_label").alias("label"),
            F.when(F.col("core_label").isNotNull(), "core")
            .when(F.col("border_label").isNotNull(), "border")
            .otherwise("noise")
            .alias("kind"),
        )
    )
