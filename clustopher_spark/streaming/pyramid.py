"""Streaming maintenance of the EXACT zoom pyramid (foreachBatch).

:mod:`clustopher_spark.streaming.live_clusters` keeps approximate per-cell
aggregates for serve latency; this module keeps the real thing — the same
``zoom_levels`` table :func:`materialize_zoom_levels` builds — advanced
per micro-batch by the fused dirty-supercell update
(:func:`clustopher_spark.operators.zoom.fused_update_pass`), bit-equal to
a full rebuild of the accumulated corpus at every version (pinned by
test). Deletions ride the same stream via an optional ``op`` column
(``"add"`` | ``"delete"``), which is the streaming right-to-be-forgotten
path a training corpus needs. The reference has no streaming or
incremental surface at all (runner/runner.go loads static datasets).

Store layout — immutable version directories, the same isolation argument
as the catalog's snapshot versioning (sources/catalog.py:145-181):

    {root}/meta.json                 {"latest": N, "last_batch": B, ...}
    {root}/versions/v{N}/levels/     snapshot mode: full pyramid snapshot;
                                     manifest mode: this version's dirty
                                     blocks only (pk=... partition dirs)
    {root}/versions/v{N}/manifest.json  manifest mode: pk -> owning dir
    {root}/batches/bootstrap/        the initial corpus (if bootstrapped)
    {root}/batches/adds/b{B}/        per-batch point log
    {root}/batches/dels/b{B}/        per-batch deletion log

Replay safety: foreachBatch re-delivers a failed batch on restart. Every
per-batch artifact is written to a batch-id-addressed directory in
OVERWRITE mode (idempotent re-write), version directories are never
mutated, and ``meta.json`` repoints only after everything for the batch
has landed — so a crash anywhere mid-batch leaves version N intact and
the replay rebuilds N+1 from it; a replay of an already-committed
``batch_id <= last_batch`` is skipped outright (the heavy_hitters /
sinks.py trick). Readers of any pinned version never observe a partial
batch.

Scale shape: per batch, COMPUTE is pruned to dirty supercells (the fused
update's contract — O(batch)-sized shuffle, exact-complement passthrough)
and the point-log write is O(batch). Two publication modes:

* ``publish="snapshot"`` — every version is a full self-contained levels
  snapshot. O(pyramid) write per batch: the cost of plain-parquet
  publication, not of the algorithm. Simple, serve-ready layout.
* ``publish="manifest"`` — levels are partitioned by a FIXED coarse
  spatial block key ``pk`` (``p{code}`` = the row's supercell at the
  store's ``publish_zoom``, spanning every zoom >= it; one shared
  ``coarse`` block below), each version writes ONLY the dirty blocks, and a per-version
  ``manifest.json`` maps every pk to the version directory that owns it —
  untouched blocks are shared across versions, the same idea a
  transactional table format's snapshot manifest implements. Write cost
  drops to O(dirty-block rows); a block emptied by deletions simply
  leaves the manifest (no stale-partition hazard). Correctness rides the
  update's own dirtiness algebra: every changed row at zoom z >= publish
  zoom lies in a block whose cell contains a batch/deleted point (cells
  nest; ±2-cell y-dilation absorbs the JVM/numpy floor-boundary ulp, the
  same argument as operators/zoom.py), and zooms below it are rewritten
  whole (they are geometrically small and the update rebuilds them
  anyway).

The per-batch point logs accumulate small files; :meth:`PyramidStore.compact`
folds them into one base the same way ``compact_small_files`` maintains
the streaming sinks.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import ClusterOptions
from clustopher_spark.operators.zoom import (
    _DRIVER_DIRTY_LIMIT,
    _fuse_cut,
    fused_update_pass,
    incremental_tail_local,
    materialize_zoom_levels,
    update_zoom_levels,
    write_zoom_levels,
)

_POINT_SCHEMA = "id long, lng double, lat double"

# The manifest fast path reads every dirty block file back as levels_old;
# past this many blocks the batch is broad enough that the full path's
# single manifest-wide read is the better plan anyway.
_FAST_DIRTY_BLOCK_LIMIT = 256


def _pk_code(pk: str) -> int | None:
    """'p845...' -> 845...; 'coarse' -> None."""
    return None if pk == "coarse" else int(pk[1:])


class PyramidStore:
    """A durable, continuously-maintained zoom pyramid.

    ``metric_cols``, ``opts``, and (in manifest mode) ``publish_zoom`` are
    layout properties of the store, fixed at bootstrap and recorded in
    meta.json — every version is built with the same algebra, so any
    version equals a full rebuild of its accumulated corpus.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        metric_cols: list[str] | None = None,
        opts: ClusterOptions = ClusterOptions(),
        publish: str = "snapshot",
        publish_zoom: int | None = None,
    ) -> None:
        if publish not in ("snapshot", "manifest"):
            raise ValueError("publish must be 'snapshot' or 'manifest'")
        self.spark = spark
        self.root = root
        self.metric_cols = list(metric_cols or [])
        self.opts = opts
        self._publish_default = publish
        self._publish_zoom_default = publish_zoom
        # observability: filled by the last apply_batch with the publish
        # path taken ("fast" | "full" | "rebuild-full") and the fused
        # pass's own dispatch stats
        self.last_apply_stats: dict = {}
        # process-lifetime caches, invalidation-free by construction:
        # point-log schemas are fixed at bootstrap (metric_cols is a
        # layout property), and a log dir's parquet footers are immutable
        # once written — caching them skips the per-apply mergeSchema
        # footer sweep (a Spark job past ~32 files) and the per-apply
        # corpus count job (see _log_row_count)
        self._log_schema_cache: dict = {}
        self._log_rows_cache: dict = {}
        os.makedirs(root, exist_ok=True)

    def _publish_props(self, meta: dict) -> tuple[str, int]:
        """(publish mode, publish zoom) — meta wins once bootstrapped."""
        publish = meta.get("publish", self._publish_default)
        z_pb = meta.get("publish_zoom", self._publish_zoom_default)
        if z_pb is None:
            # same coarse grid the fused passes partition on at the
            # session's default width — fine-grained enough to localize
            # writes, coarse enough that per-block files stay chunky
            z_pb = _fuse_cut(
                self.opts, self.spark.sparkContext.defaultParallelism
            )
        return publish, int(z_pb)

    # ---- meta ----
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def _meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"latest": 0, "last_batch": -1}
        with open(self._meta_path) as f:
            return json.load(f)

    def _commit_meta(self, meta: dict) -> None:
        # single-file atomic repoint (rename within one directory)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def _commit_manifest(self, version: int, manifest: dict) -> None:
        # immutable per-version file, written BEFORE meta repoints — a
        # pinned (version, manifest) pair is always self-consistent
        path = self._manifest_path(version)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)

    # ---- readers ----
    def _levels_path(self, version: int) -> str:
        return os.path.join(self.root, "versions", f"v{version}", "levels")

    def current_version(self) -> int:
        return int(self._meta().get("latest", 0))

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "versions", f"v{version}", "manifest.json")

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _empty_levels_df(self) -> DataFrame:
        """An empty frame with the store's levels schema (column order =
        the written block order) — for a store whose corpus deletions
        emptied every block out of the manifest."""
        from clustopher_spark.operators.zoom import levels_schema_ddl

        return self.spark.createDataFrame(
            [], levels_schema_ddl(self.metric_cols)
        )

    def current_levels(self) -> DataFrame:
        meta = self._meta()
        v = int(meta.get("latest", 0))
        if v == 0:
            raise ValueError("store is empty — bootstrap() it first")
        publish, _ = self._publish_props(meta)
        if publish == "manifest":
            paths = [
                os.path.join(self.root, rel)
                for rel in self._manifest(v).values()
            ]
            if not paths:
                return self._empty_levels_df()
            # a 1M-point pyramid's manifest names ~440 block dirs — past
            # Spark's 32-path threshold that construction launches a
            # parallel-listing JOB (~1.2 s); the manifest already names
            # every path, so list driver-side (same gate as the merge
            # table's manifest reads)
            from clustopher_spark.sources.merge_table import read_parquet_many

            return read_parquet_many(self.spark, paths)
        return self.spark.read.parquet(self._levels_path(v))

    def _pk_cols(self, z_pb: int):
        """(pb_code expr, pk expr) for tagging level rows with their
        publication block: one block per occupied publish-zoom supercell,
        spanning ALL zooms >= publish zoom (the dirty-cell set is the same
        for every such zoom, so a per-zoom split would multiply file count
        ~x(levels) for the identical write set — measured 4.8k blocks of
        ~1.7k rows vs ~440 of ~19k on the 1M pyramid); everything below
        the publish zoom shares one 'coarse' block (it is geometrically
        small and the update rebuilds it anyway). The code expression MUST
        match _dirty_pb_codes' batch side exactly (same JVM projection,
        same floor)."""
        from clustopher_spark.plans.projection import project_cols

        px, py = project_cols(F.col("lng"), F.col("lat"), z_pb, self.opts.extent)
        size = self.opts.supercell_size
        code = F.shiftleft(F.floor(px / F.lit(size)).cast("long"), 32) + F.floor(
            py / F.lit(size)
        ).cast("long")
        pk = F.when(F.col("zoom") < F.lit(z_pb), F.lit("coarse")).otherwise(
            F.concat(F.lit("p"), code.cast("string"))
        )
        return code, pk

    def _dirty_pb_codes(self, batch_pos: DataFrame, z_pb: int):
        """Publication blocks the batch can perturb: the batch positions'
        cell codes at publish_zoom, dilated ±2 in y (both the row side and
        the batch side carry a ±1-cell floor-boundary ulp vs the kernel's
        numpy codes — operators/zoom.py's argument). Returns
        ``(codes, positions)`` — a sorted int64 array plus the collected
        (lng, lat) pandas frame (the fast path's tail frontier) — or
        ``(None, None)`` for an oversized batch (caller falls back to a
        full write)."""
        import numpy as np

        code, _ = self._pk_cols(z_pb)
        bp = batch_pos.select("lng", "lat", code.alias("c")).limit(
            _DRIVER_DIRTY_LIMIT + 1
        ).toPandas()
        if len(bp) > _DRIVER_DIRTY_LIMIT:
            return None, None
        c = bp["c"].to_numpy("int64")
        return np.unique(
            np.concatenate([c - 2, c - 1, c, c + 1, c + 2])
        ), bp

    def _write_levels_manifest(
        self, upd: DataFrame, version: int, z_pb: int, dirty_codes, old_manifest: dict
    ) -> dict:
        """Write the dirty blocks of ``upd`` under v{version}/levels and
        return the new manifest. ``dirty_codes is None`` = full write."""
        import pandas as pd

        code, pk = self._pk_cols(z_pb)
        # pin zoom to int: the local-tail union upcasts it to long, and the
        # snapshot layout's partition column reads back as int — one type
        # for both publication modes
        lv = (
            upd.withColumn("zoom", F.col("zoom").cast("int"))
            .withColumn("pb_code", code)
            .withColumn("pk", pk)
        )
        if dirty_codes is not None:
            # single-pass dirty filter (a union of two filtered branches
            # would evaluate the whole update lineage twice): broadcast
            # left-join a flag and keep coarse rows + flagged blocks
            codes_df = self.spark.createDataFrame(
                pd.DataFrame({"pb_code": dirty_codes, "_dirty": True}),
                schema="pb_code long, _dirty boolean",
            )
            lv = (
                lv.join(F.broadcast(codes_df), "pb_code", "left")
                .filter(
                    (F.col("zoom") < F.lit(z_pb)) | F.col("_dirty").isNotNull()
                )
                .drop("_dirty")
            )
        out = self._levels_path(version)
        # one file per block: without the pk repartition every write task
        # emits a file into every block directory (tasks x blocks files —
        # measured ~14k files for a 442-block pyramid), and zoom-sorted
        # row groups let serve-time zoom filters prune on parquet stats
        (
            lv.drop("pb_code")
            .repartition("pk")
            .sortWithinPartitions("pk", "zoom")
            .write.mode("overwrite")
            .partitionBy("pk")
            .parquet(out)
        )
        present = {
            d[len("pk="):]: os.path.join(
                "versions", f"v{version}", "levels", d
            )
            for d in os.listdir(out)
            if d.startswith("pk=")
        }
        if dirty_codes is None:
            return present
        dirty_set = set(int(x) for x in dirty_codes)
        manifest = {
            k: v
            for k, v in old_manifest.items()
            if _pk_code(k) is not None and _pk_code(k) not in dirty_set
        }
        # the coarse block and every dirty block was dropped above; re-add
        # the ones the new version actually produced — blocks emptied by
        # deletions simply stay absent
        manifest.update(present)
        return manifest

    def _point_cols(self) -> list[str]:
        return ["id", "lng", "lat", *self.metric_cols]

    def _read_log(self, paths: list[str], kind: str, prov_col: str):
        """Read batch-log dirs under a process-cached merged schema.

        The first read per (process, kind) infers with mergeSchema —
        legacy logs may predate the provenance column, and the sweep
        reads every footer (a Spark job past ~32 files). The cached
        schema always carries ``prov_col`` (long): files lacking it read
        NULL, exactly the semantics mergeSchema gave, so later applies
        skip the footer job entirely. Log schemas are fixed at bootstrap
        (metric_cols is a layout property), so the cache never goes
        stale."""
        from pyspark.sql.types import LongType, StructField, StructType

        sch = self._log_schema_cache.get(kind)
        if sch is None:
            inferred = self.spark.read.option("mergeSchema", "true").parquet(
                *paths
            ).schema
            fields = list(inferred.fields)
            if prov_col not in inferred.names:
                fields.append(StructField(prov_col, LongType(), True))
            sch = StructType(fields)
            self._log_schema_cache[kind] = sch
        return self.spark.read.schema(sch).parquet(*paths)

    def _dir_rows(self, d: str) -> int:
        """Row count of an immutable, committed log dir from its parquet
        footers — driver-side metadata only, cached for the process."""
        if d not in self._log_rows_cache:
            import pyarrow.parquet as pq

            self._log_rows_cache[d] = sum(
                pq.read_metadata(os.path.join(d, f)).num_rows
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
        return self._log_rows_cache[d]

    def _log_row_count(self, last_batch: int) -> int | None:
        """Exact row count of the accumulated corpus (bootstrap + adds
        logs up to ``last_batch``) from footer metadata, or None when
        deletion logs are committed — deletions apply through an
        anti-join, so the footer sum would only be an upper bound; the
        caller falls back to counting. Feeds fused_update_pass's n_old
        hint (partition sizing + dispatch-estimate denominator), saving
        the per-apply corpus count job."""
        dels_root = os.path.join(self.root, "batches", "dels")
        if os.path.isdir(dels_root):
            for d in os.listdir(dels_root):
                if d.startswith("b") and int(d[1:]) <= last_batch:
                    return None
        total = 0
        boot = os.path.join(self.root, "batches", "bootstrap")
        if os.path.isdir(boot):
            total += self._dir_rows(boot)
        adds_root = os.path.join(self.root, "batches", "adds")
        if os.path.isdir(adds_root):
            for d in sorted(os.listdir(adds_root)):
                if d.startswith("b") and int(d[1:]) <= last_batch:
                    total += self._dir_rows(os.path.join(adds_root, d))
        return total

    def current_points(self) -> DataFrame:
        """The accumulated corpus: bootstrap + committed adds, minus
        committed deletions — scoped by BATCH ORDER. A deletion in batch M
        erases only adds from strictly earlier batches (bootstrap = batch
        -1): an id re-added in batch N > M survives, and a same-batch
        add+delete keeps the add — exactly the fold apply_batch feeds the
        pyramid, so 'every version equals a full rebuild of its
        accumulated corpus' holds for the point log too (round-3 advice:
        the old reader anti-joined every deletion log against every adds
        batch as a global id blacklist, silently diverging from the
        levels after a delete-then-readd). Provenance rides an
        ``_add_batch`` / ``_del_batch`` column written into each log; the
        anti-join is still ONE shuffle on id (equi key + an inequality
        residual). Orphan logs from a crashed batch carry a batch id >
        last_batch and are invisible until recommitted."""
        meta = self._meta()
        last = int(meta.get("last_batch", -1))
        pts = None
        boot = os.path.join(self.root, "batches", "bootstrap")
        if os.path.isdir(boot):
            pts = self.spark.read.parquet(boot).withColumn(
                "_add_batch", F.lit(-1).cast("long")
            )
        adds_root = os.path.join(self.root, "batches", "adds")
        apaths = []
        if os.path.isdir(adds_root):
            apaths = [
                os.path.join(adds_root, d)
                for d in sorted(os.listdir(adds_root))
                if d.startswith("b") and int(d[1:]) <= last
            ]
        if apaths:
            # cached-schema read (see _read_log): logs written before the
            # provenance column existed read as null _add_batch; coalesce
            # to -1 (the pre-provenance semantics for adds)
            adds = self._read_log(apaths, "adds", "_add_batch")
            adds = adds.withColumn(
                "_add_batch", F.coalesce("_add_batch", F.lit(-1).cast("long"))
            )
            pts = adds if pts is None else pts.unionByName(adds)
        if pts is None:
            raise ValueError("store is empty — bootstrap() it first")
        dels_root = os.path.join(self.root, "batches", "dels")
        if os.path.isdir(dels_root):
            dpaths = [
                os.path.join(dels_root, d)
                for d in sorted(os.listdir(dels_root))
                if d.startswith("b") and int(d[1:]) <= last
            ]
            if dpaths:
                dels = self._read_log(dpaths, "dels", "_del_batch")
                dels = dels.select(F.col("id").alias("_del_id"), "_del_batch")
                # null _del_batch = a pre-provenance deletion log: apply it
                # as the old reader did (global blacklist), so migrated
                # stores keep their original fold
                pts = pts.join(
                    dels,
                    (F.col("id") == F.col("_del_id"))
                    & (
                        F.col("_del_batch").isNull()
                        | (F.col("_del_batch") > F.col("_add_batch"))
                    ),
                    "left_anti",
                )
        return pts.drop("_add_batch")

    # ---- writers ----
    def bootstrap(self, points: DataFrame) -> int:
        """Build version 1 from an initial corpus (may be empty-store only).

        The bootstrap log is written Z-ORDERED: every apply_batch's fed
        selection scans the point log under the batch's bbox filter, and
        on an unsorted log that filter prunes nothing (row-group lng/lat
        stats span the world) — the one remaining corpus-sized read of
        the manifest fast path. Morton layout makes it a stat-pruned
        read of the batch's spatial neighborhood; ``compact`` re-applies
        the same layout when folding batch logs in. The Z-order write
        evaluates ``points`` twice (a bounds aggregate, then the write) —
        hand over a materialized/checkpointed frame when the lineage is
        expensive (every in-repo caller does)."""
        if self.current_version() != 0:
            raise ValueError("store already bootstrapped")
        from clustopher_spark.sources.layout import write_zordered

        pts = points.select(*self._point_cols())
        boot = os.path.join(self.root, "batches", "bootstrap")
        write_zordered(
            pts, boot, num_files=max(
                self.spark.sparkContext.defaultParallelism, 8
            ),
        )
        from clustopher_spark.plans.lineage import release_spills, spill_snapshot

        spills0 = spill_snapshot()
        try:
            levels = materialize_zoom_levels(
                self.spark.read.parquet(boot), self.metric_cols, self.opts
            )
            publish, z_pb = self._publish_props({})
            if publish == "manifest":
                manifest = self._write_levels_manifest(levels, 1, z_pb, None, {})
                self._commit_manifest(1, manifest)
            else:
                write_zoom_levels(levels, self._levels_path(1), self.opts)
        finally:
            # the bootstrap pyramid is durably published above; its spill
            # (the largest frame a store ever materializes) is dead
            release_spills(spills0)
        self._commit_meta(
            {"latest": 1, "last_batch": -1, "publish": publish,
             "publish_zoom": z_pb}
        )
        return 1

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Fold one micro-batch into a new version. Returns False when the
        batch is an already-committed replay (skipped) or empty.

        Deletions (``op == "delete"``; rows carry id + position) apply to
        previously-committed points — an add and a delete of the SAME id
        in one batch leaves the point added, and current_points() applies
        the identical batch-ordered fold (a later re-add of a deleted id
        survives both)."""
        meta = self._meta()
        if int(meta.get("latest", 0)) == 0:
            raise ValueError("store is empty — bootstrap() it first")
        if batch_id <= int(meta.get("last_batch", -1)):
            return False  # committed replay
        if "op" in batch_df.columns:
            adds = batch_df.filter(F.col("op") == "add").select(*self._point_cols())
            dels = batch_df.filter(F.col("op") == "delete").select(
                "id", "lng", "lat"
            )
        else:
            adds = batch_df.select(*self._point_cols())
            dels = None
        # idempotent per-batch logs (overwrite: a replayed crash re-writes
        # the same directory rather than appending duplicates). Each log
        # carries its batch id so current_points can scope deletions by
        # order (see its docstring). ONE file per log: a maintenance
        # batch is small by contract (bulk loads belong in bootstrap /
        # compact), so the single-task write is the right layout — the
        # old per-input-partition layout wrote ~32 tiny files per 10k
        # batch, and every later corpus scan paid their open cost. The
        # write job doubles as the emptiness probe (footer row counts,
        # driver-side) — the old take(1) pre-probe job is gone; an empty
        # batch leaves an empty UNCOMMITTED log dir behind, invisible to
        # readers (> last_batch) and overwritten by any later real
        # commit of the same id.
        import pyarrow.parquet as pq

        def _footer_rows(d: str) -> int:
            return sum(
                pq.read_metadata(os.path.join(d, f)).num_rows
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )

        adds_path = os.path.join(self.root, "batches", "adds", f"b{batch_id}")
        adds.coalesce(1).withColumn(
            "_add_batch", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").parquet(adds_path)
        n_new = _footer_rows(adds_path)
        adds = self.spark.read.parquet(adds_path).select(*self._point_cols())
        if dels is not None:
            dels_path = os.path.join(self.root, "batches", "dels", f"b{batch_id}")
            dels.coalesce(1).withColumn(
                "_del_batch", F.lit(batch_id).cast("long")
            ).write.mode("overwrite").parquet(dels_path)
            if _footer_rows(dels_path) == 0:
                dels = None
            else:
                dels = self.spark.read.parquet(dels_path).select(
                    "id", "lng", "lat"
                )
        if n_new == 0 and dels is None:
            return False
        version = int(meta["latest"]) + 1
        publish, z_pb = self._publish_props(meta)
        stats: dict = {}
        # every spill materialized while building this version (the fused
        # pass's output) is consumed by the durable block/levels writes
        # below — release the dirs once the version's files are on disk,
        # or a long-lived maintainer leaks one pyramid-sized dir per commit
        from clustopher_spark.plans.lineage import release_spills, spill_snapshot

        spills0 = spill_snapshot()
        try:
            if publish == "manifest":
                manifest = self._apply_manifest(
                    adds, dels, z_pb, meta, version, stats, n_new=n_new
                )
                self._commit_manifest(version, manifest)
            else:
                upd = update_zoom_levels(
                    self.current_levels(),
                    self.current_points(),
                    adds,
                    self.metric_cols,
                    self.opts,
                    points_deleted=dels,
                    stats=stats,
                )
                write_zoom_levels(upd, self._levels_path(version), self.opts)
        finally:
            release_spills(spills0)
        self.last_apply_stats = stats
        self._commit_meta(
            {**meta, "latest": version, "last_batch": batch_id}
        )
        return True

    def _apply_manifest(
        self, adds: DataFrame, dels: DataFrame | None, z_pb: int,
        meta: dict, version: int, stats: dict, n_new: int | None = None,
    ) -> dict:
        """Build + publish one manifest version. Fast path: an append/
        delete batch costs O(dirty blocks), never O(corpus) —

        * only the DIRTY publication-block files of the previous version
          are read back as ``levels_old`` (the manifest names them; an
          untouched block can neither feed the kernel nor need rewriting,
          so reading it is pure waste);
        * the fused update runs with ``coarse_tail=False``, skipping its
          one global dependency (the tail rebuild scans the complete new
          z_cut level every update);
        * the coarse tail (zoom < z_pb) is maintained incrementally on
          the driver from the old coarse block + the new dirty-block
          z_pb rows (:func:`incremental_tail_local`'s containment
          argument) — both driver-sized by construction.

        Before this path, every micro-batch re-evaluated the full level
        store 3-4x (passthrough write, z_cut count, tail rebuild):
        measured 15.5 s for a 10k city batch onto 1M points, ~11 s of
        which was corpus-sized scans. The guards below fall back to the
        full path (exact same result, pinned by the store's
        equality-to-rebuild tests): oversized batches (no driver dirty
        set), a publish zoom that differs from the session's fused cut
        (the dirty-block algebra needs z_pb == z_cut so chained levels
        live entirely inside publication blocks), too many dirty blocks,
        or a chain too short to fuse. ``stats['publish_path']`` records
        the decision; the fused pass adds ``path``/``est_fed_fraction``."""
        batch_pos = adds.select("lng", "lat")
        if dels is not None:
            batch_pos = batch_pos.unionByName(dels.select("lng", "lat"))
        dirty, bp = self._dirty_pb_codes(batch_pos, z_pb)
        old_manifest = self._manifest(int(meta["latest"]))
        default_par = self.spark.sparkContext.defaultParallelism
        dirty_set = set(int(x) for x in dirty) if dirty is not None else None
        dirty_rels = (
            [rel for k, rel in old_manifest.items()
             if _pk_code(k) is not None and _pk_code(k) in dirty_set]
            if dirty_set is not None else None
        )
        # the fast path's driver tail also collects the x±1/y±1 NEIGHBOR
        # blocks' z_pb rows (see below) — a batch adjacent to many dense
        # blocks would otherwise collect an unbounded frame, so the block
        # budget gates dirty + neighbor blocks TOGETHER (r4 advice). The
        # 9x code expansion + second manifest scan only run once the
        # cheap scalar guards pass AND a tail exists to consume them
        # (z_pb > min_zoom); a store that can never take the fast path
        # pays nothing extra per batch.
        fast_guards = (
            dirty is not None
            and _fuse_cut(self.opts, default_par) == z_pb
            and self.opts.max_zoom - z_pb >= 1
        )
        if fast_guards and z_pb > self.opts.min_zoom:
            nb_codes = {
                int(c) + (dx << 32) + dy
                for c in dirty for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            }
            nb_codes -= dirty_set
            nb_rels = [
                rel for k, rel in old_manifest.items()
                if _pk_code(k) is not None and _pk_code(k) in nb_codes
            ]
        else:
            nb_rels = []
        fast_ok = (
            fast_guards
            and len(dirty_rels) + len(nb_rels) <= _FAST_DIRTY_BLOCK_LIMIT
        )
        if not fast_ok:
            stats["publish_path"] = "full"
            upd = update_zoom_levels(
                self.current_levels(), self.current_points(), adds,
                self.metric_cols, self.opts, points_deleted=dels, stats=stats,
            )
            return self._write_levels_manifest(
                upd, version, z_pb, dirty, old_manifest
            )
        if dirty_rels:
            lvl_dirty = self.spark.read.parquet(
                *[os.path.join(self.root, rel) for rel in dirty_rels]
            )
        else:
            # batch lands in a virgin region (or the store was emptied):
            # empty levels frame with the store schema
            lvl_dirty = self._empty_levels_df()
        upd_deep = fused_update_pass(
            lvl_dirty, self.current_points(), adds, self.metric_cols,
            self.opts, parallelism=default_par, points_deleted=dels,
            coarse_tail=False, stats=stats,
            # count hints from immutable log footers (None past a gate
            # falls back to counting inside the pass) — saves the two
            # per-apply count jobs
            n_new=n_new,
            n_old=self._log_row_count(int(meta.get("last_batch", -1))),
        )
        if stats.get("path") == "rebuild":
            # cost dispatch chose a full rebuild (returns the complete
            # pyramid, tail included) -> publish it as a full write
            stats["publish_path"] = "rebuild-full"
            return self._write_levels_manifest(upd_deep, version, z_pb, None, {})
        stats["publish_path"] = "fast"
        zooms_rest = [
            z for z in range(self.opts.max_zoom, self.opts.min_zoom - 1, -1)
            if z < z_pb
        ]
        upd = upd_deep
        if zooms_rest:
            # ONE collect for the tail's three driver-sized inputs (the
            # fused pass's z_pb slice, the neighbor blocks' z_pb rows,
            # the old coarse block) — they were three separate jobs, and
            # each Spark action on this rig costs ~0.1-0.2 s of fixed
            # scheduling. A _src tag splits them back apart; branch
            # order (zcut, nb, coarse) preserves the exact row order the
            # sequential collects produced.
            sel_cols = [f.name for f in upd_deep.schema.fields]
            branches = [
                upd_deep.filter(F.col("zoom") == z_pb)
                .select(*sel_cols).withColumn("_src", F.lit(0))
            ]
            if nb_rels:
                branches.append(
                    self.spark.read.parquet(
                        *[os.path.join(self.root, rel) for rel in nb_rels]
                    )
                    .filter(F.col("zoom") == z_pb)
                    .select(*sel_cols).withColumn("_src", F.lit(0))
                )
            coarse_rel = old_manifest.get("coarse")
            if coarse_rel is not None:
                branches.append(
                    self.spark.read.parquet(
                        os.path.join(self.root, coarse_rel)
                    ).select(*sel_cols).withColumn("_src", F.lit(1))
                )
            combined = branches[0]
            for b in branches[1:]:
                combined = combined.unionByName(b)
            combined_pdf = combined.toPandas()
            zcut_new = combined_pdf[combined_pdf["_src"] == 0].drop(
                columns=["_src"]
            ).reset_index(drop=True)
            coarse_old = combined_pdf[combined_pdf["_src"] == 1].drop(
                columns=["_src"]
            ).reset_index(drop=True)
            if coarse_rel is None:
                coarse_old = zcut_new.iloc[0:0]
            # First-tail-level coverage: the recluster inputs at z_pb - 1
            # are the z_pb rows of every dirty cell's 2x2 children. In
            # JVM block coordinates those reach ±1 cell in x (x codes are
            # JVM/numpy-exact on both the batch and the row side) and up
            # to ±3 in y: the numpy child cell is within ±1 of the numpy
            # batch cell, and BOTH the batch's and the row's JVM codes
            # carry an independent ±1-cell floor-boundary ulp vs their
            # numpy codes. The dirty-block set only spans y±2 (and x±0),
            # so take its x±1/y±1 neighborhood. Neighbor blocks are never
            # dirty — their z_pb rows are UNCHANGED this version: read
            # them from the previous version's files and union them into
            # the tail's input. (nb_rels precomputed above, inside the
            # fast-path block budget.)
            tail_pdf = incremental_tail_local(
                coarse_old,
                zcut_new.drop(columns=["zoom"]),
                bp["lng"].to_numpy(),
                bp["lat"].to_numpy(),
                zooms_rest,
                self.metric_cols,
                self.opts,
            )
            if len(tail_pdf):
                tail_df = self.spark.createDataFrame(
                    tail_pdf[[f.name for f in upd_deep.schema.fields]],
                    schema=upd_deep.schema,
                )
                upd = upd_deep.unionByName(tail_df)
        return self._write_levels_manifest(upd, version, z_pb, dirty, old_manifest)

    def maintain(
        self,
        points_stream: DataFrame,
        checkpoint: str,
        query_name: str = "pyramid_store_sink",
    ):
        """Drain ``points_stream`` (availableNow) through the store, one
        version per non-empty micro-batch. Returns the finished query."""
        q = (
            points_stream.writeStream.foreachBatch(self.apply_batch)
            .queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        q.awaitTermination()
        return q

    # ---- maintenance ----
    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop version directories older than the newest ``keep_last``
        (never the latest). In manifest mode a version directory whose
        blocks are still referenced by any KEPT version's manifest is
        retained regardless of age (blocks are shared across versions).

        Concurrent-reader snapshot guarantee (asserted by
        test_vacuum_concurrent_reader_snapshot_safety): blocks are
        immutable and version directories are never mutated, so a reader
        pinned (via ``current_levels()``) at any version INSIDE the kept
        window reads exactly its original content after vacuum — every
        block its manifest references is owned by a directory the
        referenced-scan below retains. A reader pinned BELOW the window
        either still reads its original content (all its blocks shared
        with kept versions) or fails fast on a deleted file; it can never
        silently observe different data. Same contract as the catalog's
        vacuum."""
        meta = self._meta()
        latest = int(meta.get("latest", 0))
        publish, _ = self._publish_props(meta)
        removed = []
        vroot = os.path.join(self.root, "versions")
        if not os.path.isdir(vroot):
            return removed
        referenced: set[int] = set()
        if publish == "manifest":
            for v in range(max(1, latest - keep_last + 1), latest + 1):
                for rel in self._manifest(v).values():
                    # rel = versions/v{N}/levels/pk=...
                    referenced.add(int(rel.split(os.sep)[1][1:]))
        for d in sorted(os.listdir(vroot)):
            v = int(d[1:])
            if v <= latest - keep_last and v not in referenced:
                shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)
                removed.append(v)
        return removed

    def compact(self) -> None:
        """Fold the per-batch point logs into one bootstrap base (small-file
        maintenance; the fold is the same adds-minus-dels the reader does,
        so the folded base equals current_points() by construction). The
        final directory swap is not atomic (rmtree + rename) — run it
        between batches; a transactional table format closes that window,
        the same upgrade path as sinks.py."""
        from clustopher_spark.sources.layout import write_zordered

        pts = self.current_points().localCheckpoint(eager=True)
        meta = self._meta()
        boot = os.path.join(self.root, "batches", "bootstrap")
        tmp = boot + "_compacting"
        write_zordered(
            pts, tmp, num_files=max(
                self.spark.sparkContext.defaultParallelism, 8
            ),
        )
        for sub in ("adds", "dels"):
            d = os.path.join(self.root, "batches", sub)
            if os.path.isdir(d):
                for b in os.listdir(d):
                    if b.startswith("b") and int(b[1:]) <= int(meta["last_batch"]):
                        shutil.rmtree(os.path.join(d, b), ignore_errors=True)
        if os.path.isdir(boot):
            shutil.rmtree(boot, ignore_errors=True)
        os.replace(tmp, boot)
