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
    {root}/versions/v{N}/levels/     full pyramid snapshot (serve layout)
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
and the point-log write is O(batch). The full-snapshot levels write is
the one O(pyramid) term: the cost of plain-parquet publication, not of
the algorithm. The upgrade is partition-level publication — levels
partitioned by (zoom, coarse block) with dynamic partition overwrite of
the dirty blocks only, or a transactional format's MERGE — which drops
the write to O(dirty rows) without touching the compute side. The
per-batch point logs accumulate small files; :meth:`PyramidStore.compact`
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
    materialize_zoom_levels,
    update_zoom_levels,
    write_zoom_levels,
)

_POINT_SCHEMA = "id long, lng double, lat double"


class PyramidStore:
    """A durable, continuously-maintained zoom pyramid.

    ``metric_cols`` and ``opts`` are layout properties of the store: every
    version is built with the same algebra, so any version equals a full
    rebuild of its accumulated corpus.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        metric_cols: list[str] | None = None,
        opts: ClusterOptions = ClusterOptions(),
    ) -> None:
        self.spark = spark
        self.root = root
        self.metric_cols = list(metric_cols or [])
        self.opts = opts
        os.makedirs(root, exist_ok=True)

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

    # ---- readers ----
    def _levels_path(self, version: int) -> str:
        return os.path.join(self.root, "versions", f"v{version}", "levels")

    def current_version(self) -> int:
        return int(self._meta().get("latest", 0))

    def current_levels(self) -> DataFrame:
        v = self.current_version()
        if v == 0:
            raise ValueError("store is empty — bootstrap() it first")
        return self.spark.read.parquet(self._levels_path(v))

    def _point_cols(self) -> list[str]:
        return ["id", "lng", "lat", *self.metric_cols]

    def current_points(self) -> DataFrame:
        """The accumulated corpus: bootstrap + committed adds, minus
        committed deletions. Orphan logs from a crashed batch carry a
        batch id > last_batch and are invisible until recommitted."""
        meta = self._meta()
        last = int(meta.get("last_batch", -1))
        paths = []
        boot = os.path.join(self.root, "batches", "bootstrap")
        if os.path.isdir(boot):
            paths.append(boot)
        adds_root = os.path.join(self.root, "batches", "adds")
        if os.path.isdir(adds_root):
            paths.extend(
                os.path.join(adds_root, d)
                for d in sorted(os.listdir(adds_root))
                if d.startswith("b") and int(d[1:]) <= last
            )
        if not paths:
            raise ValueError("store is empty — bootstrap() it first")
        pts = self.spark.read.parquet(*paths)
        dels_root = os.path.join(self.root, "batches", "dels")
        if os.path.isdir(dels_root):
            dpaths = [
                os.path.join(dels_root, d)
                for d in sorted(os.listdir(dels_root))
                if d.startswith("b") and int(d[1:]) <= last
            ]
            if dpaths:
                dels = self.spark.read.parquet(*dpaths)
                pts = pts.join(dels.select("id"), "id", "left_anti")
        return pts

    # ---- writers ----
    def bootstrap(self, points: DataFrame) -> int:
        """Build version 1 from an initial corpus (may be empty-store only)."""
        if self.current_version() != 0:
            raise ValueError("store already bootstrapped")
        pts = points.select(*self._point_cols())
        boot = os.path.join(self.root, "batches", "bootstrap")
        pts.write.mode("overwrite").parquet(boot)
        levels = materialize_zoom_levels(
            self.spark.read.parquet(boot), self.metric_cols, self.opts
        )
        write_zoom_levels(levels, self._levels_path(1), self.opts)
        self._commit_meta({"latest": 1, "last_batch": -1})
        return 1

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Fold one micro-batch into a new version. Returns False when the
        batch is an already-committed replay (skipped) or empty.

        Deletions (``op == "delete"``; rows carry id + position) apply to
        previously-committed points — an add and a delete of the SAME id
        in one batch leaves the point added (split such flows across
        batches, or pre-filter upstream)."""
        meta = self._meta()
        if int(meta.get("latest", 0)) == 0:
            raise ValueError("store is empty — bootstrap() it first")
        if batch_id <= int(meta.get("last_batch", -1)):
            return False  # committed replay
        if not batch_df.take(1):
            return False
        if "op" in batch_df.columns:
            adds = batch_df.filter(F.col("op") == "add").select(*self._point_cols())
            dels = batch_df.filter(F.col("op") == "delete").select(
                "id", "lng", "lat"
            )
        else:
            adds = batch_df.select(*self._point_cols())
            dels = None
        # idempotent per-batch logs (overwrite: a replayed crash re-writes
        # the same directory rather than appending duplicates)
        adds_path = os.path.join(self.root, "batches", "adds", f"b{batch_id}")
        adds.write.mode("overwrite").parquet(adds_path)
        adds = self.spark.read.parquet(adds_path)
        if dels is not None:
            dels_path = os.path.join(self.root, "batches", "dels", f"b{batch_id}")
            dels.write.mode("overwrite").parquet(dels_path)
            dels = self.spark.read.parquet(dels_path)
            if not dels.take(1):
                dels = None
        upd = update_zoom_levels(
            self.current_levels(),
            self.current_points(),
            adds,
            self.metric_cols,
            self.opts,
            points_deleted=dels,
        )
        version = int(meta["latest"]) + 1
        write_zoom_levels(upd, self._levels_path(version), self.opts)
        self._commit_meta({"latest": version, "last_batch": batch_id})
        return True

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
        (never the latest). Pinned readers of dropped versions lose them —
        same contract as the catalog's vacuum."""
        latest = self.current_version()
        removed = []
        vroot = os.path.join(self.root, "versions")
        if not os.path.isdir(vroot):
            return removed
        for d in sorted(os.listdir(vroot)):
            v = int(d[1:])
            if v <= latest - keep_last:
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
        pts = self.current_points().localCheckpoint(eager=True)
        meta = self._meta()
        boot = os.path.join(self.root, "batches", "bootstrap")
        tmp = boot + "_compacting"
        pts.write.mode("overwrite").parquet(tmp)
        for sub in ("adds", "dels"):
            d = os.path.join(self.root, "batches", sub)
            if os.path.isdir(d):
                for b in os.listdir(d):
                    if b.startswith("b") and int(b[1:]) <= int(meta["last_batch"]):
                        shutil.rmtree(os.path.join(d, b), ignore_errors=True)
        if os.path.isdir(boot):
            shutil.rmtree(boot, ignore_errors=True)
        os.replace(tmp, boot)
