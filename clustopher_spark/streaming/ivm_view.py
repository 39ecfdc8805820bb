"""Durable maintained aggregate views over a MergeTable CDC stream — the
consumer that completes the table's CDC loop: produce (merge) -> record
(write-time CDF) -> stream (stream_changes) -> maintain (THIS) -> serve.

Four maintained shapes:

* :class:`MaintainedView` — count+sum per group, advanced purely from the
  change feed (operators/ivm.py — O(changes + affected groups), never a
  table access);
* :class:`MaintainedDistinctView` — count + COUNT(DISTINCT value) per
  group, maintained through the invertible SUPPORT RELATION (one row per
  (group, value) with multiplicity — operators/ivm.py): every change
  image is ±1 on exactly one support row, so the view advances from the
  feed alone, never a table access. The persisted state is the support
  relation (O(distinct (group, value)) rows, not O(table)); the served
  view is its projection;
* :class:`MaintainedMinMaxView` — count/MIN/MAX per group, and
  :class:`MaintainedTopKView` — count + the k largest values per group
  (MIN/MAX is its k=1 case) — the classic
  NOT-group-invertible aggregates: inserts advance extrema monotonically
  from the feed alone, and only groups whose removed values tie-or-beat a
  stored extremum are recomputed from the POST-COMMIT table snapshot
  through a broadcast semi-join on the dirty keys (O(affected groups'
  rows), never O(table)). The snapshot comes from the table's time
  travel at the batch's max commit version — `_commit_version` IS the
  table version, so the view never folds in a commit whose feed it has
  not seen.

Each view keeps its aggregate continuously current without ever
rescanning the table: a merge commit's change feed advances the view by
its delta, and the advanced view is published as a new immutable version
under the view root with an atomic meta repoint (the same
commit-then-rename discipline as the table itself). The reference
recomputes its aggregates per request (cluster/helpers.go metadata
summaries); at 100 TB a standing aggregate must be maintained, not
recomputed.

Exactly-once across replay: every change image carries its
``_commit_version``; the view's meta records the highest version applied,
and a feed batch is filtered to ``_commit_version > applied`` BEFORE the
delta — so an availableNow replay from a fresh checkpoint (which re-reads
every published feed) advances nothing. This watermark is the view-side
twin of the table's ``batch_id`` replay guard. The watermark is only
sound if a commit's images are never split across micro-batches:
merge() guarantees that by writing ONE feed file per commit (no
files-per-trigger limit can split one file), and apply_feed additionally
verifies each fresh commit's delivered row count against its feed's
parquet footers — a partial commit (possible only for feeds written
before the single-file layout) raises loudly instead of corrupting the
view.

Scale shape: the view is aggregate-sized (one row per group), so reading
the current version + writing the next is O(groups) per commit — the
delta apply itself is O(changes + affected groups). For a view with an
enormous group cardinality, range-partition the view files and rewrite
only affected partitions (the MergeTable's own manifest trick); at that
point the view IS a MergeTable keyed by the group columns. The MIN/MAX
view's lag bound: its dirty recompute time-travels to the applied commit,
so size the table's ``vacuum(keep_last=...)`` to the slowest consumer's
lag (the same retention contract stream_changes documents) — a consumer
below the window fails fast on the missing version rather than silently
folding in unapplied commits.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clustopher_spark.operators.ivm import (
    bootstrap_count_sum_view,
    bootstrap_distinct_support,
    distinct_count_view,
    incremental_count_sum_view,
    incremental_distinct_count_view,
    incremental_min_max_view,
    incremental_top_k_view,
)
from clustopher_spark.sources.merge_table import MergeTable
from clustopher_spark.streaming.merge_table import stream_changes


class _DurableViewBase:
    """Shared durable-view plumbing: versioned parquet under the view
    root, atomic meta repoint, commit-version watermark admission, and
    the availableNow CDC drain."""

    def __init__(
        self, spark: SparkSession, root: str, keep_versions: int = 2
    ) -> None:
        self.spark = spark
        self.root = root
        # retention window for published view versions: how many of the
        # newest versions survive each publish (>= 1; default 2 = current
        # plus one back for concurrent readers — the table's
        # vacuum(keep_last=...) contract, now configurable here too
        # instead of a hard-coded v-2 prune)
        self.keep_versions = max(1, int(keep_versions))

    # --- meta plumbing (the table's atomic-repoint pattern) ---

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def _meta(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _commit(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def _version_path(self, v: int) -> str:
        return os.path.join(self.root, f"v{v}.parquet")

    def _write_version(self, df: DataFrame, v: int) -> None:
        # a view is aggregate-sized: one file is the right layout
        staging = self._version_path(v) + ".staging"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        final = self._version_path(v)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(staging, final)

    def _publish(self, df: DataFrame, applied_commit: int) -> int:
        """Write the advanced view as the next version, repoint meta, and
        prune superseded versions to the ``keep_versions`` window (the
        table's retention idea; default keeps one back for concurrent
        readers). Pruning lists the root rather than assuming a single
        v-2 candidate, so raising or lowering keep_versions mid-life
        converges instead of leaking versions."""
        v = int(self._meta()["latest"]) + 1
        self._write_version(df, v)
        self._commit({"latest": v, "applied_commit": int(applied_commit)})
        for name in os.listdir(self.root):
            if not (name.startswith("v") and name.endswith(".parquet")):
                continue
            try:
                old = int(name[1:-len(".parquet")])
            except ValueError:
                continue
            if old <= v - self.keep_versions:
                shutil.rmtree(self._version_path(old), ignore_errors=True)
        return v

    @staticmethod
    def _check_commits_whole(table_root: str, per_commit: dict[int, int]) -> None:
        """Refuse a batch whose slice of any commit's feed is incomplete
        (delivered rows < the feed's parquet-footer rows). Driver-side,
        O(feed files) tiny metadata reads per fresh commit; a feed dir
        already vacuumed (or never published) is skipped — nothing to
        verify against."""
        import pyarrow.parquet as pq

        for v, n_seen in per_commit.items():
            d = os.path.join(table_root, "changes", f"v{v}")
            if not os.path.isdir(d):
                continue
            expected = sum(
                pq.read_metadata(os.path.join(d, f)).num_rows
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
            if n_seen < expected:
                raise ValueError(
                    f"commit v{v}: batch delivered {n_seen} of {expected} "
                    "change images — a files-per-trigger limit split the "
                    "commit's feed across micro-batches. Applying a partial "
                    "commit would corrupt the view (the watermark would drop "
                    "the rest forever). Delete the view's checkpoint and "
                    "re-drain WITHOUT maxFilesPerTrigger — the commit-version "
                    "watermark makes a fresh-checkpoint replay safe. (merge() "
                    "writes single-file feeds since the coalesce(1) layout, "
                    "so only pre-layout feeds can trip this.)"
                )

    def _admit(
        self, cdf_batch: DataFrame, table_root: str | None
    ) -> tuple[DataFrame, int] | None:
        """Watermark-filter a CDC batch and verify whole-commit delivery.
        Returns (fresh change images, max commit version) or None when
        nothing above the watermark arrived. The fresh frame is
        localCheckpointed: it is consumed by several jobs (the per-commit
        census here, then the delta) and a streaming source frame cannot
        be re-read after the micro-batch ends."""
        meta = self._meta()
        fresh = self._cast(
            cdf_batch.filter(F.col("_commit_version") > int(meta["applied_commit"]))
        ).localCheckpoint(eager=True)
        per_commit = {
            int(r.v): int(r.n)
            for r in fresh.groupBy(F.col("_commit_version").alias("v"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not per_commit:
            return None
        if table_root is not None:
            self._check_commits_whole(table_root, per_commit)
        return fresh, max(per_commit)

    def _cast(self, df: DataFrame) -> DataFrame:  # overridable
        return df

    def read(self) -> DataFrame:
        """The view's current version (one aggregate-sized parquet)."""
        meta = self._meta()
        return self.spark.read.parquet(self._version_path(int(meta["latest"])))

    def apply_feed(
        self, cdf_batch: DataFrame, table_root: str | None = None
    ) -> int | None:
        raise NotImplementedError

    def maintain(
        self,
        table_root: str,
        query_name: str = "maintained_view",
        options: dict | None = None,
    ):
        """Drain the table's CDC stream (availableNow) through the view.
        The checkpoint gives the file source exactly-once delivery; the
        commit-version watermark makes even a FRESH checkpoint harmless;
        the whole-commit guard in apply_feed makes a file-split feed a
        loud error instead of silent view drift. ``options`` passes
        file-source knobs to stream_changes (``maxFilesPerTrigger`` for
        commit-paced draining is safe: one feed file per commit)."""
        # one-time layout migration: the checkpoint used to live at the
        # SIBLING path `{root}_checkpoint` (string concat); a view created
        # under that layout would otherwise silently abandon its
        # checkpoint here (safe via the watermark, but a full feed
        # replay) and leak the old directory on disk forever
        legacy = self.root.rstrip(os.sep) + "_checkpoint"
        current = os.path.join(self.root, "_checkpoint")
        if os.path.isdir(legacy) and not os.path.exists(current):
            os.replace(legacy, current)
        q = (
            stream_changes(self.spark, table_root, options=options)
            .writeStream.foreachBatch(lambda df, bid: self.apply_feed(df, table_root))
            .queryName(query_name)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", os.path.join(self.root, "_checkpoint")
            )
            .start()
        )
        q.awaitTermination()
        return q


class MaintainedView(_DurableViewBase):
    """A durable, versioned count+sum view of a MergeTable.

    ``sum_cols`` maps table column -> view column; ``sum_cast`` (e.g.
    ``"decimal(18,2)"``) is applied to each source column before
    aggregation — use an exact type for drift-free maintenance (the IVM
    module's standing advice).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_cols: list[str],
        sum_cols: dict[str, str],
        count_col: str = "n_rows",
        sum_cast: str | None = "decimal(18,2)",
        keep_versions: int = 2,
    ) -> None:
        super().__init__(spark, root, keep_versions=keep_versions)
        self.group_cols = list(group_cols)
        self.sum_cols = dict(sum_cols)
        self.count_col = count_col
        self.sum_cast = sum_cast

    def _cast(self, df: DataFrame) -> DataFrame:
        if self.sum_cast is None:
            return df
        for src in self.sum_cols:
            df = df.withColumn(src, F.col(src).cast(self.sum_cast))
        return df

    # --- lifecycle ---

    def bootstrap(self, table: MergeTable) -> int:
        """Seed the view from one full aggregate of the table's CURRENT
        version (with the IVM module's non-null-count state columns, so
        NULL-sum maintenance is exact from birth). Records the table
        version it saw; feeds at or below it are already reflected."""
        os.makedirs(self.root, exist_ok=True)
        tv = int(table._meta()["latest"])
        # read AT tv, not latest: a merge committing between the two
        # reads would seed the view from post-commit data while the
        # watermark records the pre-commit version — the next refresh
        # would re-apply that commit (permanent double-count)
        base = bootstrap_count_sum_view(
            self._cast(table.read(version=tv)),
            self.group_cols,
            self.sum_cols,
            self.count_col,
        )
        self._write_version(base, 1)
        self._commit({"latest": 1, "applied_commit": tv})
        return 1

    def read(self, with_state: bool = False) -> DataFrame:
        df = super().read()
        if with_state:
            return df
        return df.drop(*[c for c in df.columns if c.startswith("_nn_")])

    def apply_feed(
        self, cdf_batch: DataFrame, table_root: str | None = None
    ) -> int | None:
        """Advance the view by one CDC batch (which may carry several
        commits' images). Filters to commits above the applied watermark
        FIRST, so replay is a no-op. Returns the new view version, or
        None when nothing fresh arrived.

        With ``table_root`` (maintain() always passes it), every fresh
        commit's delivered row count is checked against its feed's
        parquet footers and a PARTIALLY delivered commit raises instead
        of advancing — see the module docstring."""
        admitted = self._admit(cdf_batch, table_root)
        if admitted is None:
            return None
        fresh, hi = admitted
        view = self.read(with_state=True)
        advanced = incremental_count_sum_view(
            view, fresh, self.group_cols, self.sum_cols, self.count_col,
            keep_state=True,
        )
        return self._publish(advanced, hi)


class MaintainedMinMaxView(_DurableViewBase):
    """A durable, versioned count/MIN/MAX view of a MergeTable — the
    dashboard aggregate count+sum maintenance cannot serve (MIN/MAX are
    not group-invertible). Inserts advance extrema from the feed alone;
    deletes that touch a group's stored extremum trigger the bounded
    dirty-group recompute against the table's snapshot AT the applied
    commit version (time travel, so a commit whose feed is still in
    flight is never folded in early). See operators/ivm.py for the delta
    algebra and its oracle."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_cols: list[str],
        value_col: str,
        count_col: str = "n_rows",
        min_col: str = "v_min",
        max_col: str = "v_max",
        keep_versions: int = 2,
    ) -> None:
        super().__init__(spark, root, keep_versions=keep_versions)
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.count_col = count_col
        self.min_col = min_col
        self.max_col = max_col

    def bootstrap(self, table: MergeTable) -> int:
        """Seed the view from one full count/min/max aggregate of the
        table's CURRENT version."""
        os.makedirs(self.root, exist_ok=True)
        tv = int(table._meta()["latest"])
        # version-pinned read — see MaintainedView.bootstrap
        base = table.read(version=tv).groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias(self.count_col),
            F.min(self.value_col).alias(self.min_col),
            F.max(self.value_col).alias(self.max_col),
        )
        self._write_version(base, 1)
        self._commit({"latest": 1, "applied_commit": tv})
        return 1

    def apply_feed(
        self, cdf_batch: DataFrame, table_root: str | None = None
    ) -> int | None:
        """Advance the view by one CDC batch. Requires ``table_root``:
        the dirty-group recompute reads the table's snapshot at the
        batch's max commit version. A multi-commit batch is applied in
        one shot against that snapshot — every intermediate value of an
        update chain appears as both an add and a later sub within the
        window, so any group the one-shot merge could misjudge is dirtied
        by its own sub images and recomputed (the conservative tie rule
        in operators/ivm.py)."""
        if table_root is None:
            raise ValueError(
                "MaintainedMinMaxView.apply_feed needs table_root: the "
                "dirty-group recompute reads the post-commit table snapshot"
            )
        admitted = self._admit(cdf_batch, table_root)
        if admitted is None:
            return None
        fresh, hi = admitted
        post = MergeTable(self.spark, table_root).read(version=hi)
        advanced = incremental_min_max_view(
            self.read(), fresh, post, self.group_cols, self.value_col,
            count_col=self.count_col, min_col=self.min_col,
            max_col=self.max_col,
        )
        return self._publish(advanced, hi)


class MaintainedTopKView(_DurableViewBase):
    """A durable, versioned count + TOP-K-VALUES view of a MergeTable —
    the MIN/MAX view's generalization (MAX is k=1), same maintenance
    split: inserts sort-merge into the stored per-group array from the
    feed alone; removals that tie-or-beat the stored k-th value trigger
    the bounded dirty recompute against the table snapshot AT the
    applied commit version. See operators/ivm.py::incremental_top_k_view
    for the delta algebra and its multi-commit soundness argument."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_cols: list[str],
        value_col: str,
        k: int,
        count_col: str = "n_rows",
        topk_col: str = "top_k",
        keep_versions: int = 2,
    ) -> None:
        super().__init__(spark, root, keep_versions=keep_versions)
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.k = int(k)
        self.count_col = count_col
        self.topk_col = topk_col

    def bootstrap(self, table: MergeTable) -> int:
        """Seed the view from one full count + top-k aggregate of the
        table's CURRENT version."""
        os.makedirs(self.root, exist_ok=True)
        tv = int(table._meta()["latest"])
        # version-pinned read — see MaintainedView.bootstrap
        base = table.read(version=tv).groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias(self.count_col),
            F.slice(
                F.sort_array(F.collect_list(self.value_col), asc=False),
                1,
                self.k,
            ).alias(self.topk_col),
        )
        self._write_version(base, 1)
        self._commit({"latest": 1, "applied_commit": tv})
        return 1

    def apply_feed(
        self, cdf_batch: DataFrame, table_root: str | None = None
    ) -> int | None:
        """Advance the view by one CDC batch. Requires ``table_root``:
        the dirty-group recompute reads the table's snapshot at the
        batch's max commit version (never a commit whose feed is still
        undelivered)."""
        if table_root is None:
            raise ValueError(
                "MaintainedTopKView.apply_feed needs table_root: the "
                "dirty-group recompute reads the post-commit table snapshot"
            )
        admitted = self._admit(cdf_batch, table_root)
        if admitted is None:
            return None
        fresh, hi = admitted
        post = MergeTable(self.spark, table_root).read(version=hi)
        advanced = incremental_top_k_view(
            self.read(), fresh, post, self.group_cols, self.value_col,
            self.k, count_col=self.count_col, topk_col=self.topk_col,
        )
        return self._publish(advanced, hi)


class MaintainedDistinctView(_DurableViewBase):
    """A durable, versioned count + COUNT(DISTINCT) view of a MergeTable.

    COUNT(DISTINCT) is not group-invertible (removing one copy of a
    value must not drop it while duplicates remain), but its SUPPORT
    RELATION — one row per (group, value) with multiplicity
    (operators/ivm.py::bootstrap_distinct_support) — is: every change
    image contributes ±1 to exactly one support row, so unlike the
    MIN/MAX and TOP-K views this one needs NO table access, ever — the
    feed alone is enough (the count+sum views' property, recovered by
    factoring the aggregate through an invertible relation).

    What persists per version is the support relation itself; ``read()``
    serves its (group, n_rows, n_distinct) projection. Scale shape: the
    state is O(distinct (group, value)) rows — larger than an aggregate
    view but far smaller than the table whenever values repeat, and each
    publish rewrites it wholesale (one coalesced file, like its
    siblings). For enormous (group, value) cardinality, persist the
    support relation AS a MergeTable keyed by (group, value) so a commit
    rewrites only the key-range-touched files and the delta becomes a
    normal merge — the design operators/ivm.py prescribes; this class
    keeps the simpler versioned-parquet layout that matches the rest of
    the view family and its serving tier.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        group_cols: list[str],
        value_col: str,
        count_col: str = "n_rows",
        distinct_col: str = "n_distinct",
        keep_versions: int = 2,
    ) -> None:
        super().__init__(spark, root, keep_versions=keep_versions)
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.count_col = count_col
        self.distinct_col = distinct_col

    def bootstrap(self, table: MergeTable) -> int:
        """Seed the support relation from one full pass over the table's
        CURRENT version."""
        os.makedirs(self.root, exist_ok=True)
        tv = int(table._meta()["latest"])
        # version-pinned read — see MaintainedView.bootstrap
        support = bootstrap_distinct_support(
            table.read(version=tv), self.group_cols, self.value_col
        )
        self._write_version(support, 1)
        self._commit({"latest": 1, "applied_commit": tv})
        return 1

    def read(self, with_state: bool = False) -> DataFrame:
        """The served aggregate (group, n_rows, n_distinct) — or the
        underlying support relation with ``with_state=True``."""
        support = super().read()
        if with_state:
            return support
        return distinct_count_view(
            support,
            self.group_cols,
            self.value_col,
            count_col=self.count_col,
            distinct_col=self.distinct_col,
        )

    def apply_feed(
        self, cdf_batch: DataFrame, table_root: str | None = None
    ) -> int | None:
        """Advance the support relation by one CDC batch (which may carry
        several commits' images — the support delta is linear in the
        feed, so a multi-commit batch folds in one pass with no
        self-dirtying argument needed). Watermark-first, so replay is a
        no-op; the published version is the NEW support relation."""
        admitted = self._admit(cdf_batch, table_root)
        if admitted is None:
            return None
        fresh, hi = admitted
        advanced = incremental_distinct_count_view(
            self.read(with_state=True), fresh, self.group_cols, self.value_col
        )
        return self._publish(advanced, hi)
