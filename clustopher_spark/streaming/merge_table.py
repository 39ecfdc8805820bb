"""Structured-Streaming maintenance of a copy-on-write MERGE table.

The fourth leg of the engine's incremental-serving surface, next to the
durable pyramid store (``streaming/pyramid.py``), the near-dup index
(``streaming/dedup_index.py``), and the ANN index
(``streaming/vector_index.py``): a CDC-shaped stream of upsert/delete
rows keeps a :class:`~clustopher_spark.sources.merge_table.MergeTable`
current, one atomic version per micro-batch, with the row-level change
feed recorded as a by-product of every commit. The reference has no
incremental surface at all (runner/runner.go loads static datasets); this
is the mutable-dimension / corrections-feed path a 100 TB pipeline needs
(metadata fixes, license revocations, label updates) without rewriting
the table.

Per micro-batch (foreachBatch):

1. the first non-empty batch on an empty root **bootstraps** the table —
   ``create()`` seeds the replay watermark inside its one atomic commit,
   so a crash after create cannot replay the bootstrap batch as a merge
   (delete rows in the bootstrap batch are dropped: there is nothing to
   delete from yet);
2. every later batch is one ``merge(batch_id=...)`` — key-range file
   pruning bounds the read, the broadcast key set bounds the shuffle, and
   a replayed committed ``batch_id`` is skipped before any write, so
   availableNow replay is exactly-once;
3. ``compact_every=N`` folds the accumulating file set into a fresh
   range-partitioned base every N batches and vacuums versions beyond the
   retention window (the long-running stream's small-files + key-overlap
   maintenance).

Batches must be key-distinct (MERGE's one-source-row-per-target-row rule);
``dedupe='last'`` keeps the row with the greatest ``order_col`` per key —
the CDC convention where the newest change wins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clustopher_spark.sources.merge_table import MergeTable, _validate_batch


def stream_changes(
    spark, table_root: str, options: dict | None = None
) -> DataFrame:
    """The table's change feed as a STREAMING SOURCE: every merge commit's
    CDF becomes one batch of pre/post/insert/delete images — the produce
    side of a CDC pipeline (downstream IVM, replication, cache
    invalidation) with exactly-once file-source semantics.

    Safe by construction: merge() stages the feed under an
    underscore-prefixed directory (invisible to Spark's file listing) and
    publishes it by rename only AFTER the atomic meta commit, so this
    source can never observe an uncommitted or partially-written feed —
    the rename is the publication event. A crash BETWEEN a commit and its
    rename is healed by the writer itself (every later merge, changes()
    call, or vacuum publishes all committed staged feeds), so a live
    pipeline's gap lasts at most one batch.

    Listing growth (the glob re-lists ``changes/v*`` every trigger) is
    bounded by TWO mechanisms, so a year-long table never accumulates
    unbounded feed dirs:

    * **vacuum retention** — ``MergeTable.vacuum(keep_last=N)`` deletes
      the feed dirs of dropped versions with their data files; a consumer
      that already drained them continues unaffected (the file source's
      checkpoint tolerates seen files disappearing — pinned by test), and
      a consumer still BELOW the retention window fails fast through
      ``changes()`` rather than silently skipping commits. Size
      ``keep_last`` to the slowest consumer's lag.
    * **maxFileAge** — Spark's file source ignores files older than this
      relative to the newest (default ``7d``), so even without vacuum the
      per-trigger working set is time-bounded for a resumed stream.

    ``options`` passes file-source knobs through (``maxFileAge``,
    ``maxFilesPerTrigger`` for commit-paced draining — safe because
    merge() writes exactly ONE feed file per commit, so a file-count
    limit delivers whole commits, never a slice of one; watermark-based
    consumers like MaintainedView depend on that and additionally verify
    it per batch, ...).

    The stream's schema is the table schema AS OF STREAM START: a stream
    started after a widening merge NULL-fills the pre-widening feeds. A
    stream already RUNNING when a widening commits keeps its frozen
    schema and will not see the new column until restarted (Spark file
    sources fix their schema at start) — restart CDC consumers after a
    widening; the checkpoint resumes exactly where they left off, now
    under the widened schema."""
    t = MergeTable(spark, table_root)
    # schema-as-of-stream-start: the stored per-version schema JSON gives
    # it driver-side; building the full table read (hundreds of manifest
    # paths listed just to take .limit(0).schema) was measured at >1 s of
    # construction per maintain() on a 512-file table
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    base = t._schema(int(t._meta()["latest"]))
    if base is not None:
        schema = StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), True),
                StructField("_commit_version", LongType(), True),
            ]
        )
    else:  # legacy table without schema.json: infer as before
        schema = (
            t.read()
            .limit(0)
            .withColumn("_change_type", F.lit(""))
            .withColumn("_commit_version", F.lit(0).cast("long"))
            .schema
        )
    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.parquet(os.path.join(table_root, "changes", "v*"))


def incremental_merge_table(
    rows_stream: DataFrame,
    table_root: str,
    key_cols: list[str],
    op_col: str | None = "op",
    order_col: str | None = None,
    num_files: int = 8,
    compact_every: int | None = None,
    vacuum_keep: int = 2,
    query_name: str = "merge_table_sink",
):
    """Drain ``rows_stream`` (availableNow) into the MergeTable at
    ``table_root``, bootstrapping it from the first batch when empty.
    ``order_col`` enables last-writer-wins dedup within a batch (ties and
    absence fall back to requiring key-distinct input). Returns the
    finished StreamingQuery."""
    spark = rows_stream.sparkSession
    table = MergeTable(spark, table_root)

    def _dedupe(batch: DataFrame) -> DataFrame:
        if order_col is None:
            return batch
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        batch_df = _dedupe(batch_df).localCheckpoint(eager=True)
        if not os.path.isfile(os.path.join(table_root, "meta.json")):
            first = batch_df
            if op_col is not None and op_col in first.columns:
                # merge() validates op values on every later batch; the
                # bootstrap must too, BEFORE the delete-filter below would
                # silently insert a typo'd op ('Upsert', NULL) as data —
                # create() separately rejects null keys
                _validate_batch(first, key_cols, op_col)
                first = first.filter(
                    ~F.col(op_col).eqNullSafe("delete")
                ).drop(op_col)
            if order_col is not None:
                first = first.drop(order_col)
            if not first.take(1):
                return  # delete-only batch on an empty table: nothing to do
            table.create(
                first, key_cols, num_files=num_files,
                initial_last_batch=batch_id,
                # the op-column branch above already ran the fused
                # null+op check on these rows — don't scan the batch twice
                validate=not (op_col is not None and op_col in batch_df.columns),
            )
            return
        merge_batch = batch_df.drop(order_col) if order_col else batch_df
        v = table.merge(
            merge_batch,
            op_col=op_col if (op_col and op_col in batch_df.columns) else None,
            batch_id=batch_id,
        )
        # maintenance only on a batch that actually COMMITTED: a replayed
        # (watermark-skipped) batch must be a strict no-op — running
        # compact/vacuum on replay would mutate version history and could
        # vacuum feeds a lagging CDC consumer has not drained yet
        if v is not None and compact_every and batch_id > 0 and batch_id % compact_every == 0:
            table.compact(num_files=num_files)
            table.vacuum(keep_last=vacuum_keep)

    q = (
        rows_stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", table_root + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q
