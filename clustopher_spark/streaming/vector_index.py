"""Incremental ANN index maintenance over an embedding stream.

The persisted :class:`~clustopher_spark.sources.vector_index.IVFPQIndex`
already separates build (train + encode everything, once) from append
(encode with FROZEN quantizers, O(batch)); this module is the Structured
Streaming binding that keeps such an index current as embeddings arrive —
the third leg of the engine's incremental-serving triad next to the
durable pyramid store (``streaming/pyramid.py``) and the near-dup index
(``streaming/dedup_index.py``). The reference has no vector surface at
all; this is LLM-pipeline extension scope (embedding ingest feeding
retrieval/SemDeDup), not reference parity.

Per micro-batch (foreachBatch):

1. first non-empty batch on an empty root **bootstraps** the index —
   trains the coarse quantizer + PQ codebooks on that batch and encodes
   it (``bootstrap=True``; production corpora should instead ``build()``
   offline on a representative sample and hand the root to the stream —
   the bootstrap exists so a cold pipeline needs no side-channel step);
2. every later batch is encoded with the frozen quantizers and appended
   under its batch-addressed partition directory — ``append`` is
   idempotent (a committed ``batch_id`` is skipped; a crashed append's
   orphan directory is overwritten on replay and excluded from reads by
   the committed-batch filter), so availableNow replay is exactly-once;
3. **drift telemetry**: appends never move the centroids (the FAISS
   operational model — retrain rarely, re-encode never), so the one
   number an operator needs is "how well do the frozen centroids still
   fit the incoming data". Each batch's mean/p95 distance-to-assigned-
   centroid is written to ``{root}/drift`` (batch-addressed, replay-
   idempotent); :func:`drift_report` joins it against the bootstrap
   baseline — when the ratio climbs, rebuild into a fresh root and swap.

Scale shape: append cost is O(batch) — one broadcast-centroid argmin +
one Arrow-batched PQ encode, no shuffle wider than the batch's
``repartition("list_id")`` (bounded by n_lists); the drift pass is one
map + one aggregate over the batch. The index is never rescanned on
ingest, and queries (``IVFPQIndex.topk``) keep reading only committed
batch directories, so a concurrent reader never sees a half-appended
batch.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from clustopher_spark.sources.vector_index import IVFPQIndex


def _assign_dist_udf(centroids: np.ndarray):
    """Arrow-batched distance to the nearest (frozen) coarse centroid."""
    cents = centroids  # (n_lists, dim), broadcast in the closure

    @pandas_udf("double")
    def dist(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy())  # (n, dim)
        d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=-1)
        return pd.Series(np.sqrt(d2.min(axis=1)))

    return dist


def _write_drift(
    index: IVFPQIndex, batch_df: DataFrame, vec_col: str, label: str
) -> None:
    """One map + one aggregate over the batch; batch-addressed so a
    replayed batch overwrites its own row instead of duplicating it."""
    cents, _, _ = index._quantizers()
    dist = _assign_dist_udf(cents)
    stats = (
        batch_df.select(dist(F.col(vec_col)).alias("d"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("d"), 6).alias("mean_dist"),
            F.round(F.expr("percentile_approx(d, 0.95)"), 6).alias("p95_dist"),
        )
        # 'batch' itself comes from the partition directory name on read
    )
    stats.write.mode("overwrite").parquet(
        os.path.join(index.root, "drift", f"batch={label}")
    )


def drift_report(spark, index_root: str) -> DataFrame:
    """Per-batch quantization drift vs the baseline.

    Returns (batch, n, mean_dist, p95_dist, mean_ratio) where mean_ratio
    is mean_dist / baseline mean_dist — the rebuild signal (ratios near
    1.0 mean the frozen centroids still fit the incoming distribution).
    The baseline is the bootstrap's 'base' row when one exists; an index
    built OFFLINE and then streamed into has no base row, so the earliest
    appended batch stands in (its ratio reads 1.0 by construction)."""
    drift = spark.read.parquet(os.path.join(index_root, "drift"))
    order = F.when(F.col("batch") == "base", F.lit(-1)).otherwise(
        F.expr("cast(substring(batch, 2, 18) as long)")
    )
    base = (
        drift.orderBy(order)
        .limit(1)
        .select(F.col("mean_dist").alias("_base_mean"))
    )
    return (
        drift.crossJoin(F.broadcast(base))
        .select(
            "batch",
            "n",
            "mean_dist",
            "p95_dist",
            F.round(F.col("mean_dist") / F.col("_base_mean"), 4).alias(
                "mean_ratio"
            ),
        )
        .orderBy(
            # base first, then numeric batch order (b2 before b10)
            F.when(F.col("batch") == "base", F.lit(-1))
            .otherwise(F.expr("cast(substring(batch, 2, 18) as long)"))
        )
    )


def incremental_vector_index(
    embeddings_stream: DataFrame,
    index_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    m_subvectors: int = 8,
    n_codes: int = 64,
    seed: int = 42,
    bootstrap: bool = True,
    compact_every: int | None = None,
    op_col: str | None = None,
    query_name: str = "vector_index_sink",
):
    """Drain ``embeddings_stream`` (availableNow) into the IVF-PQ index at
    ``index_root``, bootstrapping it from the first batch when empty and
    ``bootstrap`` is set. ``compact_every=N`` folds the accumulated batch
    directories into a fresh base every N batches and vacuums superseded
    data roots (the long-running stream's small-files maintenance; skip it
    when an external scheduler owns maintenance). ``op_col`` names a column
    carrying ``'del'`` for deletion rows (anything else is an append) —
    the streaming right-to-be-forgotten, same contract as the pyramid
    store: within a batch deletes apply after appends, tombstones hide
    only rows appended at-or-before the deleting batch, and the next
    compaction purges them physically. Returns the finished
    StreamingQuery."""
    spark = embeddings_stream.sparkSession
    index = IVFPQIndex(
        spark,
        index_root,
        n_lists=n_lists,
        m_subvectors=m_subvectors,
        n_codes=n_codes,
        seed=seed,
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        batch_df = batch_df.localCheckpoint(eager=True)
        if op_col is not None:
            # eqNullSafe: a NULL op is "anything else", i.e. an append —
            # plain != would silently drop NULL-op rows from BOTH sides
            is_del = F.col(op_col).eqNullSafe("del")
            adds = batch_df.filter(~is_del).drop(op_col)
            dels = batch_df.filter(is_del).select(id_col)
        else:
            adds, dels = batch_df, None
        if index._meta() is None:
            if not bootstrap:
                raise ValueError(
                    f"index at {index_root} is empty and bootstrap=False — "
                    "build() it offline first"
                )
            if not adds.take(1):
                return  # delete-only batch on an empty index: nothing to do
            # the bootstrap batch id seeds the append watermark inside
            # build's ONE atomic meta commit — a crash after build cannot
            # replay this batch as an append (no second meta write exists)
            index.build(
                adds, id_col=id_col, vec_col=vec_col,
                initial_last_batch=batch_id,
            )
            # the baseline the drift ratios divide by; written after build
            # so the quantizers exist, keyed 'base' so replay overwrites
            # (a crash before this write is healed by drift_report's
            # earliest-batch baseline fallback)
            _write_drift(index, adds, vec_col, "base")
            if dels is not None:
                index.delete(dels, batch_id)  # delete wins within the batch
            return
        # append and delete each self-guard on their own watermark, so a
        # replayed batch whose append committed but whose delete crashed
        # still completes the delete — drift writes only with the append
        if adds.take(1) and batch_id > int(index._meta().get("last_batch", -1)):
            # drift is written before the append commit: on a crash between
            # the two, replay re-lands identical stats (overwrite) and then
            # completes the append the committed-batch filter was hiding
            _write_drift(index, adds, vec_col, f"b{batch_id}")
            index.append(adds, batch_id)
        if dels is not None:
            index.delete(dels, batch_id)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            index.compact()
            # grace window: the just-superseded root survives one more
            # cycle so a reader that planned its scan pre-repoint finishes
            index.vacuum(keep_previous=True)

    q = (
        embeddings_stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", index_root + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q
