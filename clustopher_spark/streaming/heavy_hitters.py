"""Streaming maintenance of a mergeable heavy-hitters summary.

Batch twin: ``llm_token_heavy_hitters`` (queries/llm.py) — exact corpus
heavy hitters by one aggregate. This module is the continuously-ingesting
form: a Misra-Gries summary of size k (Misra & Gries 1982; merge rule
from Agarwal et al., "Mergeable Summaries", PODS 2012) maintained by
foreachBatch, answering "top keys by count" over the full history from a
state table of AT MOST k rows — never rescanning raw events.

Per micro-batch:

1. exact batch counts: groupBy(key) -> count (one shuffle, map-side
   combined; bounded by the batch's distinct keys);
2. MG merge: union with the persisted summary, sum counts per key; if
   more than k keys survive, subtract the (k+1)-th largest count c* from
   every counter and drop the non-positives (keeps <= k rows), folding
   c* into the accumulated error bound ``err``;
3. overwrite the summary + one-row meta (n_total, err, last_batch).

Guarantees carried by the summary (asserted in tests):
* every key with true count > err is retained;
* for a retained key, cnt <= true count <= cnt + err;
* err <= n_total / (k + 1) (the mergeable-summaries bound).

Replay safety: unlike HLL-union (idempotent over sets), MG merge would
double-count a replayed batch, so the meta records the last folded
``batch_id`` and a replay of batch_id <= last_batch is skipped — the
same exactly-once trick as the foreachBatch upsert sink (sinks.py).
The summary and its meta commit ATOMICALLY (round-3 advice closed the
old two-parquet-commit crash window, which could refold a batch and
void the error bound): each fold writes the k-row summary under an
immutable ``versions/v{N}`` directory and repoints ``meta.json`` with
one atomic rename carrying version + counters + last_batch
(streaming/state_store.py — the PyramidStore pattern). The bottom-k
sample store (samples.py) avoids the problem entirely by being
idempotent by construction.

Scale shape: state is <= k rows regardless of history length; the
(k+1)-th-largest lookup is a distributed sort-limit over at most
k + batch-vocabulary rows collecting k+1 rows to the driver; everything
else is hash aggregates. At 100 TB the raw stream never accumulates
anywhere — only the k-row summary does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.streaming.state_store import (
    commit_meta,
    prune_versions,
    read_meta,
    version_dir,
)


def _read_state(spark, store_path: str):
    """Return (summary_df | None, n_total, err, last_batch)."""
    meta = read_meta(store_path)
    if meta is None:
        return None, 0, 0, -1
    summary = spark.read.parquet(
        os.path.join(version_dir(store_path, int(meta["version"])), "summary")
    )
    return summary, meta["n_total"], meta["err"], meta["last_batch"]


def _write_state(spark, store_path: str, summary: DataFrame,
                 n_total: int, err: int, batch_id: int) -> None:
    meta = read_meta(store_path) or {"version": 0}
    version = int(meta["version"]) + 1
    # a FRESH immutable version directory: the merge can stream-read the
    # old summary while writing (no read-overwrite hazard), and the
    # atomic meta repoint below publishes summary + counters together
    summary.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(version_dir(store_path, version), "summary")
    )
    commit_meta(store_path, {
        "version": version, "n_total": n_total, "err": err,
        "last_batch": batch_id,
    })
    prune_versions(store_path, {version})


def incremental_heavy_hitters(
    stream: DataFrame,
    store_path: str,
    key_col: str = "user_id",
    k: int = 64,
    query_name: str = "heavy_hitters_sink",
):
    """Drain ``stream`` (availableNow) into the k-row Misra-Gries summary
    at ``store_path``. Returns the finished StreamingQuery."""
    spark = stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        summary, n_total, err, last_batch = _read_state(spark, store_path)
        if batch_id <= last_batch:  # checkpoint replay: already folded
            return
        fresh = (
            batch_df.groupBy(F.col(key_col).alias("key"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        n_batch = fresh.agg(F.sum("cnt")).collect()[0][0]
        if not n_batch:
            return
        merged = fresh if summary is None else (
            fresh.unionByName(summary)
            .groupBy("key")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        # (k+1)-th largest count, if the merged vocabulary exceeds k rows
        top = merged.orderBy(F.col("cnt").desc(), "key").limit(k + 1).collect()
        if len(top) > k:
            cstar = top[-1]["cnt"]
            merged = merged.filter(F.col("cnt") > cstar).withColumn(
                "cnt", F.col("cnt") - F.lit(cstar)
            )
            err += cstar
        _write_state(spark, store_path, merged,
                     n_total + n_batch, err, batch_id)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_path + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q


def heavy_hitters_topn(spark, store_path: str, n: int = 10) -> DataFrame:
    """Serve-time read: top-n keys with their count bounds
    (cnt <= true <= cnt + err) from the k-row summary — no event scan."""
    summary, n_total, err, _ = _read_state(spark, store_path)
    if summary is None:
        raise ValueError(f"no heavy-hitters state at {store_path}")
    return (
        summary.orderBy(F.col("cnt").desc(), "key")
        .limit(n)
        .select(
            "key",
            F.col("cnt").alias("count_lower"),
            (F.col("cnt") + F.lit(err)).cast("long").alias("count_upper"),
            F.lit(n_total).cast("long").alias("n_total"),
        )
    )
