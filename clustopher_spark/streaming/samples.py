"""Stream-maintained uniform sample via bottom-k hash priorities.

The fourth stream-maintained summary next to the HLL / Misra-Gries /
histogram stores: a size-k uniform random sample (without replacement)
of every distinct key ever seen, from k rows of state.

Classic reservoir sampling is awkward to distribute (the acceptance
probability depends on a global running count, and a replayed batch
perturbs it). Bottom-k by a DETERMINISTIC hash priority fixes both
(Cohen & Kaplan 2007, bottom-k sketches): assign every key the priority
xxhash64(key) and keep the k smallest priorities. Because the hash is a
fixed uniform-random permutation of the key space, the k smallest form
a uniform sample of the distinct keys; because it is deterministic, the
maintenance is

* mergeable: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) —
  an associative, commutative fold;
* idempotent under checkpoint replay: refolding a batch re-offers the
  same (key, priority) pairs, and min-k union is a set operation — no
  batch-id bookkeeping needed (the HLL property, which the count-based
  MG/histogram stores lack);
* exactly reproducible: the sample is a FUNCTION of the distinct key
  set, so a batch recomputation over the same data yields the
  identical sample (asserted by test).

Scale shape: each micro-batch reduces to its own bottom-k via a
TakeOrdered (k rows to the driver-free sort-limit), unions with the
k-row store, and keeps the k smallest — state and shuffle are O(k)
regardless of history. As a bonus the k-th smallest priority is the
classic bottom-k distinct-count estimator: D ≈ (k-1) / U_(k) for
U_(k) = the k-th smallest hash mapped to (0, 1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bottom_k(df: DataFrame, k: int) -> DataFrame:
    # distinct BEFORE the sort-limit: duplicate keys share a priority and
    # would crowd out genuinely distinct ones
    return df.select("key", "priority").distinct().orderBy("priority").limit(k)


def incremental_bottomk_sample(
    stream: DataFrame,
    store_path: str,
    key_col: str = "user_id",
    k: int = 64,
    query_name: str = "bottomk_sample_sink",
    checkpoint_path: str | None = None,
):
    """Drain ``stream`` (availableNow) into the k-row bottom-k sample
    store at ``store_path``. Returns the finished StreamingQuery."""
    spark = stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.select(
            F.col(key_col).cast("long").alias("key"),
            F.xxhash64(F.col(key_col).cast("long")).alias("priority"),
        )
        if not fresh.take(1):
            return
        merged = _bottom_k(fresh, k)
        if os.path.isdir(store_path) and any(
            not f.startswith("_") for f in os.listdir(store_path)
        ):
            merged = _bottom_k(merged.unionByName(spark.read.parquet(store_path)), k)
        # eager checkpoint: finish READING the old store before overwrite
        merged.localCheckpoint(eager=True).coalesce(1).write.mode(
            "overwrite"
        ).parquet(store_path)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path or store_path + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q


def sample_keys(spark, store_path: str) -> DataFrame:
    """The maintained uniform sample: (key, priority), k rows."""
    return spark.read.parquet(store_path).orderBy("priority")


def distinct_count_estimate(spark, store_path: str, k: int) -> float:
    """Bottom-k distinct-count estimator D ≈ (k-1)/U_(k) with U_(k) the
    largest retained priority mapped to (0, 1). Exact when fewer than k
    distinct keys have been seen (the store then holds them all)."""
    rows = spark.read.parquet(store_path).orderBy("priority").collect()
    if len(rows) < k:  # store not full -> it IS the distinct key set
        return float(len(rows))
    # priorities are signed int64; map onto (0, 1)
    u = (rows[-1]["priority"] + 2**63 + 1) / 2**64
    return (k - 1) / u
