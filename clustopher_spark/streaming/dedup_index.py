"""Incremental near-dup index maintenance over a document stream.

The batch dedup operators (:mod:`clustopher_spark.functions.dedup`) answer
"which pairs in THIS corpus are near-dups"; a training-data ingest needs
the streaming form: "is this NEW document a near-dup of anything already
ingested?" — answered per micro-batch against a persisted LSH band index,
without ever rescanning raw history.

Per micro-batch (foreachBatch):

1. MinHash signatures for the batch (one explode + groupBy, JVM hashes);
2. explode to (band_idx, band_hash) keys;
3. LEFT SEMI join against the persisted band index -> docs that collide
   with ANY already-indexed band are flagged as index-dups (LSH's usual
   probabilistic contract: collision probability ~ s^rows per band);
4. append the flags (doc_id, batch_id, dup_of_index) to a log table;
5. append the band keys of NON-dup docs to the index — dups are not
   re-indexed, so one representative per near-dup cluster accumulates,
   and index growth tracks UNIQUE content, not ingest volume.

Scale shape: the exchange is O(batch), never O(index) — the batch's
(band_idx, band_hash) key set is broadcast and the INDEX scan is
semi-join-reduced against it map-side (the DPP-style runtime-filter
plan: an exact broadcast set, since a micro-batch's key set always
fits; a Bloom filter + recheck join is the fallback when it would
not), so no index row is ever shuffled — only the <= O(batch)
surviving keys flow back, themselves broadcast onto the batch. The
index itself stays a 16 B/key projection (two small ints per band).
Exactly-once comes from the streaming checkpoint (availableNow replays
only failed batches; a replayed batch re-flags identically because
flagging is deterministic).

Within-batch near-dups are intentionally NOT flagged here — that is the
batch operator ``lsh_candidate_pairs`` run on the same signatures (one
line, same plan); this module's contract is stream-vs-history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustopher_spark.functions.dedup import minhash_signatures


def band_table(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(id, sig) -> (id, band_idx, band_hash): one row per LSH band."""

    def band_key(b):
        return F.xxhash64(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))

    return signatures.select(
        "id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_key)
        ).alias("band_idx", "band_hash"),
    )


def incremental_minhash_dedup(
    docs_stream: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    query_name: str = "minhash_index_sink",
):
    """Drain ``docs_stream`` (availableNow) through the incremental dedup
    index at ``index_path``. Appends flags to ``{index_path}_flags``.
    Returns the finished StreamingQuery."""
    spark = docs_stream.sparkSession
    flags_path = index_path + "_flags"
    rows_per_band = num_hashes // bands

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sigs = minhash_signatures(
            batch_df, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, k=k,
        )
        bands_df = band_table(sigs, bands, rows_per_band).localCheckpoint(eager=True)
        have_index = os.path.isdir(index_path) and any(
            f.endswith(".parquet") for f in os.listdir(index_path)
        )
        if have_index:
            idx = spark.read.parquet(index_path)
            # semi-join reduction (module docstring): broadcast the batch's
            # key set, prune the index scan map-side — zero index rows
            # shuffled; then broadcast the (<= batch-sized) surviving keys
            # back onto the batch to flag colliding docs
            batch_keys = bands_df.select("band_idx", "band_hash").distinct()
            hit_keys = (
                idx.join(F.broadcast(batch_keys), ["band_idx", "band_hash"], "left_semi")
                .distinct()
            )
            dup_ids = (
                bands_df.join(
                    F.broadcast(hit_keys), ["band_idx", "band_hash"], "left_semi"
                )
                .select("id")
                .distinct()
                .localCheckpoint(eager=True)
            )
        else:
            dup_ids = spark.createDataFrame([], "id long")
        flags = (
            bands_df.select("id")
            .distinct()
            .join(dup_ids.withColumn("_dup", F.lit(True)), "id", "left")
            .select(
                F.col("id").alias(id_col),
                F.lit(batch_id).alias("batch_id"),
                F.coalesce("_dup", F.lit(False)).alias("dup_of_index"),
            )
        )
        flags.write.mode("append").parquet(flags_path)
        new_bands = bands_df.join(dup_ids, "id", "left_anti")
        new_bands.write.mode("append").parquet(index_path)

    q = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", index_path + "_checkpoint")
        .start()
    )
    q.awaitTermination()
    return q
