"""Persisted IVF-PQ vector index: build once, query many, append forever.

:func:`clustopher_spark.functions.similarity.ann_ivf_pq_topk` trains its
quantizers per call — right for a one-shot query, wrong for a serving
system. This store separates the three lifecycles a 100 TB vector corpus
actually has:

* **build** — train the coarse quantizer + PQ codebooks on a bounded
  sample, encode the whole corpus once (map-only: broadcast-matmul list
  assignment + Arrow-batched PQ encoding), and write one parquet table
  ``(neighbor_id, codes, vec)`` PARTITIONED BY ``list_id``;
* **query** — probed lists become *partition-pruned scans* (the probe
  ids are literal ``list_id IN (...)`` filters, so Spark never lists or
  reads the other ``n_lists - n_probe`` directories — the inverted-file
  idea expressed in the storage layout), then the usual ADC shortlist +
  exact re-rank from the vectors stored alongside the codes;
* **append** — new vectors are encoded with the FROZEN quantizers (the
  FAISS operational model: retrain rarely, re-encode never) and appended
  to their list partitions under a batch-id-addressed subdirectory, so
  a replayed micro-batch overwrites itself instead of duplicating rows —
  the same idempotence contract as the pyramid store and dedup index.

Quantizers are small (n_lists x dim centroids, M x K x dsub codebooks —
a few hundred KB at production sizes) and live in ``meta.json`` beside
the data; every reader broadcast-embeds them into its UDFs.

Scale shape: query cost is O(corpus/n_lists x n_probe) rows of M-byte
codes through one broadcast join — no shuffle of the corpus, ever; the
scan prunes at the DIRECTORY level before parquet stats even apply.
Append cost is O(batch). Only build touches everything, once.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clustopher_spark.functions.similarity import (
    adc_shortlist,
    exact_rerank,
    ivf_pq_assign_encode_udf,
    pq_probe_frame,
    train_ivf_centroids,
    train_pq_codebooks,
)


class IVFPQIndex:
    """A durable IVF-PQ index rooted at ``root``.

    ``n_lists`` / ``m_subvectors`` / ``n_codes`` are layout properties
    fixed at :meth:`build` and recorded in meta.json; a reopened instance
    always uses the stored ones.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_lists: int = 16,
        m_subvectors: int = 8,
        n_codes: int = 64,
        seed: int = 42,
    ) -> None:
        self.spark = spark
        self.root = root
        self._defaults = {
            "n_lists": n_lists,
            "m_subvectors": m_subvectors,
            "n_codes": n_codes,
            "seed": seed,
        }
        os.makedirs(root, exist_ok=True)

    # ---- meta / quantizers ----
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def _meta(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            return json.load(f)

    def _quantizers(self) -> tuple[np.ndarray, np.ndarray, dict]:
        meta = self._meta()
        if meta is None:
            raise ValueError("index is empty — build() it first")
        cents = np.array(meta["centroids"], dtype=np.float64)
        books = np.array(meta["codebooks"], dtype=np.float64)
        return cents, books, meta

    def _data_path_for(self, meta: dict | None) -> str:
        # versioned data roots (compact() repoints): v absent/None is the
        # original "lists" dir, so pre-compaction indexes read unchanged.
        # Resolve ONCE per operation from a meta dict already in hand —
        # re-reading meta per access would both re-parse the quantizers
        # (hundreds of KB at production sizes) and open a TOCTOU where a
        # concurrent compact repoints between two resolutions.
        v = (meta or {}).get("data_version")
        return os.path.join(
            self.root, "lists" if v is None else f"lists_v{v}"
        )

    @property
    def _data_path(self) -> str:
        return self._data_path_for(self._meta())

    def _coded(self, df: DataFrame, cents, books, id_col, vec_col) -> DataFrame:
        # fused assignment+encoding: ONE Arrow boundary over the corpus
        # instead of the chained assign -> encode pair (round 8, guide
        # §4.1); bit-identical by construction and by the index-vs-
        # one-shot answer-equality tests
        enc = ivf_pq_assign_encode_udf(books, cents)
        return df.select(
            F.col(id_col).alias("neighbor_id"),
            enc(F.col(vec_col)).alias("_e"),
            F.col(vec_col).alias("vec"),
        ).select(
            "neighbor_id",
            F.col("_e.list_id").alias("list_id"),
            F.col("_e.codes").alias("codes"),
            "vec",
        )

    # ---- lifecycle ----
    def build(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        sample_fraction: float | None = None,
        initial_last_batch: int = -1,
    ) -> int:
        """Train quantizers, encode the corpus, write the list-partitioned
        table. Returns the number of rows indexed. ``initial_last_batch``
        seeds the append watermark in build's ONE atomic meta commit — a
        streaming bootstrap passes its batch id here so a crash right
        after build cannot replay the bootstrap batch as an append."""
        if self._meta() is not None:
            raise ValueError("index already built — use append() for new rows")
        p = self._defaults
        shared = None
        if sample_fraction is None:
            # one bounded sample collect feeds BOTH quantizer trainings
            # (bit-identical draw either way — see train_ivf_centroids)
            from clustopher_spark.functions.similarity import (
                DEFAULT_SAMPLE_ROWS,
                _as_double,
                _bounded_uniform_sample,
            )

            shared = _bounded_uniform_sample(
                corpus.select(_as_double(F.col(vec_col)).alias("v")),
                DEFAULT_SAMPLE_ROWS, p["seed"], None,
            )
        cents = train_ivf_centroids(
            corpus, p["n_lists"], vec_col, sample_fraction, p["seed"],
            sample_pdf=shared,
        )
        books = train_pq_codebooks(
            corpus, cents, p["m_subvectors"], p["n_codes"], vec_col,
            seed=p["seed"], sample_pdf=shared,
        )
        coded = self._coded(corpus, cents, books, id_col, vec_col)
        # one file per list: the whole list rides one task at query time.
        # The directory is named as a partition level (batch=base) so the
        # whole store reads as ONE table with (batch, list_id) partition
        # columns — probe filters prune lists, the committed-batch filter
        # prunes replay orphans, both at the directory level.
        base = os.path.join(self._data_path, "batch=base")
        (
            coded.repartition("list_id")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(base)
        )
        n = self.spark.read.parquet(base).count()
        meta = {
            **p,
            "id_col": id_col,
            "vec_col": vec_col,
            "centroids": cents.tolist(),
            "codebooks": books.tolist(),
            "last_batch": int(initial_last_batch),
        }
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)
        return n

    def append(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Encode ``batch_df`` with the FROZEN quantizers and append it
        under a batch-addressed directory (idempotent under replay; a
        committed ``batch_id`` is skipped). Drift note: appends never move
        the centroids — when the data distribution shifts enough that
        recall degrades, rebuild into a fresh root and swap."""
        cents, books, meta = self._quantizers()
        if batch_id <= int(meta.get("last_batch", -1)):
            return False
        coded = self._coded(
            batch_df, cents, books, meta["id_col"], meta["vec_col"]
        )
        bdir = os.path.join(self._data_path_for(meta), f"batch=b{batch_id}")
        (
            coded.repartition("list_id")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(bdir)
        )
        # the write's own partition dirs double as the emptiness probe —
        # the old take(1) pre-job is gone; an empty batch leaves an
        # empty UNCOMMITTED dir (no list_id= partitions), invisible to
        # _table()'s committed-batch filter and overwritten by any later
        # real commit of the same id
        if not any(d.startswith("list_id=") for d in os.listdir(bdir)):
            return False
        meta["last_batch"] = batch_id
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)
        return True

    # ---- maintenance ----
    def compact(self) -> int:
        """Fold every committed batch directory into one fresh ``batch=base``
        under a NEW versioned data root, then atomically repoint meta — the
        small-files answer for a long-appending stream (one tiny directory
        per micro-batch otherwise accumulates forever). ``last_batch`` is
        preserved, so replays of pre-compaction batch ids stay no-ops.
        Readers opened before the repoint keep reading the old version's
        files until :meth:`vacuum` removes them (same snapshot contract as
        the pyramid store: pinned in-window readers see original content;
        post-vacuum stale readers fail fast rather than read mixed data).
        Tombstoned rows are physically absent from the new base, and the
        tombstone log is cleared (the ``last_delete_batch`` watermark
        survives, so replayed delete batches stay no-ops). Returns the
        compacted row count."""
        import shutil

        _, _, meta = self._quantizers()
        cur = self._table(meta)  # committed rows minus tombstones
        v = int(meta.get("data_version", 0)) + 1
        new_base = os.path.join(self.root, f"lists_v{v}", "batch=base")
        (
            cur.select("neighbor_id", "list_id", "codes", "vec")
            .repartition("list_id")
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(new_base)
        )
        n = self.spark.read.parquet(new_base).count()
        meta["data_version"] = v
        # base rows' provenance for tombstone ordering: everything folded
        # in is at-or-before this point, so only LATER deletes can hide it
        meta["base_batch"] = max(
            int(meta.get("last_batch", -1)),
            int(meta.get("last_delete_batch", -1)),
        )
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)
        # deletes are physical in the new base; a crash before this rmtree
        # leaves the tombstones applied as a harmless no-op anti-join
        # (provenance ordering keeps them from touching post-compaction rows)
        shutil.rmtree(os.path.join(self.root, "tombstones"), ignore_errors=True)
        return n

    def list_stats(self) -> dict:
        """Occupancy balance across the IVF lists. The IVF scale hazard is
        a skewed list — each probed list rides ONE task, so the hottest
        list bounds query latency no matter how many executors exist.
        ``balance_factor`` = max list rows / mean list rows; a factor
        drifting well past ~2-3 (or ``occupied_lists`` falling) says the
        frozen centroids no longer partition the data — retrain with more
        lists into a fresh root and swap, same cycle the drift telemetry
        triggers. One groupBy over the partition column (n_lists result
        rows)."""
        meta = self._meta()
        if meta is None:
            raise ValueError("index is empty — build() it first")
        per = [
            r["count"]
            for r in self._table(meta).groupBy("list_id").count().collect()
        ]
        total = sum(per)
        mean = total / len(per) if per else 0
        return {
            "rows": total,
            "n_lists": int(meta["n_lists"]),
            "occupied_lists": len(per),
            "max_list_rows": max(per) if per else 0,
            "balance_factor": round(max(per) / mean, 4) if per else None,
        }

    def vacuum(self, keep_previous: bool = False) -> list[str]:
        """Delete data roots other than the current version's (the
        pre-compaction ``lists`` dir and superseded ``lists_v*`` dirs — a
        crashed compact's orphan next-version dir is also removed since
        meta never pointed at it). ``keep_previous`` retains the
        immediately-superseded root as a grace window for readers that
        planned a scan just before the repoint (the streaming binding's
        default). Returns the removed directory names."""
        import shutil

        meta = self._meta()
        if meta is None:
            return []
        keep = {os.path.basename(self._data_path_for(meta))}
        if keep_previous:
            v = meta.get("data_version")
            if v is not None:
                keep.add("lists" if int(v) == 1 else f"lists_v{int(v) - 1}")
        removed = []
        for d in sorted(os.listdir(self.root)):
            if d not in keep and (d == "lists" or d.startswith("lists_v")):
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
                removed.append(d)
        return removed

    def delete(self, ids, batch_id: int) -> bool:
        """Tombstone ``ids`` (a list or a one-column DataFrame of
        neighbor ids) so they stop answering queries immediately; the
        rows are purged PHYSICALLY at the next :meth:`compact` — the
        right-to-be-forgotten path, mirroring the pyramid store's
        streaming deletions. Tombstones are batch-addressed and gated by
        their own ``last_delete_batch`` watermark, so replays are no-ops;
        within one micro-batch, deletes apply after appends (delete
        wins). The live tombstone set is bounded by deletes since the
        last compaction — it rides a broadcast anti-join at read time, so
        compact on a cadence that keeps it small."""
        meta = self._meta()
        if meta is None:
            raise ValueError("index is empty — build() it first")
        if batch_id <= int(meta.get("last_delete_batch", -1)):
            return False
        if isinstance(ids, DataFrame):
            tomb = ids.select(F.col(ids.columns[0]).cast("long").alias("neighbor_id"))
        else:
            tomb = self.spark.createDataFrame(
                [(int(i),) for i in ids], "neighbor_id long"
            )
        if not tomb.take(1):
            return False
        tomb.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.root, "tombstones", f"batch=b{batch_id}")
        )
        meta["last_delete_batch"] = batch_id
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)
        return True

    def _tombstones(self, meta: dict) -> DataFrame | None:
        """Committed tombstones as (neighbor_id, _del_b = latest deleting
        batch), or None when nothing is tombstoned (files from a crashed
        delete — batch id past the watermark — are excluded, like orphan
        append dirs)."""
        tpath = os.path.join(self.root, "tombstones")
        if not os.path.isdir(tpath):
            return None
        last = int(meta.get("last_delete_batch", -1))
        committed = [
            d[len("batch="):]
            for d in os.listdir(tpath)
            if d.startswith("batch=b") and int(d[len("batch=b"):]) <= last
        ]
        if not committed:
            return None
        return (
            self.spark.read.parquet(tpath)
            .filter(F.col("batch").isin(committed))
            .select(
                "neighbor_id",
                F.expr("cast(substring(batch, 2, 18) as long)").alias("_del_b"),
            )
            .groupBy("neighbor_id")
            .agg(F.max("_del_b").alias("_del_b"))
        )

    def _table(self, meta: dict) -> DataFrame:
        data_path = self._data_path_for(meta)  # one resolution, no TOCTOU
        last = int(meta.get("last_batch", -1))
        committed = ["base"] + [
            d[len("batch="):]
            for d in os.listdir(data_path)
            if d.startswith("batch=b")
            and d != "batch=base"
            and int(d[len("batch=b"):]) <= last
        ]
        # one root read: (batch, list_id) are partition columns, so both
        # the committed-batch filter (excludes a crashed append's orphan
        # directory) and the probe filter prune at the directory level
        rows = self.spark.read.parquet(data_path).filter(
            F.col("batch").isin(committed)
        )
        tomb = self._tombstones(meta)
        if tomb is not None:
            # provenance-ordered delete (the pyramid store's rule): a
            # tombstone hides only rows appended AT OR BEFORE the deleting
            # batch, so delete-then-re-append resurfaces the id. Base rows
            # carry the compaction point (base_batch) as their provenance;
            # the tombstone set is bounded by deletes since the last
            # compaction, so it rides a broadcast — no index shuffle.
            base_b = int(meta.get("base_batch", -1))
            rows = (
                rows.withColumn(
                    "_row_b",
                    F.when(F.col("batch") == "base", F.lit(base_b)).otherwise(
                        F.expr("cast(substring(batch, 2, 18) as long)")
                    ),
                )
                .join(F.broadcast(tomb), "neighbor_id", "left")
                .filter(F.col("_del_b").isNull() | (F.col("_del_b") < F.col("_row_b")))
                .drop("_del_b", "_row_b")
            )
        return rows

    # ---- query ----
    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        refine: int = 4,
    ) -> DataFrame:
        """Approximate top-k with exact re-rank, reading ONLY the probed
        list partitions. Queries are a bounded frame by contract (they
        broadcast); the probed list ids become a literal IN filter so the
        scan partition-prunes."""
        cents, books, meta = self._quantizers()
        id_col, vec_col = meta["id_col"], meta["vec_col"]
        # queries are bounded by contract, so the probe frame (one row
        # per (query, probed list), carrying the ADC table) is
        # driver-sized: collect it ONCE and re-ship it as a local
        # relation — the previous checkpoint + distinct-collect pair
        # cost two scheduling rounds for the same information, and the
        # local relation broadcasts into the shortlist join just the
        # same
        pf = pq_probe_frame(queries, cents, books, n_probe, id_col, vec_col)
        probe_rows = pf.collect()
        probes = self.spark.createDataFrame(probe_rows, schema=pf.schema)
        probed_ids = sorted({r["list_id"] for r in probe_rows})
        coded = self._table(meta).filter(F.col("list_id").isin(probed_ids))
        shortlist = adc_shortlist(coded, probes, books, k * refine)
        qvec = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        return exact_rerank(
            shortlist,
            coded.select("neighbor_id", F.col("vec").alias("c_vec")),
            qvec,
            k,
        )
