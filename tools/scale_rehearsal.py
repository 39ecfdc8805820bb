#!/usr/bin/env python3
"""Empirical scale rehearsal (round-3 verdict item 7): push a corpus two
orders of magnitude bigger than the bench table through the three hottest
LLM paths and compare MEASURED per-stage shuffle volume against the
SCALE.md predictions — the claims become numbers, not prose.

Corpus: N_DOCS synthetic documents (default 500k = 100x the sf0.1
documents table), ~100 tokens each (~50M corpus tokens), zipf-ish head
vocabulary so heavy hitters exist, and a planted ~2% exact-duplicate
rate. Generated deterministically from hash expressions, written to a
temp parquet, and read back so scans carry real input bytes.

Paths and the predictions under test (SCALE.md):

1. exact fingerprint dedup — ONE corpus-sized shuffle keyed on the md5
   digest: shuffle-write records == n_docs, bytes ~ corpus size (the
   text must reach its hash's reducer once; no plan avoids that and
   still emits surviving text).
2. MinHash-LSH pipeline — banded candidate generation, NEVER all-pairs:
   the band exchange carries ~n_docs x bands rows; candidate pairs and
   the signature-estimate join stay orders of magnitude under
   n_docs^2 / 2.
3. token heavy hitters — explode feeds a hash aggregate with MAP-SIDE
   COMBINE: the one shuffle carries per-partition distinct (token,
   partial-count) rows, bounded by vocab x map partitions, NOT the ~50M
   corpus tokens.
4. batch-vs-history ingest dedup (round-5 semi-join reduction) — a 1k
   batch gated against the 500k-doc history: the batch's fingerprint
   set is broadcast and the history scan is semi-join-reduced map-side,
   so TOTAL shuffle records are O(batch), never O(history) — the
   history's 500k fingerprints stay off the wire entirely.
5. vector-index append (the streaming ANN maintenance path) — a 2k
   batch appended to a 200k-vector IVF-PQ index: encode is map-only
   (broadcast quantizers), the only exchange is the batch's
   repartition("list_id"), so shuffle records are O(batch) and NO
   stage reads the existing index (input records stay O(batch) too).
6. merge-table commit (copy-on-write MERGE) — a 1k upsert/insert batch
   against a 500k-row, 32-file table: key-range pruning bounds the read
   to the touched files, the broadcast batch key set bounds the
   exchange, so BOTH input and shuffle records are O(touched files +
   batch) — independent of table size.
7. merge-table commit at 10M rows / 512 files (r5 verdict item 3): the
   same bound one order of magnitude up, PLUS the driver-side costs that
   grow with file count — stats()'s sweep line and _touched's per-file
   interval checks are O(files log files) over footer stats and must
   stay sub-second at 512 files (the design argument for a
   million-file table puts them in the milliseconds-per-thousand-files
   regime, which this measures directly).

Usage: python tools/scale_rehearsal.py [--docs N]
Prints a per-stage table per path plus a PASS/FAIL line per prediction.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")


def get_spark_with_ui():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName("scale-rehearsal")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("CLUSTOPHER_DRIVER_MEM", "16g"))
        # the whole point of this tool: the status REST API
        .config("spark.ui.enabled", "true")
        .config("spark.appStatusStore.diskStoreDir", "")
        .getOrCreate()
    )


class StageMeter:
    """Per-phase stage metrics via the status REST API."""

    def __init__(self, spark):
        self.base = (
            f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
            f"{spark.sparkContext.applicationId}/stages"
        )
        self.seen: set[int] = set()
        self._snapshot()

    def _fetch(self):
        return json.load(urllib.request.urlopen(self.base, timeout=30))

    def _snapshot(self):
        self.seen |= {s["stageId"] for s in self._fetch()}

    def measure(self, label: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        fresh = [s for s in self._fetch() if s["stageId"] not in self.seen]
        self._snapshot()
        fresh.sort(key=lambda s: s["stageId"])
        print(f"\n== {label}: {dt:.1f}s, result={out}")
        print(f"{'stage':>6} {'tasks':>5} {'input rec':>12} {'sh-write rec':>13}"
              f" {'sh-write MB':>12} {'sh-read rec':>12} {'name'}")
        tot = {"swr": 0, "swb": 0, "srr": 0}
        for s in fresh:
            tot["swr"] += s["shuffleWriteRecords"]
            tot["swb"] += s["shuffleWriteBytes"]
            tot["srr"] += s["shuffleReadRecords"]
            print(f"{s['stageId']:>6} {s['numCompleteTasks']:>5}"
                  f" {s['inputRecords']:>12} {s['shuffleWriteRecords']:>13}"
                  f" {s['shuffleWriteBytes']/1e6:>12.1f}"
                  f" {s['shuffleReadRecords']:>12} {s['name'][:48]}")
        print(f"TOTAL shuffle-write: {tot['swr']:,} records /"
              f" {tot['swb']/1e6:,.1f} MB")
        return dt, tot, fresh


def check(name: str, cond: bool, detail: str):
    print(f"{'PASS' if cond else 'FAIL'}  {name}: {detail}")
    return cond


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    args = ap.parse_args()
    n_docs = args.docs

    from pyspark.sql import functions as F

    from clustopher_spark.functions.dedup import exact_dedup, minhash_dedup_pairs

    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="clustopher_rehearsal_")
    try:
        # ---- corpus generation (untimed setup) --------------------------
        # base_id collapses ~2% of ids onto their predecessor -> planted
        # exact dups; 1-in-8 token positions draw from a 64-token head
        # vocab (heavy hitters), the rest from a 50k tail vocab.
        docs = spark.range(0, n_docs, 1, 64).selectExpr(
            "id as doc_id",
            f"if(pmod(id, 50) = 0 and id > 0, id - 1, id) as base",
        ).selectExpr(
            "doc_id",
            "concat_ws(' ', transform(sequence(1, 100), j -> "
            " if(pmod(base + j, 8) = 0,"
            "    concat('h', pmod(abs(hash(base * 31 + j)), 64)),"
            "    concat('t', pmod(abs(hash(base * 1009 + j)), 50000))"
            " ))) as text",
        )
        path = f"{tmp}/documents_large"
        docs.write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        n_actual = docs.count()
        corpus_mb = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path) for f in fs
        ) / 1e6
        print(f"corpus: {n_actual:,} docs, {corpus_mb:.0f} MB zstd parquet"
              f" (~100 tokens/doc, ~{n_actual * 100 / 1e6:.0f}M corpus tokens)")

        meter = StageMeter(spark)
        results = []

        # ---- 1. exact fingerprint dedup ---------------------------------
        n_distinct = docs.select("text").distinct().count()
        meter._snapshot()  # the distinct() above is setup, not the path
        dt, tot, _ = meter.measure(
            "exact_dedup (md5 hash-groupBy, one corpus shuffle)",
            lambda: exact_dedup(docs).count(),
        )
        # Catalyst makes this BETTER than the one-row-per-doc claim:
        # count() prunes the text column after the md5 (the shuffle
        # carries (hash, id) pairs, ~40 B/row), and WindowGroupLimit
        # pushes the rn==1 filter map-side, so per-partition duplicate
        # hashes collapse BEFORE the exchange — measured records land
        # between n_distinct and n_docs.
        results.append(check(
            "exact-dedup shuffle records in [~n_distinct, n_docs]"
            " (one pass, map-side group-limit, no blowup)",
            0.9 * n_distinct <= tot["swr"] <= 1.05 * n_actual,
            f"measured {tot['swr']:,} vs n_distinct {n_distinct:,},"
            f" n_docs {n_actual:,}",
        ))

        # ---- 2. MinHash-LSH pipeline ------------------------------------
        bands, num_hashes = 8, 32
        dt, tot, _ = meter.measure(
            "minhash_dedup_pairs (signatures -> banded buckets -> estimate)",
            lambda: minhash_dedup_pairs(
                docs, threshold=0.5, num_hashes=num_hashes, bands=bands,
                portable=False,
            ).count(),
        )
        all_pairs = n_actual * (n_actual - 1) / 2
        results.append(check(
            "minhash total shuffle records << all-pairs",
            tot["swr"] < all_pairs / 1000,
            f"measured {tot['swr']:,} vs all-pairs {all_pairs:,.0f}"
            f" ({tot['swr'] / all_pairs:.2e}x)",
        ))
        results.append(check(
            "minhash shuffle records ~ O(n_docs x bands) not O(n^2)",
            tot["swr"] <= 30 * n_actual * bands,
            f"measured {tot['swr']:,} vs n x bands {n_actual * bands:,}",
        ))

        # ---- 3. token heavy hitters (map-side combine) -------------------
        def heavy_hitters():
            counted = (
                docs.select(
                    F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                    .alias("token")
                )
                .filter(F.col("token") != "")
                .groupBy("token")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
            )
            return counted.orderBy(F.desc("n"), "token").limit(20).count()

        dt, tot, _ = meter.measure(
            "token_heavy_hitters (explode -> map-side-combined aggregate)",
            heavy_hitters,
        )
        n_tokens = n_actual * 100
        # the map-side-combine bound: each of the 64 scan partitions can
        # emit at most one partial per distinct token it sees (vocab
        # 50k tail + 64 head), plus the tiny second agg level and top-k
        vocab_bound = int(50_064 * 64 * 1.1)
        results.append(check(
            "heavy-hitters shuffle records bounded by vocab x map"
            " partitions (map-side combine), not corpus tokens",
            tot["swr"] <= vocab_bound,
            f"measured {tot['swr']:,} vs bound {vocab_bound:,};"
            f" corpus tokens {n_tokens:,}"
            f" ({tot['swr'] / n_tokens:.1%} of tokens reach the wire)",
        ))

        # ---- 4. batch-vs-history ingest dedup (semi-join reduction) ------
        from clustopher_spark.functions.text import fingerprint

        n_batch = 1_000
        # batch: 1k fresh docs, every 10th a planted copy of a history doc
        batch = spark.range(0, n_batch, 1, 8).selectExpr(
            f"id + {n_docs} as doc_id",
            f"if(pmod(id, 10) = 0, pmod(id, {n_docs}), id + {n_docs}) as base",
        ).selectExpr(
            "doc_id",
            "concat_ws(' ', transform(sequence(1, 100), j -> "
            " if(pmod(base + j, 8) = 0,"
            "    concat('h', pmod(abs(hash(base * 31 + j)), 64)),"
            "    concat('t', pmod(abs(hash(base * 1009 + j)), 50000))"
            " ))) as text",
        ).localCheckpoint(eager=True)
        batch.count()
        meter._snapshot()

        def ingest_gate():
            # the llm_incremental_ingest_dedup plan shape on this corpus
            fp = fingerprint(F.col("text")).alias("fp")
            b = batch.select("doc_id", fp)
            batch_fps = b.select("fp").distinct()
            hist = (
                docs.select(fp)
                .join(F.broadcast(batch_fps), "fp", "left_semi")
                .distinct()
            )
            flagged = b.join(
                F.broadcast(hist.withColumnRenamed("fp", "hfp")),
                F.col("fp") == F.col("hfp"), "left",
            )
            return flagged.agg(
                F.sum(F.when(F.col("hfp").isNotNull(), 1).otherwise(0))
            ).collect()[0][0]

        dt, tot, _ = meter.measure(
            "ingest_dedup (broadcast batch keys -> semi-join-reduced"
            " history scan)",
            ingest_gate,
        )
        results.append(check(
            "ingest-dedup shuffle records O(batch), history fingerprints"
            " never shuffled",
            tot["swr"] <= 20 * n_batch and tot["swr"] < 0.05 * n_actual,
            f"measured {tot['swr']:,} vs batch {n_batch:,},"
            f" history {n_actual:,}"
            f" ({tot['swr'] / n_actual:.2%} of history size)",
        ))

        # ---- 5. vector-index append (streaming ANN maintenance) ----------
        from clustopher_spark.sources.vector_index import IVFPQIndex

        n_vecs, n_vbatch, dim = 200_000, 2_000, 32
        vec_expr = (
            "cast(transform(sequence(1, {d}), j -> "
            " pmod(abs(hash(id * 37 + j)), 1000) / 500.0 - 1.0)"
            " as array<double>) as embedding"
        ).format(d=dim)
        vecs = spark.range(0, n_vecs, 1, 32).selectExpr("id as vec_id", vec_expr)
        vpath = f"{tmp}/embeddings_large"
        vecs.write.mode("overwrite").parquet(vpath)
        vecs = spark.read.parquet(vpath)
        vidx = IVFPQIndex(spark, f"{tmp}/vidx", n_lists=16, m_subvectors=4,
                          n_codes=64)
        vidx.build(vecs)  # untimed setup: the once-per-corpus cost
        vbatch = spark.range(n_vecs, n_vecs + n_vbatch, 1, 8).selectExpr(
            "id as vec_id", vec_expr
        ).localCheckpoint(eager=True)
        vbatch.count()
        meter._snapshot()

        dt, tot, fresh = meter.measure(
            "vector_index_append (frozen-quantizer encode -> "
            "repartition(list_id) write)",
            lambda: vidx.append(vbatch, 1),
        )
        in_rec = sum(s["inputRecords"] for s in fresh)
        results.append(check(
            "vector-append shuffle records O(batch); index never read",
            tot["swr"] <= 3 * n_vbatch and in_rec <= 3 * n_vbatch,
            f"measured shuffle {tot['swr']:,} / input {in_rec:,} vs batch"
            f" {n_vbatch:,}, index {n_vecs:,}"
            f" ({tot['swr'] / n_vecs:.2%} of index size shuffled)",
        ))

        # ---- 6. merge-table commit (copy-on-write MERGE maintenance) -----
        from clustopher_spark.sources.merge_table import MergeTable

        n_tbl, n_mbatch, n_files = 500_000, 1_000, 32
        tbl_rows = spark.range(0, n_tbl, 1, 32).selectExpr(
            "id as row_key",
            "pmod(abs(hash(id * 13)), 1000000) / 100.0 as amount",
            "concat('s', pmod(id, 50)) as source",
        )
        mt = MergeTable(spark, f"{tmp}/merge_tbl")
        mt.create(tbl_rows, ["row_key"], num_files=n_files)  # untimed setup
        # batch confined to ~0.5% of the keyspace: updates + fresh inserts
        mbatch = spark.range(0, n_mbatch, 1, 4).selectExpr(
            f"if(pmod(id, 2) = 0, id * 2, id + {n_tbl}) as row_key",
            "0.0 as amount",
            "'fix' as source",
        ).localCheckpoint(eager=True)
        mbatch.count()
        meter._snapshot()

        dt, tot, fresh = meter.measure(
            "merge_table_commit (key-range pruned CoW rewrite + CDF)",
            lambda: mt.merge(mbatch, batch_id=1),
        )
        hist = mt.history()[-1]
        rows_per_file = n_tbl // n_files + 1
        # everything the commit may legitimately move: the rewritten
        # files' rows (merge + CDF + range-sampling re-scans) + the batch
        bound_rows = hist["files_rewritten"] * rows_per_file + n_mbatch
        in_rec = sum(s["inputRecords"] for s in fresh)
        results.append(check(
            "merge-table commit reads/shuffles O(touched files + batch),"
            " never O(table)",
            hist["files_rewritten"] <= 4
            and tot["swr"] <= 6 * bound_rows
            and in_rec <= 12 * bound_rows,
            f"rewrote {hist['files_rewritten']}/{n_files} files; shuffle"
            f" {tot['swr']:,} / input {in_rec:,} records vs table {n_tbl:,}"
            f" ({tot['swr'] / n_tbl:.2%} of table size shuffled)",
        ))

        # ---- 7. merge-table commit bound at 10M rows / 512 files --------
        # (r5 verdict item 3: the 500k bound above, one order of magnitude
        # up, plus the O(files) driver sweeps measured directly)
        n_tbl10, n_mb10, n_files10 = 10_000_000, 10_000, 512
        tbl10 = spark.range(0, n_tbl10, 1, 64).selectExpr(
            "id as row_key",
            "pmod(abs(hash(id * 13)), 1000000) / 100.0 as amount",
            "concat('s', pmod(id, 50)) as source",
        )
        mt10 = MergeTable(spark, f"{tmp}/merge_tbl_10m")
        mt10.create(tbl10, ["row_key"], num_files=n_files10)  # untimed setup
        # batch confined to ~0.5% of the keyspace: updates + fresh inserts
        mb10 = spark.range(0, n_mb10, 1, 4).selectExpr(
            f"if(pmod(id, 2) = 0, id * 10, id + {n_tbl10}) as row_key",
            "0.0 as amount",
            "'fix' as source",
        ).localCheckpoint(eager=True)
        mb10.count()
        meter._snapshot()
        dt, tot, fresh = meter.measure(
            "merge_table_commit_10m (10k batch onto 10M rows / 512 files)",
            lambda: mt10.merge(mb10, batch_id=1),
        )
        hist10 = mt10.history()[-1]
        rows_per_file10 = n_tbl10 // n_files10 + 1
        bound10 = hist10["files_rewritten"] * rows_per_file10 + n_mb10
        in_rec = sum(s["inputRecords"] for s in fresh)
        results.append(check(
            "10M-row merge commit stays O(touched files + batch)",
            hist10["files_rewritten"] <= 8
            and tot["swr"] <= 6 * bound10
            and in_rec <= 12 * bound10,
            f"rewrote {hist10['files_rewritten']}/{n_files10} files; shuffle"
            f" {tot['swr']:,} / input {in_rec:,} records vs table"
            f" {n_tbl10:,} ({tot['swr'] / n_tbl10:.3%} of table size shuffled)",
        ))
        # the O(files) driver components, measured (not argued): stats()'s
        # sweep line over the 513-entry manifest and _touched's exact
        # per-file interval check (includes its two batch-sized Spark jobs)
        t0 = time.perf_counter()
        st10 = mt10.stats()
        t_stats = time.perf_counter() - t0
        t0 = time.perf_counter()
        touched10, _nk = mt10._touched(
            mt10._manifest(mt10._meta()["latest"]), mb10, "row_key"
        )
        t_touch = time.perf_counter() - t0
        results.append(check(
            "driver sweeps sub-second at 512 files (stats sweep; _touched"
            " incl. its batch-sized jobs <= 2s)",
            t_stats < 1.0 and t_touch < 2.0,
            f"stats {t_stats * 1000:.0f} ms over {st10['files']} files;"
            f" _touched {t_touch * 1000:.0f} ms -> {len(touched10)} files",
        ))

        print(f"\n{'ALL PREDICTIONS HOLD' if all(results) else 'PREDICTION FAILED'}"
              f" ({sum(results)}/{len(results)})")
        sys.exit(0 if all(results) else 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
