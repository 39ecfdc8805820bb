"""Persisted IVF-PQ index: build/query/append lifecycle.

Contract: a built index answers exactly like the one-shot
``ann_ivf_pq_topk`` under the same quantizers; appended rows are
queryable without retraining; replayed appends are no-ops; and the
probed query reads ONLY the probed list partitions (directory-level
pruning, asserted on the physical plan)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clustopher_spark.functions.similarity import (
    ann_ivf_pq_topk,
    cosine_topk_bruteforce,
)
from clustopher_spark.sources.vector_index import IVFPQIndex


def _embeddings(spark, n=300, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim))
    base[1] = base[0] + rng.normal(scale=0.01, size=dim)  # planted near-dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_vector_index_matches_oneshot_and_appends(spark, tmp_path):
    e = _embeddings(spark)
    q = e.filter(F.col("vec_id") < 5)
    idx = IVFPQIndex(spark, str(tmp_path / "idx"), n_lists=8,
                     m_subvectors=4, n_codes=32)
    n = idx.build(e)
    assert n == 300

    got = idx.topk(q, k=5, n_probe=3, refine=4).collect()
    # same quantizers -> identical answers to the one-shot operator
    cents, books, _ = idx._quantizers()
    want = ann_ivf_pq_topk(
        e, q, k=5, n_lists=8, n_probe=3, m_subvectors=4, n_codes=32,
        refine=4, centroids=cents, codebooks=books,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the planted near-dup surfaces
    assert any(r.query_id == 0 and r.neighbor_id == 1 for r in got)

    # a REOPENED instance (fresh object, stored quantizers) answers the same
    idx2 = IVFPQIndex(spark, str(tmp_path / "idx"))
    got2 = idx2.topk(q, k=5, n_probe=3, refine=4).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got))

    # append a new planted near-dup of query 2 with FROZEN quantizers
    target = e.filter(F.col("vec_id") == 2).first().embedding
    new = spark.createDataFrame(
        [(1000, [float(x) + 0.001 for x in target])],
        "vec_id long, embedding array<double>",
    )
    assert idx.append(new, 0) is True
    assert idx.append(new, 0) is False  # committed replay skipped
    got3 = idx.topk(q, k=5, n_probe=3, refine=4).collect()
    assert any(r.query_id == 2 and r.neighbor_id == 1000 and r.rank == 1
               for r in got3)

    # recall sanity vs brute force on the base corpus
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk_bruteforce(e, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in got}
    assert len(approx & brute) / len(brute) >= 0.5


def test_vector_index_partition_prunes(spark, tmp_path):
    e = _embeddings(spark, seed=11)
    idx = IVFPQIndex(spark, str(tmp_path / "idx"), n_lists=8,
                     m_subvectors=4, n_codes=32)
    idx.build(e)
    q = e.filter(F.col("vec_id") < 2)
    plan = idx.topk(q, k=3, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    # the probed list ids must reach the scan as a partition filter
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:200]


def _stream_embeddings(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_streaming_vector_index_bootstrap_append_query(spark, tmp_path):
    """availableNow drain bootstraps the index from batch 0, appends the
    rest with frozen quantizers, keeps drift telemetry per batch, and a
    vector inserted by the LAST batch is immediately queryable."""
    from clustopher_spark.streaming.vector_index import (
        drift_report,
        incremental_vector_index,
    )

    e = _embeddings(spark, n=300, seed=7)
    src = str(tmp_path / "src")
    # three single-file batches; the last plants an exact dup of query 2
    e.filter(F.col("vec_id") < 200).coalesce(1).write.parquet(src + "/b0")
    e.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 300)).coalesce(
        1
    ).write.parquet(src + "/b1")
    target = e.filter(F.col("vec_id") == 2).first().embedding
    spark.createDataFrame(
        [(9000, [float(x) + 0.0005 for x in target])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(src + "/b2")

    root = str(tmp_path / "vidx")
    incremental_vector_index(
        _stream_embeddings(spark, src + "/b*", e.schema),
        root,
        n_lists=8,
        m_subvectors=4,
        n_codes=32,
    )

    idx = IVFPQIndex(spark, root)
    meta = idx._meta()
    assert meta is not None and int(meta["last_batch"]) >= 2
    total = idx._table(meta).count()
    assert total == 301  # 300 corpus rows + the planted late arrival

    q = e.filter(F.col("vec_id") < 5)
    got = idx.topk(q, k=5, n_probe=4, refine=4).collect()
    assert any(
        r.query_id == 2 and r.neighbor_id == 9000 and r.rank == 1 for r in got
    )

    # drift: a base row plus one per appended batch, ratios near 1 for
    # same-distribution data (same generator, disjoint ids)
    rep = drift_report(spark, root).collect()
    labels = [r.batch for r in rep]
    assert labels[0] == "base" and len(rep) >= 3
    by = {r.batch: r for r in rep}
    assert by["base"].n == 200
    appended = [r for r in rep if r.batch != "base"]
    assert sum(r.n for r in appended) == 101
    same_dist = [r for r in appended if r.n == 100]
    assert same_dist and abs(same_dist[0].mean_ratio - 1.0) < 0.25


def test_streaming_vector_index_replay_is_exactly_once(spark, tmp_path):
    """A full re-drain with a FRESH checkpoint (worst-case replay: every
    file again, batch ids restarting at 0) adds no rows and leaves the
    drift log without duplicates."""
    import shutil

    from clustopher_spark.streaming.vector_index import (
        drift_report,
        incremental_vector_index,
    )

    e = _embeddings(spark, n=120, seed=9)
    src = str(tmp_path / "src")
    e.filter(F.col("vec_id") < 60).coalesce(1).write.parquet(src + "/b0")
    e.filter(F.col("vec_id") >= 60).coalesce(1).write.parquet(src + "/b1")

    root = str(tmp_path / "vidx")
    incremental_vector_index(
        _stream_embeddings(spark, src + "/b*", e.schema),
        root,
        n_lists=8,
        m_subvectors=4,
        n_codes=32,
        query_name="vidx_first",
    )
    idx = IVFPQIndex(spark, root)
    before = idx._table(idx._meta()).count()
    assert before == 120
    drift_before = sorted(
        (r.batch, r.n) for r in drift_report(spark, root).collect()
    )

    shutil.rmtree(root + "_checkpoint")  # force the full replay
    incremental_vector_index(
        _stream_embeddings(spark, src + "/b*", e.schema),
        root,
        n_lists=8,
        m_subvectors=4,
        n_codes=32,
        query_name="vidx_replay",
    )
    idx2 = IVFPQIndex(spark, root)
    assert idx2._table(idx2._meta()).count() == before
    drift_after = sorted(
        (r.batch, r.n) for r in drift_report(spark, root).collect()
    )
    assert drift_after == drift_before


def test_vector_index_compact_vacuum(spark, tmp_path):
    """compact() folds batch dirs into one fresh versioned base with
    identical answers and a preserved replay watermark; vacuum() removes
    superseded roots (keep_previous grace honored); appends keep working
    against the compacted root."""
    import os

    e = _embeddings(spark, n=200, seed=13)
    root = str(tmp_path / "idx")
    idx = IVFPQIndex(spark, root, n_lists=8, m_subvectors=4, n_codes=32)
    idx.build(e.filter(F.col("vec_id") < 150))
    for i, lo in enumerate((150, 170), start=1):
        idx.append(
            e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 20)), i
        )
    q = e.filter(F.col("vec_id") < 3)
    before = sorted(map(tuple, idx.topk(q, k=5, n_probe=4).collect()))
    assert idx._table(idx._meta()).count() == 190

    n = idx.compact()
    assert n == 190
    meta = idx._meta()
    assert meta["data_version"] == 1 and meta["last_batch"] == 2
    # one base dir only in the new root; old root still on disk pre-vacuum
    assert sorted(os.listdir(os.path.join(root, "lists_v1"))) == ["batch=base"]
    assert os.path.isdir(os.path.join(root, "lists"))
    after = sorted(map(tuple, idx.topk(q, k=5, n_probe=4).collect()))
    assert after == before
    # replay of a pre-compaction batch id stays a no-op
    assert idx.append(e.filter(F.col("vec_id") >= 190), 2) is False
    # a NEW append lands in the compacted root and is queryable
    assert idx.append(e.filter(F.col("vec_id") >= 190), 3) is True
    assert idx._table(idx._meta()).count() == 200
    assert any(
        d.startswith("batch=b3") for d in os.listdir(os.path.join(root, "lists_v1"))
    )

    # vacuum(keep_previous=True) keeps the grace root; plain vacuum drops it
    assert idx.vacuum(keep_previous=True) == []
    idx.compact()  # -> v2; v1 is now previous, "lists" is older
    assert idx.vacuum(keep_previous=True) == ["lists"]
    assert idx.vacuum() == ["lists_v1"]
    # a reopened instance answers identically from the compacted root
    idx2 = IVFPQIndex(spark, root)
    assert idx2._table(idx2._meta()).count() == 200
    got = sorted(map(tuple, idx2.topk(q, k=5, n_probe=4).collect()))
    # batch 3 added 10 more vectors after `before` was taken, so only
    # compare the invariant: answers equal a fresh query on idx
    assert got == sorted(map(tuple, idx.topk(q, k=5, n_probe=4).collect()))


def test_streaming_vector_index_compact_every(spark, tmp_path):
    """compact_every folds the stream's batch dirs; answers unchanged."""
    import os

    from clustopher_spark.streaming.vector_index import incremental_vector_index

    e = _embeddings(spark, n=180, seed=17)
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate(((0, 100), (100, 140), (140, 180))):
        e.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(f"{src}/b{i}")
    root = str(tmp_path / "vidx")
    incremental_vector_index(
        _stream_embeddings(spark, src + "/b*", e.schema),
        root,
        n_lists=8,
        m_subvectors=4,
        n_codes=32,
        compact_every=2,
    )
    idx = IVFPQIndex(spark, root)
    meta = idx._meta()
    assert meta["data_version"] == 1  # compacted at batch 2
    assert idx._table(meta).count() == 180
    # batch 1's dir was folded into the v1 base; batch 2 appends after? no:
    # compaction ran AFTER batch 2's append, so v1 base holds everything
    assert sorted(os.listdir(os.path.join(root, "lists_v1"))) == ["batch=base"]
    # grace window kept the pre-compaction root
    assert os.path.isdir(os.path.join(root, "lists"))


def test_vector_index_delete_tombstones_and_purge(spark, tmp_path):
    """delete() hides ids immediately (provenance-ordered: a later
    re-append resurfaces the id), replays are no-ops, and compact()
    purges tombstoned rows physically and clears the tombstone log."""
    import os

    e = _embeddings(spark, n=100, seed=19)
    root = str(tmp_path / "idx")
    idx = IVFPQIndex(spark, root, n_lists=8, m_subvectors=4, n_codes=32)
    idx.build(e)

    # foreign-id queries carrying the exact vectors of ids 0 and 2
    q = e.filter(F.col("vec_id").isin(0, 2)).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    got = idx.topk(q, k=3, n_probe=4).collect()
    assert any(r.neighbor_id == 0 and r.rank == 1 for r in got)

    # delete id 0 (list form): gone from counts and answers immediately
    assert idx.delete([0], 1) is True
    assert idx.delete([0], 1) is False  # replay no-op
    assert idx._table(idx._meta()).count() == 99
    got = idx.topk(q, k=3, n_probe=4).collect()
    assert not any(r.neighbor_id == 0 for r in got)
    assert any(r.neighbor_id == 2 and r.rank == 1 for r in got)

    # DataFrame form + provenance order: re-append id 0's vector under the
    # same id in a LATER batch — the older tombstone must not hide it
    assert idx.append(e.filter(F.col("vec_id") == 0), 2) is True
    assert idx._table(idx._meta()).count() == 100
    got = idx.topk(q, k=3, n_probe=4).collect()
    assert any(r.neighbor_id == 0 and r.rank == 1 for r in got)
    # ...and a LATER delete hides the re-appended row again
    assert idx.delete(e.filter(F.col("vec_id") == 0).select("vec_id"), 3) is True
    assert idx._table(idx._meta()).count() == 99

    # compact: physical purge, tombstone log cleared, answers stable
    n = idx.compact()
    assert n == 99
    assert not os.path.isdir(os.path.join(root, "tombstones"))
    got2 = idx.topk(q, k=3, n_probe=4).collect()
    assert not any(r.neighbor_id == 0 for r in got2)
    # replayed old delete batches stay no-ops after the purge
    assert idx.delete([0], 3) is False
    # fresh append after compaction is visible (stale-tombstone hazard
    # covered by base_batch provenance)
    assert idx.append(e.filter(F.col("vec_id") == 0), 4) is True
    assert idx._table(idx._meta()).count() == 100


def test_streaming_vector_index_op_column_deletes(spark, tmp_path):
    """op_col routes 'del' rows to tombstones: bootstrap batch, mixed
    add+delete batch (delete wins within batch), delete-only batch."""
    from clustopher_spark.streaming.vector_index import incremental_vector_index

    e = _embeddings(spark, n=120, seed=23)
    src = str(tmp_path / "src")
    schema = "vec_id long, embedding array<double>, op string"
    # b0: bootstrap 100 adds with op=NULL — "anything else is an append"
    # must include NULL (CDC streams often mark only deletes)
    e.filter(F.col("vec_id") < 100).withColumn(
        "op", F.lit(None).cast("string")
    ).coalesce(1).write.parquet(src + "/b0")
    # b1: add 100..120 AND delete 5 plus same-batch-added 100 (del wins)
    adds = e.filter(F.col("vec_id") >= 100).withColumn("op", F.lit("add"))
    dels = e.filter(F.col("vec_id").isin(5, 100)).select(
        "vec_id", "embedding"
    ).withColumn("op", F.lit("del"))
    adds.unionByName(dels).coalesce(1).write.parquet(src + "/b1")
    # b2: delete-only batch
    e.filter(F.col("vec_id") == 7).select("vec_id", "embedding").withColumn(
        "op", F.lit("del")
    ).coalesce(1).write.parquet(src + "/b2")

    root = str(tmp_path / "vidx")
    incremental_vector_index(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*"),
        root,
        n_lists=8,
        m_subvectors=4,
        n_codes=32,
        op_col="op",
    )
    idx = IVFPQIndex(spark, root)
    meta = idx._meta()
    # bootstrap's ONE atomic meta commit already carries its batch id
    # (crash right after build cannot replay the bootstrap as an append)
    assert int(meta["last_batch"]) >= 0
    live = {r.neighbor_id for r in idx._table(meta).select("neighbor_id").collect()}
    assert len(live) == 117  # 120 - {5, 100, 7}
    assert not {5, 100, 7} & live
    # deleted vectors don't answer queries
    q = e.filter(F.col("vec_id") == 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    got = idx.topk(q, k=3, n_probe=4).collect()
    assert not any(r.neighbor_id == 5 for r in got)


def test_drift_report_offline_built_baseline_fallback(spark, tmp_path):
    """An index built OFFLINE then streamed into has no 'base' drift row;
    the earliest appended batch stands in as the baseline (ratio 1.0)."""
    from clustopher_spark.streaming.vector_index import (
        drift_report,
        incremental_vector_index,
    )

    e = _embeddings(spark, n=160, seed=29)
    root = str(tmp_path / "idx")
    idx = IVFPQIndex(spark, root, n_lists=8, m_subvectors=4, n_codes=32)
    idx.build(e.filter(F.col("vec_id") < 100))  # offline build, no drift log

    src = str(tmp_path / "src")
    e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130)).coalesce(
        1
    ).write.parquet(src + "/b0")
    e.filter(F.col("vec_id") >= 130).coalesce(1).write.parquet(src + "/b1")
    incremental_vector_index(
        _stream_embeddings(spark, src + "/b*", e.schema),
        root,
        n_lists=8,
        m_subvectors=4,
        n_codes=32,
    )
    rep = drift_report(spark, root).collect()
    assert len(rep) == 2 and all(r.batch != "base" for r in rep)
    assert rep[0].mean_ratio == 1.0  # earliest batch IS the baseline
    assert rep[1].mean_ratio > 0
    assert IVFPQIndex(spark, root)._table(idx._meta()).count() == 160


def test_vector_index_delete_semantics_state_machine(spark, tmp_path):
    """Randomized add/delete/compact sequences vs a driver-side reference
    model of the provenance rule (a tombstone hides exactly the rows
    appended at-or-before the deleting batch; compact rebases every
    surviving row to the compaction point and clears tombstones). Pins
    the visibility algebra independent of the implementation."""
    import random

    e = _embeddings(spark, n=40, seed=31)
    by_id = {r.vec_id: r.embedding for r in e.collect()}

    def frame(ids):
        return spark.createDataFrame(
            [(int(i), by_id[i]) for i in ids],
            "vec_id long, embedding array<double>",
        )

    for seed in (0, 1):
        rng = random.Random(seed)
        root = str(tmp_path / f"sm{seed}")
        idx = IVFPQIndex(spark, root, n_lists=4, m_subvectors=4, n_codes=16)
        idx.build(frame(range(10)))
        # model: multiset of visible rows as (id, provenance batch);
        # build rows carry provenance -1 (base_batch default)
        rows = [(i, -1) for i in range(10)]
        batch_id = 0
        for _ in range(6):
            batch_id += 1
            op = rng.choice(["add", "add", "del", "del", "compact"])
            if op == "add":
                ids = rng.sample(range(40), 3)
                assert idx.append(frame(ids), batch_id) is True
                rows += [(i, batch_id) for i in ids]
            elif op == "del":
                ids = rng.sample(range(40), 2)
                idx.delete(ids, batch_id)
                rows = [
                    (i, b) for (i, b) in rows
                    if not (i in ids and batch_id >= b)
                ]
            else:
                n = idx.compact()
                assert n == len(rows)
                meta = idx._meta()
                rows = [(i, int(meta["base_batch"])) for (i, b) in rows]
            got = idx._table(idx._meta())
            want_count = len(rows)
            want_live = {i for (i, b) in rows}
            assert got.count() == want_count, f"seed {seed} batch {batch_id} {op}"
            live = {r.neighbor_id for r in got.select("neighbor_id").collect()}
            assert live == want_live, f"seed {seed} batch {batch_id} {op}"


def test_vector_index_compact_concurrent_reader_snapshot(spark, tmp_path):
    """Same snapshot contract the pyramid store's vacuum asserts: a reader
    planned before compact keeps reading bit-identical content while the
    grace window holds; once its root is vacuumed it fails fast or reads
    original content — never silently-different data."""
    e = _embeddings(spark, n=150, seed=37)
    idx = IVFPQIndex(spark, str(tmp_path / "idx"), n_lists=8,
                     m_subvectors=4, n_codes=32)
    idx.build(e.filter(F.col("vec_id") < 120))
    idx.append(e.filter(F.col("vec_id") >= 120), 1)

    reader = idx._table(idx._meta())  # plan pinned over the v0 root
    before = sorted(
        (r.neighbor_id, r.batch) for r in reader.select("neighbor_id", "batch").collect()
    )
    assert len(before) == 150

    # compact + grace-window vacuum: the pinned reader's files survive
    idx.compact()
    idx.vacuum(keep_previous=True)  # keeps v1 (current) + "lists" (previous)
    again = sorted(
        (r.neighbor_id, r.batch) for r in reader.select("neighbor_id", "batch").collect()
    )
    assert again == before  # bit-identical within the grace window

    # second compact + FULL vacuum drops the reader's root: the stale
    # reader must fail fast or still see original content
    idx.compact()
    removed = idx.vacuum()
    assert "lists" in removed
    try:
        stale = sorted(
            (r.neighbor_id, r.batch)
            for r in reader.select("neighbor_id", "batch").collect()
        )
        assert stale == before  # page-cache / open-handle survival is fine
    except Exception:
        pass  # fail-fast is the documented acceptable outcome

    # a freshly planned reader over the compacted root answers in full
    fresh = IVFPQIndex(spark, str(tmp_path / "idx"))
    assert fresh._table(fresh._meta()).count() == 150


def test_vector_index_list_stats_detects_skew(spark, tmp_path):
    """list_stats reports occupancy balance; a planted hot cluster (many
    near-copies of one vector land in one list) drives the factor up."""
    e = _embeddings(spark, n=200, seed=41)
    idx = IVFPQIndex(spark, str(tmp_path / "idx"), n_lists=8,
                     m_subvectors=4, n_codes=32)
    idx.build(e)
    s0 = idx.list_stats()
    assert s0["rows"] == 200 and s0["n_lists"] == 8
    assert 1 <= s0["occupied_lists"] <= 8
    assert s0["balance_factor"] >= 1.0

    # plant a hot cluster: 400 jittered copies of vector 0 -> one list
    import numpy as np
    rng = np.random.default_rng(43)
    v0 = e.filter(F.col("vec_id") == 0).first().embedding
    hot = spark.createDataFrame(
        [
            (10_000 + i, [float(x + rng.normal(scale=0.001)) for x in v0])
            for i in range(400)
        ],
        "vec_id long, embedding array<double>",
    )
    idx.append(hot, 1)
    s1 = idx.list_stats()
    assert s1["rows"] == 600
    assert s1["max_list_rows"] >= 400  # the hot list absorbed the cluster
    assert s1["balance_factor"] > s0["balance_factor"] * 2
