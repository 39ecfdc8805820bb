"""MergeTable: copy-on-write MERGE semantics, file pruning, write-time CDF,
snapshot isolation, refcounted vacuum, compaction (sources/merge_table.py).

The reference's persistence rewrites whole datasets per update
(cluster/storage.go); these tests pin the incremental contract that
replaces it: a merge rewrites only key-range-touched files and the
committed table equals the pure merge algebra applied to the whole table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustopher_spark.sources.merge_table import (
    MergeTable,
    change_feed_frames,
    merge_frames,
)

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _mixed_batch(orders):
    """Deterministic mixed batch: updates (%4==2, price bumped), inserts
    (%4==1 keys absent from the %4!=1 target), deletes (%4==3)."""
    updates = (
        orders.filter(F.col("o_orderkey") % 4 == 2)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("op", F.lit("upsert"))
    )
    inserts = orders.filter(F.col("o_orderkey") % 4 == 1).withColumn(
        "op", F.lit("upsert")
    )
    deletes = orders.filter(F.col("o_orderkey") % 4 == 3).withColumn(
        "op", F.lit("delete")
    )
    return updates.unionByName(inserts).unionByName(deletes)


@pytest.fixture()
def target(spark):
    return _orders(spark).filter(F.col("o_orderkey") % 4 != 1)


def test_create_read_roundtrip(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    assert t.create(target, ["o_orderkey"], num_files=4) == 1
    assert _frames_equal(t.read(), target)
    h = t.history()
    assert h[0]["operation"] == "create" and h[0]["rows"] == target.count()


def test_merge_matches_pure_algebra(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    batch = _mixed_batch(_orders(spark))
    v = t.merge(batch, op_col="op")
    assert v == 2
    expected = merge_frames(target, batch, ["o_orderkey"], op_col="op")
    assert _frames_equal(t.read(), expected)
    # time travel: v1 still the original
    assert _frames_equal(t.read(1), target)
    # sanity on the semantics themselves
    got = {r.o_orderkey: r.o_totalprice for r in t.read().collect()}
    src = {r.o_orderkey: r.o_totalprice for r in _orders(spark).collect()}
    for k, price in src.items():
        if k % 4 == 2:
            assert got[k] == pytest.approx(price + 1000.0)
        elif k % 4 == 3:
            assert k not in got
        else:
            assert got[k] == pytest.approx(price)


def test_narrow_merge_rewrites_only_touched_files(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=8)
    lo, hi = [
        (r.lo, r.hi)
        for r in target.agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        ).collect()
    ][0]
    # a batch confined to the bottom ~5% of the key space
    cut = lo + (hi - lo) // 20
    batch = target.filter(F.col("o_orderkey") <= cut).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    t.merge(batch)
    h = t.history()[-1]
    assert h["operation"] == "merge"
    assert h["files_carried"] >= 6, h  # most of the 8 files untouched
    assert h["files_rewritten"] <= 2, h
    # carried files are SHARED by name between the two manifests
    m1 = {e["file"] for e in t._manifest(1)}
    m2 = {e["file"] for e in t._manifest(2)}
    assert len(m1 & m2) == h["files_carried"]
    expected = merge_frames(target, batch, ["o_orderkey"])
    assert _frames_equal(t.read(), expected)


def test_change_feed_recorded_at_write_time(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    batch = _mixed_batch(_orders(spark))
    t.merge(batch, op_col="op")
    cdf = t.changes(1)
    expected = change_feed_frames(target, batch, ["o_orderkey"], op_col="op").withColumn(
        "_commit_version", F.lit(2).cast("long")
    )
    assert _frames_equal(cdf, expected)
    counts = {r._change_type: r.n for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    orders = _orders(spark)
    assert counts["update_pre"] == counts["update_post"] == orders.filter(F.col("o_orderkey") % 4 == 2).count()
    assert counts["insert"] == orders.filter(F.col("o_orderkey") % 4 == 1).count()
    assert counts["delete"] == orders.filter(F.col("o_orderkey") % 4 == 3).count()
    # empty range -> empty typed frame
    assert t.changes(2).count() == 0


def test_merge_replay_is_idempotent(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    batch = _mixed_batch(_orders(spark))
    assert t.merge(batch, op_col="op", batch_id=7) == 2
    before = t.read().count()
    assert t.merge(batch, op_col="op", batch_id=7) is None  # replay skipped
    assert t._meta()["latest"] == 2 and t.read().count() == before


def test_vacuum_refcounts_shared_files(spark, tmp_path, target):
    import os

    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=8)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    batch = target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    t.merge(batch)  # v2 shares most files with v1
    t.merge(batch.withColumn("o_totalprice", F.lit(2.0)))  # v3
    latest = t.read().collect()
    removed = t.vacuum(keep_last=2)  # drops v1's exclusive files only
    m2 = {e["file"] for e in t._manifest(2)}
    m3 = {e["file"] for e in t._manifest(3)}
    for f in removed:
        assert f not in m2 | m3  # nothing a retained version references
    # retained versions still read bit-identically
    assert {tuple(r) for r in t.read().collect()} == {tuple(r) for r in latest}
    assert _frames_equal(t.read(2), merge_frames(target, batch, ["o_orderkey"]))
    # below the window: fail fast, not partial rows
    with pytest.raises(Exception):
        t._manifest(1)
    # the shared pool holds exactly the union of retained manifests
    pool = {f for f in os.listdir(str(tmp_path / "t" / "files"))}
    assert pool == m2 | m3


def test_compact_is_a_logical_noop(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    batch = _mixed_batch(_orders(spark))
    t.merge(batch, op_col="op")
    pre = t.read()
    v = t.compact(num_files=2)
    assert v == 3
    assert _frames_equal(t.read(), pre)
    assert t.history()[-1]["files"] <= 2
    # compact contributes no CDF rows; the merge's feed is still readable
    assert _frames_equal(t.changes(1).drop("_commit_version"),
                         t.changes(1, 3).drop("_commit_version"))
    assert t.changes(2).count() == 0


def test_delete_all_leaves_empty_readable_table(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    everything = target.withColumn("op", F.lit("delete"))
    t.merge(everything, op_col="op")
    out = t.read()
    assert out.count() == 0
    assert out.columns == target.columns
    cdf = t.changes(1)
    assert cdf.filter(F.col("_change_type") == "delete").count() == target.count()


def test_non_orderable_first_key_rejected(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        t.create(target, ["o_orderdate"], num_files=2)


def test_vacuum_sweeps_crash_orphans(spark, tmp_path, target):
    """A merge that crashed between staging files and the meta repoint
    leaves pool files no manifest references; vacuum collects them."""
    import os

    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    orphan = str(tmp_path / "t" / "files" / "f-deadbeef.parquet")
    target.limit(3).write.mode("overwrite").parquet(str(tmp_path / "o"))
    part = [f for f in os.listdir(str(tmp_path / "o")) if f.endswith(".parquet")][0]
    os.replace(str(tmp_path / "o" / part), orphan)
    # default grace protects a possibly-in-flight writer's fresh files:
    # the just-planted orphan survives a default vacuum...
    assert "f-deadbeef.parquet" not in t.vacuum(keep_last=2)
    assert os.path.isfile(orphan)
    # ...and is swept once the caller asserts the table is quiesced
    removed = t.vacuum(keep_last=2, orphan_grace_sec=0)
    assert "f-deadbeef.parquet" in removed
    assert _frames_equal(t.read(), target)  # live data untouched


def _stream_rows(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_streaming_merge_table_bootstrap_merge_replay(spark, tmp_path, target):
    """availableNow drain: batch 0 bootstraps the table (create seeds the
    replay watermark atomically), later batches merge with upsert/delete
    routing, CDF is recorded per commit, and a fresh-checkpoint full
    replay changes nothing (exactly-once)."""
    import time as _time

    from clustopher_spark.streaming.merge_table import incremental_merge_table

    orders = _orders(spark)
    src = str(tmp_path / "src")
    # batch 0: the initial load (no op column semantics: all upserts)
    target.withColumn("op", F.lit("upsert")).coalesce(1).write.parquet(src + "/b0")
    _time.sleep(1.1)  # distinct mtimes -> deterministic file-batch order
    batch = _mixed_batch(orders)
    batch.coalesce(1).write.parquet(src + "/b1")

    schema = batch.schema
    root = str(tmp_path / "tbl")
    incremental_merge_table(
        _stream_rows(spark, src + "/b*", schema), root,
        key_cols=["o_orderkey"], op_col="op", num_files=4,
    )

    t = MergeTable(spark, root)
    expected = merge_frames(target, batch, ["o_orderkey"], op_col="op")
    assert _frames_equal(t.read(), expected)
    assert t.history()[0]["operation"] == "create"
    assert t.history()[-1]["operation"] == "merge"
    # the merge commit recorded its CDF
    cdf = t.changes(1)
    assert cdf.filter(F.col("_change_type") == "delete").count() > 0

    # full replay from a FRESH checkpoint: both batch ids are at-or-below
    # the committed watermark -> no new version, identical table
    import shutil

    shutil.rmtree(root + "_checkpoint")
    latest = t._meta()["latest"]
    # compact_every=1 on the replay: maintenance is gated on a batch that
    # actually COMMITTED, so a watermark-skipped replay must not compact
    # (a spurious compact would mutate history and vacuum undrained feeds)
    incremental_merge_table(
        _stream_rows(spark, src + "/b*", schema), root,
        key_cols=["o_orderkey"], op_col="op", num_files=4,
        compact_every=1,
    )
    assert t._meta()["latest"] == latest
    assert _frames_equal(t.read(), expected)


def test_streaming_merge_table_last_writer_wins_dedupe(spark, tmp_path, target):
    """order_col dedup: two CDC rows for one key within a batch -> the
    newest wins (the key-distinct precondition enforced in-stream)."""
    from clustopher_spark.streaming.merge_table import incremental_merge_table

    src = str(tmp_path / "src")
    row = target.limit(1).collect()[0]
    k = row.o_orderkey
    base = target.withColumn("op", F.lit("upsert")).withColumn(
        "seq", F.lit(0).cast("long")
    )
    dup = (
        target.filter(F.col("o_orderkey") == k)
        .withColumn("o_totalprice", F.lit(77.0))
        .withColumn("op", F.lit("upsert"))
        .withColumn("seq", F.lit(9).cast("long"))
    )
    base.unionByName(dup).coalesce(1).write.parquet(src + "/b0")

    root = str(tmp_path / "tbl")
    incremental_merge_table(
        _stream_rows(spark, src + "/b*", base.schema), root,
        key_cols=["o_orderkey"], op_col="op", order_col="seq", num_files=2,
    )
    t = MergeTable(spark, root)
    got = {r.o_orderkey: r.o_totalprice for r in t.read().collect()}
    assert got[k] == pytest.approx(77.0)
    assert len(got) == target.count()


def test_incremental_view_tracks_live_commits(spark, tmp_path, target):
    """operators/ivm.py against REAL MergeTable commits: a per-status
    count+sum view advanced by each commit's recorded change feed equals
    the recompute over the table at every version (two merges deep, so
    delta composition is exercised, not just one step)."""
    from clustopher_spark.operators.ivm import incremental_count_sum_view

    def recompute(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tp"),
        )

    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    view = recompute(target)

    batches = [
        _mixed_batch(_orders(spark)),  # update/insert/delete mix
        # second commit: delete some of what the first inserted
        _orders(spark)
        .filter(F.col("o_orderkey") % 8 == 1)
        .withColumn("op", F.lit("delete")),
    ]
    for i, batch in enumerate(batches):
        v = t.merge(batch, op_col="op", batch_id=i)
        cdf = t.changes(v - 1, v).withColumn(
            "_tp_src", F.col("o_totalprice").cast("decimal(18,2)")
        )
        view = incremental_count_sum_view(
            view, cdf, ["o_orderstatus"], {"_tp_src": "tp"}, count_col="n_rows"
        )
        assert _frames_equal(view, recompute(t.read())), f"diverged at v{v}"


def test_stats_overlap_grows_with_merges_and_compact_restores(spark, tmp_path, target):
    """Layout telemetry: a fresh range-partitioned layout is disjoint
    (overlap ~1); repeated merges append files straddling the carried
    ranges so the overlap factor climbs; compact() restores disjointness.
    This is the compact-when signal, the merge table's analogue of the
    vector index's list-skew factor."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=8)
    s0 = t.stats()
    assert s0["max_key_coverage"] == 1 and s0["overlap_factor"] <= 1.001

    # the overlap generator: one merge updating BOTH ends of the keyspace,
    # collapsed into a single output file — it spans [lo, hi] and sits on
    # top of the six carried middle files
    b = target.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    batch = target.filter(
        (F.col("o_orderkey") <= b.lo + 10) | (F.col("o_orderkey") >= b.hi - 10)
    ).withColumn("o_totalprice", F.lit(1.0))
    t.merge(batch, batch_id=0, num_files=1)
    s1 = t.stats()
    assert s1["max_key_coverage"] >= 2, s1
    assert s1["overlap_factor"] > 1.5, s1

    t.compact(num_files=8)
    s2 = t.stats()
    assert s2["max_key_coverage"] == 1 and s2["overlap_factor"] <= 1.001
    assert s2["rows"] == s1["rows"]


def test_scan_prunes_files_before_spark(spark, tmp_path, target):
    """Range scan: manifest stats exclude files before Spark lists them
    (the plan's parquet scan carries only the intersecting files), and
    the result equals the unpruned filter."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=8)
    b = target.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    hi_bound = b.lo + (b.hi - b.lo) // 10  # bottom decile of the keyspace
    pruned = t.scan(lo=b.lo, hi=hi_bound)
    expected = target.filter(
        (F.col("o_orderkey") >= b.lo) & (F.col("o_orderkey") <= hi_bound)
    )
    assert _frames_equal(pruned, expected)
    # the plan reads a strict subset of the pool's files
    n_files_in_plan = pruned._jdf.queryExecution().executedPlan().toString().count(
        "f-"
    )
    listed = len(t._manifest(1))
    assert 1 <= n_files_in_plan < listed
    # open-ended sides and an out-of-range window
    assert t.scan(lo=b.hi + 1).count() == 0
    assert t.scan().count() == target.count()


def test_nested_column_before_key_gets_correct_stats(spark, tmp_path):
    """Parquet leaf-column indexing: a nested column (array) declared
    BEFORE the key must not shift the footer-stats read off the key
    column (arrow field index != parquet leaf index)."""
    df = spark.range(0, 100).selectExpr(
        "array(cast(id as double), 1.0) as vec", "id as k", "id * 2 as v"
    )
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(df, ["k"], num_files=4)
    ent = t._manifest(1)
    assert all(e["min_key"] is not None for e in ent)
    assert min(e["min_key"] for e in ent) == 0
    assert max(e["max_key"] for e in ent) == 99
    # pruning works off those stats
    got = t.scan(lo=0, hi=10)
    assert got.count() == 11
    n_in_plan = got._jdf.queryExecution().executedPlan().toString().count("f-")
    assert n_in_plan < 4


def test_changes_below_retention_errors_explicitly(spark, tmp_path, target):
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    for i in range(3):
        t.merge(
            target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
                "o_totalprice", F.lit(float(i))
            ),
            batch_id=i,
        )
    t.vacuum(keep_last=2)  # v2's feed is gone (v3, v4 retained)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.changes(1).count()
    # ranges wholly inside the retention window still read fine
    assert t.changes(2).count() > 0


def test_stream_changes_consumes_committed_feeds_exactly_once(spark, tmp_path, target):
    """CDC source: an availableNow drain picks up every committed feed
    once; a later merge's feed arrives as a NEW batch on restart (file-
    source checkpoint semantics); staged (uncommitted) feeds are invisible
    by construction (underscore prefix + rename-after-commit)."""
    import os

    from clustopher_spark.streaming.merge_table import stream_changes

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    for i in range(2):
        t.merge(
            target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
                "o_totalprice", F.lit(float(i))
            ),
            batch_id=i,
        )

    ckpt = str(tmp_path / "ckpt")
    consumed: list = []

    def drain():
        consumed.clear()
        q = (
            stream_changes(spark, root)
            .writeStream.foreachBatch(
                lambda df, bid: consumed.extend(tuple(r) for r in df.collect())
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    drain()
    expected = {tuple(r) for r in t.changes(1).collect()}
    assert set(consumed) == expected and len(consumed) == len(expected)

    # a third commit; same checkpoint -> ONLY the new feed is delivered
    t.merge(
        target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
            "o_totalprice", F.lit(9.0)
        ),
        batch_id=2,
    )
    # plant a fake STAGED feed: must stay invisible to the stream
    staged = os.path.join(root, "changes", "_staging_v99")
    t.changes(3).write.mode("overwrite").parquet(staged)
    drain()
    assert set(consumed) == {tuple(r) for r in t.changes(3).collect()}  # v4 only


def test_vacuum_publishes_then_sweeps_staged_feeds(spark, tmp_path, target):
    """Crash window between meta commit and feed rename: vacuum (like
    changes()) finishes the publication instead of deleting a committed
    feed; a staging dir for an UNCOMMITTED version is swept as garbage."""
    import os
    import shutil as _sh

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    batch = target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    t.merge(batch, batch_id=0)
    # simulate the crash: un-publish v2's feed back to its staged name
    final = os.path.join(root, "changes", "v2")
    staged = os.path.join(root, "changes", "_staging_v2")
    os.replace(final, staged)
    # and plant garbage for a version that never committed
    _sh.copytree(staged, os.path.join(root, "changes", "_staging_v77"))
    t.vacuum(keep_last=5, orphan_grace_sec=0)
    assert os.path.isdir(final)  # healed, not deleted
    assert not os.path.isdir(staged)
    assert not os.path.isdir(os.path.join(root, "changes", "_staging_v77"))
    assert t.changes(1).count() > 0  # feed intact


def test_merge_semantics_state_machine(spark, tmp_path):
    """Randomized upsert/delete/compact/vacuum sequences vs a driver-side
    dict model: after every operation the committed table equals the
    model exactly (keys and values). Pins the MERGE visibility algebra —
    last-writer-wins per commit, delete removes, re-upsert resurrects,
    compact/vacuum are logically invisible — independent of the pruning,
    staging, and manifest machinery underneath (the same role the vector
    index's tombstone state machine plays)."""
    import random

    for seed in (0, 1):
        rng = random.Random(seed)
        root = str(tmp_path / f"sm{seed}")
        t = MergeTable(spark, root)
        keys = list(range(24))
        model = {k: float(k) for k in keys[:12]}
        t.create(
            spark.createDataFrame(
                [(k, v) for k, v in model.items()], "k long, v double"
            ),
            ["k"],
            num_files=3,
        )
        batch_id = 0
        for _ in range(7):
            op = rng.choice(["merge", "merge", "merge", "compact", "vacuum"])
            if op == "merge":
                batch_id += 1
                ups = rng.sample(keys, rng.randint(1, 4))
                dels = [k for k in rng.sample(keys, rng.randint(0, 3)) if k not in ups]
                vals = {k: rng.uniform(0, 100) for k in ups}
                batch = spark.createDataFrame(
                    [(k, round(vals[k], 3), "upsert") for k in ups]
                    + [(k, 0.0, "delete") for k in dels],
                    "k long, v double, op string",
                )
                assert t.merge(batch, op_col="op", batch_id=batch_id) is not None
                for k in ups:
                    model[k] = round(vals[k], 3)
                for k in dels:
                    model.pop(k, None)
            elif op == "compact":
                t.compact(num_files=2)
            else:
                t.vacuum(keep_last=2)
            got = {r.k: r.v for r in t.read().collect()}
            assert got == model, f"seed={seed} after {op}"


def test_merge_frames_equals_full_outer_merge_plan(spark):
    """Cross-implementation pin: the broadcast anti-join+union algebra
    (merge_frames — the plan MergeTable commits) and the full-outer
    COALESCE formulation (queries/sql_features.py::merge_upsert_orders'
    shape) are independent derivations of MERGE upsert semantics; they
    must agree row-for-row."""
    o = _orders(spark).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("P"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    )
    ins = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(42.0).alias("o_totalprice"),
    )
    batch = upd.unionByName(ins)
    got = merge_frames(o, batch, ["o_orderkey"])

    u = batch.select(*[F.col(c).alias(f"u_{c}") for c in batch.columns])
    expected = (
        o.join(u, o.o_orderkey == u.u_o_orderkey, "full_outer").select(
            F.coalesce("u_o_orderkey", "o_orderkey").alias("o_orderkey"),
            F.coalesce("u_o_custkey", "o_custkey").alias("o_custkey"),
            F.coalesce("u_o_orderstatus", "o_orderstatus").alias("o_orderstatus"),
            F.coalesce("u_o_totalprice", "o_totalprice").alias("o_totalprice"),
        )
    )
    assert _frames_equal(got, expected)


def test_decimal_first_key_rejected(spark, tmp_path, target):
    """pyarrow cannot extract footer stats for Spark-written decimals (and
    Decimal is not JSON-representable) — reject at create, not mid-write."""
    dec = target.withColumn("k", F.col("o_totalprice").cast("decimal(18,2)"))
    with pytest.raises(ValueError, match="numeric or string"):
        MergeTable(spark, str(tmp_path / "t")).create(dec, ["k"], num_files=2)


def test_null_key_batch_rejected(spark, tmp_path, target):
    """A null key can never be equality-matched: upserts would duplicate
    every commit and deletes would never apply — rejected loudly."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=2)
    poisoned = target.limit(3).withColumn(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 0, F.lit(None).cast("long")),
    )
    with pytest.raises(ValueError, match="NULL in key"):
        t.merge(poisoned, batch_id=1)
    assert t._meta()["latest"] == 1  # nothing committed


def test_ivm_handles_null_group_keys(spark):
    """GROUP BY collects NULLs into one cell; the delta apply must too
    (null-safe join), or the view drifts from recompute every commit."""
    from clustopher_spark.operators.ivm import incremental_count_sum_view

    base_rows = spark.createDataFrame(
        [("a", 5, 50.0), (None, 3, 30.0)], "g string, n_rows long, s double"
    )
    cdf = spark.createDataFrame(
        [
            (None, 7.0, "insert"),
            (None, 30.0, "delete"),
            ("a", 1.0, "insert"),
        ],
        "g string, v double, _change_type string",
    )
    out = incremental_count_sum_view(
        base_rows, cdf, ["g"], {"v": "s"}, count_col="n_rows"
    )
    got = {r.g: (r.n_rows, r.s) for r in out.collect()}
    assert got[None] == (3, 7.0)  # 3 + 1 - 1 rows; 30 + 7 - 30 value
    assert got["a"] == (6, 51.0)
    assert len(got) == 2  # ONE null group, not two


def test_merge_heals_previously_staged_feeds(spark, tmp_path, target):
    """Writer self-heal: a commit-then-rename crash on vN is repaired by
    the NEXT merge, so a pure streaming consumer (which never calls
    changes()/vacuum) misses the feed for at most one batch."""
    import os

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    batch = target.filter(F.col("o_orderkey") <= lo + 10)
    t.merge(batch.withColumn("o_totalprice", F.lit(1.0)), batch_id=0)
    # simulate the crash window: un-publish v2's feed
    os.replace(
        os.path.join(root, "changes", "v2"),
        os.path.join(root, "changes", "_staging_v2"),
    )
    t.merge(batch.withColumn("o_totalprice", F.lit(2.0)), batch_id=1)
    assert os.path.isdir(os.path.join(root, "changes", "v2"))  # healed
    assert os.path.isdir(os.path.join(root, "changes", "v3"))


def test_stats_works_for_string_keys(spark, tmp_path):
    """String-keyed tables get real telemetry (sweep is comparison-only;
    overlap falls back to open-point sampling), never a dead 0.0."""
    df = spark.range(0, 200).selectExpr(
        "concat('k', lpad(cast(id as string), 4, '0')) as k", "id as v"
    )
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(df, ["k"], num_files=4)
    s0 = t.stats()
    assert s0["max_key_coverage"] == 1 and s0["overlap_factor"] == 1.0
    # both-ends merge into one spanning file -> overlap visible
    batch = df.filter("v <= 5 or v >= 195").selectExpr("k", "v + 1000 as v")
    t.merge(batch, batch_id=0, num_files=1)
    s1 = t.stats()
    assert s1["max_key_coverage"] >= 2 and s1["overlap_factor"] > 1.0


# --- round-6 hardening (ADVICE r5) ---


def test_bad_op_value_rejected(spark, tmp_path, target):
    """The merge algebra routes any op other than the literal 'upsert' to
    the delete arm, so a typo'd ('Upsert') or NULL op would silently
    delete the row's key — merge() rejects such batches before any
    write."""
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=2)
    typo = target.limit(3).withColumn("op", F.lit("Upsert"))
    with pytest.raises(ValueError, match="not in \\['upsert', 'delete'\\]"):
        t.merge(typo, op_col="op", batch_id=1)
    null_op = target.limit(3).withColumn("op", F.lit(None).cast("string"))
    with pytest.raises(ValueError, match="not in"):
        t.merge(null_op, op_col="op", batch_id=1)
    assert t._meta()["latest"] == 1  # nothing committed


def test_create_rejects_null_keys(spark, tmp_path, target):
    """create() applies the same null-key rejection as merge(): a null-key
    row landed at bootstrap could never be updated or deleted afterwards
    (the streaming bootstrap goes through create)."""
    poisoned = target.limit(5).withColumn(
        "o_orderkey", F.lit(None).cast("long")
    ).unionByName(target.limit(20))
    with pytest.raises(ValueError, match="NULL in key"):
        MergeTable(spark, str(tmp_path / "t")).create(poisoned, ["o_orderkey"])
    import os
    assert not os.path.isfile(str(tmp_path / "t" / "meta.json"))


def test_streaming_bootstrap_rejects_bad_op(spark, tmp_path, target):
    """The stream's bootstrap branch validates op values BEFORE its
    delete-filter would silently insert a typo'd op as data."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from clustopher_spark.streaming.merge_table import incremental_merge_table

    src = str(tmp_path / "src")
    target.limit(50).withColumn("op", F.lit("Upsert")).coalesce(1).write.parquet(
        src + "/b0"
    )
    schema = target.limit(0).withColumn("op", F.lit("x")).schema
    stream = spark.readStream.schema(schema).parquet(src + "/b*")
    with pytest.raises(StreamingQueryException, match="not in"):
        incremental_merge_table(
            stream, str(tmp_path / "tbl"), key_cols=["o_orderkey"], op_col="op"
        )


def test_serving_merge_rejects_duplicate_keys(spark, tmp_path, target):
    """TableService.merge enforces MERGE's one-source-row-per-target-key
    precondition: an HTTP batch with two rows for one key would commit
    duplicate keys and a corrupt change feed (no order column exists over
    HTTP to break the tie)."""
    from clustopher_spark.serving import TableService

    root = str(tmp_path / "tables")
    MergeTable(spark, root + "/orders").create(target, ["o_orderkey"], num_files=2)
    svc = TableService(spark, root)
    row = target.limit(1).collect()[0]
    as_json = {
        k: (v.isoformat() if hasattr(v, "isoformat") else v)
        for k, v in row.asDict().items()
    }
    dup = [dict(as_json, op="upsert"), dict(as_json, o_totalprice=1.0, op="upsert")]
    with pytest.raises(ValueError, match="duplicate"):
        svc.merge("orders", dup, batch_id=1, op_col="op")
    assert MergeTable(spark, root + "/orders")._meta()["latest"] == 1
    # an unrecognized JSON field is a typo until proven otherwise: no
    # silent drop, no silent widening — 400 naming it (engine-level
    # MergeTable.merge is the schema-evolution path)
    with pytest.raises(ValueError, match="unknown column"):
        svc.merge(
            "orders",
            [dict(as_json, o_totalpryce=1.0, op="upsert")],
            batch_id=2,
            op_col="op",
        )


def test_ivm_all_null_sum_groups(spark):
    """SUM over a group whose values are all NULL is NULL, not 0 — both
    for a group BORN all-NULL (insert-only delta) and for a group that
    BECOMES all-NULL when deletes remove its non-null rows (exact via the
    bootstrap helper's non-null counts)."""
    from clustopher_spark.operators.ivm import (
        bootstrap_count_sum_view,
        incremental_count_sum_view,
    )

    tbl = spark.createDataFrame(
        [("mixed", 5.0), ("mixed", None), ("allnull", None)],
        "g string, v double",
    )
    base = bootstrap_count_sum_view(tbl, ["g"], {"v": "s"}, count_col="n")
    # sanity: the seeded view matches plain SQL semantics
    got0 = {r.g: (r.n, r.s) for r in base.collect()}
    assert got0["allnull"] == (1, None) and got0["mixed"] == (2, 5.0)

    cdf = spark.createDataFrame(
        [
            ("born_null", None, "insert"),   # new group, all-NULL values
            ("mixed", 5.0, "delete"),        # removes the only non-null row
        ],
        "g string, v double, _change_type string",
    )
    out = incremental_count_sum_view(
        base, cdf, ["g"], {"v": "s"}, count_col="n", keep_state=True
    )
    got = {r.g: (r.n, r.s) for r in out.collect()}
    assert got["born_null"] == (1, None)   # NULL, not 0
    assert got["mixed"] == (1, None)       # became all-NULL -> sum NULL
    assert got["allnull"] == (1, None)
    # recompute oracle: apply the same changes to the table directly
    post = spark.createDataFrame(
        [("mixed", None), ("allnull", None), ("born_null", None)],
        "g string, v double",
    )
    expect = {
        r.g: (r.n, r.s)
        for r in post.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert {g: got[g] for g in expect} == expect
    # chained: the keep_state view stays maintainable (delete born_null)
    cdf2 = spark.createDataFrame(
        [("born_null", None, "delete")], "g string, v double, _change_type string"
    )
    out2 = incremental_count_sum_view(
        out, cdf2, ["g"], {"v": "s"}, count_col="n", keep_state=True
    )
    assert {r.g for r in out2.collect()} == {"mixed", "allnull"}


def test_concurrent_staging_survives_write_and_vacuum_grace(spark, tmp_path, target):
    """_write_files removes only ITS OWN uuid staging dir, and vacuum's
    age gate protects a concurrent writer's FRESH in-flight staging (the
    per-table serving lock only serializes HTTP callers, so a streaming
    sink plus an HTTP merge can overlap a vacuum); only staging older
    than the grace — crash garbage — is swept."""
    import os

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=2)
    foreign = os.path.join(root, "_staging", "other-writer")
    os.makedirs(foreign)
    marker = os.path.join(foreign, "part-inflight.parquet")
    open(marker, "w").write("x")
    t.merge(target.limit(5).withColumn("o_totalprice", F.lit(9.9)), batch_id=1)
    assert os.path.isfile(marker)  # concurrent staging untouched by merge
    t.vacuum(keep_last=1)
    assert os.path.isdir(foreign)  # FRESH staging survives a default vacuum
    os.utime(foreign, (1, 1))  # now it is ancient crash garbage
    t.vacuum(keep_last=1, orphan_grace_sec=3600)
    assert not os.path.isdir(foreign)  # swept once older than the grace


def test_schema_evolution_add_column(spark, tmp_path, target):
    """Widening merge (r5 verdict item 5): a corrections batch carrying a
    NEW column adds it — carried rows read NULL (untouched files are never
    rewritten), upserted rows carry values, time travel reads v1 under its
    own schema, and the commit's CDF carries the widened schema."""
    import os

    from clustopher_spark.sources.merge_table import evolve_target

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    batch = (
        target.filter(F.col("o_orderkey") <= lo + 40)
        .withColumn("note", F.concat(F.lit("fixed-"), F.col("o_orderkey")))
        .withColumn("op", F.lit("upsert"))
    )
    v = t.merge(batch, op_col="op", batch_id=1)
    assert v == 2
    got = t.read()
    assert "note" in got.columns
    # matches the pure evolve+merge algebra exactly
    expected = merge_frames(
        evolve_target(target, batch, "op"), batch, ["o_orderkey"], op_col="op"
    )
    assert _frames_equal(got, expected)
    n_batch = batch.count()
    assert got.filter(F.col("note").isNotNull()).count() == n_batch
    assert got.filter(F.col("note").isNull()).count() == target.count() - n_batch
    # untouched files were carried, not rewritten
    h = t.history()[-1]
    assert h["schema_added"] == ["note"] and h["files_carried"] > 0
    # time travel: v1 reads under its OWN schema (no note column)
    assert "note" not in t.read(version=1).columns
    assert _frames_equal(t.read(version=1), target)
    # the CDF for the widening commit carries the new column
    cdf = t.changes(1, 2)
    assert "note" in cdf.columns
    assert cdf.filter(
        (F.col("_change_type") == "update_post") & F.col("note").isNotNull()
    ).count() == n_batch
    # update_pre images show the OLD row: note did not exist -> NULL
    assert cdf.filter(F.col("_change_type") == "update_pre")\
        .filter(F.col("note").isNotNull()).count() == 0
    # a later merge against the widened table must carry the new column
    with pytest.raises(ValueError, match="missing table column"):
        t.merge(target.limit(3).withColumn("op", F.lit("upsert")),
                op_col="op", batch_id=2)
    # point-lookup pruning still works across mixed-schema files
    hit = type(t).prune_entries(t._manifest(2), lo=lo, hi=lo)
    assert 0 < len(hit) < len(t._manifest(2))
    # a second widening merge on top (evolution composes)
    batch2 = (
        t.read().filter(F.col("o_orderkey") <= lo + 10)
        .withColumn("rank", F.lit(7).cast("int"))
        .withColumn("op", F.lit("upsert"))
    )
    n2 = batch2.count()
    batch2 = batch2.localCheckpoint(eager=True)  # pin: vacuum below drops v3's files
    v3 = t.merge(batch2, op_col="op", batch_id=3)
    assert set(t._meta()["columns"]) >= {"note", "rank"}
    assert t.read(version=v3).filter(F.col("rank") == 7).count() == n2
    assert "rank" not in t.read(version=2).columns
    # vacuum below the widening boundary keeps the evolved latest readable
    t.vacuum(keep_last=1)
    assert t.read().filter(F.col("rank") == 7).count() == n2


def test_schema_evolution_cdc_stream_null_fills_old_feeds(spark, tmp_path, target):
    """stream_changes across a widening: the stream's schema is the
    CURRENT table schema, so feed files committed BEFORE the evolution
    read with NULL for the new column, after with real values."""
    from clustopher_spark.streaming.merge_table import stream_changes

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    pre = target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    t.merge(pre, batch_id=1)  # v2: pre-evolution commit
    widened = (
        target.filter(F.col("o_orderkey") <= lo + 10)
        .withColumn("note", F.lit("n1"))
    )
    t.merge(widened, batch_id=2)  # v3: widening commit
    seen = []
    q = (
        stream_changes(spark, root)
        .writeStream.foreachBatch(lambda df, bid: seen.append(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", root + "_cdcckpt")
        .start()
    )
    q.awaitTermination()
    rows = [r for b in seen for r in b]
    v2 = [r for r in rows if r._commit_version == 2]
    v3 = [r for r in rows if r._commit_version == 3 and r._change_type == "update_post"]
    assert v2 and all(r.note is None for r in v2)     # old feed: NULL-filled
    assert v3 and all(r.note == "n1" for r in v3)     # new feed: real values


def test_cdc_listing_bounded_by_vacuum_and_consumer_survives(spark, tmp_path, target):
    """Feed-listing growth (r5 verdict item 6): vacuum deletes drained
    commits' feed dirs so the CDC glob's working set is bounded by the
    retention window, and a checkpointed consumer that already drained
    those feeds resumes cleanly across the vacuum — only new commits
    arrive, no error, no duplicates."""
    import os

    from clustopher_spark.streaming.merge_table import stream_changes

    root = str(tmp_path / "t")
    ckpt = root + "_cdcckpt"
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]

    def commit(i):
        t.merge(
            target.filter(F.col("o_orderkey") <= lo + 10)
            .withColumn("o_totalprice", F.lit(float(i))),
            batch_id=i,
        )

    for i in (1, 2, 3):
        commit(i)  # v2..v4

    def drain():
        seen = []
        q = (
            stream_changes(spark, root, options={"maxFilesPerTrigger": "1"})
            .writeStream.foreachBatch(lambda df, bid: seen.append(df.collect()))
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        return [r for b in seen for r in b]

    first = drain()
    assert {r._commit_version for r in first} == {2, 3, 4}

    # retention: keep only the newest version -> older feed dirs deleted
    t.vacuum(keep_last=1)
    feed_dirs = [d for d in os.listdir(os.path.join(root, "changes")) if d.startswith("v")]
    assert feed_dirs == ["v4"]  # listing bounded by the retention window

    commit(4)  # v5, after the vacuum
    resumed = drain()  # same checkpoint across the vacuum
    assert {r._commit_version for r in resumed} == {5}  # new commit only, once


def test_changes_range_spanning_widening_keeps_new_column(spark, tmp_path, target):
    """A changes() range spanning a widening commit mixes feed files
    written under different schemas; the read must carry the upper-bound
    version's schema (pre-widening feeds NULL-fill) — plain inference
    would take one footer's schema and silently drop the new column from
    post-widening images (code-review finding, round 6)."""
    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    sl = target.filter(F.col("o_orderkey") <= lo + 10)
    t.merge(sl.withColumn("o_totalprice", F.lit(1.0)), batch_id=1)  # v2: pre
    t.merge(sl.withColumn("note", F.lit("n1")), batch_id=2)          # v3: widening
    feed = t.changes(1)  # spans v2 (no note) + v3 (note)
    assert "note" in feed.columns
    post = feed.filter(
        (F.col("_commit_version") == 3) & (F.col("_change_type") == "update_post")
    )
    n = sl.count()
    assert post.filter(F.col("note") == "n1").count() == n  # values survive
    assert feed.filter(F.col("_commit_version") == 2)\
        .filter(F.col("note").isNotNull()).count() == 0     # old feed NULL-fills


def test_ivm_min_max_view(spark, tmp_path):
    """MIN/MAX maintenance (operators/ivm.py): inserts advance extrema
    table-free; a delete of a NON-extremum leaves them valid; only a
    removal that ties-or-beats a stored extremum triggers the bounded
    per-group recompute — and every path equals recompute. Also pins the
    recompute's scale shape: the post-table scan is semi-joined against
    the BROADCAST dirty key set."""
    import contextlib
    import io

    from clustopher_spark.operators.ivm import incremental_min_max_view

    tbl = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 5.0), ("b", 2.0), ("b", 7.0), ("c", None)],
        "g string, v double",
    )
    base = tbl.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    # one commit: insert a@9 (new max, fast path), delete b@2 (non-extremum
    # min? 2.0 IS b's min -> dirty), delete ONE a@5 (ties max with a dup
    # remaining -> dirty, recompute must keep 5), insert d@4 (new group),
    # delete c's NULL row via update to non-null (all-NULL group gains a value)
    cdf = spark.createDataFrame(
        [
            ("a", 9.0, "insert"),
            ("a", 5.0, "delete"),
            ("b", 2.0, "delete"),
            ("d", 4.0, "insert"),
            ("c", None, "update_pre"),
            ("c", 3.0, "update_post"),
        ],
        "g string, v double, _change_type string",
    )
    post = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 9.0), ("b", 7.0), ("c", 3.0), ("d", 4.0)],
        "g string, v double",
    )
    view = incremental_min_max_view(
        base, cdf, post, ["g"], "v", count_col="n", min_col="lo", max_col="hi"
    )
    got = {r.g: (r.n, r.lo, r.hi) for r in view.collect()}
    expect = {
        r.g: (r.n, r.lo, r.hi)
        for r in post.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert got == expect  # every path == recompute
    assert got["a"] == (3, 1.0, 9.0)   # tie-delete kept the duplicate max
    assert got["b"] == (1, 7.0, 7.0)   # extremum delete -> recomputed
    assert got["d"] == (1, 4.0, 4.0)   # new group, fast path
    # group vanishing: delete every remaining d row -> group disappears
    cdf2 = spark.createDataFrame(
        [("d", 4.0, "delete")], "g string, v double, _change_type string"
    )
    post2 = post.filter(F.col("g") != "d")
    view2 = incremental_min_max_view(
        view, cdf2, post2, ["g"], "v", count_col="n", min_col="lo", max_col="hi"
    )
    assert "d" not in {r.g for r in view2.collect()}
    # scale shape: the dirty-group recompute broadcasts the key set
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        view.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_feed_one_file_per_commit_and_filelimit_drain_exact(spark, tmp_path, target):
    """The commit-split hazard, closed at the writer: merge() writes ONE
    feed file per commit, so maxFilesPerTrigger=1 delivers whole commits
    — a MaintainedView drained commit-paced equals recompute after every
    batch (previously the first slice of a multi-file feed advanced the
    watermark and the rest was dropped forever)."""
    import os

    from clustopher_spark.streaming.ivm_view import MaintainedView

    def recompute(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tp"),
        )

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    view = MaintainedView(
        spark, str(tmp_path / "view"), ["o_orderstatus"],
        {"o_totalprice": "tp"},
    )
    view.bootstrap(t)
    t.merge(_mixed_batch(_orders(spark)), op_col="op", batch_id=0)
    t.merge(
        _orders(spark).filter(F.col("o_orderkey") % 8 == 1)
        .withColumn("op", F.lit("delete")),
        op_col="op", batch_id=1,
    )
    # the layout guarantee the consumer depends on: one data file per feed
    for v in (2, 3):
        d = os.path.join(root, "changes", f"v{v}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"v{v} feed has {len(files)} files"
    # commit-paced drain: one file (== one commit) per micro-batch
    view.maintain(root, options={"maxFilesPerTrigger": "1"})
    assert _frames_equal(view.read(), recompute(t.read()))
    assert int(view._meta()["applied_commit"]) == 3


def test_maintained_view_refuses_split_commit(spark, tmp_path, target):
    """Legacy multi-file feeds (written before the coalesce(1) layout) can
    still be split by a files-per-trigger limit — the file source never
    redelivers, so the view must REFUSE the partial commit loudly instead
    of marking it applied and silently dropping the remaining images."""
    import os
    import shutil

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from clustopher_spark.streaming.ivm_view import MaintainedView

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    view = MaintainedView(
        spark, str(tmp_path / "view"), ["o_orderstatus"],
        {"o_totalprice": "tp"},
    )
    view.bootstrap(t)
    t.merge(_mixed_batch(_orders(spark)), op_col="op", batch_id=0)
    # simulate the pre-layout feed: rewrite v2's single file as two files
    feed = os.path.join(root, "changes", "v2")
    two = spark.read.parquet(feed).repartition(2)
    staging = str(tmp_path / "feed2")
    two.write.mode("overwrite").parquet(staging)
    shutil.rmtree(feed)
    os.replace(staging, feed)
    files = [f for f in os.listdir(feed) if f.endswith(".parquet")]
    assert len(files) == 2
    with pytest.raises(StreamingQueryException, match="change images"):
        view.maintain(root, options={"maxFilesPerTrigger": "1"})
    # nothing was applied: the watermark still points at the bootstrap
    assert int(view._meta()["applied_commit"]) == 1


def test_ivm_min_max_null_group_key_survives_dirty_recompute(spark):
    """A NULL group key is a real group (GROUP BY collects NULLs into one
    cell), and the dirty-group recompute must use a NULL-SAFE semi-join:
    a plain `on=group_cols` equality would never match the NULL key, so a
    NULL-keyed group that turns dirty (its stored extremum removed) would
    be excluded from `clean` AND missed by the recompute — silently
    vanishing from the view while recompute still shows it."""
    from clustopher_spark.operators.ivm import incremental_min_max_view

    tbl = spark.createDataFrame(
        [(None, 1.0), (None, 9.0), ("a", 5.0)], "g string, v double"
    )
    base = tbl.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    # delete the NULL group's max -> the group is dirty and must be
    # recomputed from the post table (expected survivor: 1.0)
    cdf = spark.createDataFrame(
        [(None, 9.0, "delete")], "g string, v double, _change_type string"
    )
    post = spark.createDataFrame(
        [(None, 1.0), ("a", 5.0)], "g string, v double"
    )
    view = incremental_min_max_view(
        base, cdf, post, ["g"], "v", count_col="n", min_col="lo", max_col="hi"
    )
    got = {r.g: (r.n, r.lo, r.hi) for r in view.collect()}
    expect = {
        r.g: (r.n, r.lo, r.hi)
        for r in post.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert got == expect
    assert got[None] == (1, 1.0, 1.0)  # the NULL group survived, recomputed


def test_ivm_min_max_tracks_live_commits(spark, tmp_path, target):
    """MIN/MAX view against REAL MergeTable commits, two deep."""
    from clustopher_spark.operators.ivm import incremental_min_max_view

    def recompute(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )

    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    view = recompute(target)
    batches = [
        _mixed_batch(_orders(spark)),
        _orders(spark).filter(F.col("o_orderkey") % 8 == 1)
        .withColumn("op", F.lit("delete")),
    ]
    for i, batch in enumerate(batches):
        v = t.merge(batch, op_col="op", batch_id=i)
        cdf = t.changes(v - 1, v)
        view = incremental_min_max_view(
            view, cdf, t.read(), ["o_orderstatus"], "o_totalprice",
            count_col="n", min_col="lo", max_col="hi",
        )
        assert _frames_equal(view, recompute(t.read())), f"diverged at v{v}"


def test_maintained_view_tracks_table_and_replay_is_noop(spark, tmp_path, target):
    """streaming/ivm_view.py — the CDC loop's durable consumer: bootstrap
    one full aggregate, then every merge commit advances the view through
    its change feed (no table rescans); the view equals recompute at every
    step; a FRESH-checkpoint full replay advances nothing (the
    commit-version watermark, the view-side twin of the table's batch-id
    guard); old view versions are pruned to a fixed window."""
    import os
    import shutil

    from clustopher_spark.streaming.ivm_view import MaintainedView

    def recompute(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tp"),
        )

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    view = MaintainedView(
        spark, str(tmp_path / "view"), ["o_orderstatus"],
        {"o_totalprice": "tp"},
    )
    view.bootstrap(t)
    assert _frames_equal(view.read(), recompute(target))

    # two commits, then drain the CDC stream once
    t.merge(_mixed_batch(_orders(spark)), op_col="op", batch_id=0)
    t.merge(
        _orders(spark).filter(F.col("o_orderkey") % 8 == 1)
        .withColumn("op", F.lit("delete")),
        op_col="op", batch_id=1,
    )
    view.maintain(root)
    assert _frames_equal(view.read(), recompute(t.read()))
    latest = view._meta()

    # full replay from a FRESH checkpoint: every feed re-delivered, the
    # watermark filters them all out -> same version, same content
    shutil.rmtree(str(tmp_path / "view" / "_checkpoint"))
    view.maintain(root)
    assert view._meta() == latest
    assert _frames_equal(view.read(), recompute(t.read()))

    # a third commit after the replay still advances normally
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    t.merge(
        target.filter(F.col("o_orderkey") <= lo + 10)
        .withColumn("o_totalprice", F.lit(1.5)),
        batch_id=2,
    )
    view.maintain(root)
    assert _frames_equal(view.read(), recompute(t.read()))
    # version retention: at most the current and one previous parquet dir
    dirs = [d for d in os.listdir(str(tmp_path / "view")) if d.startswith("v")]
    assert len(dirs) <= 2


def test_maintained_minmax_view_tracks_table_and_replay_is_noop(spark, tmp_path, target):
    """streaming/ivm_view.py::MaintainedMinMaxView — the durable MIN/MAX
    consumer of the CDC loop: bootstrap one full aggregate, then every
    merge commit advances the view through its change feed, with the
    dirty-group recompute time-traveling to the applied commit's table
    snapshot; the view equals recompute at every step (including a
    commit-paced maxFilesPerTrigger=1 drain and a multi-commit batch); a
    FRESH-checkpoint full replay advances nothing; old view versions are
    pruned to a fixed window."""
    import os
    import shutil

    from clustopher_spark.streaming.ivm_view import MaintainedMinMaxView

    def recompute(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    view = MaintainedMinMaxView(
        spark, str(tmp_path / "view"), ["o_orderstatus"], "o_totalprice",
        min_col="lo", max_col="hi",
    )
    view.bootstrap(t)
    assert _frames_equal(view.read(), recompute(target))

    # commit 2 (mixed) then commit 3 (deletes that REMOVE current extrema:
    # the max-price keys per status) — drained commit-paced, so each
    # micro-batch applies exactly one commit and time-travels to it
    t.merge(_mixed_batch(_orders(spark)), op_col="op", batch_id=0)
    cur = t.read()
    w_max = cur.groupBy("o_orderstatus").agg(
        F.max("o_totalprice").alias("_mx")
    )
    extremum_keys = (
        cur.join(w_max, on="o_orderstatus")
        .filter(F.col("o_totalprice") == F.col("_mx"))
        .drop("_mx")
        .withColumn("op", F.lit("delete"))
    )
    t.merge(extremum_keys, op_col="op", batch_id=1)
    view.maintain(root, options={"maxFilesPerTrigger": "1"})
    assert _frames_equal(view.read(), recompute(t.read()))
    latest = view._meta()

    # full replay from a FRESH checkpoint: watermark filters everything
    shutil.rmtree(str(tmp_path / "view" / "_checkpoint"))
    view.maintain(root)
    assert view._meta() == latest
    assert _frames_equal(view.read(), recompute(t.read()))

    # two MORE commits drained in ONE batch (multi-commit apply: the
    # one-shot merge against the max-commit snapshot must equal recompute
    # — update chains dirty themselves via their own sub images)
    lo_key = target.agg(F.min("o_orderkey")).collect()[0][0]
    t.merge(
        target.filter(F.col("o_orderkey") <= lo_key + 10)
        .withColumn("o_totalprice", F.lit(1.5)),
        batch_id=2,
    )
    t.merge(
        target.filter(F.col("o_orderkey") <= lo_key + 10)
        .withColumn("o_totalprice", F.lit(999999.0)),
        batch_id=3,
    )
    view.maintain(root)
    assert _frames_equal(view.read(), recompute(t.read()))
    # version retention: at most the current and one previous parquet dir
    dirs = [d for d in os.listdir(str(tmp_path / "view")) if d.startswith("v")]
    assert len(dirs) <= 2


def test_concurrent_merge_conflict_raises_and_winner_intact(
    spark, tmp_path, target, monkeypatch
):
    """The single-writer contract is now enforced, not assumed: all
    version-named artifacts commit inside a flock+CAS write guard, so of
    two merges planned against the same version the one that commits
    second raises ConcurrentWriteError BEFORE touching the winner's
    manifest/schema/feed/meta; its uuid-named data files are age-gated
    vacuum orphans. Deterministic interleave: the second writer's full
    merge is injected between the first's data-file write and its
    commit."""
    import os

    from clustopher_spark.sources.merge_table import ConcurrentWriteError

    root = str(tmp_path / "t")
    t1 = MergeTable(spark, root)
    t1.create(target, ["o_orderkey"], num_files=2)
    t2 = MergeTable(spark, root)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    batch1 = target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    batch2 = target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
        "o_totalprice", F.lit(2.0)
    )

    orig = MergeTable._write_files
    fired = []

    def hijack(self, df, key_cols, num_files):
        entries = orig(self, df, key_cols, num_files)
        if self is t1 and not fired:
            fired.append(True)
            assert t2.merge(batch2, batch_id=99) == 2  # the race winner
        return entries

    monkeypatch.setattr(MergeTable, "_write_files", hijack)
    with pytest.raises(ConcurrentWriteError):
        t1.merge(batch1, batch_id=0)
    monkeypatch.setattr(MergeTable, "_write_files", orig)

    # the winner's commit is fully intact: data, manifest, feed, watermark
    assert t1._meta()["latest"] == 2
    assert t1._meta()["last_batch"] == 99
    expected = merge_frames(target, batch2, ["o_orderkey"])
    assert _frames_equal(t1.read(), expected)
    assert t1.changes(1, 2).count() > 0  # v2's feed is the winner's
    got = {r.o_orderkey: r.o_totalprice for r in t1.read().filter(
        F.col("o_orderkey") <= lo + 10).collect()}
    assert all(v == 2.0 for v in got.values())  # winner's values, not loser's
    # the loser's data files are pool orphans the age-gated sweep collects
    pre = set(os.listdir(os.path.join(root, "files")))
    t1.vacuum(keep_last=2, orphan_grace_sec=0)
    referenced = {e["file"] for e in t1._manifest(1)} | {
        e["file"] for e in t1._manifest(2)
    }
    assert set(os.listdir(os.path.join(root, "files"))) == referenced
    assert referenced < pre  # something was actually swept


def test_create_refuses_existing_table(spark, tmp_path, target):
    """create() on a root that already has a committed table raises
    instead of silently clobbering it (the create/create race)."""
    from clustopher_spark.sources.merge_table import ConcurrentWriteError

    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=2)
    with pytest.raises(ConcurrentWriteError, match="already exists"):
        t.create(target, ["o_orderkey"], num_files=2)


def test_ivm_distinct_count_view(spark):
    """COUNT(DISTINCT) maintenance via the invertible support relation
    (operators/ivm.py): duplicates decrement without dropping the value,
    the last copy's removal does drop it, NULL values never count but do
    keep an all-NULL group alive, and groups vanish at count zero —
    every step equals recompute."""
    from clustopher_spark.operators.ivm import (
        bootstrap_distinct_support,
        distinct_count_view,
        incremental_distinct_count_view,
    )

    tbl = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 7), ("c", None)],
        "g string, v int",
    )
    support = bootstrap_distinct_support(tbl, ["g"], "v")
    cdf = spark.createDataFrame(
        [
            ("a", 1, "delete"),        # one copy of a dup: distinct stays 2
            ("a", 3, "insert"),        # new value: distinct -> 3
            ("b", 7, "update_pre"),    # value change 7 -> 9
            ("b", 9, "update_post"),
            ("c", None, "insert"),     # another NULL: group alive, 0 distinct
            ("d", 5, "insert"),        # new group
        ],
        "g string, v int, _change_type string",
    )
    post = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 9), ("c", None), ("c", None), ("d", 5)],
        "g string, v int",
    )
    support2 = incremental_distinct_count_view(support, cdf, ["g"], "v")
    view = distinct_count_view(support2, ["g"], "v")
    got = {r.g: (r.n_rows, r.n_distinct) for r in view.collect()}
    expect = {
        r.g: (r.n_rows, r.n_distinct)
        for r in post.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("v").alias("n_distinct"),
        ).collect()
    }
    assert got == expect
    assert got["a"] == (3, 3) and got["b"] == (1, 1)
    assert got["c"] == (2, 0)  # NULL-only group exists with 0 distinct
    # chaining: delete everything in d and one more of a's former dup
    cdf2 = spark.createDataFrame(
        [("d", 5, "delete"), ("a", 1, "delete")],
        "g string, v int, _change_type string",
    )
    support3 = incremental_distinct_count_view(support2, cdf2, ["g"], "v")
    view2 = distinct_count_view(support3, ["g"], "v")
    got2 = {r.g: (r.n_rows, r.n_distinct) for r in view2.collect()}
    assert "d" not in got2          # group vanished at count zero
    assert got2["a"] == (2, 2)      # value 1's LAST copy removed


def test_ivm_top_k_view(spark):
    """TOP-K maintenance (operators/ivm.py) — the MIN/MAX generalization:
    inserts sort-merge into the stored array table-free; a delete below
    the k-th value leaves it valid; a delete that ties-or-beats the k-th
    (or hits a shorter-than-k array) triggers the bounded recompute —
    every path equals recompute, including ties with surviving
    duplicates, new groups, group vanish, and NULL values."""
    import contextlib
    import io

    from clustopher_spark.operators.ivm import incremental_top_k_view

    k = 3
    tbl = spark.createDataFrame(
        [("a", 9.0), ("a", 9.0), ("a", 7.0), ("a", 5.0), ("a", 1.0),
         ("b", 4.0), ("b", 2.0), ("c", None)],
        "g string, v double",
    )

    def snap(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.slice(F.sort_array(F.collect_list("v"), asc=False), 1, k).alias("top_k"),
        )

    base = snap(tbl)
    cdf = spark.createDataFrame(
        [
            ("a", 9.0, "delete"),       # ties the top: dup must survive -> dirty
            ("a", 1.0, "delete"),       # below the k-th: table-free
            ("a", 8.0, "insert"),       # enters the array: monotone merge
            ("b", 2.0, "update_pre"),   # b is shorter than k -> dirty
            ("b", 6.0, "update_post"),
            ("d", 3.0, "insert"),       # new group
            ("c", None, "insert"),      # NULL never enters the array
        ],
        "g string, v double, _change_type string",
    )
    post = spark.createDataFrame(
        [("a", 9.0), ("a", 8.0), ("a", 7.0), ("a", 5.0),
         ("b", 4.0), ("b", 6.0), ("c", None), ("c", None), ("d", 3.0)],
        "g string, v double",
    )
    view = incremental_top_k_view(base, cdf, post, ["g"], "v", k)
    got = {r.g: (r.n_rows, list(r.top_k)) for r in view.collect()}
    expect = {r.g: (r.n_rows, list(r.top_k)) for r in snap(post).collect()}
    assert got == expect
    assert got["a"] == (4, [9.0, 8.0, 7.0])   # one 9.0 survived the tie-delete
    assert got["b"] == (2, [6.0, 4.0])
    assert got["c"] == (2, [])                # all-NULL group: empty array
    assert got["d"] == (1, [3.0])
    # chained: delete everything in d -> group vanishes; plan shape: the
    # dirty recompute broadcasts the key set
    cdf2 = spark.createDataFrame(
        [("d", 3.0, "delete")], "g string, v double, _change_type string"
    )
    post2 = post.filter(F.col("g") != "d")
    view2 = incremental_top_k_view(view, cdf2, post2, ["g"], "v", k)
    assert "d" not in {r.g for r in view2.collect()}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        view.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_maintained_topk_view_tracks_table_and_replay_is_noop(spark, tmp_path, target):
    """streaming/ivm_view.py::MaintainedTopKView — bootstrap, advance
    through live commits (commit-paced drain incl. deletes that remove
    stored array members), fresh-checkpoint replay no-op, multi-commit
    batch, retention — view == recompute at every step."""
    import os
    import shutil

    from clustopher_spark.streaming.ivm_view import MaintainedTopKView

    k = 4

    def recompute(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.slice(
                F.sort_array(F.collect_list("o_totalprice"), asc=False), 1, k
            ).alias("top_k"),
        )

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    view = MaintainedTopKView(
        spark, str(tmp_path / "view"), ["o_orderstatus"], "o_totalprice", k
    )
    view.bootstrap(t)
    assert _frames_equal(view.read(), recompute(target))

    # commit 2 (mixed) then commit 3: delete each status's TOP-k rows —
    # the stored array is fully invalidated, forcing the dirty recompute
    t.merge(_mixed_batch(_orders(spark)), op_col="op", batch_id=0)
    cur = t.read()
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    top_rows = (
        cur.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .withColumn("op", F.lit("delete"))
    )
    t.merge(top_rows, op_col="op", batch_id=1)
    view.maintain(root, options={"maxFilesPerTrigger": "1"})
    assert _frames_equal(view.read(), recompute(t.read()))
    latest = view._meta()

    # fresh-checkpoint replay: watermark filters everything
    shutil.rmtree(str(tmp_path / "view" / "_checkpoint"))
    view.maintain(root)
    assert view._meta() == latest

    # two more commits in ONE drained batch (update chain through the top)
    lo_key = target.agg(F.min("o_orderkey")).collect()[0][0]
    t.merge(
        target.filter(F.col("o_orderkey") <= lo_key + 10)
        .withColumn("o_totalprice", F.lit(999999.0)),
        batch_id=2,
    )
    t.merge(
        target.filter(F.col("o_orderkey") <= lo_key + 10)
        .withColumn("o_totalprice", F.lit(2.5)),
        batch_id=3,
    )
    view.maintain(root)
    assert _frames_equal(view.read(), recompute(t.read()))
    dirs = [d for d in os.listdir(str(tmp_path / "view")) if d.startswith("v")]
    assert len(dirs) <= 2


def test_vacuum_concurrent_to_merge_preserves_history_flags(
    spark, tmp_path, target, monkeypatch
):
    """The vacuum/merge meta race (round-7 review): a vacuum that commits
    data_removed flags while a merge is mid-flight must not have them
    erased by the merge's commit — the merge's write guard re-reads meta
    under the table lock and grafts its mutations onto THAT snapshot
    (committing the entry snapshot would resurrect vacuumed versions,
    and the next vacuum would crash reading their deleted manifests)."""
    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    batch = target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    t.merge(batch, batch_id=0)  # v2
    t.merge(batch.withColumn("o_totalprice", F.lit(2.0)), batch_id=1)  # v3

    vac = MergeTable(spark, root)
    orig = MergeTable._write_files
    fired = []

    def hijack(self, df, key_cols, num_files):
        entries = orig(self, df, key_cols, num_files)
        if not fired:
            fired.append(True)
            # vacuum lands BETWEEN the merge's entry meta read and its
            # guarded commit; the default grace keeps the in-flight
            # merge's fresh pool files alive
            removed = vac.vacuum(keep_last=2)
            assert removed  # v1's exclusive files went
        return entries

    monkeypatch.setattr(MergeTable, "_write_files", hijack)
    v = t.merge(batch.withColumn("o_totalprice", F.lit(3.0)), batch_id=2)
    monkeypatch.setattr(MergeTable, "_write_files", orig)
    assert v == 4

    meta = t._meta()
    flagged = [h["version"] for h in meta["history"] if h.get("data_removed")]
    assert flagged == [1]  # vacuum's flags survived the merge commit
    assert meta["latest"] == 4 and meta["last_batch"] == 2
    # a follow-up vacuum walks history without touching v1's gone manifest
    t.vacuum(keep_last=2, orphan_grace_sec=0)
    expected = merge_frames(
        merge_frames(
            merge_frames(target, batch, ["o_orderkey"]),
            batch.withColumn("o_totalprice", F.lit(2.0)), ["o_orderkey"],
        ),
        batch.withColumn("o_totalprice", F.lit(3.0)), ["o_orderkey"],
    )
    assert _frames_equal(t.read(), expected)


def test_vacuum_without_flock_grafts_flags_onto_concurrent_commit(
    spark, tmp_path, target, monkeypatch
):
    """The round-7 advice's lost-update: on a filesystem where flock
    silently no-ops, a merge committing mid-vacuum must NOT be rolled
    back by vacuum's final meta write. Vacuum now re-reads meta and
    GRAFTS its data_removed flags onto whatever is current — the merge's
    latest/history entry survives AND the vacuum's flags land.
    Deterministic interleave: the merge is injected between vacuum's
    meta read and its final commit (via the _heal_staged_feeds hook that
    runs exactly there), with _flock patched to the no-op it degrades to
    without fcntl."""
    from contextlib import contextmanager

    @contextmanager
    def no_flock(self):
        yield

    monkeypatch.setattr(MergeTable, "_flock", no_flock)

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    batch = target.filter(F.col("o_orderkey") <= lo + 10).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    t.merge(batch, batch_id=0)  # v2
    t.merge(batch.withColumn("o_totalprice", F.lit(2.0)), batch_id=1)  # v3

    orig_heal = MergeTable._heal_staged_feeds
    vac = MergeTable(spark, root)
    state = {"raced": False}
    late = batch.withColumn("o_totalprice", F.lit(3.0))

    def heal_and_race(self, meta):
        orig_heal(self, meta)
        if self is vac and not state["raced"]:
            state["raced"] = True
            # the concurrent merge commits AFTER vacuum read its meta
            # snapshot but BEFORE vacuum's final commit
            assert MergeTable(spark, root).merge(late, batch_id=2) == 4

    monkeypatch.setattr(MergeTable, "_heal_staged_feeds", heal_and_race)
    removed = vac.vacuum(keep_last=2, orphan_grace_sec=0)
    monkeypatch.setattr(MergeTable, "_heal_staged_feeds", orig_heal)
    assert removed  # v1's exclusive files went
    assert state["raced"]

    meta = t._meta()
    # the merge's commit survived vacuum's final write...
    assert meta["latest"] == 4 and meta["last_batch"] == 2
    assert [h["version"] for h in meta["history"]] == [1, 2, 3, 4]
    # ...and vacuum's flags survived too
    assert [h["version"] for h in meta["history"] if h.get("data_removed")] == [1]
    expected = merge_frames(
        merge_frames(
            merge_frames(target, batch, ["o_orderkey"]),
            batch.withColumn("o_totalprice", F.lit(2.0)), ["o_orderkey"],
        ),
        late, ["o_orderkey"],
    )
    assert _frames_equal(t.read(), expected)


def test_write_heartbeat_keeps_staging_fresh(tmp_path, monkeypatch):
    """_mtime_heartbeat (sources/merge_table.py): a long staging write
    refreshes its dir mtime so vacuum's orphan age gate can never sweep
    an ALIVE merge's staging mid-commit (round-7 advice — previously a
    write stalling past the grace aged out silently)."""
    import os
    import time

    import clustopher_spark.sources.merge_table as mt_mod

    d = str(tmp_path / "staging")
    os.makedirs(d)
    old = time.time() - 7200.0
    os.utime(d, (old, old))
    monkeypatch.setattr(mt_mod, "_HEARTBEAT_SEC", 0.02)
    with mt_mod._mtime_heartbeat(d):
        time.sleep(0.2)
        assert os.path.getmtime(d) > time.time() - 60.0  # beat landed
    # and the thread stops on exit: backdate again, no further beats
    os.utime(d, (old, old))
    time.sleep(0.1)
    assert os.path.getmtime(d) < time.time() - 3600.0


def test_merge_nonbroadcast_fallback_matches_algebra(
    spark, tmp_path, target, monkeypatch
):
    """The over-broadcast fallback (round-7 verdict item 4): past
    _BROADCAST_KEY_LIMIT approximate distinct keys, merge_frames /
    change_feed_frames drop their broadcast hints and Catalyst picks the
    join. Results are hint-independent, and a live MergeTable.merge
    through the gated path (limit forced to 0) commits the same table
    and change feed as the broadcast path."""
    import clustopher_spark.sources.merge_table as mt_mod

    batch = _mixed_batch(_orders(spark))
    for fn, kw in (
        (merge_frames, {}),
        (change_feed_frames, {}),
    ):
        hinted = fn(target, batch, ["o_orderkey"], op_col="op", **kw)
        unhinted = fn(
            target, batch, ["o_orderkey"], op_col="op",
            broadcast_keys=False, **kw,
        )
        assert _frames_equal(hinted, unhinted)

    monkeypatch.setattr(mt_mod, "_BROADCAST_KEY_LIMIT", 0)
    t = MergeTable(spark, str(tmp_path / "t"))
    t.create(target, ["o_orderkey"], num_files=4)
    assert t.merge(batch, op_col="op", batch_id=0) == 2
    expected = merge_frames(target, batch, ["o_orderkey"], op_col="op")
    assert _frames_equal(t.read(), expected)
    # the CDF recorded through the non-broadcast path is the same feed
    expected_cdf = change_feed_frames(target, batch, ["o_orderkey"], op_col="op")
    got_cdf = t.changes(1).drop("_commit_version")
    assert _frames_equal(got_cdf, expected_cdf)


def test_maintained_distinct_view_tracks_table_and_replay_is_noop(
    spark, tmp_path, target
):
    """streaming/ivm_view.py::MaintainedDistinctView — the durable
    COUNT(DISTINCT) consumer of the CDC loop, maintained through the
    invertible support relation (no table access, ever): bootstrap,
    advance through live merge commits (commit-paced AND multi-commit
    batches), equal recompute at every step; a FRESH-checkpoint full
    replay advances nothing; old versions pruned to the keep window."""
    import os
    import shutil

    from clustopher_spark.streaming.ivm_view import MaintainedDistinctView

    def recompute(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_distinct"),
        )

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    view = MaintainedDistinctView(
        spark, str(tmp_path / "view"), ["o_orderstatus"], "o_custkey"
    )
    view.bootstrap(t)
    assert _frames_equal(view.read(), recompute(target))

    # commit 2 (mixed: updates can MOVE a row between custkeys) then
    # commit 3 (delete a whole custkey's rows from one status — the
    # multiplicity of that (group, value) support row must hit zero and
    # the distinct count must drop, the non-invertible case a naive
    # delta would get wrong)
    t.merge(_mixed_batch(_orders(spark)), op_col="op", batch_id=0)
    victim = t.read().select("o_orderstatus", "o_custkey").first()
    doomed = (
        t.read()
        .filter(
            (F.col("o_orderstatus") == victim.o_orderstatus)
            & (F.col("o_custkey") == victim.o_custkey)
        )
        .withColumn("op", F.lit("delete"))
    )
    t.merge(doomed, op_col="op", batch_id=1)
    view.maintain(root, options={"maxFilesPerTrigger": "1"})
    assert _frames_equal(view.read(), recompute(t.read()))
    latest = view._meta()

    # full replay from a FRESH checkpoint: watermark filters everything
    shutil.rmtree(str(tmp_path / "view" / "_checkpoint"))
    view.maintain(root)
    assert view._meta() == latest
    assert _frames_equal(view.read(), recompute(t.read()))

    # two MORE commits drained in ONE batch (the support delta is linear
    # in the feed, so a multi-commit fold needs no dirtying argument)
    lo_key = target.agg(F.min("o_orderkey")).collect()[0][0]
    t.merge(
        target.filter(F.col("o_orderkey") <= lo_key + 10)
        .withColumn("o_custkey", F.lit(424242).cast("long")),
        batch_id=2,
    )
    t.merge(
        target.filter(F.col("o_orderkey") <= lo_key + 5)
        .withColumn("op", F.lit("delete")),
        op_col="op", batch_id=3,
    )
    view.maintain(root)
    assert _frames_equal(view.read(), recompute(t.read()))
    # version retention: at most keep_versions parquet dirs remain
    dirs = [d for d in os.listdir(str(tmp_path / "view")) if d.startswith("v")]
    assert len(dirs) <= 2


def test_maintained_view_checkpoint_migrates_from_sibling_layout(
    spark, tmp_path, target
):
    """maintain() used to checkpoint at the SIBLING path
    `{root}_checkpoint`; a view created under that layout must not
    silently abandon it (full feed replay + leaked dir — round-7
    advice). First maintain() under the new layout renames it into the
    view root."""
    import os

    from clustopher_spark.streaming.ivm_view import MaintainedView

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    vroot = str(tmp_path / "view")
    view = MaintainedView(
        spark, vroot, ["o_orderstatus"], {"o_totalprice": "revenue"}
    )
    view.bootstrap(t)
    t.merge(_mixed_batch(_orders(spark)), op_col="op", batch_id=0)
    view.maintain(root)
    # simulate the legacy layout: move the checkpoint to the sibling path
    legacy = vroot.rstrip(os.sep) + "_checkpoint"
    os.replace(os.path.join(vroot, "_checkpoint"), legacy)
    t.merge(
        target.limit(20).withColumn("op", F.lit("delete")),
        op_col="op", batch_id=1,
    )
    view.maintain(root)
    assert not os.path.exists(legacy)  # migrated, not leaked
    assert os.path.isdir(os.path.join(vroot, "_checkpoint"))
    expected = t.read().groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
    )
    assert _frames_equal(view.read(), expected)


def test_maintained_view_keep_versions_window(spark, tmp_path, target):
    """keep_versions (round-7 verdict item 6): the durable views'
    retention window is configurable — keep_versions=3 retains three
    published versions, and shrinking it back converges by listing the
    root instead of assuming a single v-2 candidate."""
    import os

    from clustopher_spark.streaming.ivm_view import MaintainedView

    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(target, ["o_orderkey"], num_files=4)
    vroot = str(tmp_path / "view")
    view = MaintainedView(
        spark, vroot, ["o_orderstatus"], {"o_totalprice": "revenue"},
        keep_versions=3,
    )
    view.bootstrap(t)
    lo = target.agg(F.min("o_orderkey")).collect()[0][0]
    for i in range(4):
        t.merge(
            target.filter(F.col("o_orderkey") <= lo + 5)
            .withColumn("o_totalprice", F.lit(float(i + 1))),
            batch_id=i,
        )
        view.maintain(root)

    def versions():
        return sorted(
            int(d[1:-len(".parquet")])
            for d in os.listdir(vroot)
            if d.startswith("v") and d.endswith(".parquet")
        )

    assert versions() == [3, 4, 5]  # 1+4 publishes, window of 3
    # shrink the window: the next publish prunes down to 1
    view.keep_versions = 1
    t.merge(
        target.filter(F.col("o_orderkey") <= lo + 5)
        .withColumn("o_totalprice", F.lit(99.0)),
        batch_id=4,
    )
    view.maintain(root)
    assert versions() == [6]


def test_topk_dirty_guard_handles_empty_stored_array(spark, tmp_path):
    """incremental_top_k_view's dirty predicate must not depend on Or's
    evaluation order (round-7 advice): a group whose stored top-k array
    is EMPTY (all values NULL) with a removal in the feed reaches the
    element_at branch only under the explicit size>=k CASE guard —
    previously only left-to-right short-circuit saved it from
    INVALID_INDEX_OF_ZERO. The maintained result still equals
    recompute."""
    from clustopher_spark.streaming.ivm_view import MaintainedTopKView

    rows = [
        (1, "A", 10.0), (2, "A", 7.0), (3, "A", 5.0),
        # group B: all-NULL values -> stored top_k array is []
        (4, "B", None), (5, "B", None), (6, "B", None),
    ]
    df = spark.createDataFrame(rows, "k int, g string, v double")
    root = str(tmp_path / "t")
    t = MergeTable(spark, root)
    t.create(df, ["k"], num_files=2)
    view = MaintainedTopKView(spark, str(tmp_path / "view"), ["g"], "v", k=2)
    view.bootstrap(t)
    # delete one NULL-valued row from B (a removal against the empty
    # array) and one real value from A
    batch = spark.createDataFrame(
        [(1, "A", 10.0), (4, "B", None)], "k int, g string, v double"
    ).withColumn("op", F.lit("delete"))
    t.merge(batch, op_col="op", batch_id=0)
    view.maintain(root)
    expected = t.read().groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.slice(F.sort_array(F.collect_list("v"), asc=False), 1, 2).alias("top_k"),
    )
    assert _frames_equal(view.read(), expected)
