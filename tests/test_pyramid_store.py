"""PyramidStore: durable streaming maintenance of the exact zoom pyramid.

Invariant under test (the store's whole contract): after any sequence of
bootstrap / add batches / delete batches — applied directly or drained
through a real availableNow stream — every published version equals a
full ``materialize_zoom_levels`` rebuild of the accumulated corpus."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clustopher_spark.operators.cluster import ClusterOptions
from clustopher_spark.operators.zoom import materialize_zoom_levels
from clustopher_spark.sources.generators import generate_test_points
from clustopher_spark.streaming.pyramid import PyramidStore

OPTS = ClusterOptions(radius=100.0, min_points=2, max_zoom=7)


def _canon(df):
    return sorted(
        (r.zoom, r.cluster_id, round(r.lng, 9), round(r.lat, 9),
         r.point_count, r.num_members, bool(r.is_cluster), round(r.sum_value, 6))
        for r in df.collect()
    )


def _pts(spark, n, seed, id_base=0, **bounds):
    df = generate_test_points(spark, n, seed=seed, **bounds).select(
        "id", "lng", "lat", "value"
    )
    return df.withColumn("id", F.col("id") + id_base) if id_base else df


def test_pyramid_store_versions_equal_rebuild(spark, tmp_path):
    store = PyramidStore(spark, str(tmp_path / "store"), ["value"], OPTS)
    base = _pts(spark, 3000, seed=71)
    assert store.bootstrap(base) == 1
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(base, ["value"], OPTS)
    )

    # batch 0: worldwide adds; batch 1: localized adds
    b0 = _pts(spark, 200, seed=72, id_base=1_000_000)
    b1 = _pts(spark, 200, seed=73, id_base=2_000_000,
              west=-75, south=40, east=-73, north=42)
    assert store.apply_batch(b0, 0) is True
    corpus = base.unionByName(b0)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )
    assert store.apply_batch(b1, 1) is True
    corpus = corpus.unionByName(b1)
    assert store.current_version() == 3
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )

    # replay of a committed batch is skipped and changes nothing
    before = _canon(store.current_levels())
    assert store.apply_batch(b1, 1) is False
    assert store.current_version() == 3
    assert _canon(store.current_levels()) == before

    # batch 2: deletions of committed points via the op column
    doomed = corpus.filter(F.col("id") % 13 == 1)
    batch = doomed.withColumn("op", F.lit("delete")).unionByName(
        _pts(spark, 100, seed=74, id_base=3_000_000).withColumn(
            "op", F.lit("add")
        )
    )
    assert store.apply_batch(batch, 2) is True
    survivors = corpus.join(doomed.select("id"), "id", "left_anti").unionByName(
        _pts(spark, 100, seed=74, id_base=3_000_000)
    )
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(survivors, ["value"], OPTS)
    )
    # the deleted ids are gone from the corpus reader too
    doomed_ids = {r.id for r in doomed.select("id").collect()}
    assert not (
        doomed_ids & {r.id for r in store.current_points().select("id").collect()}
    )

    # compaction folds the logs without changing either reader
    levels_before = _canon(store.current_levels())
    n_pts = store.current_points().count()
    store.compact()
    assert store.current_points().count() == n_pts
    assert _canon(store.current_levels()) == levels_before
    # and the store still advances after compaction
    b3 = _pts(spark, 50, seed=75, id_base=4_000_000)
    assert store.apply_batch(b3, 3) is True
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(survivors.unionByName(b3), ["value"], OPTS)
    )

    # vacuum keeps the newest versions only
    removed = store.vacuum(keep_last=2)
    assert removed and max(removed) <= store.current_version() - 2
    assert os.path.isdir(store._levels_path(store.current_version()))


import pytest


@pytest.mark.parametrize("publish", ["snapshot", "manifest"])
def test_pyramid_store_streaming_drain(spark, tmp_path, publish):
    """Drive the store through a real file-source stream (one file per
    micro-batch, availableNow) in BOTH publication modes and check the
    final pyramid equals the rebuild of everything ingested."""
    store = PyramidStore(
        spark, str(tmp_path / "store"), ["value"], OPTS, publish=publish
    )
    base = _pts(spark, 2000, seed=81)
    store.bootstrap(base)

    src = tmp_path / "pts_in"
    src.mkdir()
    b1 = _pts(spark, 150, seed=82, id_base=1_000_000)
    b2 = _pts(spark, 150, seed=83, id_base=2_000_000,
              west=100, south=-40, east=120, north=-20)
    b1.coalesce(1).write.parquet(str(src / "b1"))
    b2.coalesce(1).write.parquet(str(src / "b2"))
    files = sorted(str(p) for p in src.rglob("*.parquet"))
    os.utime(files[0], (1_000_000, 1_000_000))
    os.utime(files[1], (2_000_000, 2_000_000))

    stream = (
        spark.readStream.schema("id long, lng double, lat double, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    store.maintain(stream, checkpoint=str(tmp_path / "ckpt"))

    assert store.current_version() == 3  # bootstrap + 2 micro-batches
    full = materialize_zoom_levels(
        base.unionByName(b1).unionByName(b2), ["value"], OPTS
    )
    assert _canon(store.current_levels()) == _canon(full)


def test_pyramid_store_manifest_mode(spark, tmp_path):
    """Incremental publication: each version writes only dirty blocks,
    untouched blocks are SHARED with older versions through the manifest,
    blocks emptied by deletions leave the manifest, and every version
    still equals a full rebuild of the accumulated corpus."""
    import json
    import os

    store = PyramidStore(
        spark, str(tmp_path / "store"), ["value"], OPTS, publish="manifest"
    )
    # two far-apart regions: batches touch only the west one, so the east
    # region's blocks must never be rewritten
    west = _pts(spark, 2000, seed=91, west=-125, south=25, east=-65, north=49)
    east = _pts(spark, 2000, seed=92, id_base=500_000,
                west=100, south=-45, east=150, north=-10)
    base = west.unionByName(east)
    store.bootstrap(base)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(base, ["value"], OPTS)
    )

    b0 = _pts(spark, 300, seed=93, id_base=1_000_000,
              west=-75, south=40, east=-73, north=42)
    assert store.apply_batch(b0, 0) is True
    corpus = base.unionByName(b0)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )
    man2 = json.load(open(store._manifest_path(2)))
    vers = {rel.split(os.sep)[1] for rel in man2.values()}
    assert "v1" in vers and "v2" in vers  # untouched blocks still served from v1
    # v2 wrote strictly fewer blocks than the table has
    v2_blocks = [k for k, rel in man2.items() if rel.split(os.sep)[1] == "v2"]
    assert 0 < len(v2_blocks) < len(man2)

    # delete the ENTIRE east region: its blocks must leave the manifest
    assert store.apply_batch(east.withColumn("op", F.lit("delete")), 1) is True
    survivors = corpus.join(east.select("id"), "id", "left_anti")
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(survivors, ["value"], OPTS)
    )
    man3 = json.load(open(store._manifest_path(3)))
    assert len(man3) < len(man2)

    # replay skip still holds in manifest mode
    assert store.apply_batch(b0, 0) is False

    # vacuum must RETAIN old version dirs still referenced by the latest
    # manifest (v1 blocks are shared into v3)
    removed = store.vacuum(keep_last=1)
    ref_vers = {int(rel.split(os.sep)[1][1:]) for rel in man3.values()}
    assert not (set(removed) & ref_vers)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(survivors, ["value"], OPTS)
    )


def test_engine_serves_from_store(spark, tmp_path):
    """Clustopher.from_store adopts a maintained store's current version:
    viewport queries answer from the store's pyramid without
    re-materializing, and match a fresh engine over the same corpus."""
    from clustopher_spark.engine import Clustopher

    store = PyramidStore(spark, str(tmp_path / "store"), ["value"], OPTS)
    base = _pts(spark, 2000, seed=65)
    store.bootstrap(base)
    batch = _pts(spark, 200, seed=66, id_base=1_000_000,
                 west=-75, south=40, east=-73, north=42)
    store.apply_batch(batch, 0)

    eng = Clustopher.from_store(store)
    fresh = Clustopher(base.unionByName(batch), ["value"], opts=OPTS)
    fresh.materialize()
    got = eng.get_clusters(-80, 35, -70, 45, 5)
    want = fresh.get_clusters(-80, 35, -70, 45, 5)

    def canon(df):
        return sorted(
            (r.cluster_id, round(r.lng, 9), round(r.lat, 9), r.point_count)
            for r in df.collect()
        )

    assert canon(got) == canon(want) and got.count() > 0
    # and the adopted engine can advance independently
    eng.update(_pts(spark, 50, seed=67, id_base=2_000_000))
    assert eng.points.count() == 2250


def test_delete_then_readd_consistency(spark, tmp_path):
    """Round-3 advice: current_points() used a global id blacklist for
    deletions, so an id deleted in batch M and re-added in batch N > M
    vanished from the point log while the pyramid (correctly) retained it
    — the next apply_batch then ran with points inconsistent with levels.
    Deletions must fold in batch order: re-adds survive, same-batch
    add+delete keeps the add, and every version still equals a rebuild."""
    store = PyramidStore(spark, str(tmp_path / "store"), ["value"], OPTS)
    base = _pts(spark, 1500, seed=81)
    store.bootstrap(base)

    # batch 0 deletes ids 0-49 and adds 100 fresh points
    doomed = base.filter(F.col("id") < 50)
    fresh = _pts(spark, 100, seed=82, id_base=1_000_000)
    b0 = fresh.withColumn("op", F.lit("add")).unionByName(
        doomed.withColumn("op", F.lit("delete"))
    )
    assert store.apply_batch(b0, 0) is True
    corpus = base.filter(F.col("id") >= 50).unionByName(fresh)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )

    # batch 1 RE-ADDS 20 of the deleted ids (new positions) — the old
    # reader dropped these from current_points forever
    readd = _pts(spark, 20, seed=83, west=-10, south=-10, east=10, north=10)
    readd = readd.withColumn("id", F.col("id") % 20)  # ids 0..19, deleted in b0
    assert store.apply_batch(readd, 1) is True
    corpus = corpus.unionByName(readd)
    got_pts = sorted(r.id for r in store.current_points().select("id").collect())
    want_pts = sorted(r.id for r in corpus.select("id").collect())
    assert got_pts == want_pts, "re-added ids missing from current_points"
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )

    # batch 2: SAME-batch add+delete of one id — the add wins in both the
    # pyramid (apply_batch contract) and the point log
    spot = _pts(spark, 1, seed=84, id_base=5_000_000)
    b2 = spot.withColumn("op", F.lit("add")).unionByName(
        spot.withColumn("op", F.lit("delete"))
    )
    assert store.apply_batch(b2, 2) is True
    corpus = corpus.unionByName(spot)
    assert store.current_points().filter(F.col("id") >= 5_000_000).count() == 1
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )

    # a further batch applied on top of the re-add state stays coherent
    b3 = _pts(spark, 50, seed=85, id_base=6_000_000)
    assert store.apply_batch(b3, 3) is True
    corpus = corpus.unionByName(b3)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )


def test_store_reads_pre_provenance_logs(spark, tmp_path):
    """Stores written before the _add_batch/_del_batch provenance columns
    must stay readable with their ORIGINAL fold (deletions as a global id
    blacklist) — round-4 review finding: durability across releases is
    the store's whole point."""
    store = PyramidStore(spark, str(tmp_path / "store"), ["value"], OPTS)
    base = _pts(spark, 800, seed=91)
    store.bootstrap(base)
    b0 = _pts(spark, 100, seed=92, id_base=1_000_000)
    store.apply_batch(b0, 0)
    dels = base.filter(F.col("id") < 40)
    store.apply_batch(
        dels.withColumn("op", F.lit("delete")).unionByName(
            _pts(spark, 10, seed=93, id_base=2_000_000).withColumn("op", F.lit("add"))
        ),
        1,
    )
    # simulate a pre-provenance store: strip the columns from every log
    import os

    for sub, col in (("adds", "_add_batch"), ("dels", "_del_batch")):
        root = os.path.join(str(tmp_path / "store"), "batches", sub)
        for b in os.listdir(root):
            p = os.path.join(root, b)
            old = spark.read.parquet(p).drop(col)
            old.write.mode("overwrite").parquet(p + "_tmp")
            import shutil

            shutil.rmtree(p)
            os.replace(p + "_tmp", p)
    got = sorted(r.id for r in store.current_points().select("id").collect())
    want = sorted(
        r.id
        for r in base.filter(F.col("id") >= 40)
        .unionByName(_pts(spark, 100, seed=92, id_base=1_000_000))
        .unionByName(_pts(spark, 10, seed=93, id_base=2_000_000))
        .select("id")
        .collect()
    )
    assert got == want


def test_manifest_fast_path_taken_and_virgin_region(spark, tmp_path):
    """The manifest publish must route a small localized batch through the
    O(dirty-blocks) fast path (dirty-block-only read, coarse_tail=False,
    driver-side incremental tail) — and a batch landing in a VIRGIN region
    (no existing blocks) must still publish correctly through it."""
    store = PyramidStore(
        spark, str(tmp_path / "store"), ["value"], OPTS, publish="manifest"
    )
    base = _pts(spark, 2000, seed=81, west=-125, south=25, east=-65, north=49)
    store.bootstrap(base)

    b0 = _pts(spark, 200, seed=82, id_base=1_000_000,
              west=-75, south=40, east=-73, north=42)
    assert store.apply_batch(b0, 0) is True
    assert store.last_apply_stats.get("publish_path") == "fast"
    assert store.last_apply_stats.get("path") == "incremental"
    corpus = base.unionByName(b0)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )

    # virgin region: far from every existing block
    b1 = _pts(spark, 150, seed=83, id_base=2_000_000,
              west=100, south=-45, east=150, north=-10)
    assert store.apply_batch(b1, 1) is True
    assert store.last_apply_stats.get("publish_path") == "fast"
    corpus = corpus.unionByName(b1)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )


def test_manifest_fast_path_delete_then_readd(spark, tmp_path):
    """Batch-ordered deletion semantics must survive the fast path: delete
    a slice, then re-add one of its ids — the re-add wins, and every
    version equals a rebuild of its accumulated corpus."""
    store = PyramidStore(
        spark, str(tmp_path / "store"), ["value"], OPTS, publish="manifest"
    )
    base = _pts(spark, 1500, seed=84, west=-125, south=25, east=-65, north=49)
    store.bootstrap(base)

    victims = base.filter(F.col("id") % 7 == 0)
    assert store.apply_batch(
        victims.withColumn("op", F.lit("delete")), 0
    ) is True
    assert store.last_apply_stats.get("publish_path") == "fast"
    survivors = base.join(victims.select("id"), "id", "left_anti")
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(survivors, ["value"], OPTS)
    )

    readd = victims.limit(20)
    assert store.apply_batch(readd, 1) is True
    corpus = survivors.unionByName(readd)
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(corpus, ["value"], OPTS)
    )


def test_store_survives_delete_everything_then_readd(spark, tmp_path):
    """Deletions can empty the store entirely: the manifest may reference
    zero blocks, compact must fold an EMPTY corpus through the Z-order
    writer, and a later re-add into the emptied store must still equal a
    rebuild (regression: empty-input crashes in write_zordered's bounds
    aggregate and _tail_levels' schema inference)."""
    store = PyramidStore(
        spark, str(tmp_path / "store"), ["value"], OPTS, publish="manifest"
    )
    base = _pts(spark, 400, seed=95)
    store.bootstrap(base)
    assert store.apply_batch(base.withColumn("op", F.lit("delete")), 0) is True
    assert store.current_levels().count() == 0
    assert store.current_points().count() == 0
    store.compact()
    assert store.current_points().count() == 0

    readd = _pts(spark, 50, seed=96, id_base=1_000_000)
    assert store.apply_batch(readd, 1) is True
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(readd, ["value"], OPTS)
    )


def test_snapshot_store_survives_delete_everything(spark, tmp_path):
    """Snapshot mode has the same delete-everything hole the manifest fix
    covered: partitionBy of an EMPTY pyramid wrote no readable footer and
    every later current_levels() raised UNABLE_TO_INFER_SCHEMA, bricking
    the store. write_zoom_levels now writes empties un-partitioned."""
    store = PyramidStore(spark, str(tmp_path / "store"), ["value"], OPTS)
    base = _pts(spark, 300, seed=97)
    store.bootstrap(base)
    assert store.apply_batch(base.withColumn("op", F.lit("delete")), 0) is True
    assert store.current_levels().count() == 0
    assert store.current_points().count() == 0

    readd = _pts(spark, 40, seed=98, id_base=1_000_000)
    assert store.apply_batch(readd, 1) is True
    assert _canon(store.current_levels()) == _canon(
        materialize_zoom_levels(readd, ["value"], OPTS)
    )


def test_vacuum_concurrent_reader_snapshot_safety(spark, tmp_path):
    """The vacuum snapshot guarantee (vacuum docstring; r4 verdict item 5):
    a reader pinned at a version inside the kept window survives a
    concurrent publish + vacuum bit-identically (its manifest's blocks are
    retained by the referenced-scan even when owned by older version
    dirs); a reader pinned below the window either reads its original
    content or fails fast — immutable blocks make silently-different data
    impossible, and this test distinguishes the two outcomes exactly."""
    store = PyramidStore(
        spark, str(tmp_path / "store"), ["value"], OPTS, publish="manifest"
    )
    store.bootstrap(_pts(spark, 2000, seed=81))
    city = dict(west=-74.5, south=40.2, east=-73.5, north=41.2)
    # three same-city batches: each supersedes the previous version's
    # dirty blocks, so v2 becomes unreferenced once v3/v4 are the window
    store.apply_batch(_pts(spark, 150, seed=82, id_base=1_000_000, **city), 0)
    reader_v2 = store.current_levels()          # pinned at v2
    snap_v2 = _canon(reader_v2)
    store.apply_batch(_pts(spark, 150, seed=83, id_base=2_000_000, **city), 1)
    reader_v3 = store.current_levels()          # pinned at v3 (oldest kept)
    snap_v3 = _canon(reader_v3)
    store.apply_batch(_pts(spark, 150, seed=84, id_base=3_000_000, **city), 2)
    assert store.current_version() == 4

    removed = store.vacuum(keep_last=2)         # window = {v3, v4}
    assert 2 in removed, f"v2 should be superseded and dropped, got {removed}"
    assert 1 not in removed, "v1 owns blocks shared into kept manifests"

    # in-window reader: bit-identical after vacuum, including its blocks
    # owned by the retained-by-reference v1 directory
    assert _canon(reader_v3) == snap_v3
    # below-window reader: original content or fail-fast — never different
    try:
        assert _canon(reader_v2) == snap_v2
    except Exception as e:  # deleted-file fail-fast is the allowed outcome
        msg = str(e)
        assert "FileNotFound" in msg or "does not exist" in msg or (
            e.__class__.__name__ in ("AnalysisException", "Py4JJavaError")
        ), msg
    # and the store itself still serves + advances
    assert store.apply_batch(
        _pts(spark, 50, seed=85, id_base=4_000_000, **city), 3
    ) is True
    assert store.current_version() == 5
