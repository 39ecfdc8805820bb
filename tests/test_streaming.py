"""Streaming/batch parity: the streaming plans must produce the same results
as their batch equivalents when draining the same parquet with availableNow.
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from clustopher_spark.queries.base import table
from clustopher_spark.streaming import (
    running_user_totals,
    sessionized_stream,
    stream_events,
    tumbling_counts_stream,
)
from clustopher_spark.streaming.windows import run_available_now

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return stream_events(spark, f"{SF_DIR}/events.parquet")


def test_tumbling_stream_matches_batch(spark, events_stream):
    run_available_now(tumbling_counts_stream(events_stream), "tumbling_out")
    stream_rows = {
        (r.wstart, r.event_type): (r.n, r.total)
        for r in spark.sql("select * from tumbling_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "total")
    )
    batch_rows = {(r.wstart, r.event_type): (r.n, r.total) for r in batch.collect()}
    assert stream_rows == batch_rows and len(batch_rows) > 0


def test_session_stream_matches_batch(spark, events_stream):
    run_available_now(sessionized_stream(events_stream), "session_out")
    stream_rows = {
        (r.user_id, r.session_start): (r.n_events, r.session_value)
        for r in spark.sql("select * from session_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "session_value")
    )
    batch_rows = {
        (r.user_id, r.session_start): (r.n_events, r.session_value) for r in batch.collect()
    }
    assert stream_rows == batch_rows and len(batch_rows) > 0


def test_stateful_running_totals(spark, events_stream):
    run_available_now(running_user_totals(events_stream), "totals_out", output_mode="update")
    stream_rows = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("select * from totals_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    batch_rows = {
        r.user_id: (r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert stream_rows == batch_rows and len(batch_rows) > 0


def test_append_mode_multi_batch_watermark(spark, tmp_path):
    """Drive REAL incremental processing: events split into 3 files, one
    micro-batch each (maxFilesPerTrigger=1), append-mode tumbling windows
    with a 30-min watermark. Windows emitted on close must match the batch
    computation exactly; only-closed-windows semantics means emitted ⊆ batch.
    """
    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_parts")
    # 3 time-ordered chunks so watermark advances between micro-batches
    ev.orderBy("ts").withColumn(
        "part", F.ntile(3).over(__import__("pyspark").sql.window.Window.orderBy("ts"))
    ).write.partitionBy("part").mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.drop("part").schema if "part" in ev.columns else ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/part=*")
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    emitted = {(r.wstart, r.n) for r in spark.sql("select * from wm_out").collect()}
    batch = {
        (r.wstart, r.n)
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
        .collect()
    }
    assert emitted, "append mode emitted no closed windows"
    assert emitted <= batch, "emitted window disagrees with batch result"
    # windows are only emitted once closed: the stream's final windows
    # (beyond the last watermark) must NOT appear
    assert len(emitted) < len(batch)


def test_stream_stream_interval_join_matches_batch(spark, events_stream):
    """Stream-stream inner interval join drained with availableNow must
    equal the batch join over the same parquet."""
    from clustopher_spark.streaming import views_purchases_interval_join

    views = events_stream.filter(F.col("event_type") == "view")
    purchases = stream_events(spark, f"{SF_DIR}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    joined = views_purchases_interval_join(views, purchases)
    q = (
        joined.writeStream.format("memory")
        .queryName("s2s_join_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_pairs = {
        (r.p_id, r.v_id) for r in spark.sql("select * from s2s_join_out").collect()
    }

    ev = table(spark, SF_DIR, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    cond = (
        (p.user_id == v.v_user)
        & (v.v_ts <= p.p_ts)
        & (v.v_ts > p.p_ts - F.expr("INTERVAL 1 HOUR"))
    )
    batch_pairs = {(r.p_id, r.v_id) for r in p.join(v, cond, "inner").collect()}
    assert stream_pairs == batch_pairs and len(batch_pairs) > 0


def test_dedup_within_watermark(spark, tmp_path):
    """A doubled source (every event twice) streamed through
    dropDuplicatesWithinWatermark yields each event_id exactly once."""
    from clustopher_spark.streaming import dedup_within_watermark

    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_doubled")
    ev.unionAll(ev).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    deduped = dedup_within_watermark(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select event_id from dedup_out").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)), "duplicates survived"
    assert len(ids) == ev.count(), "dedup dropped non-duplicates"


def test_foreach_batch_upsert_exactly_once(spark, tmp_path):
    """A doubled source streamed in 3 micro-batches through the upsert sink
    yields a table with each event exactly once."""
    from clustopher_spark.streaming import foreach_batch_upsert

    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_dup_parts")
    doubled = ev.unionAll(ev)
    doubled.orderBy("ts").withColumn(
        "part", F.ntile(3).over(__import__("pyspark").sql.window.Window.orderBy("ts"))
    ).write.partitionBy("part").mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/part=*")
    )
    tbl = str(tmp_path / "events_table")
    q = foreach_batch_upsert(stream, tbl, keys=["event_id"])
    assert len(q.recentProgress) >= 3

    got = spark.read.parquet(tbl)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
    # re-running the whole stream over the same source is a no-op (replay safe)
    stream2 = spark.readStream.schema(ev.schema).parquet(src + "/part=*")
    import shutil
    shutil.rmtree(tbl + "_checkpoint")
    foreach_batch_upsert(stream2, tbl, keys=["event_id"], query_name="upsert2")
    assert spark.read.parquet(tbl).count() == ev.count()


def test_checkpoint_recovery_processes_only_new_files(spark, tmp_path):
    """A restarted stream resumes from its checkpoint: files already
    committed are not reprocessed, so a plain append sink holds each
    event exactly once after new files arrive and the query re-runs."""
    ev = table(spark, SF_DIR, "events")
    w = __import__("pyspark").sql.window.Window.orderBy("ts")
    parts = ev.orderBy("ts").withColumn("part", F.ntile(2).over(w))
    src = str(tmp_path / "src")
    first = parts.filter(F.col("part") == 1).drop("part")
    second = parts.filter(F.col("part") == 2).drop("part")
    first.write.parquet(src + "/f1")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(first.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()
    second.write.parquet(src + "/f2")
    run_once()  # same checkpoint: must process ONLY the new file
    final = spark.read.parquet(out)
    assert final.count() == ev.count(), "reprocessed or missed files"
    assert final.select("event_id").distinct().count() == ev.count()


def test_anomaly_scoring_over_streaming_sink(spark, events_stream):
    """The events_anomaly_zscore docstring claims its hourly partials are
    exactly the tumbling stream's output — prove it: drain the stream,
    re-aggregate the sink to (event_type, hour, n), and check equality
    with the batch hourly partials the scorer consumes."""
    from clustopher_spark.streaming import tumbling_counts_stream
    from clustopher_spark.streaming.windows import run_available_now

    q = run_available_now(tumbling_counts_stream(events_stream), "anom_sink")
    try:
        sink = spark.table("anom_sink").select(
            F.col("wstart").alias("h"), "event_type", "n"
        )
        batch = (
            table(spark, SF_DIR, "events")
            .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        got = {(r.event_type, r.h): r.n for r in sink.collect()}
        want = {(r.event_type, r.h): r.n for r in batch.collect()}
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_incremental_minhash_dedup_index(spark, tmp_path):
    """Stream two micro-batches through the persisted LSH index: a batch-2
    copy of a batch-1 document must be flagged as an index dup, novel docs
    must not, and dups must not grow the index."""
    import os
    import random

    from clustopher_spark.streaming.dedup_index import incremental_minhash_dedup

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(500)]

    def doc(n=60):
        return " ".join(rng.choice(vocab) for _ in range(n))

    batch1 = [(i, doc()) for i in range(10)]
    batch2 = [(10, batch1[3][1])] + [(i, doc()) for i in range(11, 20)]

    src = tmp_path / "docs_in"
    src.mkdir()
    schema = "doc_id long, text string"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(str(src / "b2"))
    # file source orders batches by modification time under maxFilesPerTrigger
    files = sorted(str(p) for p in src.rglob("*.parquet"))
    os.utime(files[0], (1_000_000, 1_000_000))
    os.utime(files[1], (2_000_000, 2_000_000))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    index_path = str(tmp_path / "band_index")
    incremental_minhash_dedup(stream, index_path)

    flags = spark.read.parquet(index_path + "_flags").collect()
    by_doc = {r.doc_id: r.dup_of_index for r in flags}
    assert len(by_doc) == 20
    assert by_doc[10] is True              # the planted copy
    assert not any(v for d, v in by_doc.items() if d != 10)
    # dup doc contributed no bands: 19 unique docs x 8 bands
    idx = spark.read.parquet(index_path)
    assert idx.count() == 19 * 8
    assert idx.select("id").distinct().count() == 19


def _has_protobuf() -> bool:
    # find_spec("google.protobuf") itself raises when the google namespace
    # package is entirely absent; checking the parent alone is wrong the
    # other way (any google-* distro creates the namespace without
    # protobuf)
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's state-server protocol needs protobuf, "
    "absent in this container (operator is environment-gated)",
)
def test_transform_with_state_topk_matches_batch(spark, events_stream):
    """transformWithStateInPandas (typed ListState on RocksDB): an
    availableNow drain must land on the batch top-3-per-user answer."""
    from pyspark.sql.window import Window

    from clustopher_spark.streaming.stateful import streaming_topk_values

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        run_available_now(
            streaming_topk_values(events_stream, k=3), "topk_out", output_mode="update"
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    stream_rows = {
        (r.user_id, r.rank): r.value
        for r in spark.sql("select * from topk_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    batch = (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", F.round("value", 2).alias("value"))
    )
    batch_rows = {(r.user_id, r.rank): r.value for r in batch.collect()}
    assert len(stream_rows) == len(batch_rows) > 0
    assert stream_rows == batch_rows


def test_incremental_hll_rollup_matches_batch(spark, tmp_path):
    """Multi-batch streamed HLL partials must union to exactly the batch
    answer (sketch algebra is associative), and re-folding a batch must
    not change the store (idempotent replay)."""
    from clustopher_spark.streaming.sketches import (
        _batch_partials,
        distinct_users_by_event_type,
        incremental_hll_rollup,
    )

    ev = table(spark, SF_DIR, "events")
    # split the events into 3 parquet files so availableNow sees 3 batches
    src = str(tmp_path / "ev_src")
    ev.repartition(3).write.parquet(src)
    store = str(tmp_path / "hll_store")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incremental_hll_rollup(stream, store)
    got = {
        r.event_type: (r.n_days, r.approx_users)
        for r in distinct_users_by_event_type(spark, store).collect()
    }
    want = {
        r.event_type: (r.n_days, r.approx_users)
        for r in ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx_users"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
    # idempotent replay: folding an already-folded batch changes nothing
    before = sorted(got.items())
    batch0 = spark.read.parquet(src)
    fresh = _batch_partials(batch0).localCheckpoint(eager=True)
    days = [r["day"] for r in fresh.select("day").distinct().collect()]
    old = spark.read.parquet(store).filter(F.col("day").isin(days))
    merged = (
        fresh.unionByName(old).groupBy("day", "event_type")
        .agg(F.hll_union_agg("sk").alias("sk")).localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("day").parquet(store)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    after = sorted(
        (r.event_type, (r.n_days, r.approx_users))
        for r in distinct_users_by_event_type(spark, store).collect()
    )
    assert after == before


def test_incremental_heavy_hitters_misra_gries(spark, tmp_path):
    """Multi-batch Misra-Gries summary: <= k rows of state, the tracked
    error respects the mergeable-summaries bound err <= N/(k+1), every key
    with true count > err is retained with cnt <= true <= cnt + err, the
    planted heavy keys rank top-3, and a re-drain over the same checkpoint
    folds nothing twice."""
    import random

    from clustopher_spark.streaming.heavy_hitters import (
        _read_state,
        heavy_hitters_topn,
        incremental_heavy_hitters,
    )

    rng = random.Random(13)
    rows = (
        [(1000,)] * 300 + [(1001,)] * 200 + [(1002,)] * 150
        + [(uid,) for uid in range(200) for _ in range(rng.randint(2, 5))]
    )
    rng.shuffle(rows)
    true = {}
    for (u,) in rows:
        true[u] = true.get(u, 0) + 1
    src = str(tmp_path / "hh_src")
    df = spark.createDataFrame(rows, "user_id long")
    df.repartition(3).write.parquet(src)
    store = str(tmp_path / "hh_store")
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    k = 16
    incremental_heavy_hitters(stream, store, key_col="user_id", k=k)

    summary, n_total, err, last_batch = _read_state(spark, store)
    state = {r.key: r.cnt for r in summary.collect()}
    assert n_total == len(rows) and last_batch == 2
    assert len(state) <= k
    assert 0 < err <= n_total // (k + 1)
    for uid, cnt in true.items():
        if cnt > err:
            assert uid in state, f"guaranteed key {uid} (true {cnt}) missing"
    for uid, cnt in state.items():
        assert cnt <= true[uid] <= cnt + err
    top = heavy_hitters_topn(spark, store, n=3).collect()
    assert [r.key for r in top] == [1000, 1001, 1002]
    for r in top:
        assert r.count_lower <= true[r.key] <= r.count_upper

    # re-drain with the same checkpoint: no new files -> nothing refolded
    stream2 = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incremental_heavy_hitters(stream2, store, key_col="user_id", k=k)
    summary2, n_total2, err2, _ = _read_state(spark, store)
    assert n_total2 == n_total and err2 == err
    assert {r.key: r.cnt for r in summary2.collect()} == state


def test_incremental_quantile_partials_bounded_error(spark, tmp_path):
    """Per-day histogram partials: multi-batch drain, then served
    quantiles must sit within one bin width above the exact percentile
    (the mergeable-histogram guarantee), day-range filtering must answer
    from partials only, and a re-drain over the same checkpoint folds
    nothing twice."""
    import datetime

    from clustopher_spark.streaming.quantiles import (
        incremental_quantile_partials,
        quantiles_from_partials,
        read_partials,
    )

    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "q_src")
    ev.repartition(3).write.parquet(src)
    store = str(tmp_path / "q_store")
    lo, hi, bins = 0.0, 400.0, 200
    width = (hi - lo) / bins
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incremental_quantile_partials(stream, store, lo=lo, hi=hi, bins=bins)

    # state is bounded by days x bins, not by events
    part = read_partials(spark, store)
    n_days = part.select("day").distinct().count()
    assert part.count() <= n_days * bins
    assert part.agg(F.sum("cnt")).collect()[0][0] == ev.count()

    qs = [0.1, 0.5, 0.9, 0.99]
    got = quantiles_from_partials(spark, store, qs, lo=lo, hi=hi, bins=bins)
    exact = ev.approxQuantile("value", qs, 0.0)  # relativeError=0 -> exact
    for q, g, e in zip(qs, got, exact):
        assert e <= g <= e + width, (q, g, e)

    # day-range serve: first week only, vs the exact filtered percentile
    wk_end = datetime.date(2024, 1, 7)
    got_wk = quantiles_from_partials(
        spark, store, [0.5], lo=lo, hi=hi, bins=bins, day_max=wk_end
    )[0]
    exact_wk = ev.filter(F.to_date("ts") <= F.lit(wk_end)).approxQuantile(
        "value", [0.5], 0.0
    )[0]
    assert exact_wk <= got_wk <= exact_wk + width

    # re-drain with the same checkpoint: nothing refolded
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incremental_quantile_partials(stream2, store, lo=lo, hi=hi, bins=bins)
    assert read_partials(spark, store).agg(F.sum("cnt")).collect()[0][0] == ev.count()


def test_incremental_bottomk_sample_deterministic_merge(spark, tmp_path):
    """Bottom-k hash-priority sample: the multi-batch streamed store must
    EXACTLY equal the batch-computed bottom-k (the sample is a function
    of the distinct key set), refolding the same data through a second
    drain must change nothing (min-k union is idempotent — no batch-id
    bookkeeping), and the k-th-priority distinct-count estimate must
    land near the true cardinality."""
    from clustopher_spark.streaming.samples import (
        distinct_count_estimate,
        incremental_bottomk_sample,
        sample_keys,
    )

    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "bk_src")
    ev.repartition(3).write.parquet(src)
    store = str(tmp_path / "bk_store")
    k = 8  # sf0.001 events has 15 distinct users; k must be below that
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incremental_bottomk_sample(stream, store, key_col="user_id", k=k)

    got = [(r.key, r.priority) for r in sample_keys(spark, store).collect()]
    want = [
        (r.key, r.priority)
        for r in ev.select(
            F.col("user_id").cast("long").alias("key"),
            F.xxhash64(F.col("user_id").cast("long")).alias("priority"),
        )
        .distinct()
        .orderBy("priority")
        .limit(k)
        .collect()
    ]
    assert got == want and len(got) == k

    # idempotent refold: a second drain over a COPY of the same data
    # (fresh checkpoint, same store) re-offers identical priorities
    src2 = str(tmp_path / "bk_src2")
    ev.repartition(2).write.parquet(src2)
    # drain into the SAME store via a different checkpoint: still equal
    stream3 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src2)
    )
    incremental_bottomk_sample(stream3, store, key_col="user_id", k=k,
                               query_name="bk_refold",
                               checkpoint_path=store + "_refold_checkpoint")
    assert [(r.key, r.priority) for r in sample_keys(spark, store).collect()] == want

    true_d = ev.select("user_id").distinct().count()
    est = distinct_count_estimate(spark, store, k)
    assert abs(est - true_d) / true_d < 0.5, (est, true_d)


def test_sketch_store_atomic_commit_survives_crash_window(spark, tmp_path):
    """Round-3 advice: the MG summary and its meta were two parquet
    commits, so a crash between them refolded a batch on replay and
    voided the err bound. Now a fold publishes via one atomic meta.json
    repoint — simulate the crash (a stray NEWER version directory whose
    meta never landed) and check the store still reads the committed
    state and folds the next batch correctly on top of it."""
    import os

    from clustopher_spark.streaming.heavy_hitters import (
        _read_state,
        incremental_heavy_hitters,
    )
    from clustopher_spark.streaming.state_store import read_meta, version_dir

    ev = table(spark, SF_DIR, "events")
    src = str(tmp_path / "hh_src")
    ev.repartition(2).write.parquet(src)
    store = str(tmp_path / "hh_store")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incremental_heavy_hitters(stream, store, key_col="user_id", k=32)
    summary, n_total, err, last = _read_state(spark, store)
    assert n_total == ev.count()
    committed = sorted((r.key, r.cnt) for r in summary.collect())

    # simulate a crash AFTER the data write, BEFORE the meta repoint:
    # a stray v{N+1} directory with garbage data and no meta update
    meta = read_meta(store)
    stray = os.path.join(version_dir(store, int(meta["version"]) + 1), "summary")
    ev.limit(3).select(
        F.col("user_id").alias("key"), F.lit(999999).cast("long").alias("cnt")
    ).write.mode("overwrite").parquet(stray)

    # the committed state is untouched by the stray dir...
    summary2, n2, err2, last2 = _read_state(spark, store)
    assert (n2, err2, last2) == (n_total, err, last)
    assert sorted((r.key, r.cnt) for r in summary2.collect()) == committed

    # ...and the next REAL batch (same checkpoint, new source file) folds
    # on top of the committed state, claiming the stray version number by
    # overwrite — total mass is committed + new, never + stray garbage
    n_extra = 500
    ev.limit(n_extra).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    incremental_heavy_hitters(stream2, store, key_col="user_id", k=32)
    _, n3, _, last3 = _read_state(spark, store)
    assert n3 == n_total + n_extra
    assert last3 > last
    # the stray garbage (cnt=999999) never surfaced
    top = _read_state(spark, store)[0].agg(F.max("cnt")).collect()[0][0]
    assert top < 999999


def test_stream_static_enrichment_matches_batch(spark, events_stream):
    """Stream-static broadcast enrichment drained with availableNow must
    equal the batch left join, including events whose key has no
    dimension row (left semantics: nulls, not drops)."""
    from clustopher_spark.streaming.joins import enrich_with_dimension

    dim = table(spark, SF_DIR, "customer")
    q = (
        enrich_with_dimension(events_stream, dim)
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.event_id, r.c_name, r.c_nationkey)
        for r in spark.sql("select event_id, c_name, c_nationkey from enrich_out").collect()
    }
    ev = table(spark, SF_DIR, "events")
    want = {
        (r.event_id, r.c_name, r.c_nationkey)
        for r in ev.join(
            dim.select(F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"),
            "user_id", "left",
        ).collect()
    }
    assert got == want and len(want) == ev.count()
