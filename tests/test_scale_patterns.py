"""Scale-pattern operators: results AND physical-plan assertions."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from clustopher_spark.operators.scale import (
    bucketed_join,
    salted_aggregate,
    time_rollup,
    write_bucketed,
)
from clustopher_spark.queries.base import table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_time_rollup_hierarchy(spark):
    ev = table(spark, SF_DIR, "events")
    roll = time_rollup(ev).cache()
    rows = {(r.grain, r.bucket_start): r for r in roll.collect()}
    # every grain conserves the event count and total
    totals = roll.groupBy("grain").agg(F.sum("n").alias("n"), F.round(F.sum("total"), 2).alias("t"))
    got = {r.grain: (r.n, r.t) for r in totals.collect()}
    assert got["hour"][0] == got["day"][0] == got["month"][0] == 1000
    assert abs(got["hour"][1] - got["month"][1]) < 1e-6
    # day buckets re-aggregate exactly from hour partials
    day_from_hours = (
        roll.filter(F.col("grain") == "hour")
        .groupBy(F.date_trunc("day", "bucket_start").alias("b"))
        .agg(F.sum("n").alias("n"))
    )
    per_day = {r.b: r.n for r in day_from_hours.collect()}
    for (grain, b), r in rows.items():
        if grain == "day":
            assert per_day[b] == r.n


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # note: tables land in the session's default warehouse dir
    # (spark.sql.warehouse.dir is a static conf); dropped on exit.
    orders = table(spark, SF_DIR, "orders")
    customer = table(spark, SF_DIR, "customer")
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"), "orders_b", "custkey", 8)
    write_bucketed(customer.withColumnRenamed("c_custkey", "custkey"), "customer_b", "custkey", 8)
    joined = bucketed_join(spark, "orders_b", "customer_b", "custkey")
    # disable broadcast to force the join strategy decision on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bucketed_join(spark, "orders_b", "customer_b", "custkey"))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert joined.count() == orders.count()  # every order has its customer
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_salted_aggregate_matches_plain(spark):
    li = table(spark, SF_DIR, "lineitem")
    salted = salted_aggregate(
        li, ["l_returnflag"], {"l_quantity": "sum", "l_orderkey": "count", "l_extendedprice": "max"}
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_orderkey").alias("count_l_orderkey"),
        F.max("l_extendedprice").alias("max_l_extendedprice"),
    )
    s = {r.l_returnflag: (round(r.sum_l_quantity, 6), r.count_l_orderkey, r.max_l_extendedprice)
         for r in salted.collect()}
    p = {r.l_returnflag: (round(r.sum_l_quantity, 6), r.count_l_orderkey, r.max_l_extendedprice)
         for r in plain.collect()}
    assert s == p


def test_hot_supercell_skew_bounded(spark):
    """Adversarial skew: 200k points inside ONE supercell (a dense city
    blob queried at zoom 0). The supercell hash partitioning serializes
    that cell onto one task by design — the bound is the kernel itself,
    which is O(n) via the CSR r-grid (measured ~0.6 s per 1M points in a
    single cell). The full distributed query over the hot cell must finish
    in seconds and conserve every point."""
    import time

    from clustopher_spark.operators.cluster import ClusterOptions, get_clusters

    n = 200_000
    # ~0.2 deg blob => one supercell at zoom 0 (world is 512px, cell 1600px)
    pts = (
        spark.range(1, n + 1)
        .selectExpr(
            "id",
            "-100.0 + (id % 447) * 0.0005 as lng",
            "40.0 + ((id * 7) % 449) * 0.0005 as lat",
            "cast(id % 13 as double) as value",
        )
    )
    opts = ClusterOptions(radius=100.0, min_points=2)
    t0 = time.perf_counter()
    out = get_clusters(pts, -180, -85, 180, 85, 0, ["value"], opts).collect()
    dt = time.perf_counter() - t0
    assert sum(r.point_count for r in out) == n, "points lost under skew"
    total_val = sum(r.sum_value for r in out)
    expect = sum(i % 13 for i in range(1, n + 1))
    assert abs(total_val - expect) < 1e-6 * expect + 1e-9
    # generous wall bound: catches an accidental O(n^2) regression (which
    # would take minutes), not scheduler noise
    assert dt < 60, f"hot-supercell query took {dt:.1f}s"


def test_compaction_coalesce_no_shuffle(spark, tmp_path):
    from clustopher_spark.operators.scale import compact_small_files, parquet_dir_stats

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    # 64 tiny files — the post-streaming-append pathology
    spark.range(0, 100_000).withColumn("v", F.col("id") * 2).repartition(64).write.parquet(src)
    n_in, total = parquet_dir_stats(spark, src)
    assert n_in == 64
    # target ~ half the data per file -> expect exactly 2 output files
    n_out = compact_small_files(spark, src, out, target_file_bytes=(total + 1) // 2)
    assert n_out == 2
    got = spark.read.parquet(out)
    assert got.count() == 100_000
    assert got.agg(F.sum("v")).first()[0] == 2 * (99_999 * 100_000 // 2)
    # coalesce mode must not shuffle
    df = spark.read.parquet(src).coalesce(2)
    assert "Exchange" not in _plan(df)


def test_compaction_sorted_restores_skipping(spark, tmp_path):
    from clustopher_spark.operators.scale import compact_small_files

    src = str(tmp_path / "frag_sorted")
    out = str(tmp_path / "compact_sorted")
    # keys scattered round-robin across files -> every file spans the full
    # key range and min/max skipping is useless
    spark.range(0, 50_000).withColumn("k", (F.col("id") * 37) % 50_000).repartition(32).write.parquet(src)
    compact_small_files(spark, src, out, target_file_bytes=1, sort_cols=["k"])
    # range-partitioned output: per-file key ranges must be (near-)disjoint —
    # assert every file's span is far below the full range
    import pyarrow.parquet as pq
    import glob

    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(
            md.row_group(i).column(c).statistics.min
            for i in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.schema.column(c).name == "k"
        )
        hi = max(
            md.row_group(i).column(c).statistics.max
            for i in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.schema.column(c).name == "k"
        )
        spans.append((lo, hi))
    assert len(spans) > 1
    spans.sort()
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if b[0] <= a[1])
    assert overlaps == 0, spans


def test_expectations_audit_operator(spark):
    from clustopher_spark.operators.expectations import expectations_audit

    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, None, "bad"), (4, 7.0, None)],
        "id long, v double, status string",
    )
    out = {
        r.rule: r
        for r in expectations_audit(
            df,
            {
                "v_positive": F.col("v") > 0,          # NULL v -> violation
                "status_known": F.col("status").isin("ok", "bad"),
                "id_unique_range": F.col("id").between(1, 4),
            },
        ).collect()
    }
    assert out["v_positive"].n_violations == 2          # -5.0 and NULL
    assert out["status_known"].n_violations == 1        # NULL status
    assert out["id_unique_range"].n_violations == 0
    assert all(r.n_rows == 4 for r in out.values())
    assert abs(out["v_positive"].violation_rate - 0.5) < 1e-9


def test_observed_expectations_rides_along(spark):
    """The Observation form must report the same counters as the dedicated
    audit scan, as a side effect of an unrelated action (here a filter +
    count — the 'pipeline work' the metrics ride on)."""
    from clustopher_spark.operators.expectations import (
        expectations_audit,
        observed_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, None, "bad"), (4, 7.0, None)],
        "id long, v double, status string",
    )
    rules = {
        "v_positive": F.col("v") > 0,
        "status_known": F.col("status").isin("ok", "bad"),
    }
    observed, obs = observed_expectations(df, rules)
    # the pipeline's own action — not an audit scan
    n_kept = observed.filter(F.col("id") <= 3).count()
    assert n_kept == 3
    m = obs.get
    assert m["n_rows"] == 4
    assert m["v_v_positive"] == 2
    assert m["v_status_known"] == 1
    audit = {r.rule: r.n_violations for r in expectations_audit(df, rules).collect()}
    assert m["v_v_positive"] == audit["v_positive"]
    assert m["v_status_known"] == audit["status_known"]


def test_hll_mergeable_rollup(spark, tables):
    """The sketch-union law: union of per-day sketches must estimate the
    same cardinality as one sketch over the whole table (exact same
    DataSketches state, not just close), and land within 5% of truth."""
    import os

    from clustopher_spark.queries import QUERIES

    sf_dir = os.environ.get("CLUSTOPHER_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = {r.event_type: r for r in QUERIES["stats_hll_mergeable_rollup"](spark, sf_dir).collect()}
    ev = tables["events"]
    whole = {
        r.event_type: (r.approx, r.exact)
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    assert set(out) == set(whole) and len(out) > 0
    for et, r in out.items():
        approx_whole, exact = whole[et]
        # merge-of-parts == sketch-of-whole (HLL union is lossless for
        # same-lgk sketches)
        assert r.approx_users == approx_whole, (et, r.approx_users, approx_whole)
        assert abs(r.approx_users - exact) <= max(1, 0.05 * exact), (et, r.approx_users, exact)
        assert r.n_days > 1
