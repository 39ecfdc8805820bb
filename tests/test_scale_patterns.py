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
