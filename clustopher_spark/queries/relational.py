"""Generic relational OLAP surface (SURVEY.md §2.3-2.7 'absent from the
reference but required' inventory): equi/semi/anti/outer joins, broadcast
joins, aggregations with rollup/cube, ranking/analytic windows, set ops,
scalar functions, pivot, top-k.

Every query is DataFrame-first (Catalyst plans it; AQE picks join
strategies at runtime) with an exactly-matching DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clustopher_spark.queries.base import register, table

DEC = "decimal(18,2)"


# --- TPC-H-style aggregation queries -----------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: map-side partial aggregation over 4 grouping cells."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).cast("double").alias("sum_disc_price"),
            (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_discount").cast("decimal(8,2)")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           o.o_orderdate AS orderdate, o.o_orderpriority AS priority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join; customer/orders side broadcastable."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "orderkey")
        .limit(10)
    )


@register(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'AMERICA')
    GROUP BY n.n_name ORDER BY nation
    """,
)
def q5_revenue_by_nation(spark, sf_dir):
    """TPC-H Q5 shape: star join through two broadcast dims."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation")
    )


# --- join flavors -------------------------------------------------------------

@register(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
)
def join_semi(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


@register(
    "join_left_order_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
)
def join_left(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0))
            .cast("double")
            .alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer_nation_presence",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         supp AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    ORDER BY nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_range_price_bands",
    oracle="""
    SELECT b.band AS band, COUNT(*) AS n_parts, CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM part p JOIN (
      SELECT 'low' AS band, 0.0 AS lo, 500.0 AS hi UNION ALL
      SELECT 'mid', 500.0, 1000.0 UNION ALL
      SELECT 'high', 1000.0, 1e9
    ) b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band ORDER BY band
    """,
)
def join_range(spark, sf_dir):
    """Theta/range join: broadcast NLJ against a tiny bands dim."""
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 500.0), ("mid", 500.0, 1000.0), ("high", 1000.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum(F.col("p_retailprice").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        )
        .orderBy("band")
    )


# --- windows ------------------------------------------------------------------

@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
)
def window_top3(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_running_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_running(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_gaps(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg
      FROM orders
    ) WHERE o_totalprice > cavg ORDER BY o_orderkey
    """,
)
def window_above_avg(spark, sf_dir):
    """Decorrelated scalar-subquery pattern: per-partition avg as a window."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cavg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cavg"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    )


# --- grouping sets / rollup / cube --------------------------------------------

@register(
    "agg_rollup_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@register(
    "agg_distinct_parts_per_supplier",
    oracle="""
    SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_items
    FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
    """,
)
def agg_distinct(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "agg_having_string_agg",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    HAVING COUNT(*) >= 2 ORDER BY c_nationkey
    """,
)
def agg_having(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        )
        .filter(F.col("n") >= 2)
        .orderBy("c_nationkey")
    )


# --- set operations -----------------------------------------------------------

@register(
    "setop_priority_customers",
    oracle="""
    (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)
def setop_priority(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent.intersect(high).exceptAll(finished.distinct()).orderBy("o_custkey")


@register(
    "setop_union_all_keys",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
      SELECT l_partkey AS k FROM lineitem
      UNION ALL
      SELECT p_partkey AS k FROM part
    ) GROUP BY k ORDER BY k
    """,
)
def setop_union_all(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    p = table(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    return li.unionAll(p).groupBy("k").agg(F.count(F.lit(1)).alias("n")).orderBy("k")


# --- pivot / scalar functions ---------------------------------------------------

@register(
    "pivot_order_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
    ).orderBy("o_orderpriority")


@register(
    "scalar_function_gallery",
    oracle="""
    SELECT o_orderkey,
           upper(substr(o_orderpriority, 3)) AS pri_word,
           length(o_orderstatus) AS status_len,
           concat(o_orderstatus, '-', o_orderpriority) AS tag,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           ROUND(abs(o_totalprice - 100000.0), 2) AS dist_from_100k,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS size_band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded
    FROM orders ORDER BY o_orderkey
    """,
)
def scalar_gallery(spark, sf_dir):
    """String/date/math/conditional scalar functions (SURVEY.md §2.7)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 3, 100)).alias("pri_word"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.round(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("dist_from_100k"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
    ).orderBy("o_orderkey")


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def topk_orders(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority AS priority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY priority ORDER BY priority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: date-sliced EXISTS (plans as a left-semi join)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate should
    reach the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast("decimal(4,2)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: join + group + top-k by aggregate."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q12_priority_by_quantity_band",
    oracle="""
    SELECT CASE WHEN l_quantity >= 30 THEN 'bulk' ELSE 'small' END AS band,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY band ORDER BY band
    """,
)
def q12_priority_bands(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional aggregation."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(F.col("l_quantity") >= 30, "bulk").otherwise("small").alias("band")
        )
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("band")
    )


@register(
    "q14_brand_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))
                 FILTER (WHERE p_brand = 'Brand#1') AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS brand1_share,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_brand_share(spark, sf_dir):
    """TPC-H Q14 shape: broadcast dim join + conditional share-of-total."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_brand") == "Brand#1", disc)).cast("double")
            / F.sum(disc).cast("double"),
            4,
        ).alias("brand1_share"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "window_range_frame_30d",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
    FROM orders ORDER BY o_orderkey
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over event time: trailing-30-day spend per customer."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        FROM orders ORDER BY o_orderkey
        """
    )


@register(
    "window_ranking_family",
    oracle="""
    SELECT o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           ROUND(CUME_DIST() OVER w, 6) AS cdist,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LEAD(o_orderkey, 1) OVER w AS next_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_ranking_family(spark, sf_dir):
    w = (
        Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), "o_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
    ).orderBy("o_orderkey")


@register(
    "setop_multiset_except_all",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
      SELECT l_suppkey AS k FROM lineitem
      EXCEPT ALL
      SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
    ) GROUP BY k ORDER BY k
    """,
)
def setop_multiset(spark, sf_dir):
    """EXCEPT ALL (multiset semantics: per-row cardinality subtraction)."""
    li = table(spark, sf_dir, "lineitem")
    all_keys = li.select(F.col("l_suppkey").alias("k"))
    returned = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    return (
        all_keys.exceptAll(returned)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


@register(
    "join_right_supplier_items",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(l.l_orderkey) AS n_items
    FROM lineitem l RIGHT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name ORDER BY s.s_suppkey
    """,
)
def join_right(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey, "right")
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("l_orderkey").alias("n_items"))
        .orderBy("s_suppkey")
    )


@register(
    "agg_argmin_argmax",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_argminmax(spark, sf_dir):
    """min_by/max_by (argmin/argmax) aggregates — the generalized form of
    the reference's LRU argmin eviction (W4, runner/runner.go:167-186).
    (o_totalprice values are distinct per status group in this data, so the
    arg is well-defined across engines.)"""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "lateral_explode_tokens",
    oracle=r"""
    SELECT doc_id, tok.pos - 1 AS pos, tok.tok AS token
    FROM (
      SELECT doc_id, unnest(list_transform(regexp_split_to_array(trim(text), '\s+'),
                     (t, i) -> struct_pack(pos := i, tok := t))) AS tok
      FROM documents WHERE doc_id < 20
    ) ORDER BY doc_id, pos
    """,
)
def lateral_explode(spark, sf_dir):
    """Lateral fan-out: posexplode of tokenized text (UNNEST WITH
    ORDINALITY equivalent)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
        )
        .orderBy("doc_id", "pos")
    )


@register(
    "cross_join_report_grid",
    oracle="""
    SELECT r.r_name AS region, p.o_orderpriority AS priority,
           COALESCE(c.n, 0) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    LEFT JOIN (
      SELECT n.n_regionkey AS rk, o.o_orderpriority AS pri, COUNT(*) AS n
      FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey
        JOIN nation n ON cu.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ) c ON c.rk = r.r_regionkey AND c.pri = p.o_orderpriority
    ORDER BY region, priority
    """,
)
def cross_join_report_grid(spark, sf_dir):
    """CROSS JOIN of two small dimensions to a dense reporting grid, counts
    left-joined in with zero-fill — the every-cell-present report shape.
    Both cross sides are dimension-sized; the fact aggregation happens
    before the join, so the grid join touches only aggregated rows."""
    r = table(spark, sf_dir, "region")
    o = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    pri = o.select("o_orderpriority").distinct()
    counts = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("rk"), F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        r.crossJoin(F.broadcast(pri))
        .join(
            counts,
            (F.col("rk") == F.col("r_regionkey"))
            & (F.col("pri") == F.col("o_orderpriority")),
            "left",
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("o_orderpriority").alias("priority"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
        )
        .orderBy("region", "priority")
    )


@register(
    "join_fuzzy_name_levenshtein",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
     AND levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY name_a, name_b
    """,
)
def join_fuzzy_name_levenshtein(spark, sf_dir):
    """Fuzzy (edit-distance <= 2) self-join over the distinct part-name
    vocabulary — the entity-resolution / spell-variant cleanup join.  The
    oracle runs the naive theta join (levenshtein in the join condition =
    quadratic work); the Spark plan uses Q-GRAM PREFIX FILTERING: explode
    each name to its distinct 2-grams, equi-join on gram (inverted index),
    dedupe candidates, then refine with the exact levenshtein.  Pigeonhole
    completeness: d edits destroy <= 2d q-grams, and these names (>= 7
    chars, length diff <= 2) carry >= 6 grams, so every true pair shares
    >= 1 gram and candidate generation misses nothing — the oracle proves
    it.  At web-scale vocabularies the hot-gram df² blowup is capped the
    same way as ngram_jaccard_pairs (drop grams with df > cap; bounded
    recall loss, stated, not silent) and the refine stays a hash-join
    probe, never all-pairs."""
    p = table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    grams = names.select(
        "p_name",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(1, length(p_name) - 1), i -> substring(p_name, i, 2))")
            )
        ).alias("gram"),
    )
    a = grams.alias("a")
    b = grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(F.col("a.p_name").alias("name_a"), F.col("b.p_name").alias("name_b"))
        .distinct()
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
    )
    return (
        cand.withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("edit_dist") <= 2)
        .orderBy("name_a", "name_b")
    )


@register(
    "join_brand_cooccurrence",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY brand_a, brand_b
    HAVING COUNT(*) >= 50
    ORDER BY brand_a, brand_b
    """,
)
def join_brand_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence: brand pairs appearing in the same
    order at least 50 times.  The inverted-index self-join shape: dedupe
    to (order, brand) FIRST (caps the per-order fan-out at
    distinct-brands², independent of line-item count), equi-join on the
    order key, count pairs.  The brand dimension rides a broadcast join
    onto lineitem.  At 100 TB a pathological mega-order is the hot key —
    same mitigation as shingle df-caps (drop orders with > K distinct
    brands, stated recall trade)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 50)
        .orderBy("brand_a", "brand_b")
    )


@register(
    "join_salted_skew_agg",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def join_salted_skew_agg(spark, sf_dir):
    """The SALTED large-large join, result-identical to the plain join
    (that identity IS the oracle): the fact side tags every row with a
    deterministic salt in [0, 8), the build side replicates each key 8x
    with an exploded salt column, and the join runs on (key, salt) — a
    hot key's rows now spread across 8 reducers instead of one.

    This is the manual form of the skew pattern for engines/plans where
    AQE's runtime skew-join split isn't available (non-AQE deployments,
    streaming joins, or keys so hot one task still exceeds memory after
    AQE's byte-based splitting). Cost model: build side bytes x 8
    (bounded — it rides the exchange that join needed anyway), in
    exchange for an 8x tighter per-task bound on the probe side. TPC-H
    keys are uniform, so the entry here pins CORRECTNESS of the rewrite
    (salted == plain, hash-checked against the unsalted oracle); the
    skew_hot_supercell bench entry covers the perf side of skew."""
    from pyspark.sql import functions as F

    n_salt = 8
    li = table(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)).cast("int"),
    )
    orders = (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
        )
    )
    return (
        li.join(orders, ["l_orderkey", "salt"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
        )
        .orderBy("priority")
    )
