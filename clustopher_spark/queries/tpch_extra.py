"""Remaining TPC-H-shaped plans (Q2/Q7/Q8/Q9/Q11/Q13/Q15-Q22 analogs) plus
higher-order-function, null-semantics, and gaps-and-islands galleries.

The driver's star schema has no partsupp/phone/comment columns, so the
partsupp-based queries are re-targeted at lineitem/supplier while keeping the
*operator shape* that makes each TPC-H query interesting:

- Q2  -> correlated scalar MIN subquery (decorrelated to a window in Spark)
- Q7  -> nation-pair disjunctive join filter + year extraction
- Q8  -> share-of-total with conditional numerator (market share)
- Q9  -> multi-join profit expression with exact decimal arithmetic
- Q11 -> HAVING against a scalar subquery over the same CTE
- Q13 -> outer join with a non-key join predicate + histogram of counts
- Q15 -> CTE + equality against a scalar MAX subquery (exact decimal)
- Q16 -> COUNT(DISTINCT) with null-aware NOT IN (anti join)
- Q17 -> correlated AVG subquery threshold (0.5 * avg qty per part)
- Q18 -> IN against a grouped-HAVING subquery (semi join)
- Q19 -> OR-of-conjunctions join predicates (disjunctive pushdown)
- Q20 -> nested IN subqueries (part filter inside supplier filter)
- Q21 -> correlated EXISTS + NOT EXISTS with key-inequality conditions
- Q22 -> scalar AVG subquery + correlated NOT EXISTS

All money math follows the repo rule: exact DECIMAL sums cast to DOUBLE at
the edge (never round() floats — Spark HALF_UP vs DuckDB half-even diverge
on .xxx5 boundaries).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clustopher_spark.queries.base import register, table

DEC = "decimal(18,2)"


def _disc_price():
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    SELECT l.l_partkey AS partkey, CAST(l.l_extendedprice AS DOUBLE) AS min_price,
           MIN(l.l_suppkey) AS best_supp
    FROM lineitem l
    WHERE l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey, l.l_extendedprice ORDER BY partkey
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated scalar MIN subquery. Spark plans it as a
    window-min decorrelation — one shuffle on l_partkey, no self-join."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("mn", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("mn"))
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_extendedprice").cast("double").alias("min_price"),
        )
        .agg(F.min("l_suppkey").alias("best_supp"))
        .orderBy("partkey")
    )


@register(
    "q7_volume_shipping_pairs",
    oracle="""
    SELECT supp_nation, cust_nation, yr, CAST(SUM(vol) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS yr,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS vol
      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair filter across two broadcast
    nation dims; group by (supp_nation, cust_nation, year)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT yr,
           COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN vol END) AS DOUBLE), 0)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS yr, n1.n_name AS supp_nation,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS vol
      FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = (SELECT MIN(r_name) FROM region)
    ) GROUP BY yr ORDER BY yr
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_1's share of revenue among customers of one
    region, per order-year. Conditional numerator over exact decimal sums."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    target_region = r.agg(F.min("r_name")).collect()[0][0]
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_regionkey").alias("rk2")
    )
    vol = _disc_price()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == target_region)),
            F.col("rk2") == F.col("r_regionkey"),
        )
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("supp_nation") == "NATION_1", vol)).cast("double"),
                    F.lit(0.0),
                )
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("yr")
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, yr, CAST(SUM(amount) AS DOUBLE) AS profit, COUNT(*) AS n
    FROM (
      SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS yr,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
             - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(4,0)) * CAST(0.1 AS DECIMAL(2,1)) AS amount
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) GROUP BY nation, yr ORDER BY nation, yr
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit = revenue - cost per supplier-nation/year.
    No partsupp table, so cost is proxied as 10% of retailprice * quantity —
    kept in exact decimal arithmetic end to end."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    amount = _disc_price() - (
        F.col("p_retailprice").cast(DEC)
        * F.col("l_quantity").cast("decimal(4,0)")
        * F.lit(0.1).cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(amount).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("nation", "yr")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH value_per_part AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(4,0))) AS val
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS val FROM value_per_part
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) * 0.0006 FROM value_per_part)
    ORDER BY val DESC, partkey
    """,
)
def q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: HAVING against a scalar subquery over the same
    aggregate (parts holding >0.06% of total inventory value). The scalar
    side is a broadcast cross join of a 1-row aggregate."""
    li = table(spark, sf_dir, "lineitem")
    val = F.sum(
        F.col("l_extendedprice").cast(DEC) * F.col("l_quantity").cast("decimal(4,0)")
    )
    per_part = li.groupBy("l_partkey").agg(val.alias("val"))
    total = per_part.agg(
        (F.sum("val").cast("double") * F.lit(0.0006)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"), F.col("val").cast("double").alias("val")
        )
        .orderBy(F.desc("val"), "partkey")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer join with a non-key predicate in the join
    condition (not the WHERE — nulls must survive), then a histogram of
    per-customer order counts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: CTE reused twice — once as the join input, once under
    a scalar MAX. Exact-decimal equality keeps the tie semantics identical
    across engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, brand, ptype, psize
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: COUNT(DISTINCT) + NOT IN subquery (s_suppkey is
    non-null so the null-aware anti join degenerates to a plain anti join)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000)
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("ptype"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "ptype", "psize")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.half_avg_qty
    """,
)
def q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part AVG threshold. The avg is an
    exact decimal-sum / count double so both engines compute the identical
    threshold (never a float sum, whose order-dependence diverges)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.5)
            * (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1)))
        ).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY 1, 2, 3, 4 ORDER BY total_qty DESC, o.o_orderkey LIMIT 20
    """,
)
def q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape: IN against a grouped-HAVING subquery -> semi join."""
    li = table(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(big_orders, o.o_orderkey == F.col("big_ok"), "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-conjunctions mixing both join sides. Catalyst
    extracts the common single-side conjuncts for pushdown below the join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (p.p_brand == "Brand#1")
            & p.p_size.between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (p.p_brand == "Brand#2")
            & p.p_size.between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (p.p_brand == "Brand#3")
            & p.p_size.between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
    ORDER BY s_suppkey
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested IN subqueries — a part-name filter feeding a
    grouped-HAVING supplier filter, both planned as semi joins."""
    widget_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(F.broadcast(widget_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sq"))
        .filter(F.col("sq") > 100)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name AS s_name, COUNT(*) AS numwait
    FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: the sole late supplier on multi-supplier finished
    orders — correlated EXISTS (semi join with suppkey inequality) plus
    NOT EXISTS (anti join) against the same fact table. 'Late' is
    l_shipdate > o_orderdate + 60 days (this schema has no receiptdate)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("ok3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    )
    s = table(spark, sf_dir, "supplier")
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3"))
            & (F.col("sd3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_name").alias("s_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT cntry, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT c.c_custkey % 7 AS cntry, c.c_acctbal AS c_acctbal FROM customer c
      WHERE c.c_custkey % 7 IN (1, 3, 5)
        AND c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                           FROM customer c2
                           WHERE c2.c_acctbal > 0 AND c2.c_custkey % 7 IN (1, 3, 5))
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'))
    GROUP BY cntry ORDER BY cntry
    """,
)
def q22_idle_rich(spark, sf_dir):
    """TPC-H Q22 shape: scalar AVG subquery + correlated NOT EXISTS. The
    'country code' is c_custkey % 7 (this schema has no phone column); the
    anti join keeps above-average-balance customers with no URGENT orders."""
    c = table(spark, sf_dir, "customer").withColumn(
        "cntry", F.col("c_custkey") % 7
    )
    sel = c.filter(F.col("cntry").isin(1, 3, 5))
    avg_bal = sel.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("uk"))
    )
    return (
        sel.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("uk"), "left_anti")
        .groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@register(
    "hof_array_gallery",
    oracle="""
    SELECT o_key,
           array_to_string(qtys, ',') AS qtys_csv,
           array_to_string(list_transform(qtys, x -> x * 2), ',') AS doubled_csv,
           COALESCE(array_to_string(list_filter(qtys, x -> x >= 25), ','), '') AS big_csv,
           CAST(list_sum(qtys) AS BIGINT) AS total,
           len(qtys) AS n,
           array_to_string(list_sort(list_distinct(qtys)), ',') AS distinct_csv
    FROM (SELECT l_orderkey AS o_key, list_sort(list(CAST(l_quantity AS INT))) AS qtys
          FROM lineitem GROUP BY l_orderkey)
    ORDER BY o_key
    """,
)
def hof_array_gallery(spark, sf_dir):
    """Higher-order array functions (SURVEY.md §2.7 array/map row): collect,
    sort, transform, filter, fold — all JVM-side lambda expressions, no
    Python UDFs. Arrays are CSV-joined so oracle cells stay scalar."""
    li = table(spark, sf_dir, "lineitem")
    qtys = F.array_sort(F.collect_list(F.col("l_quantity").cast("int")))

    def csv(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    grouped = li.groupBy(F.col("l_orderkey").alias("o_key")).agg(qtys.alias("qtys"))
    return grouped.select(
        "o_key",
        csv(F.col("qtys")).alias("qtys_csv"),
        csv(F.transform(F.col("qtys"), lambda x: x * 2)).alias("doubled_csv"),
        csv(F.filter(F.col("qtys"), lambda x: x >= 25)).alias("big_csv"),
        F.aggregate(
            F.col("qtys"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total"),
        F.size("qtys").cast("long").alias("n"),
        csv(F.array_sort(F.array_distinct(F.col("qtys")))).alias("distinct_csv"),
    ).orderBy("o_key")


@register(
    "null_semantics_gallery",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus IS NOT DISTINCT FROM 'O' AS open_nullsafe,
           NULLIF(o_orderstatus, 'F') IS NULL AS finished,
           COALESCE(NULLIF(o_orderstatus, 'F'), 'DONE') AS decoded,
           CASE WHEN NULLIF(o_orderstatus, 'F') IS NULL THEN 0 ELSE 1 END AS live_flag
    FROM orders ORDER BY o_orderkey
    """,
)
def null_semantics_gallery(spark, sf_dir):
    """Null-semantics surface: null-safe equality (<=>), NULLIF/COALESCE,
    IS NULL in conditionals — three-valued logic pinned against the oracle."""
    o = table(spark, sf_dir, "orders")
    status_or_null = F.nullif("o_orderstatus", F.lit("F"))
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").eqNullSafe("O").alias("open_nullsafe"),
        status_or_null.isNull().alias("finished"),
        F.coalesce(status_or_null, F.lit("DONE")).alias("decoded"),
        F.when(status_or_null.isNull(), 0).otherwise(1).alias("live_flag"),
    ).orderBy("o_orderkey")


@register(
    "window_gaps_islands",
    oracle="""
    SELECT o_custkey, CAST(island AS BIGINT) AS island, COUNT(*) AS n_orders,
           CAST(MIN(o_orderdate) AS TIMESTAMP) AS island_start,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS island_end
    FROM (
      SELECT o_custkey, o_orderdate,
             SUM(CASE WHEN prev_d IS NULL OR date_diff('day', prev_d, o_orderdate) > 30
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
            FROM orders))
    GROUP BY o_custkey, island ORDER BY o_custkey, island
    """,
)
def window_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: runs of orders per customer separated by >30-day
    gaps — lag + conditional flag + running sum as island id, then a
    per-island rollup. One shuffle on o_custkey reused by both windows."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_d"),
    ).withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_d").isNull()
                | (F.datediff("o_orderdate", "prev_d") > 30),
                1,
            ).otherwise(0)
        ).over(run),
    )
    return (
        flagged.groupBy("o_custkey", "island")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # DATE outputs hash-mismatch (DuckDB fetches DATE as pandas
            # Timestamp, Spark keeps datetime.date) — cast both sides to
            # TIMESTAMP, the repo-wide convention for date-valued outputs.
            F.min("o_orderdate").cast("timestamp").alias("island_start"),
            F.max("o_orderdate").cast("timestamp").alias("island_end"),
        )
        .orderBy("o_custkey", "island")
    )
