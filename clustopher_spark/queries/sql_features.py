"""SQL-surface features beyond the TPC-H shapes: recursive CTEs, UNPIVOT
(melt), map higher-order functions, and the datetime function family.

These round out SURVEY.md §2.7 (scalar functions: date/time, array/map) and
add the two reshaping operators (unpivot, recursion) a user of a general
OLAP engine expects. Map/array results are rendered to sorted CSV strings so
oracle cells stay scalar (the driver's value-hash compares cells, not nested
objects).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clustopher_spark.queries.base import register, table

DEC = "decimal(18,2)"


@register(
    "recursive_cte_zoom_scales",
    oracle="""
    WITH RECURSIVE zooms(zoom, scale) AS (
      SELECT 0, CAST(1 AS BIGINT)
      UNION ALL SELECT zoom + 1, scale * 2 FROM zooms WHERE zoom < 16)
    SELECT zoom, scale,
           CAST(40.0 AS DOUBLE) / (scale * 512) * CAST(360.0 AS DOUBLE) AS radius_deg
    FROM zooms ORDER BY zoom
    """,
)
def recursive_cte_zoom_scales(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): generates the zoom->scale
    table the clustering pipeline uses (2^z tile scale, 40px radius in
    world degrees at extent 512 — the reference's zoomScale table,
    cluster/cluster.go:554-560, as a query instead of a precomputed array)."""
    table(spark, sf_dir, "region")  # touch a table so session conf is applied
    return spark.sql(
        """
        WITH RECURSIVE zooms(zoom, scale) AS (
          SELECT 0, CAST(1 AS BIGINT)
          UNION ALL SELECT zoom + 1, scale * 2 FROM zooms WHERE zoom < 16)
        SELECT zoom, scale,
           CAST(40.0 AS DOUBLE) / (scale * 512) * CAST(360.0 AS DOUBLE) AS radius_deg
        FROM zooms ORDER BY zoom
        """
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT measure, CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
    GROUP BY measure ORDER BY measure
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    """UNPIVOT/melt: wide measure columns to long (measure, val) rows —
    the inverse of the pivot operator. Planned as Expand (one pass over the
    scan, no union of four scans)."""
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.sum(F.col("val").cast(DEC)).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("measure")
    )


@register(
    "map_functions_gallery",
    oracle="""
    SELECT o_key, string_agg(kv, ',' ORDER BY kv) AS flag_qty_csv,
           string_agg(kv2, ',' ORDER BY kv2) AS doubled_csv,
           COALESCE(string_agg(kv_big, ',' ORDER BY kv_big), '') AS big_csv
    FROM (
      SELECT l_orderkey AS o_key,
             l_returnflag || '=' || CAST(CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS VARCHAR) AS kv,
             l_returnflag || '=' || CAST(CAST(SUM(CAST(l_quantity AS INT)) * 2 AS BIGINT) AS VARCHAR) AS kv2,
             CASE WHEN SUM(CAST(l_quantity AS INT)) >= 50
                  THEN l_returnflag || '=' || CAST(CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS VARCHAR)
             END AS kv_big
      FROM lineitem GROUP BY l_orderkey, l_returnflag)
    GROUP BY o_key ORDER BY o_key
    """,
)
def map_functions_gallery(spark, sf_dir):
    """Map higher-order functions (§2.7 array/map): map_from_entries ->
    transform_values -> map_filter -> map_entries, rendered as sorted k=v
    CSV. This is the A2/A3 metrics-map pattern (metrics MAP<STRING,DOUBLE>
    per cluster) exercised as a standalone oracle-checked operator."""
    li = table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy(
        F.col("l_orderkey").alias("o_key"), F.col("l_returnflag").alias("flag")
    ).agg(F.sum(F.col("l_quantity").cast("int")).alias("qty"))
    with_map = per_flag.groupBy("o_key").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("flag", "qty")))
        ).alias("m")
    )

    def kv_csv(m):
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(m),
                    lambda e: F.concat(e.key, F.lit("="), e.value.cast("string")),
                )
            ),
            ",",
        )

    return with_map.select(
        "o_key",
        kv_csv(F.col("m")).alias("flag_qty_csv"),
        kv_csv(F.transform_values("m", lambda k, v: v * 2)).alias("doubled_csv"),
        kv_csv(F.map_filter("m", lambda k, v: v >= 50)).alias("big_csv"),
    ).orderBy("o_key")


@register(
    "window_count_distinct",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey) AS n_pri
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def window_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) OVER — an operator Spark lacks natively; bridged
    with the dense_rank-max identity (max dense_rank over an ordered
    partition == number of distinct values). Checked against DuckDB's
    native windowed distinct count. Same single shuffle on the partition
    key; both windows reuse it."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    by_val = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    whole = Window.partitionBy("o_custkey")
    return (
        o.withColumn("dr", F.dense_rank().over(by_val))
        .withColumn("n_pri", F.max("dr").over(whole))
        .select("o_custkey", "o_orderkey", "n_pri")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
             o_totalprice + 1000 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_custkey, 'N', 42.0
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(u.o_custkey, t.o_custkey) AS o_custkey,
           COALESCE(u.o_orderstatus, t.o_orderstatus) AS status,
           CAST(COALESCE(u.o_totalprice, t.o_totalprice) AS DOUBLE) AS totalprice
    FROM orders t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
    ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE INTO (upsert) semantics as a relational plan: matched rows
    take the update's values, unmatched source rows insert, unmatched
    target rows persist — a full outer join + COALESCE. The deterministic
    'updates' feed touches every 10th key and inserts shifted copies of
    every 97th. At warehouse scale this is the same plan Delta/Iceberg
    MERGE lowers to (minus their file-level pruning)."""
    o = table(spark, sf_dir, "orders")
    upd = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("u_key"),
            F.col("o_custkey").alias("u_cust"),
            F.lit("P").alias("u_status"),
            (F.col("o_totalprice") + 1000).alias("u_price"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 1000000).alias("u_key"),
                F.col("o_custkey").alias("u_cust"),
                F.lit("N").alias("u_status"),
                F.lit(42.0).alias("u_price"),
            )
        )
    )
    return (
        o.join(upd, o.o_orderkey == upd.u_key, "full_outer")
        .select(
            F.coalesce("u_key", "o_orderkey").alias("o_orderkey"),
            F.coalesce("u_cust", "o_custkey").alias("o_custkey"),
            F.coalesce("u_status", "o_orderstatus").alias("status"),
            F.coalesce("u_price", "o_totalprice").cast("double").alias("totalprice"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "stats_linear_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stats_linear_regression(spark, sf_dir):
    """Linear-regression aggregate family (regr_slope/intercept/r2/count) —
    price-vs-quantity fit per return flag, rounded to absorb engine
    accumulation-order ulps (same policy as the moments/corr queries)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "string_function_gallery",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_name, 'Customer#000000042') AS lev,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           reverse(c_mktsegment) AS rev,
           repeat('ab', 3) AS rep,
           strpos(c_name, '#') AS hashpos,
           md5(c_name) AS digest,
           split_part(c_name, '#', 2) AS numpart
    FROM customer ORDER BY c_custkey
    """,
)
def string_function_gallery(spark, sf_dir):
    """Second string gallery (§2.7): edit distance, character translation,
    padding, reverse/repeat, 1-based find, hashing, split_part."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000042")).alias("lev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("translated"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.instr("c_name", "#").alias("hashpos"),
        F.md5("c_name").alias("digest"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("numpart"),
    ).orderBy("c_custkey")


@register(
    "bitwise_function_gallery",
    oracle="""
    SELECT o_orderkey, o_orderkey & 255 AS band, o_orderkey | 1 AS orred,
           xor(o_orderkey, 42) AS xored, o_orderkey << 2 AS shifted,
           CAST(bit_count(o_orderkey) AS INT) AS popcount
    FROM orders ORDER BY o_orderkey
    """,
)
def bitwise_function_gallery(spark, sf_dir):
    """Bitwise operator family (§2.7 math row): and/or/xor/shift/popcount —
    the primitives behind the engine's Morton interleave and SimHash bands."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(1)).alias("orred"),
        k.bitwiseXOR(F.lit(42)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted"),
        F.bit_count(k).alias("popcount"),
    ).orderBy("o_orderkey")


@register(
    "datetime_function_gallery",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofweek(o_orderdate) AS INT) + 1 AS dow,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT) AS days_to_y2k
    FROM orders ORDER BY o_orderkey
    """,
)
def datetime_function_gallery(spark, sf_dir):
    """Datetime function family (§2.7 date/time row): truncation, field
    extraction, end-of-month, interval arithmetic, day difference. DuckDB
    numbers dayofweek Sun=0 vs Spark's Sun=1 — the oracle adds 1."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.trunc("o_orderdate", "month").cast("timestamp").alias("month_start"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3mo"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
    ).orderBy("o_orderkey")


@register(
    "sql_text_lateral_subquery",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, CAST(t.o_totalprice AS DOUBLE) AS price
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey < 20
    ORDER BY c.c_custkey, price DESC, t.o_orderkey
    """,
)
def sql_text_lateral_subquery(spark, sf_dir):
    """Correlated LATERAL derived table (per-customer top-2 orders) — the
    SQL-text form of per-group top-k. Catalyst decorrelates it to the same
    window/join plan as the DataFrame version; identical SQL runs on both
    engines."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, CAST(t.o_totalprice AS DOUBLE) AS price
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 20
        ORDER BY c.c_custkey, price DESC, t.o_orderkey
        """
    )
