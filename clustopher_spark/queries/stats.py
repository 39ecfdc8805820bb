"""Statistical aggregates and SQL-layer queries rounding out SURVEY.md §2.4's
'approximate aggregates absent -> available as extension' note: exact
percentiles, moments (stddev/var/corr/covar), approximate distincts and
percentiles (rows-only: approximation algorithms differ per engine), plus
operators exercised through the spark.sql TEXT layer (temp views +
subqueries) rather than the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clustopher_spark.queries.base import register, table


@register(
    "stats_percentiles_price",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def stats_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (the reference's W2 median-selection
    primitive, generalized)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "stats_moments",
    oracle="""
    SELECT o_orderstatus,
           ROUND(stddev_samp(o_totalprice), 4) AS sd,
           ROUND(var_samp(o_totalprice), 2) AS variance,
           ROUND(skewness(o_totalprice), 4) AS skew
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def stats_moments(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    # Spark's skewness is the population estimator g1; DuckDB's is the
    # bias-corrected sample estimator G1 = g1 * sqrt(n(n-1))/(n-2)
    g1_to_G1 = F.sqrt(n * (n - F.lit(1))) / (n - F.lit(2))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
            F.round(F.var_samp("o_totalprice"), 2).alias("variance"),
            F.round(F.skewness("o_totalprice") * g1_to_G1, 4).alias("skew"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "stats_correlation",
    oracle="""
    SELECT ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(covar_samp(l_discount, l_tax), 6) AS disc_tax_covar,
           COUNT(*) AS n
    FROM lineitem
    """,
)
def stats_correlation(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_discount", "l_tax"), 6).alias("disc_tax_covar"),
        F.count(F.lit(1)).alias("n"),
    )


@register("stats_approx_distinct")  # rows-only: HLL sketches differ per engine;
# the unit check pins the approx within 5% of exact inside ONE engine
def stats_approx_distinct(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )


@register("stats_approx_percentile")  # rows-only: t-digest/GK sketches differ
def stats_approx_percentile(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50_exact"),
    )


@register(
    "sql_text_exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    ) ORDER BY s_suppkey
    """,
)
def sql_text_exists(spark, sf_dir):
    """Correlated EXISTS through the SQL text layer (Catalyst decorrelates
    to a semi join — same plan as the DataFrame left_semi)."""
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
        ) ORDER BY s_suppkey
        """
    )


@register(
    "sql_text_scalar_subquery",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_above
    FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def sql_text_scalar_subquery(spark, sf_dir):
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_above
        FROM part
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
        GROUP BY p_brand ORDER BY p_brand
        """
    )


@register(
    "sql_text_in_subquery_with_cte",
    oracle="""
    WITH big_orders AS (
      SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000
    )
    SELECT n.n_name AS nation, COUNT(DISTINCT c.c_custkey) AS n_big_spenders
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey IN (SELECT o_custkey FROM big_orders)
    GROUP BY n.n_name ORDER BY nation
    """,
)
def sql_text_in_cte(spark, sf_dir):
    for t in ("orders", "customer", "nation"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH big_orders AS (
          SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 300000
        )
        SELECT n.n_name AS nation, COUNT(DISTINCT c.c_custkey) AS n_big_spenders
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_custkey IN (SELECT o_custkey FROM big_orders)
        GROUP BY n.n_name ORDER BY nation
        """
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_suppkey, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey), ())
    ORDER BY l_returnflag NULLS FIRST, l_suppkey NULLS FIRST
    """,
)
def agg_grouping_sets(spark, sf_dir):
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_suppkey, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey), ())
        ORDER BY l_returnflag NULLS FIRST, l_suppkey NULLS FIRST
        """
    )


def _expectation_rules_sql() -> str:
    rules = {
        "custkey_in_customer": "_ck IS NOT NULL",
        "custkey_not_null": "o_custkey IS NOT NULL",
        "orderdate_in_range": "o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'",
        "priority_format": "regexp_matches(o_orderpriority, '^[1-5]-')",
        "status_valid": "o_orderstatus IN ('O', 'F', 'P')",
        "totalprice_positive": "o_totalprice > 0",
    }
    viol = ",\n        ".join(
        f"SUM(CASE WHEN COALESCE({pred}, FALSE) THEN 0 ELSE 1 END) AS v_{i}"
        for i, pred in enumerate(rules.values())
    )
    arms = "\n    UNION ALL ".join(
        f"SELECT '{name}' AS rule, CAST(v_{i} AS BIGINT) AS n_violations, n_rows, "
        f"ROUND(v_{i} / n_rows, 6) AS violation_rate FROM agg"
        for i, name in enumerate(rules)
    )
    return f"""
    WITH j AS (
      SELECT o.*, c.c_custkey AS _ck
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        {viol}
      FROM j
    )
    {arms}
    ORDER BY rule
    """


@register("stats_quality_expectations", oracle=_expectation_rules_sql())
def stats_quality_expectations(spark, sf_dir):
    """Declarative data-quality gate over ``orders``: six expectations
    (null / range / set-membership / regex / positivity / referential
    integrity against ``customer``) audited in ONE scan via
    ``operators.expectations.expectations_audit`` — each rule is a
    map-side conditional sum, the referential rule rides a broadcast left
    join, and the long-form result comes from a zero-cost ``stack`` over
    the single 1-row aggregate. The 100 TB shape: no shuffle of row data,
    ever."""
    from clustopher_spark.operators.expectations import expectations_audit

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("_ck"))
    j = o.join(F.broadcast(c), o.o_custkey == F.col("_ck"), "left")
    rules = {
        "custkey_in_customer": F.col("_ck").isNotNull(),
        "custkey_not_null": F.col("o_custkey").isNotNull(),
        "orderdate_in_range": F.col("o_orderdate").between("1992-01-01", "1998-12-31"),
        "priority_format": F.col("o_orderpriority").rlike("^[1-5]-"),
        "status_valid": F.col("o_orderstatus").isin("O", "F", "P"),
        "totalprice_positive": F.col("o_totalprice") > 0,
    }
    return expectations_audit(j, rules).orderBy("rule")


@register(
    "stats_ks_price_drift",
    oracle="""
    WITH per_value AS (
      SELECT o_totalprice AS v,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS c_o,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS c_f
      FROM orders WHERE o_orderstatus IN ('O', 'F')
      GROUP BY v
    ), cdf AS (
      SELECT v,
             SUM(c_o) OVER (ORDER BY v) AS cum_o,
             SUM(c_f) OVER (ORDER BY v) AS cum_f,
             SUM(c_o) OVER () AS n_o,
             SUM(c_f) OVER () AS n_f
      FROM per_value
    )
    SELECT CAST(MAX(n_o) AS BIGINT) AS n_open,
           CAST(MAX(n_f) AS BIGINT) AS n_filled,
           ROUND(MAX(ABS(cum_o * 1.0 / n_o - cum_f * 1.0 / n_f)), 6) AS ks_stat
    FROM cdf
    """,
)
def stats_ks_price_drift(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic between the order-price
    distributions of open vs filled orders — the distribution-drift gate a
    pipeline runs between ingest cycles.  Exact-at-scale shape: collapse to
    per-DISTINCT-value group counts first (map-side combine bounds the
    ordered pass by value cardinality, not row count), then one global
    ordered window builds both CDFs and takes the sup-distance.  When value
    cardinality itself is huge, the approximate path is quantile sketches
    (stats_approx_percentile); this is the exact reference for it."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus").isin("O", "F"))
    per_value = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).cast("long").alias("c_o"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("long").alias("c_f"),
    )
    w_ord = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cdf = per_value.select(
        F.sum("c_o").over(w_ord).alias("cum_o"),
        F.sum("c_f").over(w_ord).alias("cum_f"),
        F.sum("c_o").over(w_all).alias("n_o"),
        F.sum("c_f").over(w_all).alias("n_f"),
    )
    return cdf.agg(
        F.max("n_o").cast("long").alias("n_open"),
        F.max("n_f").cast("long").alias("n_filled"),
        F.round(
            F.max(F.abs(F.col("cum_o") / F.col("n_o") - F.col("cum_f") / F.col("n_f"))), 6
        ).alias("ks_stat"),
    )


@register(
    "stats_price_histogram",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / GREATEST((hi - lo) / 20.0, 1e-12)) AS BIGINT), 19) AS bucket,
             o_totalprice, lo, hi
      FROM orders CROSS JOIN bounds
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(lo + bucket * (hi - lo) / 20.0), 4) AS bucket_lo,
           ROUND(MIN(lo + (bucket + 1) * (hi - lo) / 20.0), 4) AS bucket_hi
    FROM binned GROUP BY bucket ORDER BY bucket
    """,
)
def stats_price_histogram(spark, sf_dir):
    """Exact 20-bucket equi-width histogram of order totals (the exact
    counterpart of Spark's approximate ``histogram_numeric``, whose
    NumericHistogram sketch DuckDB cannot replay — exact binning is the
    oracle-able form). Two scans expressed as one aggregate + broadcast:
    the 1-row min/max bounds cross-join into the binning expression, so
    the bucket math is a map stage and the histogram is one 20-key
    aggregate with map-side combine — at 100 TB the second scan is the
    only real cost, and a bounds-from-statistics shortcut (parquet
    footers) can replace the first."""
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # degenerate-input guard (all prices equal): a zero width would make
    # Spark emit NaN (0/0) where DuckDB division-by-zero yields NULL and
    # the two sides diverge; the epsilon floors everything into bucket 0
    # identically on both engines
    width = F.greatest((F.col("hi") - F.col("lo")) / F.lit(20.0), F.lit(1e-12))
    binned = o.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("long"),
            F.lit(19),
        ).alias("bucket"),
        "lo",
        "hi",
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.min(F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / F.lit(20.0)), 4
            ).alias("bucket_lo"),
            F.round(
                F.min(F.col("lo") + (F.col("bucket") + 1) * (F.col("hi") - F.col("lo")) / F.lit(20.0)), 4
            ).alias("bucket_hi"),
        )
        .orderBy("bucket")
    )


@register("stats_hll_mergeable_rollup")  # rows-only: DataSketches HLL binary
# images are engine-specific (DuckDB's approx_count_distinct uses a
# different HLL); the merge-law and accuracy tests pin semantics instead.
def stats_hll_mergeable_rollup(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built
    into Spark): per-day user sketches rolled up into per-event-type
    totals by SKETCH UNION — the cross-batch pattern a 100 TB pipeline
    needs, where yesterday's partials must merge with today's without
    rescanning either (exact COUNT(DISTINCT) cannot merge; a distinct
    count per batch double-counts). Daily partials are tiny fixed-size
    binaries (~KB at lgk=12), so the rollup shuffle carries sketches,
    not user ids."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx_users"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_psi_price_drift",
    oracle="""
    WITH pop AS (
      SELECT o_totalprice AS v, o_orderstatus AS st
      FROM orders WHERE o_orderstatus IN ('O', 'F')
    ), bounds AS (
      SELECT MIN(v) AS lo, MAX(v) AS hi FROM pop
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((v - lo) / GREATEST((hi - lo) / 10.0, 1e-12)) AS BIGINT), 9) AS bucket, st
      FROM pop CROSS JOIN bounds
    ), counts AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f
      FROM binned GROUP BY bucket
    ), tot AS (
      SELECT CAST(SUM(n_o) AS BIGINT) AS t_o, CAST(SUM(n_f) AS BIGINT) AS t_f FROM counts
    ), shares AS (
      SELECT bucket,
             (n_o + 0.5) / (t_o + 5.0) AS p,
             (n_f + 0.5) / (t_f + 5.0) AS q
      FROM counts CROSS JOIN tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(SUM((p - q) * ln(p / q)), 6) AS psi
    FROM shares
    """,
)
def stats_psi_price_drift(spark, sf_dir):
    """Population Stability Index between open vs filled order prices over
    10 equi-width bins (smoothed +0.5/bin so empty bins stay finite) — the
    drift metric model-monitoring pipelines report alongside the KS
    statistic (`stats_ks_price_drift`: exact but needs an ordered pass;
    PSI is a pure binned aggregate). One scan + a broadcast bounds row +
    a 10-key aggregate with map-side combine — at 100 TB the cheapest
    drift gate in the registry."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "F")
    )
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # same degenerate-input guard as stats_price_histogram
    width = F.greatest((F.col("hi") - F.col("lo")) / F.lit(10.0), F.lit(1e-12))
    binned = o.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("long"),
            F.lit(9),
        ).alias("bucket"),
        "o_orderstatus",
    )
    counts = binned.groupBy("bucket").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).cast("long").alias("n_o"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("long").alias("n_f"),
    )
    tot = counts.agg(
        F.sum("n_o").cast("long").alias("t_o"), F.sum("n_f").cast("long").alias("t_f")
    )
    shares = counts.crossJoin(F.broadcast(tot)).select(
        ((F.col("n_o") + 0.5) / (F.col("t_o") + 5.0)).alias("p"),
        ((F.col("n_f") + 0.5) / (F.col("t_f") + 5.0)).alias("q"),
    )
    return shares.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6).alias("psi"),
    )
