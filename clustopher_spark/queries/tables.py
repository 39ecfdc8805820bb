"""Mutable-table queries: the MERGE (upsert/delete) algebra and its
write-time change-data-feed, oracle-checked against plain-SQL derivations.

The reference's only update story is re-saving a whole dataset
(cluster/storage.go — save-whole/load-whole blobs); `sources/merge_table.py`
replaces that with copy-on-write MERGE + CDF. These registry entries check
the ALGEBRA those commits apply (`merge_frames` / `change_feed_frames`,
the same functions `MergeTable.merge` calls) as pure dataframes over the
driver's tables, so the driver's DuckDB gate value-verifies the semantics
while tests/test_merge_table.py pins the persistence/pruning/vacuum side.

Batch derivation (deterministic from `orders`): target = keys with
``o_orderkey % 4 != 1``; the batch updates keys ``%4==2`` (price +1000),
inserts keys ``%4==1`` (absent from the target), deletes keys ``%4==3``.
All three MERGE arms (matched-update, not-matched-insert, matched-delete)
are therefore non-empty at every sf.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clustopher_spark.queries.base import register, table
from clustopher_spark.sources.merge_table import change_feed_frames, merge_frames

DEC = "decimal(18,2)"

_ORDER_COLS = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
)
_BATCH_CTES = f"""
    target AS (SELECT * FROM orders WHERE o_orderkey % 4 <> 1),
    updates AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 4 = 2),
    inserts AS (SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey % 4 = 1),
    deletes AS (SELECT {_ORDER_COLS} FROM orders WHERE o_orderkey % 4 = 3)
"""


def _target_and_batch(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 4 != 1)
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
    return target, updates.unionByName(inserts).unionByName(deletes)


@register(
    "catalog_merge_upsert",
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_merge_upsert(spark, sf_dir):
    """MERGE semantics (matched-update / not-matched-insert /
    matched-delete in one batch) via the broadcast anti-join + union plan
    `MergeTable.merge` commits — the target side is never shuffled."""
    target, batch = _target_and_batch(spark, sf_dir)
    merged = merge_frames(target, batch, ["o_orderkey"], op_col="op")
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "catalog_change_feed",
    oracle=f"""
    WITH {_BATCH_CTES},
    cdf AS (
        SELECT {_ORDER_COLS}, 'update_pre' AS _change_type
        FROM orders WHERE o_orderkey % 4 = 2
        UNION ALL SELECT {_ORDER_COLS}, 'update_post' FROM updates
        UNION ALL SELECT {_ORDER_COLS}, 'insert' FROM inserts
        UNION ALL SELECT {_ORDER_COLS}, 'delete' FROM deletes)
    SELECT _change_type,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_orderkey) AS n_keys,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM cdf GROUP BY _change_type ORDER BY _change_type
    """,
)
def catalog_change_feed(spark, sf_dir):
    """The row-level change feed a merge commit records (O(batch), captured
    at write time — never a version diff over the table): pre/post images
    for updates, new rows for inserts, old rows for deletes. The oracle
    derives each partition independently from the batch definition, so it
    cross-checks the matched/unmatched join routing in
    `change_feed_frames`."""
    target, batch = _target_and_batch(spark, sf_dir)
    cdf = change_feed_frames(target, batch, ["o_orderkey"], op_col="op")
    return (
        cdf.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_orderkey").alias("n_keys"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
        .orderBy("_change_type")
    )


@register(
    "catalog_incremental_agg",
    # deliberately the SAME oracle as catalog_merge_upsert: incremental
    # maintenance must be value-identical to recomputing the aggregate
    # over the post-merge table — the driver's hash compare IS the
    # IVM-correctness check
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_incremental_agg(spark, sf_dir):
    """Incremental view maintenance (operators/ivm.py): a per-status
    count+sum view advanced by the merge's change feed — cost O(changes +
    affected groups) — must equal the recompute over the merged table.
    Sums ride DECIMAL end-to-end so repeated increments are drift-free."""
    from clustopher_spark.operators.ivm import incremental_count_sum_view

    target, batch = _target_and_batch(spark, sf_dir)
    base = target.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("_tp"),
    )
    cdf = change_feed_frames(target, batch, ["o_orderkey"], op_col="op").withColumn(
        "_tp_src", F.col("o_totalprice").cast(DEC)
    )
    view = incremental_count_sum_view(
        base, cdf, ["o_orderstatus"], {"_tp_src": "_tp"}, count_col="n_orders"
    )
    return view.select(
        "o_orderstatus",
        "n_orders",
        F.col("_tp").cast("double").alias("total_price"),
    ).orderBy("o_orderstatus")


@register(
    "catalog_schema_evolution",
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT {_ORDER_COLS}, NULL AS note FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL
        SELECT {_ORDER_COLS}, 'fix-' || CAST(o_orderkey AS VARCHAR) AS note
        FROM updates
        UNION ALL
        SELECT {_ORDER_COLS}, 'fix-' || CAST(o_orderkey AS VARCHAR) AS note
        FROM inserts)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(note) AS n_noted,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_schema_evolution(spark, sf_dir):
    """Widening MERGE (r5 verdict item 5): the batch carries a column the
    target lacks — kept rows read NULL for it, upserted rows carry their
    values — via the same evolve_target + merge_frames algebra
    MergeTable.merge commits (per-version schemas make time travel read
    old versions under their own schema; tests/test_merge_table.py pins
    the persisted side). COUNT(note) cross-checks exactly which rows got
    the new column."""
    from clustopher_spark.sources.merge_table import evolve_target

    target, batch = _target_and_batch(spark, sf_dir)
    batch = batch.withColumn(
        "note",
        F.concat(F.lit("fix-"), F.col("o_orderkey").cast("string")),
    )
    merged = merge_frames(
        evolve_target(target, batch, "op"), batch, ["o_orderkey"], op_col="op"
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("note").alias("n_noted"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "catalog_incremental_minmax",
    # recompute over the post-merge table — the driver hash-verifies that
    # MIN/MAX maintenance (monotone fast path + bounded dirty-group
    # recompute) equals recompute, the same shared-oracle trick as
    # catalog_incremental_agg
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_incremental_minmax(spark, sf_dir):
    """MIN/MAX view maintenance (operators/ivm.py): the classic
    non-invertible aggregate — inserts advance extrema monotonically
    (table-free); only groups whose removed values tie-or-beat a stored
    extremum are recomputed, through a broadcast semi-join on the dirty
    group keys, so the recompute reads O(affected groups' rows), never
    O(table)."""
    from clustopher_spark.operators.ivm import incremental_min_max_view

    target, batch = _target_and_batch(spark, sf_dir)
    base = target.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    cdf = change_feed_frames(target, batch, ["o_orderkey"], op_col="op")
    post = merge_frames(target, batch, ["o_orderkey"], op_col="op")
    view = incremental_min_max_view(
        base, cdf, post, ["o_orderstatus"], "o_totalprice",
        count_col="n_orders", min_col="min_price", max_col="max_price",
    )
    return view.select(
        "o_orderstatus", "n_orders",
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    ).orderBy("o_orderstatus")


@register(
    "catalog_maintained_minmax",
    # recompute over the table state after BOTH commits — the driver
    # hash-verifies that the DURABLE maintained view (bootstrap + CDC
    # stream drain + per-commit time-traveled dirty recompute) equals
    # recomputing the aggregate over the final table, end to end through
    # real MergeTable commits and a real Structured Streaming drain
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts),
    final AS (SELECT * FROM merged WHERE o_orderkey % 8 <> 1)
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_maintained_minmax(spark, sf_dir):
    """The DURABLE MIN/MAX maintained view (streaming/ivm_view.py::
    MaintainedMinMaxView) over live MergeTable commits: create the table,
    bootstrap the view, commit a mixed merge then a delete wave (keys
    %8==1 — inserted by the first commit, so their removal dirties
    extrema), drain the CDC stream, and return the view. The oracle is a
    pure-SQL recompute of the final table state, so the driver
    hash-verifies the whole loop: write-time CDF -> streaming drain ->
    watermark -> bounded dirty recompute at the time-traveled snapshot.
    Unlike catalog_incremental_minmax (the pure-frame algebra twin), this
    entry exercises the persisted, versioned, exactly-once path."""
    import shutil
    import tempfile

    from clustopher_spark.sources.merge_table import MergeTable
    from clustopher_spark.streaming.ivm_view import MaintainedMinMaxView

    orders = table(spark, sf_dir, "orders")
    target, batch = _target_and_batch(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="clustopher_minmax_view_")
    try:
        root = f"{tmp}/t"
        t = MergeTable(spark, root)
        t.create(target, ["o_orderkey"], num_files=4)
        view = MaintainedMinMaxView(
            spark, f"{tmp}/view", ["o_orderstatus"], "o_totalprice",
            min_col="min_price", max_col="max_price",
        )
        view.bootstrap(t)
        t.merge(batch, op_col="op", batch_id=0)
        t.merge(
            orders.filter(F.col("o_orderkey") % 8 == 1)
            .withColumn("op", F.lit("delete")),
            op_col="op", batch_id=1,
        )
        view.maintain(root, query_name="catalog_maintained_minmax_drain")
        out = view.read().select(
            "o_orderstatus", "n_rows",
            F.col("min_price").cast("double").alias("min_price"),
            F.col("max_price").cast("double").alias("max_price"),
        ).orderBy("o_orderstatus")
        # the view is aggregate-sized: pin it in the block manager so the
        # temp dir can be deleted before the caller collects
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "catalog_incremental_distinct",
    # recompute over the post-merge table — the driver hash-verifies that
    # COUNT(DISTINCT) maintenance via the invertible support relation
    # equals recompute, the shared-oracle trick the count/sum and MIN/MAX
    # entries use
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts)
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_distinct
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_incremental_distinct(spark, sf_dir):
    """COUNT(DISTINCT) view maintenance (operators/ivm.py): the aggregate
    itself is not invertible (removing one copy of a value must not drop
    it while duplicates remain), but its SUPPORT RELATION — one row per
    (group, value) with multiplicity — is: every change image is ±1 on
    exactly one support row, and the distinct count is a projection. The
    support relation is O(distinct (group, value)), never O(table); for
    enormous cardinality it persists as a MergeTable keyed by (group,
    value) and the delta becomes a normal merge."""
    from clustopher_spark.operators.ivm import (
        bootstrap_distinct_support,
        distinct_count_view,
        incremental_distinct_count_view,
    )

    target, batch = _target_and_batch(spark, sf_dir)
    support = bootstrap_distinct_support(target, ["o_orderstatus"], "o_custkey")
    cdf = change_feed_frames(target, batch, ["o_orderkey"], op_col="op")
    support = incremental_distinct_count_view(
        support, cdf, ["o_orderstatus"], "o_custkey"
    )
    return (
        distinct_count_view(support, ["o_orderstatus"], "o_custkey")
        .orderBy("o_orderstatus")
    )


@register(
    "catalog_incremental_moments",
    # recompute over the post-merge table. AVG/STDDEV need no new
    # operator at all: SUM(v*v) is just another sum column for the
    # count+sum machinery, and the moments derive at read time — the
    # entry exists to pin that composition. stddev (not variance) is the
    # hashed output: the variance of ~1e5-scale prices is ~1e10, whose
    # 4-decimal rounding sits below double precision for BOTH engines;
    # its square root rounds stably.
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS std_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_incremental_moments(spark, sf_dir):
    """AVG/STDDEV view maintenance as a pure COMPOSITION of the existing
    count+sum machinery (operators/ivm.py): maintain SUM(v) and SUM(v*v)
    in exact DECIMAL alongside the non-null count, derive mean and
    sample stddev at read time (var = (sum2/m - mean^2) * m/(m-1) — the
    sum2/m - mean^2 form keeps intermediates at the magnitude of the
    answer, so no catastrophic cancellation). Maintenance cost is
    unchanged: O(changes + affected groups) per commit."""
    from clustopher_spark.operators.ivm import (
        bootstrap_count_sum_view,
        incremental_count_sum_view,
    )

    target, batch = _target_and_batch(spark, sf_dir)
    dec = "decimal(28,6)"
    prep = lambda df: df.withColumn(  # noqa: E731
        "_v", F.col("o_totalprice").cast(dec)
    ).withColumn("_v2", (F.col("o_totalprice") * F.col("o_totalprice")).cast(dec))
    base = bootstrap_count_sum_view(
        prep(target), ["o_orderstatus"], {"_v": "_s", "_v2": "_s2"},
        count_col="n_orders",
    )
    cdf = prep(change_feed_frames(target, batch, ["o_orderkey"], op_col="op"))
    view = incremental_count_sum_view(
        base, cdf, ["o_orderstatus"], {"_v": "_s", "_v2": "_s2"},
        count_col="n_orders", keep_state=True,
    )
    m = F.col("_nn__s").cast("double")
    mean = F.col("_s").cast("double") / m
    var = (F.col("_s2").cast("double") / m - mean * mean) * m / (m - F.lit(1.0))
    return view.select(
        "o_orderstatus",
        "n_orders",
        F.round(mean, 4).alias("avg_price"),
        F.round(F.sqrt(var), 4).alias("std_price"),
    ).orderBy("o_orderstatus")


@register(
    "catalog_incremental_topk",
    # recompute over the post-merge table, exploded to (group, rank,
    # value) rows: with duplicate values the rank assignment among equal
    # values is arbitrary in BOTH engines but the row SET is identical,
    # so the driver's sorted hash matches exactly (values are raw table
    # doubles — no arithmetic, no float drift)
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts),
    ranked AS (
        SELECT o_orderstatus,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderstatus ORDER BY o_totalprice DESC
               ) AS rnk,
               o_totalprice AS price
        FROM merged)
    SELECT o_orderstatus, rnk, price
    FROM ranked WHERE rnk <= 5
    ORDER BY o_orderstatus, rnk
    """,
)
def catalog_incremental_topk(spark, sf_dir):
    """TOP-K view maintenance (operators/ivm.py::incremental_top_k_view)
    — the MIN/MAX generalization (MAX is k=1): inserts sort-merge into
    the stored per-group array table-free; only removals that tie-or-beat
    the stored k-th value trigger the bounded dirty-group recompute via a
    broadcast null-safe semi-join (O(affected groups' rows), never
    O(table)). The maintained view is exploded to (group, rank, value)
    rows so DuckDB hash-verifies it equals recomputing the window top-k
    over the post-merge table."""
    from clustopher_spark.operators.ivm import incremental_top_k_view

    k = 5
    target, batch = _target_and_batch(spark, sf_dir)
    base = target.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.slice(
            F.sort_array(F.collect_list("o_totalprice"), asc=False), 1, k
        ).alias("top_k"),
    )
    cdf = change_feed_frames(target, batch, ["o_orderkey"], op_col="op")
    post = merge_frames(target, batch, ["o_orderkey"], op_col="op")
    view = incremental_top_k_view(
        base, cdf, post, ["o_orderstatus"], "o_totalprice", k
    )
    return (
        view.select(
            "o_orderstatus", F.posexplode("top_k").alias("pos", "price")
        )
        .select(
            "o_orderstatus",
            (F.col("pos") + 1).cast("long").alias("rnk"),
            "price",
        )
        .orderBy("o_orderstatus", "rnk")
    )


@register(
    "catalog_maintained_distinct",
    # recompute over the table state after BOTH commits — the driver
    # hash-verifies that the DURABLE COUNT(DISTINCT) maintained view
    # (bootstrap + CDC stream drain + support-relation delta, no table
    # access ever) equals recomputing the aggregate over the final
    # table, end to end through real MergeTable commits and a real
    # Structured Streaming drain
    oracle=f"""
    WITH {_BATCH_CTES},
    merged AS (
        SELECT * FROM target
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM inserts)
          AND o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM inserts),
    final AS (SELECT * FROM merged WHERE o_orderkey % 8 <> 1)
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_distinct
    FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def catalog_maintained_distinct(spark, sf_dir):
    """The DURABLE COUNT(DISTINCT) maintained view (streaming/
    ivm_view.py::MaintainedDistinctView) over live MergeTable commits:
    create the table, bootstrap the view's support relation, commit a
    mixed merge then a delete wave (keys %8==1 — among them whole
    custkeys leave a status, the case where naive count maintenance
    breaks and the support relation's multiplicity-zero rule is what
    keeps the view exact), drain the CDC stream, and return the served
    projection. Unlike catalog_incremental_distinct (the pure-frame
    algebra twin), this entry exercises the persisted, versioned,
    exactly-once path — and unlike the MIN/MAX/TOP-K durable views it
    never reads the table after bootstrap: the support relation is
    invertible, so the feed alone advances it."""
    import shutil
    import tempfile

    from clustopher_spark.sources.merge_table import MergeTable
    from clustopher_spark.streaming.ivm_view import MaintainedDistinctView

    orders = table(spark, sf_dir, "orders")
    target, batch = _target_and_batch(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="clustopher_distinct_view_")
    try:
        root = f"{tmp}/t"
        t = MergeTable(spark, root)
        t.create(target, ["o_orderkey"], num_files=4)
        view = MaintainedDistinctView(
            spark, f"{tmp}/view", ["o_orderstatus"], "o_custkey"
        )
        view.bootstrap(t)
        t.merge(batch, op_col="op", batch_id=0)
        t.merge(
            orders.filter(F.col("o_orderkey") % 8 == 1)
            .withColumn("op", F.lit("delete")),
            op_col="op", batch_id=1,
        )
        view.maintain(root, query_name="catalog_maintained_distinct_drain")
        out = view.read().orderBy("o_orderstatus")
        # the view is aggregate-sized: pin it in the block manager so the
        # temp dir can be deleted before the caller collects
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
