"""Physical-plan regression guards: the traits that make these queries
scale (documented in PLANS.md / SCALE.md) asserted as tests, so a silent
plan change (lost broadcast, new shuffle, dropped pushdown, extra Python
boundary) fails CI instead of showing up as a 10x at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import os
import re

from pyspark.sql import functions as F

from clustopher_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_of(name: str, spark) -> str:
    return fmt(QUERIES[name](spark, SF_DIR))


def n_nodes(plan: str, op: str) -> int:
    """Count distinct plan nodes of type ``op`` (formatted explain prints
    each node twice: once in the tree, once in the detail section)."""
    return len(set(re.findall(rf"{op}\s+\((\d+)\)", plan)))


def test_star_join_stays_broadcast(spark):
    p = plan_of("q5_revenue_by_nation", spark)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_geofence_join_is_hash_not_nested_loop(spark):
    p = plan_of("spatial_geofence_join", spark)
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_knn_is_take_ordered_no_exchange(spark):
    p = plan_of("spatial_knn_query", spark)
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p          # per-partition top-k + driver merge
    assert n_nodes(p, "Scan parquet") == 1


def test_chunking_is_pure_map_stage(spark):
    p = plan_of("llm_doc_chunking", spark)
    # the only exchange allowed is the presentation sort's range partitioning
    assert n_nodes(p, "Exchange") == 1 and "rangepartitioning" in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_viewport_filter_pushed_to_scan(spark, tmp_path):
    # on a REAL stored points table (the serving layout) the bbox predicate
    # must reach the parquet reader; the registry query derives points
    # arithmetically, so exercise the operator on materialized data
    from clustopher_spark.operators.cluster import filter_viewport
    from clustopher_spark.queries.spatial import points_df

    path = str(tmp_path / "pts")
    points_df(spark, SF_DIR).select("id", "lng", "lat", "value").write.parquet(path)
    p = fmt(filter_viewport(spark.read.parquet(path), -110.0, 30.0, -90.0, 45.0, 6))
    pushed = p.split("PushedFilters")[1][:400]
    assert "GreaterThanOrEqual(lng" in pushed and "LessThanOrEqual(lat" in pushed


def test_flagship_has_exactly_one_python_kernel(spark):
    p = plan_of("spatial_cluster_greedy", spark)
    n_python = (
        n_nodes(p, "ArrowEvalPython")
        + n_nodes(p, "MapInPandas")
        + n_nodes(p, "FlatMapGroupsInPandas")
    )
    assert n_python == 1, p


def test_quality_expectations_no_row_shuffle(spark):
    p = plan_of("stats_quality_expectations", spark)
    # broadcast ref join + scalar aggregate: no hash-partitioned exchange of rows
    assert "hashpartitioning" not in p
    assert "BroadcastHashJoin" in p


def test_quantization_stays_jvm_side(spark):
    p = plan_of("llm_embedding_quantization", spark)
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_heavy_hitters_reuses_exchange_and_take_ordered(spark):
    """One scan feeds both the per-token counts and the grand total (the
    total must come from a ReusedExchange, not a second scan), and the
    top-20 must be TakeOrderedAndProject (per-partition heaps), never a
    global sort."""
    df = QUERIES["llm_token_heavy_hitters"](spark, SF_DIR)
    df.collect()  # AQE: reuse decision lands in the final adaptive plan
    p = df._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]  # AQE prints initial plan too
    assert "ReusedExchange" in final
    assert "TakeOrderedAndProject" in final
    assert final.count("FileScan parquet") == 1


def test_shard_plan_is_single_scan_small_shuffle(spark):
    p = plan_of("llm_corpus_shard_plan", spark)
    assert n_nodes(p, "Scan parquet") == 1
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_histogram_bounds_are_broadcast(spark):
    """The min/max bounds row must broadcast into the binning expression —
    a shuffled or nested-loop bounds join would serialize the second scan."""
    p = plan_of("stats_price_histogram", spark)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_dbscan_no_python_boundary(spark):
    """The DataFrame dbscan RETURNS must stay free of per-row Python and
    quadratic joins in BOTH paths. The round-8 native kernel path runs
    its two pair passes eagerly at construction (like the plan's own
    localCheckpoint), so the returned assembly plan is pure relational
    either way; the SQL path is additionally pinned here with the kernel
    forced off, since it is the at-scale plan past the driver gate."""
    from clustopher_spark.operators.dbscan import dbscan
    from clustopher_spark.queries.spatial import dbscan_points_df

    for kern in ("1", "0"):
        os.environ["CLUSTOPHER_DBSCAN_KERNEL"] = kern
        try:
            p = fmt(dbscan(dbscan_points_df(spark, SF_DIR), eps=300, min_pts=4,
                           x_col="ix", y_col="iy"))
        finally:
            os.environ.pop("CLUSTOPHER_DBSCAN_KERNEL", None)
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
        assert "MapInPandas" not in p and "FlatMapGroupsInPandas" not in p
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_winnowing_substring_dedup_shuffle_shape(spark):
    p = plan_of("llm_substring_dedup", spark)
    # winnow mins are computed map-side over overlapping text segments
    # (array higher-order functions — no gram exchange, no per-doc window
    # sort); the exchanges are the _spread round-robin on raw docs (the
    # hashing stage's parallelism), the fingerprint DISTINCT, the
    # fp-frequency window, the rollup, and the presentation sort: 5
    # total, and the only corpus-sized one carries raw doc rows — the
    # old plan's first exchange carried EVERY gram hash (~len(text) rows
    # per doc); now only distinct fingerprints (density 2/(w+1)) shuffle.
    # No Python boundary, no join, ONE corpus scan.
    assert n_nodes(p, "Exchange") == 5, p
    assert "rangepartitioning" in p      # the presentation sort
    assert "Generate" in p               # explode stays JVM-side
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Join" not in p
    assert n_nodes(p, "Scan parquet") == 1


def test_incremental_ingest_dedup_history_never_shuffled(spark):
    """The batch-vs-history dedup must be the semi-join-reduction plan
    (r4 verdict item 3): the batch's fingerprint set is broadcast and the
    HISTORY scan is pruned map-side — no SortMergeJoin, both the prune and
    the probe are broadcast hash joins, so no exchange ever carries
    O(history) rows (every hashpartitioning exchange in the plan sits on
    a batch-derived or post-prune side)."""
    p = plan_of("llm_incremental_ingest_dedup", spark)
    assert "SortMergeJoin" not in p
    assert re.search(r"BroadcastHashJoin LeftSemi", p), p
    # history prune + final probe: two broadcast joins (the tree line
    # carries the join type, so count those lines, not n_nodes' bare form)
    assert len(re.findall(r"BroadcastHashJoin \w+ Build", p)) == 2, p
    assert "ShuffledHashJoin" not in p


def test_streaming_dedup_index_scan_pruned_broadcast(spark, tmp_path):
    """The streaming LSH index's per-batch dup-detection join (replicated
    here as its static plan — foreachBatch closures can't be explained
    from outside): the INDEX parquet scan must feed broadcast hash joins
    only, never a shuffle — the exchange is O(batch), not O(index)."""
    import random

    from pyspark.sql import functions as F

    from clustopher_spark.functions.dedup import minhash_signatures
    from clustopher_spark.streaming.dedup_index import band_table

    rng = random.Random(3)
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{rng.randrange(200)}" for _ in range(40)))
         for i in range(30)],
        "doc_id long, text string",
    )
    bands_df = band_table(minhash_signatures(docs), 8, 4)
    idx_path = str(tmp_path / "band_idx")
    bands_df.write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    # the exact join chain process_batch builds (dedup_index.py)
    batch_keys = bands_df.select("band_idx", "band_hash").distinct()
    hit_keys = (
        idx.join(F.broadcast(batch_keys), ["band_idx", "band_hash"], "left_semi")
        .distinct()
    )
    dup_ids = (
        bands_df.join(F.broadcast(hit_keys), ["band_idx", "band_hash"], "left_semi")
        .select("id").distinct()
    )
    p = fmt(dup_ids)
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert re.search(r"BroadcastHashJoin LeftSemi", p), p
    assert len(re.findall(r"BroadcastHashJoin \w+ Build", p)) == 2, p
    # and the pruned plan still flags every colliding doc
    assert dup_ids.count() == 30  # self-join vs own index: all collide


def test_merge_table_target_never_shuffled(spark):
    """MergeTable's commit algebra (queries/tables.py -> merge_frames /
    change_feed_frames): the table side must ride broadcast joins only —
    the exchange cost of a MERGE is O(batch) at any table size (the
    touched-file pruning bounds the READ; this bounds the SHUFFLE)."""
    for name in ("catalog_merge_upsert", "catalog_change_feed"):
        p = plan_of(name, spark)
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, name
        assert re.search(r"BroadcastHashJoin LeftAnti", p), name


def test_ivfpq_index_registry_entry_is_partition_pruned(spark):
    """llm_ann_ivfpq_index_topk (the serving twin) queries the prebuilt
    persisted index: the probed list ids must reach the scan as a
    PartitionFilters entry (directory-level pruning), and no KMeans
    retraining happens per call — the second invocation reuses the cached
    index (its plan never scans the raw embeddings table)."""
    plan = plan_of("llm_ann_ivfpq_index_topk", spark)
    assert "PartitionFilters" in plan
    assert "list_id" in plan.split("PartitionFilters", 1)[1][:300]
    # the only embeddings.parquet read is the QUERY-VECTOR fetch, bounded
    # by a pushed vec_id predicate — the corpus side comes from the index
    # store's pruned partitions, never a full corpus scan
    for seg in plan.split("embeddings.parquet")[1:]:
        assert "LessThan(vec_id,5)" in seg[:300]
