"""Query registry: every implemented operator from SURVEY.md §2 as a
(name -> spark callable, name -> oracle SQL) pair consumed by
``__spark_entry__.py``.

The Spark side is DataFrame-first; the oracle side is ANSI SQL that DuckDB
runs over the same parquet tables. Column names/aliases are identical on
both sides (the driver's compare sorts columns by name before hashing).

Float-determinism policy (so Spark and DuckDB hash-match):
* counts and keys: exact integer types;
* money sums: summed as DECIMAL (exact, order-independent) then cast to
  DOUBLE at the edge;
* averages/ratios: computed in DOUBLE, rounded to 4 decimals;
* transcendental projections: rounded to 4 decimals.
"""

from __future__ import annotations

from clustopher_spark.queries.base import ORACLES, QUERIES, register
import clustopher_spark.queries.relational  # noqa: F401  (registers)
import clustopher_spark.queries.tpch_extra  # noqa: F401
import clustopher_spark.queries.sql_features  # noqa: F401
import clustopher_spark.queries.spatial  # noqa: F401
import clustopher_spark.queries.llm  # noqa: F401
import clustopher_spark.queries.events  # noqa: F401
import clustopher_spark.queries.stats  # noqa: F401


# Round-4 window: rounds 1-3 drove ALL 134 oracles through the driver's
# DuckDB gate (CORRECTNESS_r01-03, all green — zero never-checked oracles
# remain). This round's 50 slots = 19 flagship anchors (kept in-window
# every round so a regression in the core surface is always
# driver-visible) + the 8 NEW round-4 oracles + the 23 STALEST re-checks
# (oracles last driver-checked in round 1 and not since: the TPC-H
# battery and the window-function family — freshness rotation now that
# coverage is total). tools/check_window_rotation.py enforces that the
# union of all rounds' windows covers every registered oracle.
_FLAGSHIP_ANCHORS = [
    "spatial_cluster_invariants",   # greedy kernel conservation laws
    "spatial_grid_centroids",       # A2 weighted-centroid algebra
    "spatial_knn_query",            # great-circle kNN (C5/F2)
    "spatial_viewport_filter",      # P5 pushed-filter viewport
    "llm_fingerprint_dedup",        # exact dedup
    "llm_minhash_candidates",       # MinHash+LSH band join
    "llm_simhash_near_pairs",       # SimHash pigeonhole join
    "llm_neardup_groups",           # connected components vs recursive CTE
    "llm_embedding_near_dups",      # embedding cosine near-dup
    # llm_knn_cosine rotated out (driver-green r2; the ANN family
    # keeps llm_embedding_near_dups + recall tests in-window) to
    # seat the new ray-casting polygon-membership oracle
    "spatial_point_in_polygon",     # concave polygons, parity rule
    "llm_pipeline_end_to_end",      # composite pipeline
    "llm_incremental_ingest_dedup", # batch-vs-history anti-join
    # events_tumbling_hourly rotated out (driver-green r2; the events
    # family keeps session windows + as-of in-window) to seat the new
    # point-to-polyline distance oracle
    "spatial_nearest_route_distance",  # map-matching primitive
    "events_session_windows",       # session windows
    "events_asof_last_view_before_purchase",  # as-of join vs DuckDB ASOF
    # events_json_props rotated out (driver-green r2) to seat the
    # span-based grouping oracle (winnow pairs + star CC vs recursive CTE)
    "llm_substring_neardup_groups",
    "stats_percentiles_price",      # W2 percentiles
    # stats_correlation rotated out (driver-green r2) to seat the new
    # round-3 winnowing substring-dedup oracle in this round's window
    "llm_substring_dedup",          # winnowing duplicated-span detection
    "window_gaps_islands",          # round-1 FAIL; stays pinned
]
_R4_ROTATION = [
    # new this round — must be driver-checked in the round they land
    "llm_token_pmi_pairs",
    "join_salted_skew_agg",
    "llm_bm25_retrieval",
    "llm_random_projection",
    "llm_hybrid_retrieval_rrf",
    "llm_dedup_keep_best",
    "llm_token_zipf_fit",
    "llm_cross_corpus_overlap",
    # (window_above_customer_avg, window_order_gaps,
    # window_range_frame_30d, window_running_spend, window_top3_orders_
    # per_customer and window_ranking_family yield their re-check slots
    # to the six oracles above: all were driver-green in round 1 and
    # stay value-verified every run by the local replica,
    # tests/test_oracle_parity.py + tools/strict_parity.py)
    # stalest re-checks: driver-green in round 1 only, untouched since
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority_check",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q7_volume_shipping_pairs",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_by_quantity_band",
    "q13_customer_order_distribution",
    "q14_brand_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "join_range_price_bands",
]
_R4_WINDOW = set(_FLAGSHIP_ANCHORS) | set(_R4_ROTATION)
assert len(_R4_WINDOW) == 50, len(_R4_WINDOW)


def _window_priority(name: str) -> int:
    """Registry order decides which oracles the driver's CORRECTNESS gate
    checks (first 50 oracle-backed entries).

    Tiering (oracle-backed only; rows-only queries go last so they never
    displace an oracle from the window):
      0. the round-4 window (_R4_WINDOW): flagship anchors, new oracles,
         and the stalest re-checks
      1. every other oracle (all driver-green in round 1 or 2 and still
         locally oracle-verified by test_oracle_parity)
      2. rows-only queries
    """
    if name not in ORACLES:
        return 2
    if name in _R4_WINDOW:
        return 0
    return 1


_order = sorted(range(len(QUERIES)), key=lambda i: (_window_priority(list(QUERIES)[i]), i))
_names = list(QUERIES)
QUERIES_ORDERED = {_names[i]: QUERIES[_names[i]] for i in _order}
ORACLES_ORDERED = {n: ORACLES[n] for n in QUERIES_ORDERED if n in ORACLES}
QUERIES.clear()
QUERIES.update(QUERIES_ORDERED)
ORACLES.clear()
ORACLES.update(ORACLES_ORDERED)

__all__ = ["QUERIES", "ORACLES", "register"]
