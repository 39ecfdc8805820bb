"""Viewport-wide statistics rollup (reference ``CalculateMetadataSummary``,
cluster/helpers.go:142-344 — SURVEY.md A5).

Second-stage aggregation over a cluster result set:

* counts: total points, #clusters (``point_count > 1``), #singles;
* per metric: min / max / sum / average of the per-cluster metric values
  (``MetricStats``, cluster/helpers.go:23-28);
* per metadata key, typed dispatch: numeric -> count-weighted range,
  timestamp -> earliest/latest, categorical -> count-weighted percentage
  distribution (the reference re-merges the A3 frequency maps weighted by
  cluster Count, cluster/helpers.go:236-275 — we merge the mergeable
  *count* state instead, which is the same algebra without the lossy
  intermediate normalize).

All plain Catalyst group-bys; when run directly over raw points this whole
module is one partial+final aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_counts(clusters: DataFrame) -> DataFrame:
    """(total_points, num_clusters, num_single_points) over a cluster set."""
    return clusters.agg(
        F.coalesce(F.sum("point_count"), F.lit(0)).cast("long").alias("total_points"),
        F.count(F.when(F.col("point_count") > 1, 1)).alias("num_clusters"),
        F.count(F.when(F.col("point_count") == 1, 1)).alias("num_single_points"),
    )


def metric_stats(clusters: DataFrame, metric_cols: list[str]) -> DataFrame:
    """Long-form (metric, min, max, sum, average) across cluster rows.

    Matches the reference's per-cluster-value stats (helpers.go:303-311):
    min/max are over the *cluster-level* sums, not raw points.
    """
    stats = []
    for m in metric_cols:
        col = f"sum_{m}" if f"sum_{m}" in clusters.columns else m
        stats.append(
            clusters.agg(
                F.lit(m).alias("metric"),
                F.min(col).alias("min"),
                F.max(col).alias("max"),
                F.sum(col).alias("sum"),
                F.avg(col).alias("average"),
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


def categorical_distribution(meta_counts: DataFrame) -> DataFrame:
    """Viewport-wide percentage distribution per metadata key.

    Input: the mergeable (cluster_id, key, value, cnt) state (A3 partials).
    Output: (key, value, percentage) with percentages summing to 100 per key
    (reference emits percentages, helpers.go:272-275).
    """
    totals = meta_counts.groupBy("key", "value").agg(F.sum("cnt").alias("cnt"))
    key_totals = totals.groupBy("key").agg(F.sum("cnt").alias("total"))
    return totals.join(key_totals, "key").select(
        "key", "value", (F.col("cnt") / F.col("total") * 100.0).alias("percentage")
    )


def numeric_range(points: DataFrame, cols: list[str]) -> DataFrame:
    """(key, min, max, average) per numeric metadata column, weighted by
    num_points when present (reference count-weighted range, helpers.go:283-301)."""
    w = (
        F.col("num_points").cast("double")
        if "num_points" in points.columns
        else F.lit(1.0)
    )
    parts = []
    for c in cols:
        parts.append(
            points.agg(
                F.lit(c).alias("key"),
                F.min(c).cast("double").alias("min"),
                F.max(c).cast("double").alias("max"),
                (F.sum(F.col(c) * w) / F.sum(w)).alias("average"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def time_range(points: DataFrame, ts_col: str) -> DataFrame:
    """(earliest, latest) over a timestamp column (RFC3339 re-parsing in the
    reference, helpers.go:226-256, is obsolete: we parse once at ingest)."""
    return points.agg(
        F.min(ts_col).alias("earliest"), F.max(ts_col).alias("latest")
    )
