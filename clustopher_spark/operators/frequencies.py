"""Metadata frequency aggregation (reference ``CalculateFrequencies``,
cluster/cluster.go:210-289 — SURVEY.md A3).

Per cluster, per metadata key, per distinct value: relative frequency
``weight / total_weight``. The reference counts each member once; we weight
by ``num_points`` so the operator stays *closed* under the zoom hierarchy
(a level-N cluster row represents ``num_points`` original points — this is
exactly the count-weighted re-merge the reference performs at summary time,
cluster/helpers.go:236-275). For raw points (``num_points = 1``) the two
definitions coincide.

Everything here is pure Catalyst: melt via ``explode`` of a struct array,
group-by partial aggregation, a window for normalization, and
``map_from_entries`` for the nested-map output shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def melt_metadata(points: DataFrame, meta_cols: list[str], id_col: str = "cluster_id") -> DataFrame:
    """Wide categorical columns -> long (id, key, value, weight) rows.

    NULL values are dropped (missing metadata tolerated, reference
    cluster/cluster_test.go:360-401: frequencies over present values only).
    """
    weight = (
        F.col("num_points").cast("double")
        if "num_points" in points.columns
        else F.lit(1.0)
    )
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.col(k).cast("string").alias("value"))
            for k in meta_cols
        ]
    )
    kv = points.select(F.col(id_col), weight.alias("w"), F.explode(pairs).alias("kv"))
    return kv.select(
        id_col, F.col("kv.key").alias("key"), F.col("kv.value").alias("value"), "w"
    ).filter(F.col("value").isNotNull())


def metadata_counts(
    points_with_cluster: DataFrame, meta_cols: list[str], id_col: str = "cluster_id"
) -> DataFrame:
    """(cluster_id, key, value, cnt) — the mergeable partial state.

    Summing ``cnt`` is associative, so counts roll up through zoom levels
    (partial+final aggregation, SURVEY.md A5 note).
    """
    melted = melt_metadata(points_with_cluster, meta_cols, id_col)
    return melted.groupBy(id_col, "key", "value").agg(F.sum("w").alias("cnt"))


def frequencies_from_counts(counts: DataFrame, id_col: str = "cluster_id") -> DataFrame:
    """Normalize counts to relative frequencies per (cluster, key)."""
    w = Window.partitionBy(id_col, "key")
    return counts.withColumn("freq", F.col("cnt") / F.sum("cnt").over(w))


def frequencies_as_map(freq_rows: DataFrame, id_col: str = "cluster_id") -> DataFrame:
    """Assemble (cluster_id, meta_freq MAP<STRING, MAP<STRING,DOUBLE>>) —
    the reference's ``map[string]json.RawMessage`` output shape
    (cluster/cluster.go:449-450) without the JSON round-trip.
    """
    per_key = freq_rows.groupBy(id_col, "key").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("value", "freq")))
        ).alias("freq_map")
    )
    # no sort_array here: structs containing MAP are not orderable in Spark;
    # map equality is content-based so ordering is immaterial.
    return per_key.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("key", "freq_map"))).alias("meta_freq")
    )
