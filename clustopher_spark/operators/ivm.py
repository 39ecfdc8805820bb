"""Incremental view maintenance over a MergeTable change feed.

The consumer side of the write-time CDF (sources/merge_table.py): a
downstream aggregate view (counts + sums per group) is advanced by the
row-level changes of a commit instead of recomputed over the table — the
classic delta-query rewrite (each change contributes ±1 to its group's
count and ±value to its sums; an update is update_pre(-) + update_post(+),
so an in-group update nets to a pure value delta). The reference has
nothing like this — its aggregates are recomputed per request
(cluster/cluster.go metadata summaries); at 100 TB a maintained aggregate
must cost O(changes + affected groups), never O(table).

Scale shape: one O(batch) aggregation of the feed, then a full-outer join
of BASE VIEW against delta — both sides are aggregate-sized (groups), not
table-sized, and the delta side is typically tiny, so Catalyst broadcasts
it. Sums ride whatever type the caller aggregated in; use DECIMAL for
exact drift-free maintenance (the registry query does — float sums
accumulate rounding drift across many increments, the known IVM hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADD = ("insert", "update_post")
_SUB = ("delete", "update_pre")


def agg_delta(
    cdf: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The per-group delta a change feed implies for a count+sum view.

    ``sum_cols`` maps source column -> view column; values should already
    be cast to the view's (exact) sum type by the caller.
    """
    sign = (
        F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
        .when(F.col("_change_type").isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return cdf.groupBy(*group_cols).agg(
        F.sum(sign).alias(count_col),
        *[F.sum(sign * F.col(src)).alias(dst) for src, dst in sum_cols.items()],
    )


def apply_agg_delta(
    base: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """base view ⊕ delta: full-outer on the group key, null-safe addition,
    groups whose count reaches zero disappear (exactly what a recompute
    over the post-merge table would show)."""
    cols = [count_col, *value_cols]
    b, d = base.alias("b"), delta.alias("d")
    # null-safe equality: a NULL group key is a real group in an
    # aggregate view (GROUP BY collects NULLs into one cell); a plain
    # equality join would keep base's and delta's NULL rows separate and
    # the view would drift from recompute on every commit
    cond = None
    for c in group_cols:
        eq = F.col(f"b.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = b.join(d, on=cond, how="full_outer")
    out = joined.select(
        *[
            F.coalesce(F.col(f"b.{c}"), F.col(f"d.{c}")).alias(c)
            for c in group_cols
        ],
        *[
            (
                F.coalesce(F.col(f"b.{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            ).alias(c)
            for c in cols
        ],
    )
    return out.filter(F.col(count_col) > 0)


def incremental_count_sum_view(
    base: DataFrame,
    cdf: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Advance a count+sum aggregate view by one (or many unioned) commit
    change feeds. Equals recomputing the view over the post-merge table —
    pinned by oracle (queries/tables.py::catalog_incremental_agg shares
    its oracle SQL with the direct merge aggregate) and by
    tests/test_merge_table.py against live MergeTable commits."""
    delta = agg_delta(cdf, group_cols, sum_cols, count_col)
    return apply_agg_delta(base, delta, group_cols, list(sum_cols.values()), count_col)
