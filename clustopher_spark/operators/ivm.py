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

NULL-sum semantics: SQL's SUM over a group whose values are all NULL is
NULL, not 0 — a maintained view must preserve that or it drifts from the
recompute oracle. The delta therefore tracks a per-sum-column NON-NULL
COUNT (``_nn_{col}``) and the applied sum goes back to NULL when the
group's non-null count reaches zero. For exact maintenance across deletes
of non-null rows, seed the view with :func:`bootstrap_count_sum_view`
(which materializes the non-null counts) and chain with
``keep_state=True``; a base WITHOUT state columns gets them synthesized
(``0`` when the base sum is NULL — exact, since SUM is NULL iff no
non-null input — else the group's row count), which is exact unless a
group mixes NULL and non-NULL values AND a delete later removes non-null
rows from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ADD = ("insert", "update_post")
_SUB = ("delete", "update_pre")


def _nn(col: str) -> str:
    return f"_nn_{col}"


def _ns_cond(lalias: str, ralias: str, cols: list[str]):
    """Null-safe equality over ``cols`` between two aliased frames — THE
    group-key join condition for every IVM join in this module (a NULL
    group key is a real group; plain equality would silently split or
    drop it — the round-7 advice bug class)."""
    cond = None
    for c in cols:
        eq = F.col(f"{lalias}.{c}").eqNullSafe(F.col(f"{ralias}.{c}"))
        cond = eq if cond is None else (cond & eq)
    return cond


def bootstrap_count_sum_view(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Seed a maintainable count+sum view from a full table scan: the
    caller's aggregate plus the per-sum-column non-null counts
    (``_nn_{col}``) that make NULL-sum maintenance exact under deletes.
    ``sum_cols`` maps source column -> view column (same contract as
    :func:`incremental_count_sum_view`)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(F.col(src)).alias(dst) for src, dst in sum_cols.items()],
        *[
            F.count(F.col(src)).alias(_nn(dst))
            for src, dst in sum_cols.items()
        ],
    )


def agg_delta(
    cdf: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The per-group delta a change feed implies for a count+sum view.

    ``sum_cols`` maps source column -> view column; values should already
    be cast to the view's (exact) sum type by the caller. Alongside each
    sum delta rides its non-null-count delta (``_nn_{col}``) so the apply
    step can distinguish a zero sum from an all-NULL group.
    """
    sign = (
        F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
        .when(F.col("_change_type").isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    return cdf.groupBy(*group_cols).agg(
        F.sum(sign).alias(count_col),
        *[F.sum(sign * F.col(src)).alias(dst) for src, dst in sum_cols.items()],
        *[
            F.sum(sign * F.col(src).isNotNull().cast("int")).alias(_nn(dst))
            for src, dst in sum_cols.items()
        ],
    )


def apply_agg_delta(
    base: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    count_col: str = "n_rows",
    keep_state: bool = False,
) -> DataFrame:
    """base view ⊕ delta: full-outer on the group key, null-safe addition,
    groups whose count reaches zero disappear, and a sum whose group has
    no non-null values left goes back to NULL (exactly what a recompute
    over the post-merge table would show).

    ``delta`` must carry ``_nn_{col}`` columns (it does when produced by
    :func:`agg_delta`). If ``base`` lacks them (a plain aggregate was
    passed), they are synthesized — see the module docstring for when
    that synthesis is exact. ``keep_state=True`` keeps the ``_nn_``
    columns in the output so the view can be chained exactly.
    """
    has_state = all(_nn(c) in base.columns for c in value_cols)
    if not has_state:
        # SUM is NULL iff the group had no non-null input, so NULL -> 0 is
        # exact; a non-null sum came from >=1 and at most count_col
        # non-null rows — use the row count (exact for groups without NULL
        # values, an overcount only for mixed groups, documented above)
        base = base.select(
            "*",
            *[
                F.when(F.col(c).isNull(), F.lit(0))
                .otherwise(F.col(count_col))
                .cast("long")
                .alias(_nn(c))
                for c in value_cols
            ],
        )
    b, d = base.alias("b"), delta.alias("d")
    joined = b.join(d, on=_ns_cond("b", "d", group_cols), how="full_outer")
    nn_sum = {
        c: (
            F.coalesce(F.col(f"b.{_nn(c)}"), F.lit(0))
            + F.coalesce(F.col(f"d.{_nn(c)}"), F.lit(0))
        )
        for c in value_cols
    }
    out = joined.select(
        *[
            F.coalesce(F.col(f"b.{c}"), F.col(f"d.{c}")).alias(c)
            for c in group_cols
        ],
        (
            F.coalesce(F.col(f"b.{count_col}"), F.lit(0))
            + F.coalesce(F.col(f"d.{count_col}"), F.lit(0))
        ).alias(count_col),
        *[
            F.when(
                nn_sum[c] > 0,
                F.coalesce(F.col(f"b.{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.{c}"), F.lit(0)),
            ).alias(c)
            for c in value_cols
        ],
        *([nn_sum[c].alias(_nn(c)) for c in value_cols] if keep_state else []),
    )
    return out.filter(F.col(count_col) > 0)


def incremental_count_sum_view(
    base: DataFrame,
    cdf: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    keep_state: bool = False,
) -> DataFrame:
    """Advance a count+sum aggregate view by one (or many unioned) commit
    change feeds. Equals recomputing the view over the post-merge table —
    pinned by oracle (queries/tables.py::catalog_incremental_agg shares
    its oracle SQL with the direct merge aggregate) and by
    tests/test_merge_table.py against live MergeTable commits. For exact
    NULL-sum maintenance under deletes, seed the base with
    :func:`bootstrap_count_sum_view` and pass ``keep_state=True``."""
    delta = agg_delta(cdf, group_cols, sum_cols, count_col)
    return apply_agg_delta(
        base, delta, group_cols, list(sum_cols.values()), count_col,
        keep_state=keep_state,
    )


def incremental_min_max_view(
    base: DataFrame,
    cdf: DataFrame,
    post_table: DataFrame,
    group_cols: list[str],
    value_col: str,
    count_col: str = "n_rows",
    min_col: str = "v_min",
    max_col: str = "v_max",
) -> DataFrame:
    """Maintain a per-group COUNT/MIN/MAX view across a commit's change
    feed — the classic NOT-trivially-maintainable aggregate (MIN/MAX are
    not group-invertible: removing the current extremum forgets what the
    runner-up was).

    The scale-correct split:

    * **inserts / update_post** advance MIN/MAX monotonically — a pure
      aggregate-sized merge, no table access;
    * **deletes / update_pre** that do NOT touch a group's current
      extremum leave MIN/MAX valid — also table-free;
    * only groups where a removed value ties-or-beats the stored
      extremum are DIRTY and recomputed from ``post_table`` — scanned
      through a BROADCAST semi-join on the dirty group keys (the
      ingest-dedup reduction), so the recompute reads O(affected
      groups' rows), never O(table). Dirty groups are bounded by the
      groups the batch touches, i.e. O(batch).

    ``post_table`` must be the POST-commit table (e.g. ``t.read()``
    after the merge, or ``merge_frames(...)`` in pure-frame form). NULL
    values follow SQL MIN/MAX semantics (ignored; a group with no
    non-null values has NULL extrema). Equals recomputing the view —
    pinned by the shared-oracle registry entry and tests.
    """
    v = F.col(value_col)
    add = cdf.filter(F.col("_change_type").isin(*_ADD))
    sub = cdf.filter(F.col("_change_type").isin(*_SUB))
    add_agg = add.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_a_n"),
        F.min(v).alias("_a_min"),
        F.max(v).alias("_a_max"),
    )
    sub_agg = sub.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_s_n"),
        F.min(v).alias("_s_min"),
        F.max(v).alias("_s_max"),
    )

    b, a = base.alias("b"), add_agg.alias("a")
    j1 = b.join(a, on=_ns_cond("b", "a", group_cols), how="full_outer").select(
        *[
            F.coalesce(F.col(f"b.{c}"), F.col(f"a.{c}")).alias(c)
            for c in group_cols
        ],
        F.col(f"b.{count_col}").alias("_b_n"),
        F.col(f"b.{min_col}").alias("_b_min"),
        F.col(f"b.{max_col}").alias("_b_max"),
        "_a_n", "_a_min", "_a_max",
    )
    j = j1.alias("j").join(
        sub_agg.alias("s"), on=_ns_cond("j", "s", group_cols), how="left_outer"
    )
    n_new = (
        F.coalesce(F.col("_b_n"), F.lit(0))
        + F.coalesce(F.col("_a_n"), F.lit(0))
        - F.coalesce(F.col("_s_n"), F.lit(0))
    )
    # a removal dirties the group when it ties-or-beats a stored
    # extremum (tie included: a duplicate of the max may remain — only a
    # recompute can tell); removals from a group the base never saw
    # (insert+delete composed upstream) cannot occur in one commit's
    # feed, but a NULL-valued removal never dirties (MIN/MAX ignore it)
    dirty = (
        F.col("_s_n").isNotNull()
        & (
            (F.col("_s_min") <= F.col("_b_min"))
            | (F.col("_s_max") >= F.col("_b_max"))
            | F.col("_b_min").isNull()
        )
    )
    merged = j.select(
        *[F.col(f"j.{c}").alias(c) for c in group_cols],
        n_new.alias(count_col),
        F.least(F.col("_b_min"), F.col("_a_min")).alias(min_col),
        F.greatest(F.col("_b_max"), F.col("_a_max")).alias(max_col),
        F.coalesce(dirty, F.lit(False)).alias("_dirty"),
    ).filter(F.col(count_col) > 0)
    merged = merged.localCheckpoint(eager=True)
    dirty_keys = merged.filter(F.col("_dirty")).select(*group_cols)
    if not dirty_keys.take(1):
        return merged.drop("_dirty")
    # bounded recompute: ONLY the dirty groups' rows leave the scan —
    # the dirty key set is batch-bounded, so it broadcasts. Null-safe
    # condition, same as every other group-key join in this module: a
    # NULL group key is a real group, and `on=group_cols` (null-rejecting
    # equality) would silently drop a NULL-keyed group the moment it
    # turns dirty (e.g. a delete removes its stored extremum).
    recomputed = (
        post_table.alias("t")
        .join(
            F.broadcast(dirty_keys.alias("k")),
            on=_ns_cond("t", "k", group_cols),
            how="left_semi",
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias(count_col),
            F.min(v).alias(min_col),
            F.max(v).alias(max_col),
        )
    )
    clean = merged.filter(~F.col("_dirty")).drop("_dirty")
    return clean.unionByName(recomputed)


def bootstrap_distinct_support(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    mult_col: str = "_mult",
) -> DataFrame:
    """Seed the SUPPORT RELATION for a maintainable COUNT(DISTINCT) view:
    one row per (group, value) with its multiplicity. COUNT(DISTINCT) is
    not directly invertible (removing one copy of a value must not drop
    it while duplicates remain), but the support relation IS — every
    change image contributes ±1 to exactly one (group, value) row — and
    the distinct count is a trivial projection of it. NULL values ride
    along (they track group existence) but never count as distinct, per
    SQL semantics."""
    return df.groupBy(*group_cols, F.col(value_col)).agg(
        F.count(F.lit(1)).alias(mult_col)
    )


def incremental_distinct_count_view(
    support: DataFrame,
    cdf: DataFrame,
    group_cols: list[str],
    value_col: str,
    mult_col: str = "_mult",
) -> DataFrame:
    """Advance a COUNT(DISTINCT) support relation by one (or many
    unioned) commit change feeds. Returns the NEW support relation —
    chain it across commits, and project the view with
    :func:`distinct_count_view` (group, n_rows, n_distinct), which
    equals recomputing ``SELECT g, COUNT(*), COUNT(DISTINCT v)`` over
    the post-merge table (pinned by the shared-oracle registry entry).

    Scale shape: the support relation is O(distinct (group, value))
    rows — larger than an aggregate view but far smaller than the table
    whenever values repeat; for enormous value cardinality, persist it
    AS a MergeTable keyed by (group, value) and this delta becomes a
    normal merge (the maintained-view module's standing advice). The
    delta itself is one O(batch) aggregation plus a full-outer join
    against the support relation on (group, value) — both sides
    support-sized, the delta side batch-sized, so Catalyst broadcasts
    it."""
    sign = (
        F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
        .when(F.col("_change_type").isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    delta = cdf.groupBy(*group_cols, F.col(value_col)).agg(
        F.sum(sign).alias("_d")
    )
    keys = [*group_cols, value_col]
    s, d = support.alias("s"), delta.alias("d")
    # null-safe on every key: a NULL group key is a real group AND a NULL
    # value is a real support row (it carries group existence)
    joined = s.join(d, on=_ns_cond("s", "d", keys), how="full_outer")
    out = joined.select(
        *[F.coalesce(F.col(f"s.{c}"), F.col(f"d.{c}")).alias(c) for c in keys],
        (
            F.coalesce(F.col(f"s.{mult_col}"), F.lit(0))
            + F.coalesce(F.col("d._d"), F.lit(0))
        ).alias(mult_col),
    )
    # multiplicity zero = the value left the group entirely (negative is
    # impossible for a feed consistent with the table it came from)
    return out.filter(F.col(mult_col) > 0)


def distinct_count_view(
    support: DataFrame,
    group_cols: list[str],
    value_col: str,
    mult_col: str = "_mult",
    count_col: str = "n_rows",
    distinct_col: str = "n_distinct",
) -> DataFrame:
    """Project (group, n_rows, n_distinct) from a support relation:
    n_rows = SUM(multiplicity) (COUNT(*) of the underlying table),
    n_distinct = support rows with a non-null value (COUNT(DISTINCT v)
    ignores NULLs; a group of only NULL values exists with 0)."""
    return support.groupBy(*group_cols).agg(
        F.sum(mult_col).alias(count_col),
        F.sum(F.col(value_col).isNotNull().cast("int")).alias(distinct_col),
    )


def incremental_top_k_view(
    base: DataFrame,
    cdf: DataFrame,
    post_table: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    count_col: str = "n_rows",
    topk_col: str = "top_k",
) -> DataFrame:
    """Maintain a per-group COUNT + TOP-K-VALUES view across a commit's
    change feed — the generalization of :func:`incremental_min_max_view`
    (MAX is k=1): the stored array of the k largest non-null values is
    not invertible (removing a member forgets the runner-up), so the
    maintenance splits the same way:

    * **inserts / update_post** merge monotonically — sort-merge the
      stored array with the batch's per-group top-k and keep the first
      k, a pure aggregate-sized array op, no table access;
    * **deletes / update_pre** below the stored k-th value cannot touch
      the array — table-free;
    * a removal that TIES-OR-BEATS the stored k-th value (or hits a
      group whose stored array is shorter than k, i.e. the array IS the
      group's whole non-null multiset) marks the group DIRTY, recomputed
      from ``post_table`` through a broadcast null-safe semi-join on the
      batch-bounded dirty key set — O(affected groups' rows), never
      O(table).

    Soundness under a multi-commit feed (the maintained-view drain):
    merging adds can only move the k-th threshold UP, so any removed
    value that could sit in the naively-merged array is >= the BASE
    k-th value and therefore dirties the group — the same
    self-dirtying argument as MIN/MAX update chains.

    ``base`` carries (group_cols..., count_col, topk_col:
    array<value> sorted descending); seed it with
    ``df.groupBy(...).agg(F.count(F.lit(1)), F.slice(F.sort_array(
    F.collect_list(v), asc=False), 1, k))``. NULL values never enter
    the array (SQL aggregate semantics) but do count rows. Equals
    recomputing the view — pinned by the registry oracle and tests.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    v = F.col(value_col)
    add = cdf.filter(F.col("_change_type").isin(*_ADD))
    sub = cdf.filter(F.col("_change_type").isin(*_SUB))
    add_agg = add.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_a_n"),
        F.slice(F.sort_array(F.collect_list(v), asc=False), 1, k).alias("_a_top"),
    )
    sub_agg = sub.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_s_n"),
        F.max(v).alias("_s_max"),
    )

    b, a = base.alias("b"), add_agg.alias("a")
    empty = F.array().cast(f"array<{dict(base.dtypes)[topk_col][6:-1]}>")
    j1 = b.join(a, on=_ns_cond("b", "a", group_cols), how="full_outer").select(
        *[
            F.coalesce(F.col(f"b.{c}"), F.col(f"a.{c}")).alias(c)
            for c in group_cols
        ],
        F.col(f"b.{count_col}").alias("_b_n"),
        F.col(f"b.{topk_col}").alias("_b_top"),
        "_a_n", "_a_top",
    )
    j = j1.alias("j").join(
        sub_agg.alias("s"), on=_ns_cond("j", "s", group_cols), how="left_outer"
    )
    n_new = (
        F.coalesce(F.col("_b_n"), F.lit(0))
        + F.coalesce(F.col("_a_n"), F.lit(0))
        - F.coalesce(F.col("_s_n"), F.lit(0))
    )
    merged_top = F.slice(
        F.sort_array(
            F.concat(
                F.coalesce(F.col("_b_top"), empty),
                F.coalesce(F.col("_a_top"), empty),
            ),
            asc=False,
        ),
        1,
        k,
    )
    # a removal dirties the group when the stored array cannot prove it
    # unaffected: the array is shorter than k (it IS the group's whole
    # non-null multiset — a non-null removal is in it), the group is new
    # to the base, or the removed max ties-or-beats the stored k-th
    # value (tie included: which copy left is unknowable from values).
    # A NULL-valued removal never dirties a FULL array (_s_max NULL ->
    # comparison NULL -> coalesced False); on a short array it triggers
    # a recompute that is merely unnecessary, not wrong. element_at is
    # guarded by an explicit CASE branch (not OR ordering): only a
    # non-null array of size >= k >= 1 ever reaches it, so correctness
    # does not depend on Or's undocumented left-to-right short-circuit
    # (the round-7 advice finding — INVALID_INDEX_OF_ZERO on an empty
    # array if an optimizer ever reorders the disjuncts).
    dirty = F.col("_s_n").isNotNull() & F.coalesce(
        F.when(
            F.col("_b_top").isNotNull() & (F.size("_b_top") >= F.lit(k)),
            F.col("_s_max") >= F.element_at("_b_top", F.size("_b_top")),
        ).otherwise(F.lit(True)),
        F.lit(False),
    )
    merged = j.select(
        *[F.col(f"j.{c}").alias(c) for c in group_cols],
        n_new.alias(count_col),
        merged_top.alias(topk_col),
        # dirty is already never-NULL (isNotNull & a coalesced inner)
        dirty.alias("_dirty"),
    ).filter(F.col(count_col) > 0)
    merged = merged.localCheckpoint(eager=True)
    dirty_keys = merged.filter(F.col("_dirty")).select(*group_cols)
    if not dirty_keys.take(1):
        return merged.drop("_dirty")
    recomputed = (
        post_table.alias("t")
        .join(
            F.broadcast(dirty_keys.alias("dk")),
            on=_ns_cond("t", "dk", group_cols),
            how="left_semi",
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias(count_col),
            F.slice(F.sort_array(F.collect_list(v), asc=False), 1, k).alias(topk_col),
        )
    )
    clean = merged.filter(~F.col("_dirty")).drop("_dirty")
    return clean.unionByName(recomputed)
