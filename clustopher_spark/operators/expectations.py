"""Data-quality expectations: declarative rule audit over any DataFrame.

The pipeline-gate operator a 100 TB ingest needs before training data is
blessed: N predicate rules are evaluated in ONE scan (each rule is a
``sum(case when violated)`` — map-side partial aggregation, no shuffle of
row data, one 1-row partial per task), then pivoted to long form with a
zero-row ``stack``. Referential rules (key exists in a dimension) are
expressed by the caller as a pre-joined column (broadcast anti-join side
channel) so the audit itself stays single-pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectations_audit(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Audit ``df`` against named expectations.

    rules: {rule_name: boolean Column that is True when the row PASSES}.
    Returns one row per rule: (rule, n_violations, n_rows, violation_rate)
    with the rate rounded to 6 decimals.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred in rules.items():
        # NULL predicate result counts as a violation (three-valued logic
        # must not silently pass nulls)
        aggs.append(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)).alias(
                f"_v_{name}"
            )
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', _v_{name}" for name in rules)
    long = wide.selectExpr(
        f"stack({len(rules)}, {stack_args}) as (rule, n_violations)", "_n as n_rows"
    )
    return long.select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias("violation_rate"),
    )


def observed_expectations(df: DataFrame, rules: dict[str, Column]):
    """Zero-extra-scan expectations: attach the same rule counters as
    ``expectations_audit`` to ``df`` as observed metrics, so they are
    computed as a side effect of whatever action the pipeline runs anyway
    (the training-shard write, the dedup count, ...) — no second pass over
    100 TB just to know the violation rates.

    Returns ``(observed_df, observation)``: run any ONE action on
    ``observed_df`` (observed metrics are per-action; reuse requires
    re-attaching), then read ``observation.get`` —
    ``{"n_rows": N, "v_<rule>": count, ...}``. ``expectations_audit`` is
    the standalone-audit form of the same counters (one dedicated scan);
    this is the riding-along form. Counters are plain sum/count aggregates
    evaluated inside the action's own tasks (map-side, no extra shuffle)."""
    from pyspark.sql import Observation

    obs = Observation("expectations")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1))
            .cast("long")
            .alias(f"v_{name}")
        )
    return df.observe(obs, *aggs), obs
