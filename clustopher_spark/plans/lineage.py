"""Lineage truncation for iterative DataFrame algorithms.

``Dataset.localCheckpoint`` truncates the RDD lineage but copies the
ORIGIN plan's statistics onto the resulting ``LogicalRDD``
(``LogicalRDD.rewriteStatsAndConstraints``). Size estimates multiply
through joins, so an iterative algorithm that checkpoints a join output
every round builds a ``sizeInBytes`` BigInteger whose digit count grows
geometrically with rounds — label propagation with a pointer-jump step
(3 joins/round) quadruples the digits per round, and by round ~8 the
driver burns minutes inside ``BigInteger.multiply`` in the size-only
stats visitor (observed via jstack: ``multiplyToomCook3`` under
``SizeInBytesOnlyStatsPlanVisitor`` under ``Dataset.checkpoint``).

``truncate_lineage`` rebuilds the DataFrame over the already-checkpointed
RDD through ``SparkSession.internalCreateDataFrame`` (JVM-side, no rows
cross to Python), which resets the estimate to the session default and
keeps per-round planning O(plan size). The estimate reset is harmless
here: every join against a loop-carried frame in this codebase carries an
explicit ``F.broadcast`` hint, so nothing relies on the inherited
estimate for join-strategy selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` + plan-statistics reset.

    Use instead of a bare ``localCheckpoint`` whenever the checkpoint
    output feeds the NEXT iteration of a loop (label propagation,
    frontier expansion); for one-shot checkpoints the bare call is fine.
    Falls back to the plain checkpoint if the private JVM constructor is
    unavailable (e.g. Spark Connect, where plans never carry BigInt
    stats driver-side in the first place).
    """
    ck = df.localCheckpoint(eager=True)
    try:
        jdf = ck._jdf
        spark = df.sparkSession
        jrdd = jdf.queryExecution().toRdd()
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover - non-classic sessions
        return ck
