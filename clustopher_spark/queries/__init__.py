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

__all__ = ["QUERIES", "ORACLES", "register"]
