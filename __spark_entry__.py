"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 (registry in ``clustopher_spark.queries``); ``entry`` runs the
flagship viewport cluster query (the reference's hot path,
cluster/cluster.go:867-956) on sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
# Spark python workers must also be able to import clustopher_spark
# (applyInPandas kernels are pickled by module reference).
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    if REPO_ROOT not in os.environ.get("PYTHONPATH", "")
    else os.environ["PYTHONPATH"]
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: greedy viewport clustering."""
    from clustopher_spark.queries import QUERIES

    return QUERIES["spatial_cluster_greedy"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from clustopher_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from clustopher_spark.queries import ORACLES

    return dict(ORACLES)
