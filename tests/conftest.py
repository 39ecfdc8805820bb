from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("CLUSTOPHER_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("CLUSTOPHER_SHUFFLE_PARTITIONS", "8")
    from clustopher_spark.session import get_spark

    spark = get_spark(app_name="clustopher-tests", master="local[4]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from clustopher_spark.session import load_tables

    return load_tables(spark, SF_DIR)
