"""Shared fixtures: one session-scoped SparkSession + sf-dir paths."""

from __future__ import annotations

import os

import pytest

from customer_churn_prediction_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_TEST = os.environ.get("SPARK_GRAFT_TEST_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ccp-spark-tests", master="local[8]",
                      shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_TEST


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE
