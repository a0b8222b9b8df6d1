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


class CrashOnce:
    """Crash-injection hook shared by every maintenance-sink test:
    raises once at the given epoch (after the sink's writes, before
    Spark commits the offset — the worst-case window), then lets the
    recovery run drain."""

    def __init__(self, at_epoch: int):
        self.at_epoch = at_epoch
        self.fired = False

    def __call__(self, epoch_id: int) -> None:
        if epoch_id == self.at_epoch and not self.fired:
            self.fired = True
            raise RuntimeError(f"injected crash after epoch {epoch_id}")


def drain_to_exception(q):
    """Wait out a (possibly crashing) streaming query; returns its
    exception (None for a clean drain)."""
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    return q.exception()
