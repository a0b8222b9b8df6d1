"""hourly_anomalies (operators/anomaly.py) — staged registry candidate;
oracle parity at driver rigor plus detection semantics on a constructed
spike."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import anomaly

from .oracle_utils import assert_matches_oracle


def test_anomaly_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        anomaly.hourly_anomalies(spark, sf_dir),
        anomaly.ANOMALY_ORACLE,
        sf_dir,
    )


def test_constructed_spike_is_flagged(spark, sf_dir, tmp_path):
    """Steady traffic with one 10x-hour: exactly that hour flags."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(72):
        # steady 50/hour with a deterministic +/-1 wiggle (zero
        # variance would leave var=0 -> unscored by design)
        n = 50 + (h % 3) - 1
        if h == 60:
            n = 500
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, seconds=i), 1,
                         "view", 1.0, "{}"))
            eid += 1
    src = str(tmp_path / "spike")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.parquet(
            f"{src}/{t}.parquet"
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{src}/events.parquet")
    out = anomaly.hourly_anomalies(spark, src).collect()
    flagged = [r.hour for r in out if r.is_anomaly == 1]
    assert flagged == [base + dt.timedelta(hours=60)]
    # warm-up respected: first scored hour is MIN_TRAIL in
    assert min(r.hour for r in out) == base + dt.timedelta(
        hours=anomaly.MIN_TRAIL
    )


def test_windows_run_over_aggregate_not_events(spark, sf_dir):
    """The unpartitioned window is fine ONLY because it runs over the
    hourly aggregate (≤ |hours| rows): assert the executed plan sorts
    after the aggregate, and that the single event scan feeds one
    aggregate."""
    df = anomaly.hourly_anomalies(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet ") == 1
    assert "Window" in plan
    # the window's sort consumes the aggregate output, not raw events:
    # events carry event_id/user_id columns; the sort node must not
    assert "Sort [hour" in plan


def test_total_outage_hour_is_flagged(spark, sf_dir, tmp_path):
    """A dead hour produces NO aggregate row; the dense hour spine
    must still score it (n_events=0) and flag the outage."""
    base = dt.datetime(2024, 4, 1)
    rows = []
    eid = 0
    for h in range(72):
        if h == 60:
            continue  # total outage: zero events this hour
        n = 50 + (h % 3) - 1
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, seconds=i), 1,
                         "view", 1.0, "{}"))
            eid += 1
    src = str(tmp_path / "outage")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).write.parquet(
            f"{src}/{t}.parquet"
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{src}/events.parquet")
    out = {r.hour: r for r in anomaly.hourly_anomalies(spark, src).collect()}
    dead = base + dt.timedelta(hours=60)
    assert dead in out, "outage hour missing from the densified series"
    assert out[dead].n_events == 0
    assert out[dead].is_anomaly == 1
    # and the full spine is contiguous
    hours = sorted(out)
    assert len(hours) == 72 - anomaly.MIN_TRAIL
