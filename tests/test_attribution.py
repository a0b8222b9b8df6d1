"""attribution_last_touch (operators/attribution.py) — staged registry
candidate; oracle parity at driver rigor plus the credit semantics on
constructed journeys."""

from __future__ import annotations

import datetime as dt

from customer_churn_prediction_spark.operators import attribution

from .oracle_utils import assert_matches_oracle


def test_attribution_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        attribution.attribution_last_touch(spark, sf_dir),
        attribution.ATTRIBUTION_ORACLE,
        sf_dir,
    )


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, d, h, m), uid, typ, val, "{}")
            for eid, d, h, m, uid, typ, val in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_last_touch_credit_semantics(spark):
    e = _events(
        spark,
        [
            # user 1: view then click then purchase -> click credited
            (1, 1, 9, 0, 1, "view", 0.0),
            (2, 1, 9, 30, 1, "click", 0.0),
            (3, 1, 10, 0, 1, "purchase", 50.0),
            # user 2: no touch before purchase -> direct
            (4, 1, 9, 0, 2, "purchase", 20.0),
            # user 3: touch AFTER purchase only -> direct
            (5, 1, 9, 0, 3, "purchase", 10.0),
            (6, 1, 10, 0, 3, "click", 0.0),
            # user 4: touch outside the 72h lookback -> direct
            (7, 1, 9, 0, 4, "view", 0.0),
            (8, 5, 10, 0, 4, "purchase", 30.0),
            # user 5: signup is not a touch type -> direct
            (9, 1, 9, 0, 5, "signup", 0.0),
            (10, 1, 9, 30, 5, "purchase", 40.0),
        ],
    )
    rows = {r.channel: r for r in attribution.attribution_frame(e).collect()}
    assert rows["click"].n_conversions == 1
    assert rows["click"].total_value == 50.0
    assert rows["click"].avg_secs_to_convert == 1800.0
    assert rows["direct"].n_conversions == 4
    assert rows["direct"].total_value == 100.0
    assert rows["direct"].avg_secs_to_convert is None
    assert "view" not in rows  # click overwrote the earlier view


def test_same_timestamp_tie_breaks_by_event_id(spark):
    e = _events(
        spark,
        [
            (1, 1, 9, 0, 1, "click", 0.0),
            (2, 1, 9, 0, 1, "purchase", 5.0),  # same ts, later event_id
            (3, 1, 9, 0, 2, "purchase", 5.0),  # same ts, EARLIER than touch
            (4, 1, 9, 0, 2, "click", 0.0),
        ],
    )
    rows = {r.channel: r for r in attribution.attribution_frame(e).collect()}
    assert rows["click"].n_conversions == 1  # user 1 only
    assert rows["direct"].n_conversions == 1  # user 2's touch came after


def test_one_user_shuffle_no_self_join(spark, sf_dir):
    df = attribution.attribution_last_touch(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan parquet ") == 1
