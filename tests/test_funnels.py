"""Funnel conversion + cohort retention (operators/funnels.py) —
staged registry candidates; oracle parity at driver rigor plus the
strict-ordering and triangle semantics on constructed inputs."""

from __future__ import annotations

import datetime as dt

from customer_churn_prediction_spark.operators import funnels

from .oracle_utils import assert_matches_oracle


def test_funnel_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        funnels.funnel_conversion(spark, sf_dir),
        funnels.FUNNEL_ORACLE,
        sf_dir,
    )


def test_cohort_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        funnels.cohort_retention(spark, sf_dir),
        funnels.COHORT_ORACLE,
        sf_dir,
    )


def test_funnel_is_monotone(spark, sf_dir):
    rows = funnels.funnel_conversion(spark, sf_dir).orderBy(
        "step_idx"
    ).collect()
    assert [r.step for r in rows] == funnels.FUNNEL_STEPS
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert rows[0].overall_conversion == 1.0
    for r in rows:
        assert 0.0 <= r.step_conversion <= 1.0


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (uid, dt.datetime(2024, 1, 1, h, m), typ)
            for uid, h, m, typ in rows
        ],
        "user_id long, ts timestamp, event_type string",
    )


def test_strict_ordering_excludes_out_of_order_users(spark):
    e = _events(
        spark,
        [
            # user 1: proper view -> click -> purchase
            (1, 9, 0, "view"), (1, 9, 5, "click"), (1, 9, 10, "purchase"),
            # user 2: clicked BEFORE viewing; purchase never follows a
            # post-view click
            (2, 9, 0, "click"), (2, 9, 5, "view"), (2, 9, 10, "purchase"),
            # user 3: view only
            (3, 9, 0, "view"),
        ],
    )
    rows = {
        r.step: r for r in funnels.funnel_frame(e).collect()
    }
    assert rows["view"].n_users == 3
    assert rows["click"].n_users == 1  # user 2's click precedes the view
    assert rows["purchase"].n_users == 1
    assert rows["purchase"].overall_conversion == round(1 / 3, 6)


def test_simultaneous_steps_do_not_advance(spark):
    # strict > : a click at the same instant as the view doesn't count
    e = _events(spark, [(1, 9, 0, "view"), (1, 9, 0, "click")])
    rows = {r.step: r for r in funnels.funnel_frame(e).collect()}
    assert rows["view"].n_users == 1
    assert rows["click"].n_users == 0


def test_cohort_triangle_shape(spark, sf_dir):
    rows = funnels.cohort_retention(spark, sf_dir).collect()
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    for month, rs in by_cohort.items():
        rs.sort(key=lambda r: r.months_since)
        assert rs[0].months_since == 0
        assert rs[0].retention == 1.0
        size = rs[0].cohort_size
        for r in rs:
            assert r.cohort_size == size
            assert 0 < r.n_active <= size
            assert 0.0 < r.retention <= 1.0
    # the first cohort exists and every month offset fits the window span
    assert max(r.months_since for r in rows) <= 36
