"""Kaplan–Meier survival (ml/survival.py) — staged registry candidate;
oracle parity at driver rigor plus estimator semantics on constructed
cohorts."""

from __future__ import annotations

from customer_churn_prediction_spark.ml import survival

from .oracle_utils import assert_matches_oracle


def test_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        survival.survival_km(spark, sf_dir),
        survival.SURVIVAL_ORACLE,
        sf_dir,
    )


def test_curve_shape_and_population(spark, sf_dir):
    from customer_churn_prediction_spark.operators import labeling

    rows = survival.survival_km(spark, sf_dir).orderBy("duration_days").collect()
    balance = {
        r.label: r["count"]
        for r in labeling.class_balance(spark, sf_dir).collect()
    }
    assert rows[0].n_risk == balance[0] + balance[1]
    assert sum(r.n_events for r in rows) == balance[1]
    assert sum(r.n_censored for r in rows) == balance[0]
    # survival is a non-increasing step function in (0, 1]
    last = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= last + 1e-9
        last = r.survival
    # at-risk counts strictly decrease along the grid
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)


def _spans(spark, rows):
    return spark.createDataFrame(rows, "duration_days int, event int")


def test_textbook_example(spark):
    # classic KM worked example: events at t=1 (1 of 5) and t=3
    # (1 of 3), censored at t=2 and t=4; S = 4/5, then 4/5*2/3
    spans = _spans(
        spark,
        [(1, 1), (2, 0), (3, 1), (3, 0), (4, 0)],
    )
    got = {
        r.duration_days: r for r in survival.km_curve(spans).collect()
    }
    assert got[1].n_risk == 5 and got[1].n_events == 1
    assert got[1].survival == 0.8
    assert got[2].survival == 0.8  # censoring does not drop the curve
    assert got[3].n_risk == 3 and got[3].n_events == 1
    assert round(got[3].survival, 6) == round(0.8 * (1 - 1 / 3), 6)
    assert got[4].survival == got[3].survival


def test_all_churn_at_last_duration_hits_zero(spark):
    spans = _spans(spark, [(1, 0), (5, 1), (5, 1)])
    got = {
        r.duration_days: r for r in survival.km_curve(spans).collect()
    }
    assert got[5].n_risk == 2 and got[5].n_events == 2
    assert got[5].survival == 0.0
