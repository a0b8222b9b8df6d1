"""session_transitions (operators/sessions.py, staged r11): the
within-visit Markov transition model — oracle parity plus the
semantics that make it a probability model over the SAME sessions the
visit table reports."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sessions

from .oracle_utils import assert_matches_oracle


def test_transitions_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sessions.session_transitions(spark, sf_dir),
        sessions.ORACLES["session_transitions"],
        sf_dir,
    )


def test_rows_are_a_probability_model(spark, sf_dir):
    out = sessions.session_transitions(spark, sf_dir)
    rows = out.collect()
    assert rows
    # per from-state the probabilities sum to 1 (6dp tolerance) and
    # n_from is consistent with the member counts
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for fr, rs in by_from.items():
        assert abs(sum(r.p for r in rs) - 1.0) <= 1e-4, fr
        assert all(r.n_from == sum(x.n for x in rs) for r in rs)
        assert all(0.0 < r.p <= 1.0 for r in rs)


def test_transitions_never_cross_session_boundaries(spark):
    """Two visits separated by more than the gap: the (last event of
    visit 1 → first event of visit 2) bigram must NOT appear."""
    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    gap = datetime.timedelta(minutes=sessions.SESSION_GAP_MIN + 5)
    m = datetime.timedelta(minutes=1)
    rows = [
        # visit 1: a -> b
        (1, 7, t0, "a"),
        (2, 7, t0 + m, "b"),
        # visit 2 (after the gap): c -> d
        (3, 7, t0 + gap, "c"),
        (4, 7, t0 + gap + m, "d"),
    ]
    e = spark.createDataFrame(
        [(eid, uid, ts, et, 1.0) for eid, uid, ts, et in rows],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    got = {
        (r.from_type, r.to_type): r.n
        for r in sessions.transitions_from_events(e).collect()
    }
    assert got == {("a", "b"): 1, ("c", "d"): 1}  # no ('b','c')
