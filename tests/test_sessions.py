"""Batch sessionization (operators/sessions.py) — staged registry
candidate; oracle parity at driver rigor plus gap semantics on a
constructed stream."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.constants import (
    EVENTS_END_EXCL,
    EVENTS_START,
)
from customer_churn_prediction_spark.operators import sessions

from .oracle_utils import assert_matches_oracle


def test_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        sessions.event_sessions(spark, sf_dir),
        sessions.SESSIONS_ORACLE,
        sf_dir,
    )


def test_sessions_partition_the_event_log(spark, sf_dir):
    out = sessions.event_sessions(spark, sf_dir)
    n_events_total = (
        load_table(spark, sf_dir, "events")
        .where(
            (F.col("ts") >= F.lit(EVENTS_START).cast("timestamp"))
            & (F.col("ts") < F.lit(EVENTS_END_EXCL).cast("timestamp"))
        )
        .count()
    )
    agg = out.agg(
        F.sum("n_events").alias("n"),
        F.sum((F.col("session_start") > F.col("session_end")).cast("int")).alias(
            "bad_bounds"
        ),
    ).collect()[0]
    assert agg.n == n_events_total  # every event in exactly one session
    assert agg.bad_bounds == 0


def _stream(spark, rows):
    return spark.createDataFrame(
        [
            (uid, dt.datetime(2024, 1, 1, 0, m, s), eid, val)
            for uid, m, s, eid, val in rows
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )


def test_gap_rule_splits_and_keeps(spark):
    # user 1: gaps of 29m59s (keep) then 30m01s (split)
    e = _stream(
        spark,
        [
            (1, 0, 0, 10, 1.0),
            (1, 29, 59, 11, 2.0),
            (1, 59, 0, 12, 4.0),   # 29m01s after previous -> same
            (2, 0, 0, 20, 8.0),
        ],
    )
    out = {
        (r.user_id, r.session_seq): r
        for r in sessions.sessionize(e).collect()
    }
    assert set(out) == {(1, 1), (2, 1)}
    assert out[(1, 1)].n_events == 3
    assert out[(1, 1)].total_value == 7.0

    e2 = _stream(
        spark,
        [
            (1, 0, 0, 10, 1.0),
            (1, 30, 1, 11, 2.0),  # 30m01s (>= gap) -> new session
        ],
    )
    out2 = sessions.sessionize(e2).orderBy("session_seq").collect()
    assert [r.session_seq for r in out2] == [1, 2]
    assert [r.n_events for r in out2] == [1, 1]


def test_exact_boundary_gap_starts_new_session(spark):
    # exactly 30m00s starts a NEW session — the streaming
    # session_window exclusive-end rule, kept identical in batch
    e = _stream(spark, [(1, 0, 0, 10, 1.0), (1, 30, 0, 11, 2.0)])
    out = sessions.sessionize(e).orderBy("session_seq").collect()
    assert [r.session_seq for r in out] == [1, 2]


def test_timestamp_ties_break_on_event_id(spark):
    e = _stream(spark, [(1, 0, 0, 11, 1.0), (1, 0, 0, 10, 2.0)])
    out = sessions.sessionize(e).collect()
    assert len(out) == 1
    assert out[0].n_events == 2
