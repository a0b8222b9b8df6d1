"""events_split_temporal (operators/sampling.py, staged r11): purged
temporal split with an embargo gap — oracle parity plus the leakage
guarantees the split exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.operators import sampling

from .oracle_utils import assert_matches_oracle


def test_temporal_split_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        sampling.events_split_temporal(spark, sf_dir),
        sampling.ORACLES["events_split_temporal"],
        sf_dir,
    )


def test_split_is_total_purged_and_ordered(spark, sf_dir):
    """Every event gets exactly one label; max(train ts) + embargo <=
    min(test ts) — no test event inside the purged window — and the
    embargo bucket sits strictly between the two."""
    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    out = sampling.events_split_temporal(spark, sf_dir)
    assert out.count() == e.count()
    j = out.join(e, "event_id")
    agg = {
        r.split: r
        for r in j.groupBy("split")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    }
    assert set(agg) <= {"train", "embargo", "test"}
    import datetime

    gap = datetime.timedelta(hours=sampling.EMBARGO_HOURS)
    tr_hi = agg["train"].hi
    te_lo = agg["test"].lo
    # train ends strictly before the cutoff, test starts at or after
    # cutoff + embargo, so the observed gap must EXCEED the embargo
    assert te_lo - tr_hi > gap, (tr_hi, te_lo)
    if "embargo" in agg:
        assert agg["embargo"].lo > tr_hi
        assert agg["embargo"].hi < te_lo


def test_split_is_deterministic_not_wall_clock(spark, sf_dir):
    a = sorted(
        map(tuple, sampling.events_split_temporal(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, sampling.events_split_temporal(spark, sf_dir).collect())
    )
    assert a == b
