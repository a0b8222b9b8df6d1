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
    e = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id")
        .where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    )
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


def test_null_keys_are_dropped_not_bucketed_as_test(spark, tmp_path):
    """ADVICE r11 #2: a NULL ts compares false in both when()
    branches, so before the null-key filter it silently landed in the
    'test' bucket — semantically wrong for a purged split. Constructed
    events with NULL ts / NULL user_id must be dropped in BOTH the
    Spark plan and the oracle."""
    import duckdb

    rows = [
        (1, "2024-01-01 00:00:00", 10),
        (2, "2024-01-05 00:00:00", 11),
        (3, "2024-01-10 00:00:00", 12),
        (4, None, 13),          # NULL ts: must not appear
        (5, "2024-01-09 00:00:00", None),  # NULL user: must not appear
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")

    out = sampling.events_split_temporal(spark, path).collect()
    assert {r.event_id for r in out} == {1, 2, 3}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM "
        f"read_parquet('{path}/events.parquet/*.parquet')"
    )
    got = con.execute(
        sampling.ORACLES["events_split_temporal"]
    ).fetchall()
    assert {r[0] for r in got} == {1, 2, 3}


def test_split_is_deterministic_not_wall_clock(spark, sf_dir):
    a = sorted(
        map(tuple, sampling.events_split_temporal(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, sampling.events_split_temporal(spark, sf_dir).collect())
    )
    assert a == b
