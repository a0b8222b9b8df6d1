"""events_resample_ffill (operators/asof.py, registered r11; staged r10): regular
hourly series + forward fill from the irregular event stream — oracle
parity plus the semantics that make the fill trustworthy."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import asof

from .oracle_utils import assert_matches_oracle


def test_resample_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        asof.events_resample_ffill(spark, sf_dir),
        asof.ORACLES["events_resample_ffill"],
        sf_dir,
    )


def test_grid_is_dense_and_bounded(spark, sf_dir):
    """Per user the grid must be exactly (last hour - first hour + 1)
    consecutive rows — no holes, no rows outside the user's own
    span."""
    df = asof.events_resample_ffill(spark, sf_dir)
    per_user = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("grid_ts").alias("t0"),
        F.max("grid_ts").alias("t1"),
    )
    bad = per_user.where(
        F.col("n")
        != (
            F.unix_timestamp("t1", "yyyy-MM-dd HH:00:00")
            - F.unix_timestamp("t0", "yyyy-MM-dd HH:00:00")
        ) / 3600 + 1
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_gap_rows_carry_previous_value_forward(spark, sf_dir):
    """Every gap row's last_value must equal the previous grid row's
    last_value (the definition of ffill), and no last_value may be
    NULL (the first grid row always holds an event)."""
    from pyspark.sql import Window

    df = asof.events_resample_ffill(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("grid_ts")
    j = df.withColumn("prev", F.lag("last_value").over(w))
    bad = j.where(
        F.col("is_gap") & (F.col("last_value") != F.col("prev"))
    )
    assert bad.count() == 0, bad.limit(5).collect()
    assert df.where(F.col("last_value").isNull()).count() == 0


def test_event_hours_pin_their_latest_value(spark, sf_dir):
    """A non-gap row's last_value must be the value of that hour's
    latest event by (ts, event_id) — the deterministic within-hour
    pick, checked independently with a window over raw events."""
    from pyspark.sql import Window

    e = (
        asof.load_table(spark, sf_dir, "events")
        .select(
            "user_id", "ts", "event_id", "value",
            F.date_format(
                F.date_trunc("hour", F.col("ts")),
                "yyyy-MM-dd HH:00:00",
            ).alias("grid_ts"),
        )
    )
    w = Window.partitionBy("user_id", "grid_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "grid_ts", F.col("value").alias("want"))
    )
    got = asof.events_resample_ffill(spark, sf_dir).where(
        ~F.col("is_gap")
    )
    bad = got.join(want, ["user_id", "grid_ts"]).where(
        F.col("last_value") != F.col("want")
    )
    assert bad.count() == 0, bad.limit(5).collect()
