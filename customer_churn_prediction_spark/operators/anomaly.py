"""Time-series anomaly flags over the event stream's hourly volume.

The alerting companion to the monitoring tier: hourly event counts
scored against their own trailing window (z-score vs the previous 48
hours), flagging hours whose volume deviates ≥ 3σ — the standard
ops-dashboard "traffic broke" signal.

Scale shape: ONE hash aggregate (hour buckets — at 100 TB this is the
map-side-combined rollup the streaming tier already maintains), then
every window function runs over the ≤ |hours| aggregate rows, never
over events. Determinism for the oracle hash: the trailing mean and
variance are derived from INTEGER window sums (Σx, Σx², n are exact
64-bit in both engines; Welford-style `stddev` accumulates in
engine-specific order and can differ in the last ulp), so the floating
arithmetic has a fixed operand order and rounds identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

TRAIL_HOURS = 48
MIN_TRAIL = 24  # warm-up: hours with fewer trailing points are unscored
Z_FLAG = 3.0


def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-volume anomaly flags: each hour's count z-scored
    against its trailing 48-hour window (exact integer sums, 24-hour
    warm-up), flagged at 3 sigma — one hour-grain hash aggregate, then
    windows over aggregate rows only."""
    e = load_table(spark, sf_dir, "events")
    observed = (
        e.select(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return score_hourly(observed)


def score_hourly(observed: DataFrame) -> DataFrame:
    """Score any (hour, n_events) histogram — the ONE scoring core the
    batch operator and the streaming maintenance sink
    (streaming/anomaly.py) both run, so their reports cannot drift."""
    # Densify onto the full hour spine BEFORE windowing: an hour with
    # zero events has no aggregate row, so a rows-frame over observed
    # hours could never flag a total outage (the most important volume
    # anomaly) and would silently stitch counts from across a gap as
    # if adjacent. Gap-fill via lead(): each observed hour explodes
    # into [hour, next_hour) with n_events only on its first element —
    # ONE lineage off the single aggregate (a min/max + spine join
    # would plan a second scan branch of the events table).
    w_ord = Window.orderBy("hour")
    dense = (
        observed.withColumn("next_hour", F.lead("hour").over(w_ord))
        .select(
            F.posexplode(
                F.when(
                    F.col("next_hour").isNull(), F.array(F.col("hour"))
                ).otherwise(
                    F.sequence(
                        "hour",
                        F.col("next_hour") - F.expr("interval 1 hour"),
                        F.expr("interval 1 hour"),
                    )
                )
            ).alias("i", "hour_d"),
            "n_events",
        )
        .select(
            F.col("hour_d").alias("hour"),
            F.when(F.col("i") == 0, F.col("n_events"))
            .otherwise(F.lit(0))
            .alias("n_events"),
        )
    )
    hourly = dense
    w = Window.orderBy("hour").rowsBetween(-TRAIL_HOURS, -1)
    s1 = F.sum("n_events").over(w)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    mean = s1 / cnt
    # sample variance from exact integer sums, fixed operand order
    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
    z = (F.col("n_events") - mean) / F.sqrt(var)
    scored = hourly.select(
        "hour",
        "n_events",
        cnt.alias("_cnt"),
        F.round(mean, 6).alias("mean_trailing"),
        F.when((cnt >= MIN_TRAIL) & (var > 0), F.round(z, 6)).alias("z"),
    )
    return scored.where(F.col("_cnt") >= MIN_TRAIL).select(
        "hour",
        "n_events",
        "mean_trailing",
        "z",
        # when/otherwise (not a bare boolean cast): an unscored hour has
        # z NULL, and NULL >= 3 must land in the 0 branch as the
        # oracle's CASE does, not propagate NULL.
        F.when(F.abs(F.col("z")) >= Z_FLAG, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_anomaly"),
    )


ANOMALY_ORACLE = f"""
WITH observed AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1
),
with_next AS (
  SELECT hour, n_events, lead(hour) OVER (ORDER BY hour) AS next_hour
  FROM observed
),
hourly AS (
  SELECT hour_d AS hour,
         CASE WHEN hour_d = hour THEN n_events ELSE 0 END AS n_events
  FROM (
    SELECT hour, n_events,
           unnest(CASE WHEN next_hour IS NULL THEN [hour]
                  ELSE generate_series(hour, next_hour - INTERVAL 1 HOUR,
                                       INTERVAL 1 HOUR) END) AS hour_d
    FROM with_next
  )
),
win AS (
  SELECT hour, n_events,
    sum(n_events) OVER (ORDER BY hour
      ROWS BETWEEN {TRAIL_HOURS} PRECEDING AND 1 PRECEDING) AS s1,
    sum(n_events * n_events) OVER (ORDER BY hour
      ROWS BETWEEN {TRAIL_HOURS} PRECEDING AND 1 PRECEDING) AS s2,
    count(*) OVER (ORDER BY hour
      ROWS BETWEEN {TRAIL_HOURS} PRECEDING AND 1 PRECEDING) AS cnt
  FROM hourly
),
scored AS (
  SELECT hour, n_events, cnt,
    round(CAST(s1 AS DOUBLE) / cnt, 6) AS mean_trailing,
    CASE WHEN cnt >= {MIN_TRAIL}
          AND (s2 - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1) > 0
         THEN round((n_events - CAST(s1 AS DOUBLE) / cnt)
              / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / cnt) / (cnt - 1)), 6)
         END AS z
  FROM win
)
SELECT hour, CAST(n_events AS BIGINT) AS n_events, mean_trailing, z,
       CAST(CASE WHEN abs(z) >= {Z_FLAG} THEN 1 ELSE 0 END AS INTEGER)
         AS is_anomaly
FROM scored WHERE cnt >= {MIN_TRAIL}
"""

# Staged permanently by design: the 100-entry registry ceiling
# (50-row driver budget x 2-round proof cycle) binds, and these lost
# the priority call (ROADMAP round-6 state); tests/test_anomaly.py holds
# them to driver rigor regardless.
QUERIES = {"hourly_anomalies": hourly_anomalies}
ORACLES = {"hourly_anomalies": ANOMALY_ORACLE}
