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
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
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
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
  FROM events GROUP BY 1
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

# Staged for the r6 registry (driver PRIORITY budget is full this
# round); tests/test_anomaly.py holds these to driver rigor.
QUERIES = {"hourly_anomalies": hourly_anomalies}
ORACLES = {"hourly_anomalies": ANOMALY_ORACLE}
