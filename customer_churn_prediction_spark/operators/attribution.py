"""Marketing attribution: last-touch conversion credit over the event log.

Which channel gets credit for each purchase — the report every
funnel/cohort stack (operators/funnels.py) is eventually asked for.
Last-touch model: a purchase is credited to the user's most recent
click/view STRICTLY BEFORE it (ties on timestamp break by event_id,
the same total order the sessionizer uses) and within a lookback
window; purchases with no qualifying touch are 'direct'.

Scale shape: ONE user-keyed shuffle. The carried last-touch
(type, time) is a single ``last(..., ignorenulls)`` window over
``ROWS UNBOUNDED PRECEDING .. 1 PRECEDING`` — the streaming-friendly
prefix form, not a purchases⋈touches self-join (which shuffles the
event log twice and explodes on users with many touches). The report
aggregate then groups ~5 channel rows. Deterministic end to end:
integer second arithmetic for time-to-convert, fixed rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

TOUCH_TYPES = ("click", "view")
CONVERSION_TYPE = "purchase"
LOOKBACK_HOURS = 72


def attribution_frame(events: DataFrame) -> DataFrame:
    """Per-channel conversion credit for any events frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_type = F.when(
        F.col("event_type").isin(*TOUCH_TYPES), F.col("event_type")
    )
    touch_ts = F.when(
        F.col("event_type").isin(*TOUCH_TYPES), F.col("ts")
    )
    carried = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.last(touch_type, ignorenulls=True).over(w).alias("lt_type"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("lt_ts"),
    )
    secs = F.col("ts").cast("long") - F.col("lt_ts").cast("long")
    conversions = carried.where(
        F.col("event_type") == CONVERSION_TYPE
    ).select(
        F.when(
            F.col("lt_type").isNotNull()
            & (secs <= LOOKBACK_HOURS * 3600),
            F.col("lt_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
        F.when(
            F.col("lt_type").isNotNull()
            & (secs <= LOOKBACK_HOURS * 3600),
            secs,
        ).alias("secs_to_convert"),
    )
    return (
        conversions.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("secs_to_convert"), 6).alias("avg_secs_to_convert"),
        )
        .orderBy("channel")
    )


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel last-touch attribution report: each purchase
    credited to the user's most recent preceding click/view within a
    72 h lookback (else 'direct') via one user-keyed ignore-nulls
    window — no purchases-to-touches self-join."""
    return attribution_frame(load_table(spark, sf_dir, "events"))


_TOUCH_LIST = ", ".join(f"'{t}'" for t in TOUCH_TYPES)

ATTRIBUTION_ORACLE = f"""
WITH carried AS (
  SELECT user_id, ts, event_type, value,
    last_value(CASE WHEN event_type IN ({_TOUCH_LIST}) THEN event_type END
               IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
    last_value(CASE WHEN event_type IN ({_TOUCH_LIST}) THEN ts END
               IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts
  FROM events
),
conv AS (
  -- date_diff('second', ...) truncates both operands to seconds before
  -- differencing, matching Spark's cast(ts as long) arithmetic;
  -- epoch()::BIGINT would ROUND the fractional seconds and disagree.
  SELECT
    CASE WHEN lt_type IS NOT NULL
          AND date_diff('second', lt_ts, ts) <= {LOOKBACK_HOURS} * 3600
         THEN lt_type ELSE 'direct' END AS channel,
    value,
    CASE WHEN lt_type IS NOT NULL
          AND date_diff('second', lt_ts, ts) <= {LOOKBACK_HOURS} * 3600
         THEN date_diff('second', lt_ts, ts) END
      AS secs_to_convert
  FROM carried WHERE event_type = '{CONVERSION_TYPE}'
)
SELECT channel, count(*) AS n_conversions,
       round(sum(value), 2) AS total_value,
       round(avg(secs_to_convert), 6) AS avg_secs_to_convert
FROM conv GROUP BY channel ORDER BY channel
"""

# Staged permanently by design: the 100-entry registry ceiling
# (50-row driver budget x 2-round proof cycle) binds, and these lost
# the priority call (ROADMAP round-6 state); tests/test_attribution.py holds
# them to driver rigor regardless.
QUERIES = {"attribution_last_touch": attribution_last_touch}
ORACLES = {"attribution_last_touch": ATTRIBUTION_ORACLE}
