"""As-of and range joins over the `events` table.

The reference has no temporal joins (SURVEY §2.3: range *predicates*
only, `RF/randomforest_churn.scala:89,44-45`); these are the north-star
temporal extensions a training-data pipeline needs (sessionized
attribution, point-in-time feature lookup).

Scale notes:

* ``asof_join_clicks`` uses the union + ordered-window form — ONE
  shuffle on user_id, no pair explosion — instead of the naive
  range-join + top-1 (which materializes every (purchase, click)
  candidate pair before pruning). This is the 100 TB as-of pattern:
  state per user is a single running value, and the sort is the same
  per-key sort a range join would need anyway.
* ``range_join_events`` keeps the explicit pair form (equi-join on
  user_id + range predicate on ts) for the aggregate-over-window-of-
  pairs shape where every pair IS the answer; the equi key keeps it a
  hash join, never a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def asof_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the most recent click (ts <= purchase
    ts) by the same user, as-of semantics with ties-include (a click at
    exactly the purchase timestamp matches).

    Union both sides, one window per user ordered by (ts, side,
    event_id), carry the last non-null click payload forward, keep the
    purchase rows."""
    e = load_table(spark, sf_dir, "events")
    cp = e.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_val = F.last(
        F.when(F.col("is_p") == 0, F.col("value")), ignorenulls=True
    ).over(w)
    click_ts = F.last(
        F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        cp.withColumn("last_click_value", click_val)
        .withColumn("last_click_ts", F.date_format(click_ts, _TS_FMT_US))
        .where(F.col("is_p") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", _TS_FMT_US).alias("purchase_ts"),
            "last_click_ts",
            "last_click_value",
        )
    )


def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: count + value sum of same-user clicks in the
    preceding hour (inclusive bounds). Equi-join on user_id keeps this
    a hash/sort-merge join; the ts range is a post-join predicate."""
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    joined = p.join(
        c,
        (p.user_id == c.user_id)
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy(
        "purchase_id", p.user_id.alias("user_id"), "p_ts"
    ).agg(
        F.count("c_ts").alias("n_clicks_1h"),
        F.round(F.coalesce(F.sum("c_value"), F.lit(0.0)), 2).alias(
            "click_value_1h"
        ),
    ).select(
        "purchase_id",
        "user_id",
        F.date_format("p_ts", _TS_FMT_US).alias("purchase_ts"),
        "n_clicks_1h",
        "click_value_1h",
    )


QUERIES = {
    "asof_join_clicks": asof_join_clicks,
    "range_join_events": range_join_events,
    # events_resample_ffill is appended below its def (r11 graduation).
}

ORACLES = {
    "asof_join_clicks": """
WITH cp AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events WHERE event_type IN ('click', 'purchase')
),
w AS (
  SELECT *,
    last_value(CASE WHEN is_p = 0 THEN value END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_p, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_value,
    last_value(CASE WHEN is_p = 0 THEN ts END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, is_p, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
  FROM cp
)
SELECT event_id AS purchase_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       strftime(last_click_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
       last_click_value
FROM w WHERE is_p = 1
""",
    "range_join_events": """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts AS c_ts, value AS c_value
  FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id,
       strftime(p.p_ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       count(c.c_ts) AS n_clicks_1h,
       round(coalesce(sum(c.c_value), 0.0), 2) AS click_value_1h
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.c_ts <= p.p_ts
 AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
GROUP BY p.purchase_id, p.user_id, p.p_ts
""",
}


def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + forward fill: the point-in-time feature grid.

    Regular per-user hourly series from the irregular event stream —
    the "feature as of hour H" table a feature store derives from raw
    events (pandas' ``resample().ffill()``, Flink's interval fill),
    an operator Spark has no native form for.

    Per user: an hourly grid from their first to last event hour
    (``sequence`` + explode); per grid hour the event count (0 on gap
    hours — ~90% of the sf0.01 grid) and ``last_value`` = the value of
    the latest event at-or-before that hour (deterministic latest by
    (ts, event_id); forward-filled across gaps with an
    ignore-nulls running window). The first grid row always has an
    event, so last_value is never NULL.

    Scale shape: hourly rollup and grid join share the (user, hour)
    hash; bounds + fill are one user-keyed shuffle; the fill state per
    user is a single running value (the as-of union-window discipline
    above) and the grid explode is output-sized — no pair blowup, no
    per-gap self-join. At 100 TB the grid is the OUTPUT table and
    everything upstream is linear in events."""
    return resample_from_events(load_table(spark, sf_dir, "events"))


def resample_from_events(events: DataFrame) -> DataFrame:
    """The resample + ffill plan over ANY (user_id, ts, event_id,
    value) events frame — one core shared by the registered-table form
    above and the maintained-store serve path
    (``streaming/resample.py::resample_report``), so the stream twin
    cannot drift from the batch semantics."""
    # Null-key contract (ADVICE r10): rows with null user_id/ts are
    # dropped HERE, in the shared core, so the batch form, its oracle,
    # and the maintained stream twin (streaming/resample.py +
    # streaming/decay.py, which filter identically in maintain_*)
    # agree on sources that contain null keys — a null user has no
    # grid and a null ts has no hour.
    e = events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.date_trunc("hour", F.col("ts")).alias("h"),
    )
    # Latest-event-per-hour as ONE hash aggregate (r14 optimization):
    # max(struct(ts, event_id, value)).value picks the value of the
    # lexicographically-max (ts, event_id) row — identical to the old
    # row_number window ordered by (ts DESC, event_id DESC) wherever
    # (ts, event_id) is unique per (user, hour), and deterministic
    # even under ties (the window's row_number was not). The window
    # form paid a full sort of the event stream plus a second pass
    # through the aggregate; the struct max is a map-side-combined
    # hash agg on the same single shuffle key (the streaming
    # reservoir's r13 in-batch dedupe discipline).
    hourly = e.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.struct("ts", "event_id", "value"))["value"].alias(
            "v_last"
        ),
    )
    return resample_from_hourly(hourly)


def resample_from_hourly(hourly: DataFrame) -> DataFrame:
    """Grid + forward fill over a (user_id, h, n_events, v_last)
    hourly rollup — the tail the maintained store serves directly
    (its merged state IS this rollup)."""
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("v_last", ignorenulls=True).over(w_fill).alias(
            "last_value"
        ),
    )
    return filled.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:00:00").alias("grid_ts"),
        "n_events",
        "last_value",
        (F.col("n_events") == 0).alias("is_gap"),
    )


# r11: GRADUATED into the banked 100th registry slot (staged since
# r10; driver-rigor parity held in tests/test_resample.py +
# STAGED_CORRECTNESS.json through r10, now proven by the driver in its
# registration round per the rotation contract).
QUERIES["events_resample_ffill"] = events_resample_ffill
ORACLES["events_resample_ffill"] = """
WITH e AS (
  SELECT user_id, ts, event_id, value, date_trunc('hour', ts) AS h
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
hourly AS (
  SELECT user_id, h, CAST(count(*) AS BIGINT) AS n_events,
         (array_agg(value ORDER BY ts DESC, event_id DESC))[1] AS v_last
  FROM e GROUP BY 1, 2
),
grid AS (
  SELECT user_id,
         unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
  FROM e GROUP BY user_id
),
filled AS (
  SELECT g.user_id, g.h,
         CAST(coalesce(hr.n_events, 0) AS BIGINT) AS n_events,
         last_value(hr.v_last IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_value
  FROM grid g LEFT JOIN hourly hr
    ON g.user_id = hr.user_id AND g.h = hr.h
)
SELECT user_id, strftime(h, '%Y-%m-%d %H:00:00') AS grid_ts,
       n_events, last_value, n_events = 0 AS is_gap
FROM filled
"""
