"""Batch sessionization of the event log (gap-based visits).

The streaming tier already sessionizes with
``F.session_window`` (streaming/windows.py); this is the BATCH twin a
feature pipeline runs over historical logs: split each user's event
stream into visits wherever the inter-event gap exceeds the timeout,
then aggregate per visit. Classic lag→flag→running-sum plan:

  1. one window per user ordered by (ts, event_id): the gap flag is
     ``lag(ts)`` versus the timeout (event_id breaks timestamp ties so
     the session numbering is total-order deterministic). The boundary
     is ``>=``: an event landing EXACTLY at prev_ts + gap starts a new
     session — the same exclusive-end rule ``F.session_window`` applies
     (see streaming/windows.py's session oracle), so the batch and
     streaming forms agree on boundary events;
  2. the running sum of flags IS the session number (one shuffle, by
     user);
  3. per-(user, session) hash aggregate — same key prefix as the
     window partitioning, so the aggregate reuses the shuffle.

Scale: the one real shuffle is keyed by user_id; a hot user serializes
only their own events (inherent to sessionization's order dependency
— the same bound the streaming form has). No joins, no collect.

Staged query surface (registry candidate for a later round; driver
budget full in r5) — tests/test_sessions.py enforces oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..constants import EVENTS_END_EXCL, EVENTS_START

SESSION_GAP_MIN = 30


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, visit): bounds, event count, total value."""
    e = load_table(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit(EVENTS_START).cast("timestamp"))
        & (F.col("ts") < F.lit(EVENTS_END_EXCL).cast("timestamp"))
    )
    return sessionize(e)


def sessionize(e: DataFrame) -> DataFrame:
    """Core plan over any (user_id, ts, event_id, value) frame."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                >= SESSION_GAP_MIN * 60
            ),
            1,
        )
        .otherwise(0)
    )
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = e.select(
        "user_id", "ts", "event_id", "value",
        F.sum(gap_flag).over(w_run).cast("long").alias("session_seq"),
    )
    return (
        numbered.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SESSIONS_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE ts >= TIMESTAMP '{EVENTS_START}'
    AND ts <  TIMESTAMP '{EVENTS_END_EXCL}'
),
flagged AS (
  SELECT *,
    CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('second', lag(ts) OVER w, ts) >= {SESSION_GAP_MIN * 60}
         THEN 1 ELSE 0 END AS gap_flag
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
    CAST(sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM numbered
GROUP BY user_id, session_seq
"""

QUERIES = {"event_sessions": event_sessions}
ORACLES = {"event_sessions": SESSIONS_ORACLE}
