"""Exponential time-decay feature aggregation over the event stream.

The behavioral tier's features so far are counts, windows, and RFM
buckets — step functions of time. Production churn/engagement models
overwhelmingly use the continuous form: a half-life-weighted sum
``sum(0.5^(age/H))`` where each event contributes by recency-decayed
weight (the classic feature-store "decayed count"/"decayed sum"
primitive; one number per user summarizes the whole history with
recent activity dominating). H = 7 days here.

Cross-engine float discipline (the ``text_logprob`` rule): the decay
exponent is computed from an INTEGER microsecond difference divided
by exact double constants — bit-identical in both engines — and each
per-event weight is rounded to 6dp before summing, so the remaining
``pow`` last-ulp risk is confined to a measure-zero rounding-boundary
set and the sums agree at the driver's 9-significant-digit canon.

Scale shape: the anchor (corpus max ts) is a 1-row broadcast scalar
(the calibration-report pattern — no driver collect, stays one job);
per-event weights are a pure map; the report is ONE user-keyed hash
aggregate. One scan, one shuffle, at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

HALF_LIFE_DAYS = 7.0
_US_PER_DAY = 86_400_000_000.0


def user_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed engagement features per user (H = 7 days).

    Event count, age of the latest event in days, decayed event count
    and decayed value sum —
    anchored at the corpus' latest event timestamp so the feature is
    a deterministic function of the data (a wall-clock anchor would
    never reproduce)."""
    # Null-key contract (ADVICE r10): drop null user_id/ts here so
    # the batch form matches the maintained stream twin
    # (streaming/decay.py::maintain_decay filters identically) on
    # sources containing null keys — the documented
    # maintained-equals-batch band holds for any source.
    e = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id", "ts", "value"
    )
    anchor = e.agg(F.max("ts").alias("anchor"))
    t = e.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "value",
        (
            F.unix_micros(F.col("anchor")) - F.unix_micros(F.col("ts"))
        ).alias("dmic"),
    )
    w = F.round(
        F.pow(
            F.lit(0.5),
            (F.col("dmic") / F.lit(_US_PER_DAY))
            / F.lit(HALF_LIFE_DAYS),
        ),
        6,
    )
    t = t.select(
        "user_id",
        "dmic",
        "value",
        w.alias("w"),
    ).select(
        "user_id",
        "dmic",
        "w",
        F.round(F.col("value") * F.col("w"), 6).alias("wv"),
    )
    return (
        t.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.min("dmic") / F.lit(_US_PER_DAY), 6).alias(
                "last_event_age_days"
            ),
            F.round(F.sum("w"), 6).alias("decayed_count"),
            F.round(F.sum("wv"), 6).alias("decayed_value"),
        )
    )


DECAY_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, value FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
a AS (SELECT max(ts) AS anchor FROM e),
t AS (
  SELECT user_id,
         date_diff('microsecond', ts, a.anchor) AS dmic,
         round(pow(0.5, (date_diff('microsecond', ts, a.anchor)
                         / {_US_PER_DAY!r}) / {HALF_LIFE_DAYS!r}),
               6) AS w,
         value
  FROM e, a
),
t2 AS (
  SELECT user_id, dmic, w, round(value * w, 6) AS wv FROM t
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(min(dmic) / {_US_PER_DAY!r}, 6) AS last_event_age_days,
       round(sum(w), 6) AS decayed_count,
       round(sum(wv), 6) AS decayed_value
FROM t2 GROUP BY 1
"""

QUERIES = {
    "user_decay_features": user_decay_features,
}
ORACLES = {
    "user_decay_features": DECAY_ORACLE,
}
