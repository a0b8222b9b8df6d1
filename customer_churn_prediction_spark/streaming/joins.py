"""Watermarked stream–stream interval join: click→purchase pairing.

The last Structured Streaming operator class the engine's streaming
tier hadn't exercised: joining two UNBOUNDED streams. The example is
the streaming twin of the batch as-of/attribution shape — pair each
purchase with the same user's clicks in the preceding hour, as both
streams arrive.

Why the shape matters at scale: a stream–stream join buffers BOTH
sides in state, and without an event-time bound that state grows
forever. The interval condition (``click.ts`` within 1 h before
``purchase.ts``) plus watermarks on both sides lets Spark prove when a
buffered row can never match again and evict it — state is bounded by
(rate × interval + watermark), independent of stream lifetime. Append
output mode emits a pair exactly once, when the watermark passes the
match interval.

Batch form included for convergence testing (file sources deliver
everything, so the streaming result must equal the batch join on the
same inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_WINDOW_SECONDS = 3600
WATERMARK = "10 minutes"


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    return purchases, clicks


def _join_cond():
    return (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts")
            - F.expr(f"interval {JOIN_WINDOW_SECONDS} seconds")
        )
    )


_OUT = ("purchase_id", "click_id", "p_user", "purchase_ts", "click_ts",
        "purchase_value")


def streaming_click_purchase_pairs(events_stream: DataFrame) -> DataFrame:
    """The watermarked stream–stream interval join (append mode)."""
    purchases, clicks = _sides(events_stream)
    return (
        purchases.withWatermark("purchase_ts", WATERMARK)
        .join(
            clicks.withWatermark("click_ts", WATERMARK),
            _join_cond(),
            "inner",
        )
        .select(*_OUT)
    )


def batch_click_purchase_pairs(events: DataFrame) -> DataFrame:
    """The batch twin — same sides, same interval condition."""
    purchases, clicks = _sides(events)
    return purchases.join(clicks, _join_cond(), "inner").select(*_OUT)
