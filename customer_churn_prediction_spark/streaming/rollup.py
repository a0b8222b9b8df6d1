"""Hypertable-style continuous rollup over `events`.

The timeseries-database pattern (e.g. a hypertable's continuous
aggregate): maintain a FINE-grain pre-aggregate (hourly, partitioned
by day) and answer every coarser-grain query (daily, weekly, total)
from the rollup instead of the raw events. Aggregates used are all
re-aggregable (count/sum/min/max — no avg/distinct stored, those are
derived at read time), so coarsening is lossless by construction and
`tests/test_streaming.py` asserts rollup-derived daily == direct
daily.

Scale notes: the rollup write shuffles once on (hour, event_type) and
lands date-partitioned (partition pruning for time-windowed reads);
incremental maintenance is the watermarked streaming tumbling
aggregation in windows.py with `stream_to_batch_sink` overwriting the
current day's partition per epoch — the batch/stream pair shares this
schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fine-grain pre-aggregate: per (hour, event_type) counts and
    re-aggregable value stats."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
        .withColumn("dt", F.to_date("hour"))
    )


def materialize_hourly_rollup(
    spark: SparkSession, sf_dir: str, path: str, mode: str = "overwrite"
) -> None:
    """Write the rollup date-partitioned — the 'hypertable chunk'
    layout; time-windowed reads prune partitions."""
    hourly_rollup(spark, sf_dir).write.mode(mode).partitionBy("dt").parquet(
        path
    )


def daily_from_rollup(rollup: DataFrame) -> DataFrame:
    """Coarsen hourly → daily by RE-aggregating the rollup (sum of
    counts/sums, min of mins, max of maxes) — never touching raw
    events. avg is derived, not stored."""
    return (
        rollup.groupBy(F.col("dt").alias("day"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("value_sum"), 2).alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
        .withColumn(
            "value_avg", F.round(F.col("value_sum") / F.col("n_events"), 6)
        )
    )


def daily_rollup_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form (oracle-paired): daily stats computed through the
    hourly rollup — the answer must equal aggregating events directly,
    which is exactly what the DuckDB oracle does."""
    daily = daily_from_rollup(hourly_rollup(spark, sf_dir))
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        "value_sum",
        "value_min",
        "value_max",
        "value_avg",
    )


def streaming_hourly_rollup(events_stream: DataFrame) -> DataFrame:
    """The streaming form of ``hourly_rollup``: watermarked tumbling
    aggregation emitting the identical schema, so the batch and stream
    paths share every downstream consumer (``daily_from_rollup``)."""
    return (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "value_sum",
            "value_min",
            "value_max",
        )
        .withColumn("dt", F.to_date("hour"))
    )


def maintain_rollup(events_stream: DataFrame, path: str, query_name: str
                    = "rollup_maintenance", checkpoint: str | None = None,
                    fault=None):
    """Continuously-maintained rollup: each epoch lands the current
    aggregate state into the date-partitioned layout via foreachBatch,
    and rewriting partitions from current state is idempotent on
    replay (the exactly-once contract of ``stream_to_batch_sink``).

    Runs in complete mode, so each epoch's output carries EVERY day
    seen so far and the dynamic partition overwrite rewrites the whole
    rollup each epoch — not just the days the epoch touched (a
    complete-mode batch has no changed-day marker to restrict by).
    Likewise the streaming state is the full rollup: it grows with
    stream lifetime as O(days × hours × types) — proportional to the
    rollup GRAIN, never the event volume, which is what keeps
    hypertable-style continuous aggregates maintainable. A long-lived
    deployment bounds both by closing out old days: run the stream
    with a watermark-bounded window (see ``stream_tumbling_counts``)
    and fold closed days into the at-rest rollup with the batch
    ``daily_rollup_direct``, keeping complete-mode state to the open
    tail only.

    ``fault`` is the same crash-injection hook as
    ``ingest.dedup_ingest_stream``'s: called with the epoch_id after
    the partition overwrite and before the offset commit, so recovery
    tests can force a replay of a fully-landed epoch."""
    from .windows import stream_to_batch_sink

    def _land(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dt")
            .parquet(path)
        )
        if fault is not None:
            fault(epoch_id)

    return stream_to_batch_sink(
        streaming_hourly_rollup(events_stream),
        _land,
        query_name,
        output_mode="complete",
        checkpoint=checkpoint,
    )


QUERIES = {
    "rollup_daily_from_hourly": daily_rollup_direct,
}

ORACLES = {
    # The oracle aggregates the RAW events straight to daily grain:
    # matching it proves the hourly rollup loses nothing.
    "rollup_daily_from_hourly": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS value_sum,
       min(value) AS value_min,
       max(value) AS value_max,
       round(round(sum(value), 2) / count(*), 6) AS value_avg
FROM events
GROUP BY 1, 2
""",
}
