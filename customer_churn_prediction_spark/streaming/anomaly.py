"""Continuously-maintained volume-anomaly report over the event stream.

The third maintenance sink (drift PSI, DQ rules, now volume
anomalies): hourly event counts aggregated in ``complete`` output mode
and rescored every epoch by the SAME core the batch operator runs
(``operators/anomaly.score_hourly`` — dense hour spine, trailing
z-score, outage hours flagged), published through the shared atomic
``_LATEST``-pointer discipline (``drift.publish_epoch_report``).

State: one row per OBSERVED hour — 8 760 rows/year regardless of
stream volume; the per-epoch shuffle is the map-combined hour
aggregate of that epoch's files. Complete mode never drops state, so
the report always scores the whole retained history; if a deployment
wants a bounded alerting horizon instead, filter the stream to a
rolling ingest window upstream — the scoring core is indifferent.
Epoch replay is idempotent because the report is a pure function of
the running histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.anomaly import score_hourly
from .drift import publish_epoch_report, read_report  # noqa: F401 (re-export)
from .windows import stream_to_batch_sink


def streaming_hourly_counts(events_stream: DataFrame) -> DataFrame:
    """The running per-hour aggregate (outputMode='complete')."""
    return (
        events_stream.select(
            F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .groupBy("hour")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def maintain_volume_anomalies(
    spark: SparkSession,
    events_stream: DataFrame,
    report_path: str,
    checkpoint: str | None = None,
):
    """Start the maintenance query: every epoch republishes the scored
    anomaly report for the stream-so-far."""
    counts = streaming_hourly_counts(events_stream)

    def write_report(batch_df: DataFrame, epoch_id: int) -> None:
        publish_epoch_report(score_hourly(batch_df), report_path, epoch_id)

    return stream_to_batch_sink(
        counts,
        write_report,
        query_name="volume-anomaly-maintenance",
        output_mode="complete",
        checkpoint=checkpoint,
    )
