"""Streaming quantiles: the Greenwald–Khanna sketch maintained on
ingest.

``operators/sketches.py::approx_percentile_bands`` verifies the GK
sketch's rank-error contract in one batch pass; a production latency/
value monitor wants running percentiles AS EVENTS ARRIVE. Spark's
``approx_percentile`` is a TypedImperativeAggregate whose buffer IS
the mergeable sketch, so a complete-mode streaming aggregate
maintains it natively — per (group) state is O(accuracy), constant in
ingest volume, which is the whole reason to monitor p50/p95 with a
sketch instead of a sorted window.

This completes the maintained-sketch matrix: frequency (CMS,
``sketch.py``), cardinality (HLL, ``hll.py``), membership (Bloom,
``bloom.py``), quantiles (GK, here) — each with a batch-verified
error contract and a streaming maintenance loop. Unlike the other
three, the state here lives in Spark's own aggregation buffers
behind the checkpoint (restart restores it — tested), not in an
epoch-partitioned parquet store: there is nothing epoch-mergeable to
land because the engine already owns the merge.

Every epoch republishes the per-group report through the shared
atomic publish (``drift.publish_epoch_report``). The error contract
carried into the report is the batch op's: the sketched percentile's
VALUE must lie between the exact percentiles at ``p ± 2/accuracy`` —
asserted against the exact batch computation in
``tests/test_streaming_quantiles.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import ACCURACY
from .drift import publish_epoch_report

QUANTILE_PS = (0.5, 0.95)


def quantile_aggregate(events_stream: DataFrame) -> DataFrame:
    """Per-event-type running percentile sketch of ``value`` — the
    complete-mode aggregate whose buffer Spark maintains across
    epochs and restarts."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for p in QUANTILE_PS:
        tag = f"p{int(p * 100)}"
        aggs.append(
            F.expr(
                f"approx_percentile(value, {p}, {ACCURACY})"
            ).alias(f"approx_{tag}")
        )
    return (
        events_stream.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(*aggs)
    )


def maintain_quantiles(
    spark: SparkSession,
    events_stream: DataFrame,
    report_path: str,
    checkpoint: str | None = None,
):
    """Start the maintenance query: every epoch republishes the
    per-event-type running p50/p95 report."""
    agg = quantile_aggregate(events_stream)

    def write_report(batch_df: DataFrame, epoch_id: int) -> None:
        publish_epoch_report(batch_df, report_path, epoch_id)

    writer = (
        agg.writeStream.foreachBatch(write_report)
        .outputMode("complete")
        .queryName("gk-quantiles-maintenance")
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
