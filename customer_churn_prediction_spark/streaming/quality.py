"""Continuously-maintained data-quality monitor over the event stream.

The batch ``dq_audit`` (operators/quality.py) checks tables at rest; a
production pipeline wants the single-table rules checked AS ROWS
ARRIVE, so a bad upstream deploy (new event type, negative values,
null keys) alerts within an epoch instead of at the next batch audit.
Built exactly like the drift maintenance sink (streaming/drift.py):

* the stream side is a global conditional aggregate in ``complete``
  output mode — state is ONE row of rule counters (the smallest
  stateful query there is), with map-side combine doing the heavy
  lifting per epoch;
* ``foreachBatch`` unpivots the wide counter row into the per-rule
  report frame (rule, n_violations, n_rows, passed) — the same shape
  the batch audit emits — and publishes it through the shared atomic
  ``_LATEST``-pointer discipline (``drift.publish_epoch_report``), so
  readers never see a half-written report and epoch replay is
  idempotent (the report is a pure function of the running state).

Scale: state is 1 row regardless of stream volume; the per-epoch
shuffle is the map-combined global aggregate of that epoch's files.
Referential (FK) rules are deliberately absent here — a streaming
anti-join against a mutable parent table is a different operator class
(stream-static join with its own staleness contract); run those in the
batch audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import EVENT_TYPES
from .drift import publish_epoch_report, read_report  # noqa: F401 (re-export)
from .windows import stream_to_batch_sink

# rule name -> violation-predicate factory over the events schema
# (factories, not Columns: building a Column requires an active
# SparkContext, which must not be an import-time dependency)
_RULES = {
    "event_type_in_domain": lambda: ~F.col("event_type").isin(*EVENT_TYPES),
    "value_non_negative": lambda: F.col("value") < 0,
    "ts_not_null": lambda: F.col("ts").isNull(),
    "user_id_not_null": lambda: F.col("user_id").isNull(),
}


def streaming_rule_counts(events_stream: DataFrame) -> DataFrame:
    """The running one-row conditional aggregate (outputMode='complete').

    Each counter is coalesced: before the first file lands, the
    zero-row epoch's sums are NULL, and a NULL counter would publish
    passed=NULL (neither 0 nor 1) to alerting readers."""
    return events_stream.agg(
        F.count(F.lit(1)).alias("_n_rows"),
        *[
            F.coalesce(
                F.sum(F.when(cond(), 1).otherwise(0)), F.lit(0)
            ).alias(name)
            for name, cond in _RULES.items()
        ],
    )


def rule_report(counts_row: DataFrame) -> DataFrame:
    """Unpivot the wide counter row into the batch audit's report shape
    — via the audit's own shared helpers, so the two report schemas
    cannot drift."""
    from ..operators.quality import finish_report, unpivot_counts

    return finish_report(unpivot_counts(counts_row, list(_RULES)))


def maintain_dq_report(
    spark: SparkSession,
    events_stream: DataFrame,
    report_path: str,
    checkpoint: str | None = None,
):
    """Start the maintenance query: every epoch republishes the
    per-rule report for the stream-so-far."""
    counts = streaming_rule_counts(events_stream)

    def write_report(batch_df: DataFrame, epoch_id: int) -> None:
        publish_epoch_report(rule_report(batch_df), report_path, epoch_id)

    return stream_to_batch_sink(
        counts,
        write_report,
        query_name="dq-maintenance",
        output_mode="complete",
        checkpoint=checkpoint,
    )
