"""Erasure-on-ingest: right-to-be-forgotten requests maintained as a
stream — the streaming twin of ``sources/forget.py``, completing the
pattern every at-rest layout here follows (dedup has
``dedup_ingest_stream``, the PQ index has ``vector_ingest``, the
reports have drift/DQ/anomaly maintenance).

Compliance deletions arrive continuously (user requests, takedowns),
and their SLA is 'within N days', not 'this instant' — so the right
shape is a stream of requests drained per micro-batch: each epoch
applies the whole batch in ONE pass over the derived stores (the
batching that amortizes the bucketed stores' full rewrites — see
``sources/forget.py``) and publishes the audit report atomically.

Epoch replay is idempotent because the underlying erasure is: a
replayed batch's ids are already gone, every store reports zero rows
removed, and the re-published report records exactly that. Request
batches are collected driver-side — erasure requests are human-scale
(thousands, not billions); a backlog bigger than driver memory should
be drained through the batch API directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.forget import _REPORT_SCHEMA, forget_documents, forget_vectors
from .drift import publish_epoch_report
from .windows import stream_to_batch_sink

# Request schema: kind in ('vector', 'document'), id = vec_id/doc_id.
REQUEST_SCHEMA = "kind string, id long"


def apply_erasure_batch(
    spark: SparkSession, sf_dir: str, batch_df: DataFrame
) -> DataFrame:
    """One erasure pass for a batch of requests; returns the combined
    audit report (may be empty if the batch held no valid requests).

    Requests whose ``kind`` is not in the known set (a typo'd
    'documents', a NULL) — or whose ``id`` is NULL — are NEVER
    silently discarded: each malformed shape gets a
    ``layout='rejected'`` report row counting its requests, so the
    epoch's audit record shows a malformed compliance request was
    received and NOT applied — the sender retries with a valid request
    instead of assuming erasure happened. A raise here would wedge the
    maintenance stream on a poison record; a rejected AUDIT row keeps
    the trail append-only and the stream alive."""
    reqs = batch_df.select("kind", "id").collect()
    vec_ids = sorted(
        {int(r.id) for r in reqs if r.kind == "vector" and r.id is not None}
    )
    doc_ids = sorted(
        {int(r.id) for r in reqs if r.kind == "document" and r.id is not None}
    )
    bad: dict[str, int] = {}
    for r in reqs:
        if r.kind not in ("vector", "document"):
            key = "kind=" + ("NULL" if r.kind is None else str(r.kind))
        elif r.id is None:
            key = f"id=NULL:kind={r.kind}"
        else:
            continue
        bad[key] = bad.get(key, 0) + 1
    reports = []
    if vec_ids:
        reports.append(forget_vectors(spark, sf_dir, vec_ids))
    if doc_ids:
        reports.append(forget_documents(spark, sf_dir, doc_ids))
    if bad:
        reports.append(
            spark.createDataFrame(
                [
                    (f"request:{key}", "rejected", n, 0, 0)
                    for key, n in sorted(bad.items())
                ],
                _REPORT_SCHEMA,
            )
        )
    if not reports:
        return spark.createDataFrame([], _REPORT_SCHEMA)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def _apply_epoch_fn(spark: SparkSession, sf_dir: str, report_path: str):
    def apply_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        report = apply_erasure_batch(spark, sf_dir, batch_df)
        # keep_history: erasure reports are compliance RECORDS — the
        # audit trail must never be GC'd by the next epoch's publish.
        publish_epoch_report(
            report, report_path, epoch_id, keep_history=True
        )

    return apply_epoch


def maintain_erasure(
    spark: SparkSession,
    sf_dir: str,
    request_stream: DataFrame,
    report_path: str,
    checkpoint: str,
):
    """Start the continuous erasure maintenance query: every epoch
    drains the arrived requests, applies them to all derived stores,
    and publishes the audit report through the shared atomic
    ``_LATEST`` discipline (``drift.publish_epoch_report``) in its
    append-only form — every epoch's audit record is retained."""
    return stream_to_batch_sink(
        request_stream,
        _apply_epoch_fn(spark, sf_dir, report_path),
        query_name="erasure-maintenance",
        output_mode="append",
        checkpoint=checkpoint,
    )


def start_erasure_available_now(
    spark: SparkSession,
    sf_dir: str,
    request_stream: DataFrame,
    report_path: str,
    checkpoint: str,
):
    """availableNow variant: drain everything already in the source,
    then stop — the shape tests and scheduled compliance jobs use."""
    return (
        request_stream.writeStream.foreachBatch(
            _apply_epoch_fn(spark, sf_dir, report_path)
        )
        .outputMode("append")
        .queryName("erasure-maintenance")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
