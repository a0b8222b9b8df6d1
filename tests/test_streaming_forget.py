"""Erasure-on-ingest (streaming/forget.py): a drained request stream
removes the ids from every derived store, publishes the audit report
atomically, and epoch replay of the same requests is a reported no-op."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from customer_churn_prediction_spark.streaming import forget as sforget
from customer_churn_prediction_spark.streaming.drift import read_report
from customer_churn_prediction_spark.sources.writers import (
    sf_tag,
    warehouse_store,
)

IDS = [410, 411]


@pytest.fixture(autouse=True)
def _restore_stores_after(spark, sf_dir):
    yield
    tag = sf_tag(sf_dir)
    for table in (
        f"ivf_lists_{tag}", f"ivf_pq_store_{tag}",
        f"int8_store_{tag}", f"corpus_bands_{tag}",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            os.path.join(warehouse_store(), table), ignore_errors=True
        )
    shutil.rmtree(
        os.path.join(warehouse_store(), f"erasure_ledger_{tag}"),
        ignore_errors=True,
    )


def test_erasure_stream_drains_requests_and_replays_as_noop(
    spark, sf_dir, tmp_path
):
    tag = sf_tag(sf_dir)
    src = str(tmp_path / "requests")
    spark.createDataFrame(
        [("vector", i) for i in IDS] + [("document", 7)],
        sforget.REQUEST_SCHEMA,
    ).repartition(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(sforget.REQUEST_SCHEMA).parquet(src)
    report_path = str(tmp_path / "erasure_report")
    q = sforget.start_erasure_available_now(
        spark, sf_dir, stream, report_path,
        checkpoint=str(tmp_path / "ckpt1"),
    )
    assert q.awaitTermination(180), "drain timed out"

    # ids gone from every store
    for table in (f"ivf_lists_{tag}", f"ivf_pq_store_{tag}",
                  f"int8_store_{tag}"):
        assert (
            spark.table(table).where(F.col("vec_id").isin(IDS)).count() == 0
        ), table
    assert (
        spark.table(f"corpus_bands_{tag}")
        .where(F.col("doc_id") == 7)
        .count()
        == 0
    )
    report = {r.store: r for r in read_report(spark, report_path).collect()}
    assert set(report) == {
        f"ivf_lists_{tag}", f"ivf_pq_store_{tag}",
        f"int8_store_{tag}", f"corpus_bands_{tag}",
    }

    # replay: same source, FRESH checkpoint — the stores already lack
    # the ids, so every store reports zero removed (erasure idempotent
    # under epoch replay) and the republished report says so
    q2 = sforget.start_erasure_available_now(
        spark, sf_dir, stream, report_path,
        checkpoint=str(tmp_path / "ckpt2"),
    )
    assert q2.awaitTermination(180), "replay drain timed out"
    replay = {r.store: r for r in read_report(spark, report_path).collect()}
    for r in replay.values():
        assert r.rows_before == r.rows_after, r


def test_poison_requests_do_not_wedge_the_stream(spark, sf_dir, tmp_path):
    """The design claim behind the rejected-row path: a malformed
    request (bad kind, NULL id) arriving THROUGH the stream must leave
    the query alive and terminating cleanly, with the rejections in
    the published epoch report and the valid request still applied."""
    tag = sf_tag(sf_dir)
    src = str(tmp_path / "requests")
    spark.createDataFrame(
        [("document", 7), ("documents", 8), ("vector", None)],
        sforget.REQUEST_SCHEMA,
    ).repartition(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(sforget.REQUEST_SCHEMA).parquet(src)
    report_path = str(tmp_path / "poison_report")
    q = sforget.start_erasure_available_now(
        spark, sf_dir, stream, report_path,
        checkpoint=str(tmp_path / "ckpt_poison"),
    )
    assert q.awaitTermination(180), "drain timed out"
    assert q.exception() is None
    report = {r.store: r for r in read_report(spark, report_path).collect()}
    assert report["request:kind=documents"].layout == "rejected"
    assert report["request:id=NULL:kind=vector"].layout == "rejected"
    assert f"corpus_bands_{tag}" in report  # the valid request applied
    assert (
        spark.table(f"corpus_bands_{tag}")
        .where(F.col("doc_id") == 7).count() == 0
    )


def test_erasure_audit_trail_is_append_only(spark, sf_dir, tmp_path):
    """Erasure reports are compliance RECORDS: a later epoch's publish
    must never GC an earlier epoch's audit record (the running-
    aggregate sinks' GC discipline does not apply here). Two separate
    one-epoch drains against the same report path must leave BOTH
    epoch records on disk, with _LATEST pointing at the newer."""
    report_path = str(tmp_path / "audit")
    src = str(tmp_path / "requests")
    ckpt = str(tmp_path / "ckpt")  # SAME checkpoint: epochs advance
    for vec in (401, 402):
        spark.createDataFrame(
            [("vector", vec)], sforget.REQUEST_SCHEMA
        ).repartition(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(sforget.REQUEST_SCHEMA).parquet(src)
        )
        q = sforget.start_erasure_available_now(
            spark, sf_dir, stream, report_path, checkpoint=ckpt
        )
        assert q.awaitTermination(180), "drain timed out"
    epochs = sorted(
        d for d in os.listdir(report_path) if d.startswith("epoch=")
    )
    assert len(epochs) == 2, epochs
    # the full trail remains queryable as one frame
    trail = spark.read.parquet(
        *[os.path.join(report_path, d) for d in epochs]
    )
    assert trail.count() >= 2


def test_malformed_request_kinds_leave_rejected_audit_rows(spark, sf_dir):
    """A request whose kind is not in the known set (typo'd
    'documents', NULL) must NOT vanish silently: the batch's audit
    report carries one layout='rejected' row per bad kind with the
    request count, and the bad rows trigger no store erasure."""
    batch = spark.createDataFrame(
        [("documents", 7), ("documents", 8), (None, 9),
         # valid kind, NULL id: the other poison shape — unguarded,
         # int(None) raises in the epoch fn and wedges the stream
         ("document", None)],
        sforget.REQUEST_SCHEMA,
    )
    report = sforget.apply_erasure_batch(spark, sf_dir, batch)
    rows = {r.store: r for r in report.collect()}
    # no valid requests -> no store rows, only the rejections
    assert set(rows) == {"request:kind=documents", "request:kind=NULL",
                         "request:id=NULL:kind=document"}
    assert rows["request:kind=documents"].layout == "rejected"
    assert rows["request:kind=documents"].partitions_touched == 2
    assert rows["request:kind=NULL"].partitions_touched == 1
    assert rows["request:id=NULL:kind=document"].layout == "rejected"
    assert rows["request:id=NULL:kind=document"].partitions_touched == 1
    # mixed batch: valid kinds still apply, rejections still reported
    tag = sf_tag(sf_dir)
    mixed = spark.createDataFrame(
        [("document", 7), ("documents", 8)], sforget.REQUEST_SCHEMA
    )
    report2 = sforget.apply_erasure_batch(spark, sf_dir, mixed)
    rows2 = {r.store: r for r in report2.collect()}
    assert set(rows2) == {
        f"corpus_bands_{tag}", "request:kind=documents"
    }
