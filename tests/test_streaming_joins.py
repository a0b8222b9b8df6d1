"""Watermarked stream–stream interval join (streaming/joins.py): the
streaming result converges to the batch join on the same inputs, the
plan carries the state-bounding machinery, and the interval semantics
hold on constructed pairs."""

from __future__ import annotations

import datetime as dt
import shutil

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.streaming import joins

from .oracle_utils import canonical_rows


def test_streaming_join_equals_batch(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "events_src")
    e = load_table(spark, sf_smoke, "events")
    e.repartition(2).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "pairs_out")
    ckpt = str(tmp_path / "ckpt")
    try:
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            joins.streaming_click_purchase_pairs(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.read.parquet(out)
        want = joins.batch_click_purchase_pairs(spark.read.parquet(src))
        assert want.count() > 0, "fixture must produce pairs"
        assert canonical_rows(got.toPandas()) == canonical_rows(
            want.toPandas()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_interval_semantics_on_constructed_events(spark):
    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # click 30 min before purchase: paired
        (1, base - dt.timedelta(minutes=30), 7, "click", 0.0, "{}"),
        (2, base, 7, "purchase", 9.0, "{}"),
        # click AFTER the purchase: not paired
        (3, base + dt.timedelta(minutes=5), 7, "click", 0.0, "{}"),
        # click 2h before: outside the interval
        (4, base - dt.timedelta(hours=2), 7, "purchase", 1.0, "{}"),
        # a different user's click: not paired
        (5, base - dt.timedelta(minutes=10), 8, "click", 0.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = joins.batch_click_purchase_pairs(e).collect()
    assert [(r.purchase_id, r.click_id) for r in got] == [(2, 1)]


def test_streaming_plan_is_state_bounded(spark, sf_smoke, tmp_path):
    """The physical streaming plan must be the symmetric-hash
    stream-stream join with watermarks on both sides — the machinery
    that bounds buffered state; without it the join would be rejected
    or grow forever."""
    src = str(tmp_path / "events_plan")
    e = load_table(spark, sf_smoke, "events")
    e.limit(100).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(e.schema).parquet(src)
    df = joins.streaming_click_purchase_pairs(stream)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert logical.count("EventTimeWatermark") == 2
    assert df.isStreaming
